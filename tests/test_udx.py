"""UDF/UDAF/UDTF surface (operators/udx.py, SURVEY.md §2.11).

The UDTF chunker is pinned DIFFERENTIALLY against the builtin chunker —
two independent implementations (Python generator vs JVM explode) must
agree row-for-row — and the MAD UDAF against hand-computed order
statistics plus a pandas cross-check.
"""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from temporalvault_spark.operators.corpus import chunk_documents
from temporalvault_spark.operators.udx import (
    ChunkSpans,
    q_udaf_source_length_mad,
    q_udtf_chunk_spans,
)


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_udtf_chunker_matches_builtin(spark, sf_dir):
    cols = ["doc_id", "chunk_id", "n_chunk_tokens", "chunk_text"]
    from temporalvault_spark.catalog import load_catalog

    docs = load_catalog(spark, sf_dir).table("documents")
    builtin = _rows(chunk_documents(docs).select(*cols), cols)
    via_udtf = _rows(q_udtf_chunk_spans(spark, sf_dir).select(*cols), cols)
    assert via_udtf == builtin
    assert len(builtin) > 0


def test_udtf_edge_semantics(spark):
    """Empty/whitespace/multi-space docs behave exactly like the builtin:
    split(' ') keeps empty tokens, every non-NULL doc emits >= 1 chunk,
    and NULL-text docs emit none (oracle contract: range(0, NULL) = 0
    rows)."""
    rows = [(1, ""), (2, "   "), (3, "a  b"), (4, None)]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    cols = ["doc_id", "chunk_id", "n_chunk_tokens", "chunk_text"]
    builtin = _rows(chunk_documents(docs).select(*cols), cols)
    spark.udtf.register("chunk_spans_t", ChunkSpans)
    docs.createOrReplaceTempView("udtf_edge_docs")
    via_udtf = _rows(
        spark.sql(
            """SELECT d.doc_id, c.chunk_id, c.n_chunk_tokens, c.chunk_text
               FROM udtf_edge_docs d, LATERAL chunk_spans_t(d.text) c"""
        ),
        cols,
    )
    assert via_udtf == builtin
    assert {r[0] for r in via_udtf} == {1, 2, 3}  # NULL-text doc 4 emits nothing


def test_udtf_plan_no_shuffle(spark, sf_dir):
    """Chunking through the Python boundary must stay embarrassingly
    parallel: the plan is a lateral generate with NO Exchange."""
    plan = q_udtf_chunk_spans(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "PythonUDTF" in plan or "EvalPython" in plan


def test_mad_udaf_crafted(spark):
    """lengths [1,2,3,100]: median 2.5, |dev| [1.5,.5,.5,97.5] -> MAD 1.0;
    odd group [5,5,5]: MAD 0."""
    rows = [("a", "x"), ("a", "xy"), ("a", "xyz"), ("a", "z" * 100), ("b", "aaaaa"), ("b", "bbbbb"), ("b", "ccccc")]
    docs = spark.createDataFrame(rows, "source string, text string")
    from temporalvault_spark.operators.udx import mad_double

    out = dict(
        docs.select("source", F.length("text").cast("double").alias("x"))
        .groupBy("source")
        .agg(F.round(mad_double("x"), 6).alias("mad_len"))
        .collect()
    )
    assert out == {"a": 1.0, "b": 0.0}


def test_mad_udaf_matches_pandas(spark, sf_dir):
    got = {r["source"]: r["mad_len"] for r in q_udaf_source_length_mad(spark, sf_dir).collect()}
    pdf = pd.read_parquet(f"{sf_dir}/documents.parquet")[["source", "text"]]
    pdf["x"] = pdf["text"].str.len().astype(float)
    exp = (
        pdf.groupby("source")["x"]
        .apply(lambda s: round(float((s - s.median()).abs().median()), 6))
        .to_dict()
    )
    assert got == pytest.approx(exp)


def test_grouped_map_robust_z_crafted(spark):
    """Group a: lengths [1,2,3,100] -> med 2.5, MAD 1.0; z = (x-2.5)/2.0.
    Only the 100-char doc crosses |z| > 3. Constant group b: all z=0."""
    rows = [
        (1, "a", "x"),
        (2, "a", "xy"),
        (3, "a", "xyz"),
        (4, "a", "z" * 100),
        (5, "b", "mm"),
        (6, "b", "nn"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string, text string")
    from pyspark.sql import functions as F

    from temporalvault_spark.operators.udx import _robust_z_group

    base = docs.select("doc_id", "source", F.length("text").cast("double").alias("x"))
    out = base.groupBy("source").applyInPandas(
        _robust_z_group,
        schema="doc_id bigint, source string, robust_z double, is_outlier boolean",
    )
    got = {r["doc_id"]: (r["robust_z"], r["is_outlier"]) for r in out.collect()}
    assert got[4] == (48.75, True)
    assert got[1] == (-0.75, False)
    assert got[5] == (0.0, False) and got[6] == (0.0, False)
    assert [o for (_z, o) in got.values() if o] == [True]


def test_ptf_sessionize_equals_native_session_window(spark, sf_dir):
    """The stateful PTF must reproduce the native session_window aggregate
    row-for-row (same 30-min >= boundary, same per-session sums)."""
    from temporalvault_spark.operators.timewindow import q_win_session
    from temporalvault_spark.operators.udx import q_udtf_sessionize

    cols = ["user_id", "session_start", "n_events", "sum_value"]
    native = sorted(tuple(r[c] for c in cols) for r in q_win_session(spark, sf_dir).collect())
    via_ptf = sorted(tuple(r[c] for c in cols) for r in q_udtf_sessionize(spark, sf_dir).collect())
    assert via_ptf == native
    assert len(native) > 0


def test_ptf_sessionize_skips_null_ts(spark):
    """A NULL-ts event must be skipped, not crash the partition."""
    import datetime as dt

    from temporalvault_spark.operators.udx import SessionizePTF

    t0 = dt.datetime(2026, 1, 1)
    rows = [
        (1, None, 1.0, 100),
        (1, t0, 2.0, 101),
        (1, t0 + dt.timedelta(minutes=5), 3.0, 102),
    ]
    df = spark.createDataFrame(rows, "user_id bigint, ts timestamp, value double, event_id bigint")
    df.createOrReplaceTempView("ptf_null_ts_events")
    spark.udtf.register("sessionize_nullts", SessionizePTF)
    out = spark.sql(
        """SELECT * FROM sessionize_nullts(
               TABLE(SELECT user_id, ts, value, event_id FROM ptf_null_ts_events)
               PARTITION BY user_id ORDER BY (ts, event_id))"""
    ).collect()
    assert len(out) == 1
    assert out[0]["n_events"] == 2 and out[0]["sum_value_raw"] == 5.0
