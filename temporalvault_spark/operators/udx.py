"""User-defined function surface (SURVEY.md §2.11): UDTF + grouped UDAF.

The reference's only "UDFs" are driver-side Python — `parsedatetime` NL
parsing (reference app/main.py:110-111) and the dict diff (app/main.py:
322-326) — both of which this engine expresses with JVM builtins (engine
policy: builtins first, Python only when the semantics demand it). This
module completes the three-kind UDF surface a Spark engine exposes, each
with a deterministic oracle or differential check:

  * scalar pandas UDF — `similarity.sim_topk_cosine_pandas` (Arrow twin of
    the builtin cosine operator; already registered there);
  * table function (UDTF) — `ChunkSpans` below, the Python-UDTF twin of
    `corpus.chunk_documents`. Arrow-optimized, lateral-joined, and graded
    against the SAME DuckDB oracle as the builtin — a full value-hash
    check on a Python UDTF;
  * grouped aggregate (UDAF) — `mad_double` below, the median absolute
    deviation of per-document length per source: a two-order-statistic
    aggregate Spark has no single builtin for, expressed as one Arrow
    batch per group instead of two shuffles (median join + re-aggregate).

Scale notes: the builtin chunker remains the hot path (zero-Python explode
at scan speed); the UDTF exists as the extension seam — the shape a user
plugs a real tokenizer (BPE, sentencepiece) into. Its plan is a single
ArrowEvalPython/BatchEvalPython generate with no shuffle: chunking stays
embarrassingly parallel even through the Python boundary. The MAD UDAF
shuffles (source, length) pairs only — 8-byte payloads, never text — and
each group's order statistics run vectorized in one numpy pass.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf
from pyspark.sql.types import DoubleType

from temporalvault_spark.catalog import load_catalog
from temporalvault_spark.operators.corpus import (
    CHUNK_ORACLE_SQL,
    CHUNK_STRIDE,
    CHUNK_TOKENS,
)
from temporalvault_spark.registry import query


@udtf(returnType="chunk_id bigint, n_chunk_tokens bigint, chunk_text string", useArrow=True)
class ChunkSpans:
    """Python-UDTF twin of `corpus.chunk_documents`: emit overlapping
    CHUNK_TOKENS-token windows every CHUNK_STRIDE tokens.

    Tokenization must match the builtin bit-for-bit: `split(lower(trim(x)),
    ' ')` keeps empty tokens between consecutive spaces, and Python's
    `str.split(' ')` (single-space separator, not the whitespace default)
    has the identical contract. Start offsets are 0, stride, … ≤ n-1, so an
    empty-after-trim document still yields one (empty) chunk — same as the
    builtin's `sequence(0, greatest(n-1, 0), stride)`.
    """

    def eval(self, text: str | None):
        if text is None:
            # contract shared with the builtin AND the oracle: NULL text
            # produces no chunks (DuckDB's range(0, NULL) is zero rows)
            return
        # strip(' ') — SPACES only — because the builtin/oracle `trim()`
        # removes only spaces; Python's bare strip() removes all Unicode
        # whitespace (\t, \n, \r …) and would tokenize a newline-padded
        # document differently from the builtin twin
        toks = text.strip(" ").lower().split(" ")
        n = len(toks)
        for start in range(0, max(n - 1, 0) + 1, CHUNK_STRIDE):
            ch = toks[start : start + CHUNK_TOKENS]
            yield start // CHUNK_STRIDE, len(ch), " ".join(ch)


@query("udtf_chunk_spans", CHUNK_ORACLE_SQL)
def q_udtf_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lateral-join the UDTF against documents; graded by the same oracle as
    the builtin chunker (identical output contract)."""
    load_catalog(spark, sf_dir)
    spark.udtf.register("chunk_spans", ChunkSpans)
    return spark.sql(
        """SELECT d.doc_id, c.chunk_id, c.n_chunk_tokens, c.chunk_text
           FROM documents d, LATERAL chunk_spans(d.text) c"""
    )


# DataType instance, not DDL string: a string returnType is parsed eagerly at
# decoration time and needs a live SparkContext — this module imports before
# any session exists (registry population).
@pandas_udf(DoubleType())
def mad_double(x: pd.Series) -> float:
    """Grouped-agg UDAF: median absolute deviation (robust spread). Order
    statistics, not sums — so the result is permutation-invariant and safe
    to value-hash against DuckDB's `median` (both interpolate the midpoint
    of even-sized groups; NULLs are skipped on both sides)."""
    med = x.median()
    return float((x - med).abs().median())


@query(
    "udaf_source_length_mad",
    """WITH l AS (
        SELECT source, CAST(length(text) AS DOUBLE) AS x FROM documents),
    m AS (SELECT source, median(x) AS med FROM l GROUP BY source)
    SELECT l.source,
           round(median(abs(l.x - m.med)), 6) AS mad_len
    FROM l JOIN m ON l.source IS NOT DISTINCT FROM m.source
    GROUP BY l.source""",
)
def q_udaf_source_length_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source robust length spread: one grouped Arrow aggregate where
    pure SQL needs a median subquery + join + second aggregate (the oracle
    spells out that two-pass form). The shuffle carries (source, double)
    pairs only."""
    docs = load_catalog(spark, sf_dir).table("documents")
    return (
        docs.select("source", F.length("text").cast("double").alias("x"))
        .groupBy("source")
        # a grouped-agg pandas UDF cannot share an agg() with non-pandas
        # aggregates (INVALID_PANDAS_UDF_PLACEMENT) — output stays pure
        .agg(F.round(mad_double("x"), 6).alias("mad_len"))
    )


def _robust_z_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """One whole group per call: per-source robust z of doc length,
    (x - median) / (MAD + 1) — median/MAD instead of mean/std so a few
    giant documents can't mask each other (the failure mode of the plain
    z-score scan, operators/temporal_analytics.q_events_zscore_outliers).
    +1 smoothing keeps constant-length groups finite."""
    x = pdf["x"]
    med = x.median()
    mad = (x - med).abs().median()
    z = (x - med) / (mad + 1.0)
    # NULL x must stay NULL in BOTH outputs: pandas' NaN > 3.0 is False,
    # but SQL's abs(NULL) > 3 is NULL — mask to keep oracle parity. The
    # same masking applies to robust_z itself: Arrow round-trips a float
    # NaN as NaN, not SQL NULL, so leave the NULL-x rows as object-None
    robust_z = z.round(6).astype(object)
    robust_z[x.isna()] = None
    is_outlier = (z.abs() > 3.0).astype(object)
    is_outlier[x.isna()] = None
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "source": pdf["source"],
            "robust_z": robust_z,
            "is_outlier": is_outlier,
        }
    )


@query(
    "grouped_map_robust_z",
    """WITH l AS (
        SELECT doc_id, source, CAST(length(text) AS DOUBLE) AS x FROM documents),
    m AS (SELECT source, median(x) AS med FROM l GROUP BY source),
    d AS (SELECT l.source, median(abs(x - med)) AS mad
          FROM l JOIN m ON l.source IS NOT DISTINCT FROM m.source
          GROUP BY l.source)
    SELECT doc_id, l.source,
           ROUND((x - med) / (mad + 1.0), 6) AS robust_z,
           abs((x - med) / (mad + 1.0)) > 3.0 AS is_outlier
    FROM l JOIN m ON l.source IS NOT DISTINCT FROM m.source
           JOIN d ON l.source IS NOT DISTINCT FROM d.source""",
)
def q_grouped_map_robust_z(spark, sf_dir: str):
    """Grouped-map applyInPandas (the 4th pandas-API kind after scalar /
    UDAF / UDTF): per-source robust-z outlier flags in ONE group-local
    pass, where pure SQL needs two median subqueries + a three-way join
    (the oracle spells that form out).

    Scale caveat, stated honestly: grouped-map ships ENTIRE groups through
    Arrow — right when per-group logic is arbitrary and groups are bounded
    (here: |sources| groups). For unbounded/skewed groups the two-pass
    aggregate+join form is the scale path; this operator is the seam for
    logic that form can't express."""
    docs = load_catalog(spark, sf_dir).table("documents")
    base = docs.select("doc_id", "source", F.length("text").cast("double").alias("x"))
    return base.groupBy("source").applyInPandas(
        _robust_z_group,
        schema="doc_id bigint, source string, robust_z double, is_outlier boolean",
    )


@udtf(
    returnType="user_id bigint, session_start timestamp, n_events bigint, sum_value_raw double"
)
class SessionizePTF:
    """Polymorphic table function (SQL-standard PTF shape): consumes
    ``TABLE(events) PARTITION BY user_id ORDER BY ts, event_id`` and emits
    one row per 30-minute-gap session — the UDTF counterpart of both the
    native ``session_window`` aggregate (timewindow.q_win_session) and the
    streaming ``applyInPandasWithState`` form: per-partition instances see
    their rows in order and carry state across them, exactly the seam a
    user plugs custom sessionization (e.g., campaign-aware gaps) into.

    Boundary matches q_win_session: an event at exactly prev + 30min
    STARTS a new session (>=). Sums are emitted raw and rounded by the
    caller with F.round — Python's round() is banker's rounding, SQL's is
    half-away-from-zero, and a hash-checked oracle cannot tolerate the
    difference."""

    GAP_SECONDS = 1800.0

    def __init__(self):
        self._cur = None  # [user_id, start_ts, prev_ts, n, sum, any_value]

    def _flush(self):
        u, start, _prev, n, s, any_v = self._cur
        yield u, start, n, (s if any_v else None)

    def eval(self, row):
        ts, u, v = row["ts"], row["user_id"], row["value"]
        if ts is None:
            # an event with no timestamp cannot be sessionized — skip it
            # rather than crash the partition (the event-log contract
            # guarantees non-null ts; this is the belt to that suspender)
            return
        if self._cur is None or (ts - self._cur[2]).total_seconds() >= self.GAP_SECONDS:
            if self._cur is not None:
                yield from self._flush()
            self._cur = [u, ts, ts, 0, 0.0, False]
        self._cur[2] = ts
        self._cur[3] += 1
        if v is not None:
            self._cur[4] += v
            self._cur[5] = True

    def terminate(self):
        if self._cur is not None:
            yield from self._flush()


from temporalvault_spark.operators.timewindow import SESSION_ORACLE_SQL  # noqa: E402


@query("udtf_sessionize", SESSION_ORACLE_SQL)

def q_udtf_sessionize(spark, sf_dir: str):
    """Sessionization through the PTF: same oracle as win_session (the
    gaps-and-islands rewrite), so the stateful Python path is value-hash
    checked against ground truth. The plan partitions once on user_id and
    streams each partition through its UDTF instance in order — the batch
    twin of the stateful-streaming shape."""
    load_catalog(spark, sf_dir)
    spark.udtf.register("sessionize_events", SessionizePTF)
    out = spark.sql(
        """SELECT * FROM sessionize_events(
               TABLE(SELECT user_id, ts, value, event_id FROM events)
               PARTITION BY user_id ORDER BY (ts, event_id))"""
    )
    return out.select(
        "user_id",
        "session_start",
        "n_events",
        F.round("sum_value_raw", 2).alias("sum_value"),
    )
