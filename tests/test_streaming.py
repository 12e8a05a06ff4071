"""Streaming jobs drained with Trigger.AvailableNow must equal their
oracle-checked batch twins — the one-definition/two-modes guarantee."""

import pytest

import __spark_entry__ as entrymod
from temporalvault_spark import streaming

QUERIES = entrymod.queries()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "stream_fn,batch_key",
    [
        (streaming.tumbling_counts, "win_tumbling_hour"),
        (streaming.sliding_counts, "win_sliding"),
        (streaming.session_counts, "win_session"),
    ],
)
def test_stream_equals_batch(spark, sf_dir, stream_fn, batch_key):
    ev = streaming.events_stream(spark, sf_dir)
    out = streaming.run_available_now(stream_fn(ev), f"t_{batch_key}")
    assert _rows(out) == _rows(QUERIES[batch_key](spark, sf_dir))


def test_latest_state_stream(spark, sf_dir):
    """Feed the stateful operator a stream with precomputed version numbers
    (windows aren't available on unbounded streams) and check it converges to
    the batch asof state."""
    import pyspark.sql.functions as F
    from temporalvault_spark.constants import PROBE_TS

    cat_dir = sf_dir
    ev = streaming.events_stream(spark, cat_dir).filter(
        F.col("ts") <= F.lit(PROBE_TS).cast("timestamp")
    )
    # version_num must come precomputed on a stream; event_id arrival order
    # is a valid stand-in for ordering within this bounded drain
    rec = ev.select(
        F.col("user_id").cast("string").alias("record_id"),
        F.col("event_id").cast("int").alias("version_num"),
        "ts",
        F.col("props").alias("data"),
    )
    out = streaming.run_available_now(
        streaming.latest_state_stream(rec), "t_latest_state", output_mode="update"
    )
    rows = out.collect()
    assert len(rows) > 0
    # every key's reported state is its max event_id at or before the probe
    expected = {
        str(r["user_id"]): r["m"]
        for r in spark.read.parquet(f"{cat_dir}/events.parquet")
        .withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        .filter(F.col("ts") <= F.lit(PROBE_TS).cast("timestamp"))
        .groupBy("user_id")
        .agg(F.max("event_id").alias("m"))
        .collect()
    }
    got = {r["record_id"]: int(r["version"][1:]) for r in rows}
    assert got == expected


def test_stream_ingest_into_vault(spark, sf_dir, tmp_path):
    """events stream → foreachBatch → vault.record_bulk: resulting state
    equals the batch-derived temporal view's latest-per-key."""
    import pyspark.sql.functions as F
    from temporalvault_spark.vault import TemporalVault
    from temporalvault_spark.catalog import load_catalog

    vault = TemporalVault(spark, str(tmp_path / "ingest_vault"))
    ev = streaming.events_stream(spark, sf_dir)
    streaming.ingest_into_vault(vault, ev)

    got = {
        r["record_id"]: (r["version"], r["data"])
        for r in vault.state_at("2030-01-01 00:00:00").collect()
    }
    cat = load_catalog(spark, sf_dir)
    expected = {
        r["record_id"]: r["n"]
        for r in cat.temporal_records.groupBy("record_id")
        .agg(F.max("version_num").alias("n"))
        .collect()
    }
    # version strings may differ in tie-order at identical (ts) seconds;
    # compare key set + per-key version counts
    assert set(got) == set(expected)
    assert {k: int(v[0][1:]) for k, v in got.items()} == expected
