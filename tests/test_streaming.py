"""Streaming jobs drained with Trigger.AvailableNow must equal their
oracle-checked batch twins — the one-definition/two-modes guarantee."""

import pytest

import __spark_entry__ as entrymod
from temporalvault_spark import streaming

QUERIES = entrymod.queries()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_events_stream_ts_is_ltz_timestamp(spark, sf_dir):
    """Watermarks hard-require session-tz TIMESTAMP (LTZ). Whatever physical
    type the source parquet carries — int64 nanos, TIMESTAMP_NTZ, or LTZ —
    events_stream must emit ts as plain 'timestamp'. This is the guard that
    catches an inferTimestampNTZ regression at commit time instead of as six
    EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE failures."""
    ev = streaming.events_stream(spark, sf_dir)
    assert dict(ev.dtypes)["ts"] == "timestamp"
    # and the batch catalog agrees — stream and batch must see one type
    from temporalvault_spark.catalog import load_catalog

    cat = load_catalog(spark, sf_dir)
    assert dict(cat.table("events").dtypes)["ts"] == "timestamp"
    assert dict(cat.temporal_records.dtypes)["ts"] == "timestamp"


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
    from temporalvault_spark.session import normalize_ts_cols

    expected = {
        str(r["user_id"]): r["m"]
        for r in normalize_ts_cols(
            spark.read.parquet(f"{cat_dir}/events.parquet"), ("ts",)
        )
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


def test_watermark_drops_late_events(spark, tmp_path):
    """Two sequential micro-batches: batch 1 advances the watermark; batch 2
    delivers an event older than it — the aggregate must NOT emit that
    window. This is the late-data contract watermarks exist for."""
    import pyspark.sql.functions as F
    from datetime import datetime

    src = tmp_path / "stream_src"
    src.mkdir()
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
            str(src / name)
        )

    # batch 1: events up to 12:00 -> watermark advances to 11:00 (1h delay)
    write_batch("b1", [
        (1, datetime(2026, 1, 1, 10, 30), 1, "click", 1.0, "{}"),
        (2, datetime(2026, 1, 1, 12, 0), 1, "click", 1.0, "{}"),
    ])
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "*"))
    )
    agg = (
        stream.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "n")
    )
    q = (
        agg.writeStream.format("memory").queryName("late_test")
        .outputMode("update").start()
    )
    try:
        q.processAllAvailable()
        # batch 2: an event at 08:15, far older than the 11:00 watermark
        write_batch("b2", [(3, datetime(2026, 1, 1, 8, 15), 1, "click", 1.0, "{}")])
        q.processAllAvailable()
    finally:
        q.stop()

    windows = {r["ws"] for r in spark.table("late_test").collect()}
    assert datetime(2026, 1, 1, 10, 0) in windows and datetime(2026, 1, 1, 12, 0) in windows
    assert datetime(2026, 1, 1, 8, 0) not in windows  # late event dropped


def test_stream_stream_join_equals_batch(spark, sf_dir):
    """The watermarked purchase⋈click interval join, drained as a stream,
    equals the identical plan executed in batch mode."""
    import pyspark.sql.functions as F

    ev_stream = streaming.events_stream(spark, sf_dir)
    out = streaming.run_available_now(
        streaming.clicks_to_purchases_join(ev_stream), "ss_join", output_mode="append"
    )
    from temporalvault_spark.session import normalize_ts_cols

    ev_batch = normalize_ts_cols(
        spark.read.parquet(f"{sf_dir}/events.parquet"), ("ts",)
    )
    batch = streaming.clicks_to_purchases_join(ev_batch)
    got = sorted(tuple(r) for r in out.collect())
    expected = sorted(tuple(r) for r in batch.collect())
    assert len(got) > 0
    assert got == expected


def test_latest_state_multibatch_dedup(spark, tmp_path):
    """Across multiple micro-batches the update-mode memory sink accumulates
    one row per key per batch; latest_by/order_col must collapse to the
    newest, and n_versions must be cumulative (not per-batch)."""
    import pyspark.sql.functions as F

    src = tmp_path / "ms"
    src.mkdir()
    schema = "record_id string, version_num int, ts timestamp, data string"
    from datetime import datetime

    spark.createDataFrame(
        [("k", 1, datetime(2026, 1, 1, 1), "a"), ("k", 2, datetime(2026, 1, 1, 2), "b")],
        schema,
    ).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(
        [("k", 3, datetime(2026, 1, 1, 3), "c")], schema
    ).coalesce(1).write.parquet(str(src / "f2"))

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(str(src / "*"))
    )
    out = streaming.run_available_now(
        streaming.latest_state_stream(stream),
        "ms_state",
        output_mode="update",
        latest_by=("record_id",),
        order_col="n_versions",
    ).collect()
    assert len(out) == 1
    assert out[0]["version"] == "v3" and out[0]["data"] == "c"
    assert out[0]["n_versions"] == 3  # cumulative across both batches


def test_ingest_replay_is_idempotent(spark, sf_dir, tmp_path):
    """Re-draining the same source must not double the log (batch markers)."""
    from temporalvault_spark.vault import TemporalVault

    v = TemporalVault(spark, str(tmp_path / "idem"))
    streaming.ingest_into_vault(v, streaming.events_stream(spark, sf_dir))
    n1 = v.log().count()
    # second drain: a fresh checkpoint-less query restarts at batch_id 0,
    # which the marker dir recognizes as already committed
    streaming.ingest_into_vault(v, streaming.events_stream(spark, sf_dir))
    assert v.log().count() == n1


def test_ingest_marker_compaction_and_atomicity(spark, tmp_path):
    """Marker files must compact into the floor file once they accumulate
    (the dir stays O(1), committed-ness preserved through the floor), and a
    batch id at-or-below the floor is never re-appended."""
    import os

    import temporalvault_spark.streaming.jobs as jobs
    from temporalvault_spark.vault import TemporalVault

    v = TemporalVault(spark, str(tmp_path / "compact_markers"))
    marker_dir = f"{v.root}/_ingest_batches"
    os.makedirs(marker_dir, exist_ok=True)
    # simulate 70 previously committed batches (past the compaction trigger)
    for i in range(70):
        with open(f"{marker_dir}/{i}", "w") as f:
            f.write("committed")

    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", 1)
        .load()
        .selectExpr("CAST(value AS STRING) AS user_id", "'{}' AS props", "timestamp AS ts")
    )
    calls = []
    orig = v.record_bulk
    v.record_bulk = lambda df: calls.append(1) or orig(df)
    jobs.ingest_into_vault(v, src)
    v.record_bulk = orig

    names = set(os.listdir(marker_dir))
    assert "_floor" in names
    with open(f"{marker_dir}/_floor") as f:
        floor = int(f.read())
    assert floor == 69
    # individual markers at-or-below the floor are gone
    assert not [n for n in names if n.isdigit() and int(n) <= floor]
    # the drain's batch 0 was already committed per the floor -> skipped
    assert not calls and v.log().count() == 0
    # no stray temp files from the atomic writes
    assert not [n for n in names if n.endswith(".tmp")]


def test_stream_dedup_within_watermark(spark, sf_dir):
    """A doubled stream (every event delivered twice, the at-least-once
    redelivery shape) deduped on event_id must converge to exactly the batch
    table's distinct event set."""
    from pyspark.sql import functions as F

    ev = streaming.events_stream(spark, sf_dir)
    doubled = ev.withColumn("_d", F.explode(F.array(F.lit(0), F.lit(1)))).drop("_d")
    out = streaming.run_available_now(
        streaming.dedup_events_stream(doubled), "dedup_stream", output_mode="append"
    )
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    assert out.count() == batch.select("event_id").distinct().count()
    # payloads intact, one row per id
    assert out.groupBy("event_id").count().filter("count > 1").count() == 0


def test_ingest_exactly_once_crash_windows(spark, tmp_path):
    """The staged-commit protocol must resolve every crash window without
    loss or duplication: (a) crash mid/after promotion but BEFORE the commit
    marker -> abort on recovery (files gone, replay re-ingests once);
    (b) crash AFTER the marker but before stage cleanup -> finish on
    recovery (data stays, no re-append); (c) a clean run leaves no stage."""
    import os
    from datetime import datetime

    from temporalvault_spark.vault import TemporalVault

    v = TemporalVault(spark, str(tmp_path / "xonce"))
    base = spark.createDataFrame(
        [("u1", "{}", datetime(2026, 1, 1)), ("u2", "{}", datetime(2026, 1, 2))],
        "record_id string, data string, ts timestamp",
    )
    batch = spark.createDataFrame(
        [("u1", '{"x":1}', datetime(2026, 1, 3))],
        "record_id string, data string, ts timestamp",
    )
    assert v.record_bulk(base) == 2

    # (a) staged commit ran, marker never written (crash before marker)
    assert v.record_bulk(batch, stage_tag="b7") == 1
    assert v.log().count() == 3  # promoted files are live pre-crash
    assert v.pending_ingest_tags() == ["b7"]
    v.abort_ingest("b7")  # what recovery does for a marker-less tag
    assert v.log().count() == 2 and v.pending_ingest_tags() == []
    # replay re-ingests: versions continue as if the aborted try never was
    assert v.record_bulk(batch, stage_tag="b7") == 1
    rows = {(r["record_id"], r["version"]) for r in v.log().collect()}
    assert ("u1", "v2") in rows and len(rows) == 3

    # (b) marker written, cleanup lost (crash after marker)
    v.finish_ingest("b7")
    batch2 = spark.createDataFrame(
        [("u2", '{"y":2}', datetime(2026, 1, 4))],
        "record_id string, data string, ts timestamp",
    )
    assert v.record_bulk(batch2, stage_tag="b8") == 1
    assert v.pending_ingest_tags() == ["b8"]
    v.finish_ingest("b8")  # what recovery does for a committed tag
    assert v.pending_ingest_tags() == [] and v.log().count() == 4

    # (c) abort is idempotent and touches nothing once clean
    v.abort_ingest("b9")
    assert v.log().count() == 4


def test_ingest_recovery_via_stream_restart(spark, sf_dir, tmp_path):
    """End-to-end: an uncommitted leftover stage from a 'crashed' run is
    rolled back by ingest_into_vault's recovery, and the stream then ingests
    everything exactly once."""
    from temporalvault_spark.vault import TemporalVault

    v = TemporalVault(spark, str(tmp_path / "xonce_stream"))
    # fabricate a crashed half-ingest: batch b0 promoted, marker missing
    ghost = spark.createDataFrame(
        [("ghost", "{}", __import__("datetime").datetime(2026, 1, 1))],
        "record_id string, data string, ts timestamp",
    )
    v.record_bulk(ghost, stage_tag="b0")
    assert v.log().count() == 1

    streaming.ingest_into_vault(v, streaming.events_stream(spark, sf_dir))
    n = v.log().count()
    # the ghost row was rolled back; batch 0 (the real data) landed once
    assert v.log().filter("record_id = 'ghost'").count() == 0
    expected = spark.read.parquet(f"{sf_dir}/events.parquet").count()
    assert n == expected


def test_funnel_state_stream_equals_batch(spark, sf_dir):
    """A complete drain of the stateful funnel must reproduce the batch
    funnel's stage counts exactly: every state component is a first-
    occurrence min, so arrival order cannot change the converged answer."""
    import pyspark.sql.functions as F

    ev = streaming.events_stream(spark, sf_dir)
    out = streaming.run_available_now(
        streaming.funnel_state_stream(ev),
        "t_funnel_state",
        output_mode="update",
        latest_by=("user_id",),
        order_col="stage",
    )
    got = out.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("stage") >= 1, 1).otherwise(0)).cast("bigint").alias("s1"),
        F.sum(F.when(F.col("stage") >= 2, 1).otherwise(0)).cast("bigint").alias("s2"),
        F.sum(F.when(F.col("stage") >= 3, 1).otherwise(0)).cast("bigint").alias("s3"),
    ).first()
    want = QUERIES["funnel_signup_click_purchase"](spark, sf_dir).first()
    assert got["n_users"] == want["n_users"]
    assert got["s1"] == want["stage_signup"]
    assert got["s2"] == want["stage_click_after_signup"]
    assert got["s3"] == want["stage_full_funnel"]


def _has_protobuf():
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithState driver worker needs protobuf (not in sandbox)",
)
def test_user_totals_transform_with_state(spark, sf_dir):
    """transformWithStateInPandas (the Spark-4 arbitrary-stateful API):
    a single AvailableNow drain's final per-user totals must equal the
    batch groupBy — count, value sum, and max event time — proving the
    ValueState accumulation and the epoch-micros timestamp round-trip."""
    import pyspark.sql.functions as F

    ev = streaming.events_stream(spark, sf_dir)
    out = streaming.run_available_now(
        streaming.user_totals_stream(ev),
        "t_user_totals",
        output_mode="update",
        latest_by=("user_id",),
        order_col="n_events",
    )
    got = {
        r["user_id"]: (r["n_events"], r["total_value"], r["last_ts"])
        for r in out.collect()
    }
    batch = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("n"),
            # bare sum(value): NULL for a user whose events all carry NULL
            # value — the stream's has_value sentinel must reproduce that
            F.round(F.sum("value"), 6).alias("tv"),
            F.max("ts").alias("mt"),
        )
    )
    want = {r["user_id"]: (r["n"], r["tv"], r["mt"]) for r in batch.collect()}
    assert got == want


def test_user_totals_gate_raises_clearly_without_protobuf(spark, sf_dir):
    """In a protobuf-less environment the operator must fail FAST with an
    actionable message (not a mid-query Python-worker crash) and point at
    the dependency-free stateful tier."""
    if _has_protobuf():
        pytest.skip("protobuf present; the gate passes through")
    ev = streaming.events_stream(spark, sf_dir)
    with pytest.raises(ImportError, match="protobuf"):
        streaming.user_totals_stream(ev)


def test_hourly_distinct_users_stream_equals_batch(spark, sf_dir):
    """The HLL sketch aggregate is the streaming form of distinct
    counting (exact COUNT(DISTINCT) needs the full value set — unbounded
    state); micro-batch partial merges must land exactly on the estimates
    of THE SAME FUNCTION run in batch mode (withWatermark is a no-op on a
    bounded Dataset, so one production expression serves both modes)."""
    from temporalvault_spark.catalog import load_catalog

    ev = streaming.events_stream(spark, sf_dir)
    out = streaming.run_available_now(
        streaming.hourly_distinct_users(ev), "t_hourly_distinct"
    )
    batch = streaming.hourly_distinct_users(load_catalog(spark, sf_dir).table("events"))
    assert _rows(out) == _rows(batch)
