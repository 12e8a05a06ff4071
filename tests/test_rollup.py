"""ContinuousAggregate: the incremental rollup must equal the full
recompute after every ingest (late data included), while touching only the
dirty buckets' files."""

import datetime as dt
import os

from temporalvault_spark.rollup import ContinuousAggregate
from tests.oracle_check import rows_canon


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
    )


def _eq(a_df, b_df):
    cols = sorted(a_df.columns)
    assert cols == sorted(b_df.columns)
    a = rows_canon(a_df.columns, [tuple(r) for r in a_df.collect()])
    b = rows_canon(b_df.columns, [tuple(r) for r in b_df.collect()])
    assert a == b


def _part_files(root, bucket):
    d = os.path.join(root, f"bucket={bucket}")
    return sorted(
        (f, os.path.getmtime(os.path.join(d, f)))
        for f in os.listdir(d)
        if f.endswith(".parquet")
    )


def test_incremental_equals_full_recompute_with_late_data(spark, tmp_path):
    ca = ContinuousAggregate(spark, str(tmp_path / "ca"))
    t = dt.datetime(2026, 1, 1, 0, 0, 0)

    batch1 = [
        (1, t, 10, "click", 1.0),
        (2, t + dt.timedelta(minutes=30), 11, "click", 2.0),
        (3, t + dt.timedelta(hours=1), 10, "view", 3.0),
        (4, t + dt.timedelta(hours=2), 12, "click", 4.0),
    ]
    dirty = ca.ingest(_events(spark, batch1))
    assert dirty == ["2026-01-01-00", "2026-01-01-01", "2026-01-01-02"]
    _eq(ca.read(), ca.recompute_full())

    hour0_before = _part_files(ca.rollup_path, "2026-01-01-00")

    # batch 2: new hour 3 + LATE event into hour 1 — hour 1 must be
    # recomputed (count goes 1 -> 2), hour 0 must not be rewritten
    batch2 = [
        (5, t + dt.timedelta(hours=3), 13, "view", 5.0),
        (6, t + dt.timedelta(hours=1, minutes=45), 14, "view", 6.0),
    ]
    dirty2 = ca.ingest(_events(spark, batch2))
    assert dirty2 == ["2026-01-01-01", "2026-01-01-03"]
    _eq(ca.read(), ca.recompute_full())

    out = {(r.bucket, r.event_type): r for r in ca.read().collect()}
    assert out[("2026-01-01-01", "view")].n_events == 2
    assert out[("2026-01-01-01", "view")].n_users == 2
    assert out[("2026-01-01-01", "view")].sum_value == 9.0

    # untouched bucket's files were neither replaced nor rewritten
    assert _part_files(ca.rollup_path, "2026-01-01-00") == hour0_before


def test_replayed_batch_is_recomputed_not_merged_wrong(spark, tmp_path):
    # recompute-dirty semantics: re-ingesting data (double append) yields the
    # rollup of the doubled base — counts reflect the base exactly, never a
    # stale merge; the invariant rollup == recompute_full always holds
    ca = ContinuousAggregate(spark, str(tmp_path / "ca2"))
    t = dt.datetime(2026, 1, 1, 5, 0, 0)
    batch = [(1, t, 1, "click", 1.5)]
    ca.ingest(_events(spark, batch))
    ca.ingest(_events(spark, batch))
    _eq(ca.read(), ca.recompute_full())
    row = ca.read().collect()[0]
    assert row.n_events == 2 and row.n_users == 1


def test_batch_id_ingest_is_idempotent_under_replay(spark, tmp_path):
    ca = ContinuousAggregate(spark, str(tmp_path / "ca3"))
    t = dt.datetime(2026, 1, 2, 0, 0, 0)
    b0 = _events(spark, [(1, t, 1, "click", 1.0), (2, t, 2, "view", 2.0)])
    b1 = _events(spark, [(3, t + dt.timedelta(hours=1), 1, "click", 3.0)])
    ca.ingest(b0, batch_id=0)
    ca.ingest(b1, batch_id=1)
    snap = rows_canon(ca.read().columns, [tuple(r) for r in ca.read().collect()])
    # replay epoch 0 (crash-after-append, pre-checkpoint): same partitions
    # rewritten, rollup unchanged — no double counting
    ca.ingest(b0, batch_id=0)
    _eq(ca.read(), ca.recompute_full())
    again = rows_canon(ca.read().columns, [tuple(r) for r in ca.read().collect()])
    assert again == snap
    assert {r.n_events for r in ca.read().collect()} == {1}


def test_stream_into_rollup_equals_batch(spark, tmp_path, sf_dir):
    from temporalvault_spark.streaming.jobs import events_stream, stream_into_rollup

    ca = ContinuousAggregate(spark, str(tmp_path / "ca_stream"))
    stream_into_rollup(ca, events_stream(spark, sf_dir), str(tmp_path / "ckpt"))
    got = ca.read().drop("batch_id")
    _eq(got, ca.recompute_full().drop("batch_id"))
    # spot-check against a direct batch aggregation of the source table
    from temporalvault_spark.catalog import load_catalog

    ev = load_catalog(spark, sf_dir).table("events")
    import pyspark.sql.functions as F

    expect = (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )
    _eq(got, expect)
