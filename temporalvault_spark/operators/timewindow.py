"""Time-window aggregates over the event log (SURVEY.md §2.10, batch tier).

These are the oracle-checkable batch twins of the Structured Streaming jobs in
``temporalvault_spark.streaming`` — identical grouping semantics, so a stream
restart and a batch backfill produce the same rows (the lambda-architecture
equivalence Spark gives for free).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog
from temporalvault_spark.registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_catalog(spark, sf_dir).table("events")


@query(
    "win_tumbling_hour",
    """SELECT date_trunc('hour', ts) AS window_start, event_type,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2""",
)
def q_win_tumbling_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows (streaming: groupBy(window(...)) + watermark;
    see streaming.jobs.tumbling_counts). window() buckets are epoch-aligned,
    so date_trunc('hour') is the exact oracle."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


@query(
    "win_sliding",
    """SELECT make_timestamp((CAST(floor(epoch(ts) / 900) AS BIGINT) * 900
                              - k.k * 900) * 1000000) AS window_start,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS sum_value
    FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS k) k
    GROUP BY 1""",
)
def q_win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows: 1 hour long, 15-minute slide — every event lands in
    exactly 4 epoch-aligned buckets (the oracle enumerates them arithmetically;
    Spark's window() plans the same expansion via Expand, then partial-aggs,
    so the shuffle carries only bucket rows)."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


# Shared with the sessionize PTF (operators/udx.py): both are graded
# against the identical gaps-and-islands ground truth.
SESSION_ORACLE_SQL = """WITH d AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts, value,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM d
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS sum_value
    FROM s GROUP BY user_id, sess_id"""


@query("win_session", SESSION_ORACLE_SQL)
def q_win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows, 30-minute inactivity gap, per user — Spark's native
    session_window (streaming-capable); the oracle is the classic
    gaps-and-islands rewrite. Boundary semantics: an event at exactly
    last_ts + gap starts a NEW session (session end is exclusive), hence the
    oracle's >=."""
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(F.col("user_id"), F.col("w.start").alias("session_start"), "n_events", "sum_value")
    )


@query("approx_distinct_users_sketch")  # rows-only: Datasketches binary HLL
def q_approx_distinct_users_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via the persisted-sketch rollup
    pattern: per-(event_type, day) Datasketches HLL sketches
    (functions.approx.hll_sketch_rollup — in production a daily job
    persisting ~4 KB/sketch), merged at query time across days with
    hll_union_agg. The merge shuffles O(sketch) bytes per group no matter
    how many raw rows or distinct users a day holds — THE way a 100 TB log
    answers arbitrary-date-range cardinality without a rescan.

    No DuckDB oracle: the estimate is Datasketches-implementation-defined
    (DuckDB's approx_count_distinct is a different HLL). The unit test
    (tests/test_functions_sources.py) pins merge-vs-direct consistency and
    bounded error against the exact count."""
    from temporalvault_spark.functions.approx import (
        hll_merge_estimate,
        hll_sketch_rollup,
    )

    ev = _events(spark, sf_dir).withColumn("day", F.to_date("ts"))
    daily = hll_sketch_rollup(ev, ["event_type", "day"], "user_id")
    est = hll_merge_estimate(daily, ["event_type"], "approx_users")
    return est.select("event_type", F.col("approx_users").cast("bigint").alias("approx_users"))
