"""Hypertable-style time-series operators over the event log.

The reference advertises TimescaleDB (README.md:16, docker-compose.yml:19)
but never calls a single Timescale function — no create_hypertable, no
time_bucket_gapfill, no first()/last(), no histogram() anywhere in app/.
This module implements those advertised-but-absent capabilities as native
Spark plans over the same events table:

  - ``win_gapfill_locf``  — time_bucket_gapfill + locf(): a dense hourly
    bucket grid per series with empty buckets carried forward;
  - ``agg_first_last_by_time`` — first(value, ts) / last(value, ts): the
    time-ordered argmin/argmax aggregates;
  - ``histogram_value_buckets`` — histogram(): fixed-width value bucketing;
  - ``time_weighted_avg`` — time_weight('LOCF') + average(): the gauge
    mean under piecewise-constant interpolation.

All four are pure JVM builtins (no UDFs) and DuckDB-oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog
from temporalvault_spark.registry import query


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_catalog(spark, sf_dir).table("events")


@query(
    "win_gapfill_locf",
    """WITH agg AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n, ROUND(SUM(value), 2) AS s
        FROM events GROUP BY 1, 2),
    b AS (SELECT min(date_trunc('hour', ts)) AS g0,
                 max(date_trunc('hour', ts)) AS g1 FROM events),
    grid AS (
        SELECT t.event_type, unnest(generate_series(b.g0, b.g1, INTERVAL 1 HOUR)) AS bucket
        FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN b)
    SELECT g.event_type, g.bucket,
           COALESCE(a.n, 0) AS n_events,
           last_value(a.s IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.bucket
               ROWS UNBOUNDED PRECEDING) AS sum_value_locf,
           a.n IS NULL AS is_gap
    FROM grid g LEFT JOIN agg a
      ON a.event_type = g.event_type AND a.bucket = g.bucket""",
)
def q_win_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gapfill_locf(_events(spark, sf_dir))


def gapfill_locf(ev: DataFrame) -> DataFrame:
    """time_bucket_gapfill + locf: dense hourly grid per event_type over the
    table's [min, max] hour span; buckets with no events appear with
    n_events=0 and the last non-empty bucket's sum carried forward (leading
    gaps before a series' first event stay NULL — locf has nothing to carry).

    Scale shape: the only data-sized pass is the bucket aggregate (map-side
    combined — the shuffle carries one row per live (series, hour)). The
    grid is series x hours — O(cardinality x time), generated from a 1-row
    broadcast bounds frame + a per-series sequence() explode, never from the
    raw events. The gapfill join and the LOCF window both run on grid-sized
    data, and the window partitions by series, so a 1000-executor run
    parallelizes across series. This is the TimescaleDB
    time_bucket_gapfill/locf semantic (advertised via README.md:16, unused
    in app/) as a plain Catalyst plan."""
    hour = F.date_trunc("hour", F.col("ts"))
    agg = ev.groupBy(F.col("event_type"), hour.alias("bucket")).agg(
        F.count("*").cast("bigint").alias("n"), F.round(F.sum("value"), 2).alias("s")
    )
    bounds = ev.agg(F.min(hour).alias("g0"), F.max(hour).alias("g1"))
    grid = (
        ev.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("g0", "g1", F.expr("INTERVAL 1 HOUR"))).alias("bucket"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(agg, ["event_type", "bucket"], "left").select(
        "event_type",
        "bucket",
        F.coalesce(F.col("n"), F.lit(0).cast("bigint")).alias("n_events"),
        F.last("s", ignorenulls=True).over(w).alias("sum_value_locf"),
        F.col("n").isNull().alias("is_gap"),
    )


@query(
    "agg_first_last_by_time",
    """SELECT user_id,
           arg_min(value, ts) AS first_value,
           arg_max(value, ts) AS last_value,
           min(ts) AS first_ts,
           max(ts) AS last_ts,
           ROUND(arg_max(value, ts) - arg_min(value, ts), 6) AS delta,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY user_id""",
)
def q_agg_first_last_by_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB first()/last(): per series, the value at the earliest and
    latest timestamp plus their delta — the gauge-style "change over the
    period" aggregate, done as min_by/max_by so it is ONE hash aggregate
    (partial+final, no window, no self-join; a row_number formulation would
    shuffle every event). Timestamps are unique per user in this dataset
    (verified), so the time-ordered argmin/argmax is deterministic."""
    ev = _events(spark, sf_dir)
    # NULL-value rows must not be the picked extremes: DuckDB's
    # arg_min/arg_max skip NULL args, Spark's min_by/max_by don't — nulling
    # the ORDERING key for null values makes Spark skip the same rows
    # (min_by/max_by ignore null ordering keys), so both engines return
    # the value at the earliest/latest NON-NULL observation
    ts_nn = F.when(F.col("value").isNotNull(), F.col("ts"))
    return ev.groupBy("user_id").agg(
        F.min_by("value", ts_nn).alias("first_value"),
        F.max_by("value", ts_nn).alias("last_value"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.round(F.max_by("value", ts_nn) - F.min_by("value", ts_nn), 6).alias("delta"),
        F.count("*").cast("bigint").alias("n_events"),
    )


HIST_WIDTH = 25.0
HIST_MAX_BUCKET = 23  # values >= 24*25 = 600 clamp into the top bucket


@query(
    "histogram_value_buckets",
    f"""SELECT event_type,
           LEAST(CAST(floor(value / {HIST_WIDTH}) AS BIGINT), {HIST_MAX_BUCKET}) AS bucket,
           CAST(LEAST(CAST(floor(value / {HIST_WIDTH}) AS BIGINT), {HIST_MAX_BUCKET}) * {HIST_WIDTH} AS DOUBLE) AS lo,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(SUM(value), 2) AS sum_value
    FROM events GROUP BY 1, 2, 3""",
)
def q_histogram_value_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB histogram(): per-series fixed-width value distribution
    (width {HIST_WIDTH}, top bucket clamped). One partial+final aggregate —
    the shuffle carries (series, bucket) partials, never events; the floor
    arithmetic (rather than width_bucket) keeps the bucketing bit-identical
    in every engine."""
    ev = _events(spark, sf_dir)
    bucket = F.least(
        F.floor(F.col("value") / HIST_WIDTH).cast("bigint"), F.lit(HIST_MAX_BUCKET)
    )
    return ev.groupBy(
        "event_type", bucket.alias("bucket"), (bucket * HIST_WIDTH).alias("lo")
    ).agg(F.count("*").cast("bigint").alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))


@query(
    "time_weighted_avg",
    """WITH f AS (
        SELECT user_id, event_id, ts, value FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL),
    d AS (
        SELECT user_id, value,
               epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS dur
        FROM f
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
    SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_points,
           CASE WHEN COALESCE(CAST(SUM(dur) AS DOUBLE), 0) > 0
                THEN ROUND(SUM(value * dur) / CAST(SUM(dur) AS DOUBLE), 6)
           END AS twa
    FROM d GROUP BY user_id""",
)
def q_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TimescaleDB time_weight('LOCF') + average(): the mean of a gauge
    under piecewise-constant interpolation — each observation holds until
    the next one, so irregular sampling doesn't bias the average toward
    densely-sampled stretches (a plain AVG does). twa = sum(v_i * dt_i) /
    sum(dt_i) over consecutive-observation intervals; the final
    observation spans no interval and contributes only to n_points; keys
    with one observation (or zero total duration) yield NULL.

    Determinism: intervals are integer MICROSECONDS (unix_micros — same
    boundary trick as win_rolling_1h_by_time: DuckDB epoch_us), ordering
    is total via (ts, event_id), and NULL-value/NULL-ts observations are
    excluded by the same WHERE on both engines. One window + one hash
    aggregate, both on the user_id partitioning — the per-key shuffle is
    paid once.

    Reference parity: TimescaleDB capability advertised in README.md:16
    and never implemented (no Timescale call in app/); this completes the
    advertised surface alongside gapfill/first-last/histogram."""
    return time_weighted_avg(_events(spark, sf_dir))


def time_weighted_avg(events: DataFrame) -> DataFrame:
    """Core of ``time_weighted_avg`` on an arbitrary events frame —
    crafted-fixture testable (tests/test_hypertable.py pins the irregular-
    sampling value, the single-observation NULL, and the zero-duration
    NULL)."""
    ev = events.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = (F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")).alias("dur")
    d = ev.select("user_id", "value", dur)
    den = F.sum("dur").cast("double")
    return d.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n_points"),
        F.when(
            F.coalesce(den, F.lit(0.0)) > 0,
            F.round(F.sum(F.col("value") * F.col("dur")) / den, 6),
        ).alias("twa"),
    )


# --- EWMA over the trailing event window -----------------------------------

# Finite-horizon exponentially-weighted moving average: weight (1-α)^lag over
# the last EWMA_WINDOW observations per key, normalized over the weights
# actually present (series shorter than the horizon re-normalize, the pandas
# ``ewm(adjust=True)`` convention restricted to a finite window).
EWMA_ALPHA = 0.3
EWMA_WINDOW = 8

# The decay weights and their prefix sums are computed ONCE here in Python
# and embedded as literals in BOTH the Spark expression and the DuckDB
# oracle — the two engines consume bit-identical constants, so pow() libm
# differences can't desynchronize them.
_EWMA_W = [(1.0 - EWMA_ALPHA) ** lag for lag in range(EWMA_WINDOW)]  # lag 0..7
_EWMA_DEN = [sum(_EWMA_W[: s + 1]) for s in range(EWMA_WINDOW)]  # size 1..8

_W_LIT = ", ".join(repr(x) for x in _EWMA_W)
_DEN_LIT = ", ".join(repr(x) for x in _EWMA_DEN)

# Per-element contributions are scaled to integer micro-units before the
# sum (same associativity trick as retrieval.py's BM25): an integer sum has
# no floating-point order sensitivity, so Spark's fold and DuckDB's fold
# agree exactly. Element i of the s-element frame (oldest first) has
# lag = s-1-i, i.e. weight W[s-1-i] (1-based: element_at(W, s-i)).
_EWMA_SPARK_EXPR = f"""
round(
  cast(aggregate(
    transform(sequence(0, size(v) - 1),
              i -> cast(round(element_at(v, i + 1)
                              * element_at(array({_W_LIT}), size(v) - i)
                              * 1000000.0) as bigint)),
    0L, (acc, x) -> acc + x) as double)
  / 1000000.0
  / element_at(array({_DEN_LIT}), size(v)), 6)
"""

_EWMA_DUCK_EXPR = f"""
ROUND(
  CAST(list_reduce(
    list_transform(range(1, len(v) + 1),
        i -> CAST(ROUND(v[i] * ([{_W_LIT}])[len(v) - i + 1]
                        * 1000000.0) AS BIGINT)),
    (acc, x) -> acc + x) AS DOUBLE)
  / 1000000.0
  / ([{_DEN_LIT}])[len(v)], 6)
"""


@query(
    "win_ewma",
    f"""WITH f AS (
        SELECT event_id, user_id, ts, value FROM events
        WHERE ts IS NOT NULL AND value IS NOT NULL),
    v AS (
        SELECT event_id, user_id, ts,
               list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING
                                 AND CURRENT ROW) AS v
        FROM f)
    SELECT event_id, user_id, ts, {_EWMA_DUCK_EXPR} AS ewma FROM v""",
)
def q_win_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of ``value`` per user over the
    trailing {EWMA_WINDOW}-event window (α={EWMA_ALPHA}) — the smoothing
    primitive behind anomaly baselines and rate estimators, which plain
    window AVG (win_rolling_1h_by_time) can't express because the weights
    depend on the lag.

    Scale shape: ONE window over the (user_id) partitioning — the same
    shuffle every per-key operator pays — collecting a ≤{EWMA_WINDOW}-element
    frame per row; the weighted fold runs as a JVM higher-order function
    over that bounded array (no UDF, no per-row Python). Determinism:
    total order (ts, event_id); weights/prefix-sums are module-level
    literals shared verbatim with the oracle; contributions sum as integer
    micro-units, so aggregation order is immaterial."""
    return win_ewma(_events(spark, sf_dir))


def win_ewma(events: DataFrame) -> DataFrame:
    """Core of ``win_ewma`` on an arbitrary events frame."""
    ev = events.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(EWMA_WINDOW - 1), 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.collect_list("value").over(w).alias("v"),
    ).select(
        "event_id", "user_id", "ts", F.expr(_EWMA_SPARK_EXPR).alias("ewma")
    )


# --- exact rolling median over a time-range window -------------------------


@query(
    "win_rolling_median_1h",
    """SELECT event_id, user_id, ts,
           ROUND(CASE WHEN len(arr) % 2 = 1 THEN arr[len(arr) // 2 + 1]
                 ELSE (arr[len(arr) // 2] + arr[len(arr) // 2 + 1]) * 0.5
                 END + 0.0, 6) AS med_1h
    FROM (
        SELECT event_id, user_id, ts,
               list_sort(list(value) OVER (
                   PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)) AS arr
        FROM events WHERE ts IS NOT NULL AND value IS NOT NULL) x""",
)
def q_win_rolling_median_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median of ``value`` over the trailing 1-hour TIME-RANGE window
    per user — the holistic-aggregate-over-a-window capability (a rolling
    AVG distributes; a rolling MEDIAN does not). TimescaleDB ships this as
    percentile_agg over a window; here the frame's sorted values feed an
    EXPLICIT midpoint written identically in both dialects.

    Scale shape: one shuffle on user_id; the RANGE frame is evaluated
    per-partition with a sliding frame over the time-sorted run (no
    self-join explosion, no per-row re-scan of the partition from scratch),
    buffering exactly what a holistic percentile aggregate would buffer.
    Peers at the same microsecond are frame-equal in both engines because
    the frame bound is the ORDER BY value itself.

    Parity (closes the round-7/8 documented ulp risk): the engines'
    percentile/quantile_cont interpolation FORMULAS can differ in the last
    ulp (lo + (hi-lo)·f vs (1-f)·lo + f·hi), so the median is instead
    computed as an explicit shared formula over the sorted frame array:
    the middle element (odd n — a data value, no arithmetic), or
    (lo + hi) · 0.5 (even n — ONE correctly-rounded IEEE add, then an
    exact power-of-two scale). Identical input doubles therefore produce
    BIT-IDENTICAL medians in both engines, and the ROUND(·, 6) boundary
    can no longer discriminate. `+ 0.0` normalizes a -0.0 middle element
    so both engines render the same sign. Double ordering on the sorted
    array agrees (values are non-null; non-NaN doubles totally ordered)."""
    return win_rolling_median_1h(_events(spark, sf_dir))


def win_rolling_median_1h(events: DataFrame) -> DataFrame:
    """Core of ``win_rolling_median_1h`` on an arbitrary events frame
    (parity contract on the registered query above)."""
    ev = events.filter(F.col("ts").isNotNull() & F.col("value").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    half = (F.size(arr) / 2).cast("int")  # floor: size is positive
    med = F.when(
        F.size(arr) % 2 == 1, F.element_at(arr, half + 1)
    ).otherwise(
        (F.element_at(arr, half) + F.element_at(arr, half + 1)) * F.lit(0.5)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(med + F.lit(0.0), 6).alias("med_1h"),
    )


# --- rolling exact distinct over a time-range window -----------------------


@query(
    "win_rolling_distinct_1h",
    """SELECT event_id, user_id, ts,
           len(list_distinct(list(event_type) OVER (
               PARTITION BY user_id ORDER BY epoch_us(ts)
               RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)))
           AS n_types_1h
    FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL""",
)
def q_win_rolling_distinct_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct event types seen per user over the trailing hour — the
    sliding-cardinality signal behind bot/abuse heuristics ("how many
    different actions in the last hour"). DISTINCT is a holistic aggregate:
    like the rolling median it cannot ride a running partial, so the frame
    is re-evaluated per row — but only within the user's time-sorted
    partition (one shuffle, no self-join). The streaming twin of this
    cardinality shape at unbounded scale is the HLL-sketch rollup
    (approx_distinct_users_sketch); this exact form IS the oracle."""
    ev = _events(spark, sf_dir).filter(
        F.col("ts").isNotNull() & F.col("event_type").isNotNull()
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.size(F.collect_set("event_type").over(w)).cast("bigint").alias("n_types_1h"),
    )
