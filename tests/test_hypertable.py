"""Hypertable-style operators: crafted fixtures proving the gapfill/locf,
first/last-by-time, and histogram semantics on known gaps/ties (testdata
rarely exercises the edge rows — leading gaps, empty series hours, clamped
buckets — so oracle parity alone can't pin them)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from temporalvault_spark.operators.hypertable import (
    HIST_MAX_BUCKET,
    HIST_WIDTH,
    gapfill_locf,
)


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


@pytest.fixture()
def crafted_events(spark):
    # series A: events in hours 0 and 3 (hours 1-2 are gaps)
    # series B: first event in hour 2 (hours 0-1 are LEADING gaps -> locf NULL)
    rows = [
        (1, _ts(0, 5), 10, "A", 10.0, "{}"),
        (2, _ts(0, 40), 10, "A", 20.0, "{}"),
        (3, _ts(3, 1), 11, "A", 40.0, "{}"),
        (4, _ts(2, 30), 12, "B", 5.0, "{}"),
    ]
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def test_gapfill_locf_semantics(spark, crafted_events):
    rows = {
        (r["event_type"], r["bucket"].hour): r
        for r in gapfill_locf(crafted_events).collect()
    }
    # dense grid: both series span the table's full [0h, 3h] range
    assert len(rows) == 8
    # series A hour 0 aggregates both events; hours 1-2 are gaps carrying 30.0
    assert rows[("A", 0)]["sum_value_locf"] == 30.0 and not rows[("A", 0)]["is_gap"]
    for h in (1, 2):
        assert rows[("A", h)]["is_gap"] and rows[("A", h)]["n_events"] == 0
        assert rows[("A", h)]["sum_value_locf"] == 30.0  # carried forward
    assert rows[("A", 3)]["sum_value_locf"] == 40.0
    # series B: leading gaps stay NULL (nothing to carry), then the value
    assert rows[("B", 0)]["sum_value_locf"] is None and rows[("B", 0)]["is_gap"]
    assert rows[("B", 1)]["sum_value_locf"] is None
    assert rows[("B", 2)]["sum_value_locf"] == 5.0 and not rows[("B", 2)]["is_gap"]
    assert rows[("B", 3)]["sum_value_locf"] == 5.0 and rows[("B", 3)]["is_gap"]


def test_first_last_by_time(spark, crafted_events):
    got = {
        r["user_id"]: r
        for r in crafted_events.groupBy("user_id")
        .agg(
            F.min_by("value", "ts").alias("first_value"),
            F.max_by("value", "ts").alias("last_value"),
        )
        .collect()
    }
    assert got[10]["first_value"] == 10.0 and got[10]["last_value"] == 20.0
    assert got[12]["first_value"] == 5.0 and got[12]["last_value"] == 5.0


def test_histogram_clamps_top_bucket(spark):
    rows = [
        (1, _ts(0), 1, "A", 0.0, "{}"),  # bucket 0
        (2, _ts(0), 1, "A", HIST_WIDTH, "{}"),  # exactly one width -> bucket 1
        (3, _ts(0), 1, "A", 10_000.0, "{}"),  # far out -> clamped
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    bucket = F.least(F.floor(F.col("value") / HIST_WIDTH).cast("bigint"), F.lit(HIST_MAX_BUCKET))
    got = {
        r["bucket"]: r["n"]
        for r in df.groupBy(bucket.alias("bucket")).agg(F.count("*").alias("n")).collect()
    }
    assert got == {0: 1, 1: 1, HIST_MAX_BUCKET: 1}


def test_time_weighted_avg_crafted(spark):
    """Hand-computed LOCF integral on irregular sampling: value 10 holds
    60s, then 40 holds 30s -> twa = (10*60 + 40*30)/90 = 20.0 (a plain AVG
    of observations would say 23.33 — the densely-sampled tail biases it).
    Single-observation and zero-duration keys yield NULL."""
    import datetime as dt

    from temporalvault_spark.operators.hypertable import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def s(sec):
        return t0 + dt.timedelta(seconds=sec)

    rows = [
        # user 1: irregular gauge
        (1, s(0), 1, "m", 10.0, "{}"),
        (2, s(60), 1, "m", 40.0, "{}"),
        (3, s(90), 1, "m", 70.0, "{}"),  # final obs spans no interval
        # user 2: single observation -> NULL twa
        (4, s(0), 2, "m", 5.0, "{}"),
        # user 3: two observations at the SAME instant -> zero duration -> NULL
        (5, s(0), 3, "m", 1.0, "{}"),
        (6, s(0), 3, "m", 2.0, "{}"),
        # user 4: NULL value and NULL ts rows are excluded before pairing
        (7, s(0), 4, "m", 3.0, "{}"),
        (8, s(10), 4, "m", None, "{}"),
        (9, None, 4, "m", 9.0, "{}"),
        (10, s(20), 4, "m", 5.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    got = {r["user_id"]: (r["n_points"], r["twa"]) for r in time_weighted_avg(ev).collect()}
    assert got[1] == (3, 20.0)
    assert got[2] == (1, None)
    assert got[3] == (2, None)
    assert got[4] == (2, 3.0)  # value 3 holds the full 20s; NULL rows skipped


def test_time_weighted_avg_matches_python_reference(spark):
    """Differential property test: the Spark LOCF integral must match a
    direct Python computation on random small event sets — duplicate
    timestamps, NULL values/timestamps, and single-point users included."""
    import datetime as dt

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from temporalvault_spark.operators.hypertable import time_weighted_avg

    t0 = dt.datetime(2024, 1, 1)
    vals = st.one_of(st.none(), st.sampled_from([1.0, 2.5, -3.0, 0.5]))
    ev_st = st.lists(
        st.tuples(st.integers(1, 3), st.one_of(st.none(), st.integers(0, 500)), vals),
        min_size=1,
        max_size=14,
    )

    def py_ref(rows):
        by_user: dict[int, list] = {}
        for eid, (uid, sec, val) in enumerate(rows):
            if sec is None or val is None:
                continue
            by_user.setdefault(uid, []).append((sec * 1_000_000, eid, val))
        out = {}
        for uid, pts in by_user.items():
            pts.sort()
            num = den = 0.0
            for (us1, _, v), (us2, _, _) in zip(pts, pts[1:]):
                num += v * (us2 - us1)
                den += us2 - us1
            out[uid] = (len(pts), round(num / den, 6) if den > 0 else None)
        return out

    @settings(
        max_examples=10,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
    )
    @given(rows=ev_st)
    def check(rows):
        df = spark.createDataFrame(
            [
                (eid, t0 + dt.timedelta(seconds=sec) if sec is not None else None, uid, "m", val, "{}")
                for eid, (uid, sec, val) in enumerate(rows)
            ],
            "event_id bigint, ts timestamp, user_id bigint, event_type string, "
            "value double, props string",
        )
        got = {
            r["user_id"]: (r["n_points"], r["twa"])
            for r in time_weighted_avg(df).collect()
        }
        want = py_ref(rows)
        assert set(got) == set(want)
        for uid in want:
            assert got[uid][0] == want[uid][0], uid
            g, w = got[uid][1], want[uid][1]
            assert (g is None) == (w is None), uid
            if g is not None:
                assert abs(g - w) <= 1e-6, (uid, g, w)

    check()


# --- EWMA -------------------------------------------------------------------


@pytest.fixture()
def ewma_events(spark):
    rows = [
        (1, _ts(0, 0), 1, "A", 1.0, "{}"),
        (2, _ts(0, 1), 1, "A", 2.0, "{}"),
        (3, _ts(0, 2), 1, "A", 4.0, "{}"),
    ] + [
        # user 2: a spike then 8 zeros — the 9th row's window must have
        # forgotten the spike entirely (finite horizon)
        (10 + i, _ts(1, i), 2, "A", 100.0 if i == 0 else 0.0, "{}")
        for i in range(9)
    ]
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def test_ewma_values(spark, ewma_events):
    from temporalvault_spark.operators.hypertable import win_ewma

    got = {r["event_id"]: r["ewma"] for r in win_ewma(ewma_events).collect()}
    # hand-computed with alpha=0.3 weights (1, .7, .49), normalized
    assert got[1] == pytest.approx(1.0, abs=1e-6)
    assert got[2] == pytest.approx((1 * 0.7 + 2 * 1.0) / 1.7, abs=2e-6)
    assert got[3] == pytest.approx((1 * 0.49 + 2 * 0.7 + 4 * 1.0) / 2.19, abs=2e-6)


def test_ewma_finite_horizon_forgets(spark, ewma_events):
    from temporalvault_spark.operators.hypertable import win_ewma

    got = {r["event_id"]: r["ewma"] for r in win_ewma(ewma_events).collect()}
    assert got[10] == pytest.approx(100.0, abs=1e-6)  # spike itself
    assert got[18] == 0.0  # 9th row: 8-event window holds only zeros
    assert got[17] > 0.0  # 8th row: spike still (barely) in window


def test_ewma_skips_null_values(spark):
    from temporalvault_spark.operators.hypertable import win_ewma

    rows = [
        (1, _ts(0, 0), 1, "A", 10.0, "{}"),
        (2, _ts(0, 1), 1, "A", None, "{}"),
        (3, _ts(0, 2), 1, "A", 10.0, "{}"),
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    out = {r["event_id"]: r["ewma"] for r in win_ewma(ev).collect()}
    assert set(out) == {1, 3}  # NULL row excluded, not zero-filled
    assert out[3] == pytest.approx(10.0, abs=1e-6)


# --- rolling median over a time-range frame --------------------------------


def test_rolling_median_time_range(spark):
    from temporalvault_spark.operators.hypertable import win_rolling_median_1h

    rows = [
        (1, _ts(0, 0), 1, "A", 1.0, "{}"),
        (2, _ts(0, 30), 1, "A", 9.0, "{}"),
        (3, _ts(1, 15), 1, "A", 5.0, "{}"),  # 0:00 fell out of the 1h window
        (4, _ts(1, 30), 1, "A", 3.0, "{}"),  # 0:30 exactly at the boundary: in
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    got = {r["event_id"]: r["med_1h"] for r in win_rolling_median_1h(ev).collect()}
    assert got[1] == 1.0
    assert got[2] == 5.0  # interpolated median of [1, 9]
    assert got[3] == 7.0  # window [0:15, 1:15] -> [9, 5]
    assert got[4] == 5.0  # inclusive boundary: [9, 5, 3]


def test_rolling_distinct_time_range(spark):
    from temporalvault_spark.operators.hypertable import q_win_rolling_distinct_1h  # noqa: F401
    from temporalvault_spark.operators import hypertable as H
    from pyspark.sql import Window, functions as F

    rows = [
        (1, _ts(0, 0), 1, "A", 1.0, "{}"),
        (2, _ts(0, 30), 1, "B", 1.0, "{}"),
        (3, _ts(0, 45), 1, "A", 1.0, "{}"),   # repeat: still 2 distinct
        (4, _ts(2, 0), 1, "C", 1.0, "{}"),    # both A/B aged out
        (5, _ts(0, 10), 1, None, 1.0, "{}"),  # NULL type excluded entirely
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    out = ev.filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull()).select(
        "event_id",
        F.size(F.collect_set("event_type").over(w)).cast("bigint").alias("n"),
    )
    got = {r["event_id"]: r["n"] for r in out.collect()}
    assert got == {1: 1, 2: 2, 3: 2, 4: 1}


def test_rolling_median_midpoint_matches_percentile_and_normalizes_zero(spark):
    """The explicit sorted-array midpoint (the libm-proof form) must equal
    Spark's own percentile(value, 0.5) on random frames, and a -0.0
    midpoint must come out +0.0."""
    import math
    import random

    from pyspark.sql import Window, functions as F

    from temporalvault_spark.operators.hypertable import win_rolling_median_1h

    rng = random.Random(7)
    rows = [
        (
            i,
            _ts(i // 60, i % 60),
            i % 3,
            "A",
            round(rng.uniform(-5, 5), 4),
            "{}",
        )
        for i in range(120)
    ]
    ev = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    got = {r["event_id"]: r["med_1h"] for r in win_rolling_median_1h(ev).collect()}
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    ref = {
        r["event_id"]: r["m"]
        for r in ev.select(
            "event_id", F.round(F.expr("percentile(value, 0.5)").over(w), 6).alias("m")
        ).collect()
    }
    assert got.keys() == ref.keys()
    for k in got:
        assert got[k] == pytest.approx(ref[k], abs=1e-9), k

    # -0.0 normalization: a frame whose median IS -0.0 must render +0.0
    neg = spark.createDataFrame(
        [(1, _ts(0, 0), 9, "A", -0.0, "{}")],
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )
    m = win_rolling_median_1h(neg).collect()[0]["med_1h"]
    assert m == 0.0 and math.copysign(1.0, m) == 1.0
