"""General as-of join (union-tag) vs a brute-force correlated reference."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from temporalvault_spark.operators.joins import asof_join


@pytest.fixture(scope="module")
def frames(spark):
    base = datetime(2026, 1, 1)
    versions = [
        ("k1", base + timedelta(hours=h), f"k1-v{h}") for h in (0, 5, 10, 20)
    ] + [("k2", base + timedelta(hours=h), f"k2-v{h}") for h in (3, 9)]
    probes = [
        ("k1", base + timedelta(hours=h)) for h in (0, 4, 10, 11, 25)
    ] + [("k2", base + timedelta(hours=h)) for h in (1, 9, 30)] + [
        ("k3", base + timedelta(hours=2))  # key with no versions at all
    ]
    r = spark.createDataFrame(versions, "key string, vts timestamp, payload string")
    l = spark.createDataFrame(probes, "key string, pts timestamp")
    return l, r


def brute_force(l_rows, r_rows, tolerance_h=None):
    out = {}
    for key, pts in l_rows:
        best = None
        for k, vts, payload in r_rows:
            if k == key and vts <= pts and (best is None or vts > best[0]):
                best = (vts, payload)
        if best and tolerance_h is not None and best[0] < pts - timedelta(hours=tolerance_h):
            best = None
        out[(key, pts)] = best[1] if best else None
    return out


def test_asof_join_matches_brute_force(spark, frames):
    l, r = frames
    got = {
        (row["key"], row["pts"]): row["payload"]
        for row in asof_join(l, r, "key", "pts", "vts", ["payload"]).collect()
    }
    expected = brute_force(
        [(x["key"], x["pts"]) for x in l.collect()],
        [(x["key"], x["vts"], x["payload"]) for x in r.collect()],
    )
    assert got == expected
    # spot semantics: exact-ts match included; no-version key present w/ null
    assert got[("k1", datetime(2026, 1, 1, 10))] == "k1-v10"
    assert got[("k3", datetime(2026, 1, 1, 2))] is None


def test_asof_join_tolerance(spark, frames):
    l, r = frames
    got = {
        (row["key"], row["pts"]): row["payload"]
        for row in asof_join(l, r, "key", "pts", "vts", ["payload"], tolerance="4 hours").collect()
    }
    expected = brute_force(
        [(x["key"], x["pts"]) for x in l.collect()],
        [(x["key"], x["vts"], x["payload"]) for x in r.collect()],
        tolerance_h=4,
    )
    assert got == expected
    assert got[("k1", datetime(2026, 1, 2, 1))] is None  # 25h probe, last v at 20h


def test_asof_join_is_single_shuffle(spark, frames):
    l, r = frames
    plan = asof_join(l, r, "key", "pts", "vts", ["payload"])._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan  # no join operator at all
    assert plan.count("Exchange hashpartitioning") <= 1

def test_asof_join_null_payload_not_skipped(spark):
    """A matched version row whose value column is legitimately NULL must
    yield NULL — not fall back to an older version's value — and with
    multiple value columns every column must come from the SAME matched row
    (the single-struct fill guarantees both)."""
    base = datetime(2026, 1, 1)
    r = spark.createDataFrame(
        [("k", base, 1, "b1"), ("k", base + timedelta(hours=1), None, "b2")],
        "key string, vts timestamp, val_a int, val_b string",
    )
    l = spark.createDataFrame(
        [("k", base + timedelta(hours=2))], "key string, pts timestamp"
    )
    row = asof_join(l, r, "key", "pts", "vts", ["val_a", "val_b"]).collect()[0]
    # matched row is the h=1 version: val_a stays NULL (no leak of 1 from h=0)
    assert row["val_a"] is None and row["val_b"] == "b2"


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    versions=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 200)),
        min_size=1, max_size=25,
    ),
    probes=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(0, 220)),
        min_size=1, max_size=15,
    ),
)
def test_asof_join_matches_pandas_merge_asof(spark, versions, probes):
    """Differential property test: our union-tag as-of join must equal
    pandas.merge_asof (direction='backward', exact matches allowed) on random
    inputs — including duplicate timestamps and keys with no versions."""
    import pandas as pd

    base = datetime(2026, 1, 1)
    # dedupe (key, ts) on the version side: merge_asof picks the LAST row of
    # equal-ts duplicates, which is input-order-dependent; (key, ts) must be
    # unique for a well-defined comparison
    vmap = {}
    for i, (k, m) in enumerate(versions):
        # every third version carries a NULL payload: matched-but-NULL must
        # surface as NULL, never as an older row's value
        vmap[(k, m)] = None if m % 3 == 0 else f"p{i}"
    vrows = [
        (k, base + timedelta(minutes=m), p)
        for (k, m), p in sorted(vmap.items(), key=lambda kv: kv[0])
    ]
    prows = [(k, base + timedelta(minutes=m)) for k, m in probes]

    r = spark.createDataFrame(vrows, "key string, vts timestamp, payload string")
    l = spark.createDataFrame(prows, "key string, pts timestamp")
    got = sorted(
        (row["key"], row["pts"], row["payload"])
        for row in asof_join(l, r, "key", "pts", "vts", ["payload"]).collect()
    )

    pdl = pd.DataFrame(prows, columns=["key", "pts"]).sort_values("pts", kind="stable")
    pdr = pd.DataFrame(vrows, columns=["key", "vts", "payload"]).sort_values("vts", kind="stable")
    merged = pd.merge_asof(
        pdl, pdr, left_on="pts", right_on="vts", by="key", direction="backward"
    )
    expected = sorted(
        (row.key, row.pts.to_pydatetime(), None if pd.isna(row.payload) else row.payload)
        for row in merged.itertuples()
    )
    assert got == expected


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    versions=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 200)),
        min_size=1, max_size=20,
    ),
    probes=st.lists(
        st.tuples(st.sampled_from(["a", "b", "c", "d"]), st.integers(0, 220)),
        min_size=1, max_size=12,
    ),
    direction=st.sampled_from(["forward", "nearest"]),
)
def test_asof_join_directions_match_pandas(spark, versions, probes, direction):
    """forward/nearest must equal pandas.merge_asof with the same direction
    on random inputs — exact matches, equidistant ties (pandas: backward
    wins), and keys with no versions included."""
    import pandas as pd

    base = datetime(2026, 1, 1)
    vmap = {}
    for i, (k, m) in enumerate(versions):
        vmap[(k, m)] = f"p{i}"
    vrows = [
        (k, base + timedelta(minutes=m), p)
        for (k, m), p in sorted(vmap.items(), key=lambda kv: kv[0])
    ]
    prows = [(k, base + timedelta(minutes=m)) for k, m in probes]

    r = spark.createDataFrame(vrows, "key string, vts timestamp, payload string")
    l = spark.createDataFrame(prows, "key string, pts timestamp")
    got = sorted(
        (row["key"], row["pts"], row["payload"])
        for row in asof_join(
            l, r, "key", "pts", "vts", ["payload"], direction=direction
        ).collect()
    )

    pdl = pd.DataFrame(prows, columns=["key", "pts"]).sort_values("pts", kind="stable")
    pdr = pd.DataFrame(vrows, columns=["key", "vts", "payload"]).sort_values("vts", kind="stable")
    merged = pd.merge_asof(
        pdl, pdr, left_on="pts", right_on="vts", by="key", direction=direction
    )
    expected = sorted(
        (row.key, row.pts.to_pydatetime(), None if pd.isna(row.payload) else row.payload)
        for row in merged.itertuples()
    )
    assert got == expected


def test_asof_join_direction_plans_stay_single_exchange(spark, frames):
    l, r = frames
    for d in ("forward", "nearest"):
        plan = asof_join(l, r, "key", "pts", "vts", ["payload"], direction=d)._jdf.queryExecution().executedPlan().toString()
        assert "Join" not in plan
        assert plan.count("Exchange hashpartitioning") <= 1, (d, plan)
