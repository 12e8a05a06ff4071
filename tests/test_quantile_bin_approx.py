"""Approx-boundary quantile binning: tolerance vs the exact ntile form,
range-bin invariants, and the windowless/broadcast plan shape."""

import pytest
from pyspark.sql import functions as F

from temporalvault_spark.operators.analytics import (
    q_ml_quantile_bin,
    q_ml_quantile_bin_approx,
    quantile_bin_approx,
)
from temporalvault_spark.plans import executed_plan, plan_counts


@pytest.fixture(scope="module")
def exact_and_approx(spark, sf_dir):
    exact = {
        (r["event_type"], r["bin"]): r.asDict()
        for r in q_ml_quantile_bin(spark, sf_dir).collect()
    }
    approx = {
        (r["event_type"], r["bin"]): r.asDict()
        for r in q_ml_quantile_bin_approx(spark, sf_dir).collect()
    }
    return exact, approx


def test_bin_counts_near_equal_frequency(exact_and_approx):
    """Every approx bin holds its type's N/4 within tolerance (ties at a
    boundary land in one bin under range lookup, ntile splits them)."""
    exact, approx = exact_and_approx
    per_type: dict[str, int] = {}
    for (et, _b), row in exact.items():
        per_type[et] = per_type.get(et, 0) + row["n"]
    assert set(approx) == set(exact)  # same (type, 1..4) key set
    for (et, _b), row in approx.items():
        target = per_type[et] / 4
        assert abs(row["n"] - target) <= max(3, 0.05 * per_type[et])


def test_bin_boundaries_near_exact_quartiles(exact_and_approx):
    """Approx bin edges sit within a tight band of the exact ntile edges:
    each approx bin's [lo, hi] must overlap its exact counterpart's range
    widened by 5% of the type's value spread."""
    exact, approx = exact_and_approx
    for key, a in approx.items():
        e = exact[key]
        et = key[0]
        spread = max(r["hi"] for k, r in exact.items() if k[0] == et) - min(
            r["lo"] for k, r in exact.items() if k[0] == et
        )
        tol = 0.05 * spread
        assert a["lo"] >= e["lo"] - tol
        assert a["hi"] <= e["hi"] + tol


def test_range_bins_are_contiguous_and_total_preserving(exact_and_approx):
    """Range binning's exact invariants: bins partition each type's rows
    (counts sum to N) and never interleave (max of bin i ≤ min of bin i+1)."""
    exact, approx = exact_and_approx
    types = {et for et, _ in approx}
    for et in types:
        n_exact = sum(r["n"] for k, r in exact.items() if k[0] == et)
        n_approx = sum(r["n"] for k, r in approx.items() if k[0] == et)
        assert n_exact == n_approx
        for b in (1, 2, 3):
            assert approx[(et, b)]["hi"] <= approx[(et, b + 1)]["lo"]


def test_plan_has_no_window_and_broadcasts_boundaries(spark, sf_dir):
    """The scale claim as a plan assertion: no Window (no per-key total
    order), boundaries broadcast onto the fact side."""
    df = q_ml_quantile_bin_approx(spark, sf_dir)
    assert "Window" not in executed_plan(df)
    c = plan_counts(df)
    assert c["BroadcastHashJoin"] >= 1
    assert c["SortMergeJoin"] == 0 and c["CartesianProduct"] == 0


def test_custom_bins_and_accuracy(spark):
    """n_bins generalizes: 10 deciles over a uniform ramp hit ±1 of N/10."""
    df = spark.range(10_000).select(
        F.lit("k").alias("k"), F.col("id").cast("double").alias("v")
    )
    out = quantile_bin_approx(df, "k", "v", n_bins=10).groupBy("bin").count()
    counts = {r["bin"]: r["count"] for r in out.collect()}
    assert set(counts) == set(range(1, 11))
    for n in counts.values():
        assert abs(n - 1000) <= 10
