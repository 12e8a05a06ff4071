"""Approximate/sketch aggregates — the 100 TB path for cardinality and
quantile questions.

The oracle-checked exact forms (agg_distinct, agg_percentiles) are the
correctness anchors; these are their scale twins: HyperLogLog++ and t-digest
sketches whose partials are mergeable, so the shuffle carries O(sketch) bytes
per group instead of O(distinct values). rsd/accuracy parameters trade error
for sketch size exactly like the Spark docs describe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(df: DataFrame, group_col: str, value_col: str, rsd: float = 0.02) -> DataFrame:
    """HyperLogLog++ distinct count per group (relative error ~rsd). The
    exact twin (count_distinct) plans an Expand + double shuffle; this is one
    pass with mergeable sketch partials."""
    return df.groupBy(group_col).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias(f"approx_n_{value_col}")
    )


def approx_quantiles_by(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple[float, ...] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """Approximate per-group quantiles (Greenwald-Khanna / t-digest style
    sketch; error <= 1/accuracy of rank)."""
    qs = "array(" + ", ".join(str(q) for q in quantiles) + ")"
    out = df.groupBy(group_col).agg(
        F.expr(f"approx_percentile({value_col}, {qs}, {accuracy})").alias("qv")
    )
    return out.select(
        group_col,
        *[
            F.col("qv")[i].alias(f"p{int(q * 100):02d}")
            for i, q in enumerate(quantiles)
        ],
    )


def sample_fraction(df: DataFrame, fraction: float, seed: int = 42) -> DataFrame:
    """Seeded Bernoulli sample — the cheap first stage of any estimate-then-
    verify pipeline over a 100 TB table (pushed into the scan, no shuffle)."""
    return df.sample(withReplacement=False, fraction=fraction, seed=seed)


def hll_sketch_rollup(
    df: DataFrame, group_cols: list[str], value_col: str, lg_k: int = 12
) -> DataFrame:
    """Per-group mergeable Datasketches HLL sketch (binary column) — the
    PRE-AGGREGATION form of distinct counting: persist one ~2^lg_k-byte
    sketch per (group, partition-unit) and every later distinct-count
    question over ANY union of groups is a sketch merge, not a rescan of
    the raw table. This is how a 100 TB events log answers "distinct users
    over an arbitrary date range" in milliseconds: daily sketch rollup job
    + hll_union_agg at query time."""
    return df.groupBy(*group_cols).agg(
        F.hll_sketch_agg(value_col, F.lit(lg_k)).alias("sketch")
    )


def hll_merge_estimate(
    sketches: DataFrame, group_cols: list[str], out_col: str = "approx_distinct"
) -> DataFrame:
    """Merge persisted HLL sketches down to ``group_cols`` and estimate:
    the query-time half of hll_sketch_rollup. The merge is an ordinary
    aggregate whose partials are the sketches themselves — O(sketch bytes)
    per group through the shuffle regardless of raw cardinality."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias(out_col)
    )
