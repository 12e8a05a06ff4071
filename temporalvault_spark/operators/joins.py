"""General-purpose AS-OF join — the operator the reference hand-rolls as an
N+1 loop (/root/reference/app/main.py:191-224: per record, one SELECT for the
latest version <= T) and the one Spark famously lacks as a builtin.

Union-tag formulation: instead of a join at all, version rows and probe rows
are unioned, sorted within each key partition by (ts, tag), and each probe
picks up the most recent version columns via last(ignorenulls) over a running
frame. Cost = ONE shuffle on the key — the same shuffle any per-key operator
pays — regardless of probe count, with no join fan-out and no skew
amplification (a hot key's rows stay one partition-stream). This is the
formulation that survives 100 TB; the broadcast-probe variant
(relational.q_join_asof) is the small-probe-list special case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    tolerance: str | None = None,
) -> DataFrame:
    """For each left (probe) row: attach ``value_cols`` from the right row
    with the same ``key`` and the greatest ``right_ts`` <= ``left_ts``
    (pandas.merge_asof semantics, direction='backward', allow_exact_matches).

    ``tolerance``: optional max lookback (SQL interval string, e.g.
    '7 days') — probes further than that from the matched row get nulls.
    """
    l_cols = left.columns
    probes = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_tag", F.lit(1))
        .withColumns({f"_v_{c}": F.lit(None).cast(dict(right.dtypes)[c]) for c in value_cols})
        .withColumn("_r_ts", F.lit(None).cast("timestamp"))
    )
    versions = (
        right.select(key, F.col(right_ts).alias("_ts"), *value_cols)
        .withColumn("_tag", F.lit(0))
        .withColumns({f"_v_{c}": F.col(c) for c in value_cols})
        .withColumn("_r_ts", F.col("_ts"))
        .drop(*[c for c in value_cols if c not in (key, "_ts")])
    )
    for c in l_cols:
        if c not in versions.columns:
            versions = versions.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = probes.unionByName(versions.select(probes.columns))

    # version rows (tag 0) sort before probes at equal ts → exact matches hit
    w = (
        Window.partitionBy(key)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumns(
        {f"_v_{c}": F.last(f"_v_{c}", ignorenulls=True).over(w) for c in value_cols}
        | {"_r_ts": F.last("_r_ts", ignorenulls=True).over(w)}
    )
    out = filled.filter(F.col("_tag") == 1)
    if tolerance is not None:
        within = F.col("_r_ts") >= F.col("_ts") - F.expr(f"INTERVAL {tolerance}")
        out = out.withColumns(
            {f"_v_{c}": F.when(within, F.col(f"_v_{c}")) for c in value_cols}
        )
    return out.select(
        *l_cols, *[F.col(f"_v_{c}").alias(c) for c in value_cols]
    )
