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
    direction: str = "backward",
) -> DataFrame:
    """For each left (probe) row: attach ``value_cols`` from the matching
    right row (pandas.merge_asof semantics, allow_exact_matches):

    - ``direction='backward'`` (default): greatest ``right_ts`` <= probe ts;
    - ``'forward'``: smallest ``right_ts`` >= probe ts;
    - ``'nearest'``: whichever of the two is closer in absolute distance
      (exact ties pick backward, matching pandas).

    ``tolerance``: optional max distance (SQL interval string, e.g.
    '7 days') — probes further than that from the matched row get nulls.

    All three run in the same single-shuffle union-tag plan: one hash
    exchange on ``key``, no join operator; forward adds a second sort of the
    same partitioning (descending tag at equal ts so exact matches land in
    the following frame), nearest fills both directions over that one
    exchange and picks per row.
    """
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, got {direction!r}")
    l_cols = left.columns
    r_types = dict(right.dtypes)
    # ONE struct per version row carries (_r_ts, *value_cols) and is filled
    # atomically with a single last(ignorenulls): every value column comes
    # from the SAME matched version row, and a matched row's legitimate NULL
    # value stays NULL (per-column fill would skip it and leak an older
    # row's value — pandas.merge_asof never mixes rows like that)
    m_type = "struct<_r_ts:timestamp," + ",".join(
        f"{c}:{r_types[c]}" for c in value_cols
    ) + ">"
    probes = (
        left.withColumn("_ts", F.col(left_ts))
        .withColumn("_tag", F.lit(1))
        .withColumn("_m", F.lit(None).cast(m_type))
    )
    versions = right.select(
        key,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.struct(
            F.col(right_ts).cast("timestamp").alias("_r_ts"),
            *[F.col(c).alias(c) for c in value_cols],
        ).alias("_m"),
    )
    for c in l_cols:
        if c not in versions.columns:
            versions = versions.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = probes.unionByName(versions.select(probes.columns))

    # backward: version rows (tag 0) sort BEFORE probes at equal ts, so an
    # exact match is inside the preceding frame; forward: descending tag
    # puts versions AFTER probes at equal ts, so it's inside the following
    # frame. Both windows share the one hash exchange on key.
    w_b = (
        Window.partitionBy(key)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(key)
        .orderBy(F.col("_ts").asc(), F.col("_tag").desc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    if direction == "backward":
        filled = unioned.withColumn("_m", F.last("_m", ignorenulls=True).over(w_b))
    elif direction == "forward":
        filled = unioned.withColumn("_m", F.first("_m", ignorenulls=True).over(w_f))
    else:
        back, fwd = F.last("_m", ignorenulls=True).over(w_b), F.first(
            "_m", ignorenulls=True
        ).over(w_f)
        filled = unioned.withColumn("_mb", back).withColumn("_mf", fwd)
        bdiff = F.col("_ts").cast("double") - F.col("_mb")["_r_ts"].cast("double")
        fdiff = F.col("_mf")["_r_ts"].cast("double") - F.col("_ts").cast("double")
        filled = filled.withColumn(
            "_m",
            F.when(F.col("_mb").isNull(), F.col("_mf"))
            .when(F.col("_mf").isNull(), F.col("_mb"))
            .when(bdiff <= fdiff, F.col("_mb"))  # exact tie → backward (pandas)
            .otherwise(F.col("_mf")),
        ).drop("_mb", "_mf")
    out = filled.filter(F.col("_tag") == 1)
    if tolerance is not None:
        i = F.expr(f"INTERVAL {tolerance}")
        within = (F.col("_m")["_r_ts"] >= F.col("_ts") - i) & (
            F.col("_m")["_r_ts"] <= F.col("_ts") + i
        )
        out = out.withColumn("_m", F.when(within, F.col("_m")))
    return out.select(
        *l_cols, *[F.col("_m")[c].alias(c) for c in value_cols]
    )
