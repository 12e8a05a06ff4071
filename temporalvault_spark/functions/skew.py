"""Skew mitigation: salting utilities.

AQE's skew-join splitting (on by default, session.RUNTIME_CONFS) handles most
skew at runtime; salting is the explicit tool for the two cases AQE can't
fix: (1) a skewed AGGREGATE key (AQE only splits join partitions), and
(2) a skewed BROADCAST-infeasible join where one key dominates. Both
decompose the hot key into `salt` sub-keys, aggregate partially per sub-key,
then merge — turning one straggler reducer into `salt` parallel ones at the
cost of a second (tiny, per-group) aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[str, str]],
    salt: int = 16,
) -> DataFrame:
    """Two-stage aggregate for skewed group keys.

    ``aggs``: output_name -> (function, column) where function is one of
    sum/count/min/max (the re-aggregatable algebra: each has a merge
    function — count merges with sum; avg callers decompose into sum+count).
    """
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    first_fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for name, (fn, _col) in aggs.items():
        if fn not in first_fn:
            raise ValueError(f"{name}: {fn} is not re-aggregatable (use sum/count/min/max)")

    # collision-safe working column: a caller's own "_salt" must survive
    salt_col = "_tvsalt_"
    while salt_col in df.columns:
        salt_col += "x"
    salted = df.withColumn(salt_col, (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*group_cols, salt_col).agg(
        *[first_fn[fn](c).alias(name) for name, (fn, c) in aggs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[merge_fn[fn](name).alias(name) for name, (fn, _c) in aggs.items()]
    )


def salted_join_skewed_left(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 16,
    join_hint: str | None = None,
) -> DataFrame:
    """Equi-join resilient to a hot key on the LEFT side: the left adds a
    random salt in [0, salt), the right is replicated ``salt`` times (explode
    over the salt range), and the join key becomes (key, salt) — the hot
    key's rows spread over ``salt`` reducers. Use when the right side is too
    big to broadcast but small enough to replicate ``salt``-fold.

    ``join_hint`` (e.g. ``'shuffle_hash'``/``'merge'``) pins the physical
    strategy on the replicated side. Salting only matters on the SHUFFLE
    join path — if the dim fits in a broadcast, Catalyst will pick
    BroadcastHashJoin and the salt is dead weight — so demos/tests that
    exercise the salted shape on small data must pass a shuffle hint to
    reproduce what a 100 TB planner would choose on its own."""
    salt_col = "_tvsalt_"
    while salt_col in left.columns or salt_col in right.columns:
        salt_col += "x"
    l = left.withColumn(salt_col, (F.rand(seed=42) * salt).cast("int"))
    r = right.withColumn(salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    if join_hint is not None:
        r = r.hint(join_hint)
    out = l.join(r, [key, salt_col])
    return out.drop(salt_col)
