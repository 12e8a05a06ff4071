"""Deeper analytics coverage: TPC-H-shaped multi-join queries, cube/grouping
sets, percentiles, top-n per group (SURVEY.md §2.4-2.7 breadth).

These double as bench headliners: each one is a canonical OLAP plan shape
whose physical strategy (broadcast star joins, partial aggregation, window
group limits) is exactly what a 1000-executor run needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog
from temporalvault_spark.registry import query


def _cat(spark: SparkSession, sf_dir: str):
    return load_catalog(spark, sf_dir)


@query(
    "tpch_q3_shipping_priority",
    """SELECT l.l_orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey LIMIT 10""",
)
def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → two equi joins → aggregate →
    top-10. The segment filter prunes customer before it broadcasts; the
    LIMIT plans as TakeOrderedAndProject over the aggregate."""
    c = _cat(spark, sf_dir)
    cut = F.lit("1998-03-15 00:00:00").cast("timestamp")
    return (
        c.table("customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .join(c.table("orders"), F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < cut)
        .join(c.table("lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > cut)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "tpch_q5_local_supplier",
    """SELECT n.n_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name""",
)
def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: five joins, a local-supplier correlation predicate
    (c_nationkey = s_nationkey) applied post-join. Only the fixed-size dims
    (nation 25, region 5) carry explicit broadcast hints; supplier scales
    with SF, so its join strategy is left to the threshold/AQE — a forced
    broadcast would OOM at the scale this module targets."""
    c = _cat(spark, sf_dir)
    return (
        c.table("customer")
        .join(c.table("orders"), F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(c.table("lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c.table("supplier"), F.col("l_suppkey") == F.col("s_suppkey"))
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(c.table("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "agg_cube",
    """SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS sum_price
    FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",
)
def q_agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full CUBE over two dims (all four grouping sets in one pass via
    Expand + partial agg)."""
    return (
        _cat(spark, sf_dir)
        .table("orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
    )


@query(
    "agg_percentiles",
    """SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           ROUND(MIN(value), 6) AS min_v, ROUND(MAX(value), 6) AS max_v
    FROM events GROUP BY event_type""",
)
def q_agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (Spark percentile == DuckDB
    quantile_cont, both linear interpolation). The 100 TB path is
    approx_percentile (t-digest sketch, mergeable partials) — exposed in
    functions/approx.py; exact form here because the oracle must match."""
    ev = _cat(spark, sf_dir).table("events")
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.round(F.min("value"), 6).alias("min_v"),
        F.round(F.max("value"), 6).alias("max_v"),
    )


@query(
    "topn_per_group",
    """SELECT c_nationkey, c_custkey, c_acctbal, rnk FROM (
        SELECT c_nationkey, c_custkey, c_acctbal,
               RANK() OVER (PARTITION BY c_nationkey
                            ORDER BY c_acctbal DESC, c_custkey) AS rnk
        FROM customer) t
    WHERE rnk <= 5""",
)
def q_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 customers by balance per nation — rank() with a WindowGroupLimit
    plan (per-partition top-k before the shuffle)."""
    cust = _cat(spark, sf_dir).table("customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 5)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
    )


@query(
    "tpch_q4_order_priority",
    """SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o.o_orderpriority""",
)
def q_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery — planned as a left-semi
    join (existence without duplication), then a 5-group aggregate."""
    c = _cat(spark, sf_dir)
    o = c.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    late = c.table("lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            late,
            (F.col("l_orderkey") == F.col("o_orderkey"))
            & (F.col("l_shipdate") > F.col("o_orderdate")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


@query(
    "tpch_q6_forecast_revenue",
    """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24""",
)
def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate reaches
    the parquet scan (PushedFilters), no shuffle beyond the 1-row final agg."""
    li = _cat(spark, sf_dir).table("lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "tpch_q12_shipmode",
    """SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag""",
)
def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: conditional aggregation (CASE inside SUM) — the
    pivot-lite pattern; one join, one agg."""
    c = _cat(spark, sf_dir)
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        c.table("orders")
        .join(c.table("lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "tpch_q14_promo_revenue",
    """SELECT ROUND(100.0 * SUM(CASE WHEN p.p_type = 'PROMO'
                                     THEN l.l_extendedprice * (1 - l.l_discount)
                                     ELSE 0 END)
                  / SUM(l.l_extendedprice * (1 - l.l_discount)), 4) AS promo_revenue_pct
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""",
)
def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: ratio of conditional aggregates over a part join
    (part scales with SF — no forced broadcast; the threshold/AQE picks)."""
    c = _cat(spark, sf_dir)
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        c.table("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
        )
        .join(c.table("part"), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "tpch_q18_large_orders",
    """SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate,
           ROUND(SUM(l.l_quantity), 2) AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderkey IN (
        SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 120)
    GROUP BY o.o_orderkey, o.o_totalprice, o.o_orderdate""",
)
def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: IN over a HAVING aggregate subquery — planned as an
    aggregate + left-semi join; the quantity threshold re-aggregates only the
    surviving orders."""
    c = _cat(spark, sf_dir)
    big = (
        c.table("lineitem")
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
        .filter(F.col("q") > 120)
        .select(F.col("l_orderkey").alias("big_orderkey"))
    )
    return (
        c.table("orders")
        .join(big, F.col("o_orderkey") == F.col("big_orderkey"), "left_semi")
        .join(c.table("lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_totalprice", "o_orderdate")
        .agg(F.round(F.sum("l_quantity"), 2).alias("total_qty"))
        .select("o_orderkey", "o_totalprice", "o_orderdate", "total_qty")
    )


@query(
    "scalar_subquery_above_avg",
    """SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS acctbal
    FROM customer
    WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0)""",
)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar subquery (TPC-H Q22 flavor): the global average computes once
    as a 1-row subquery result and broadcasts into the filter."""
    c = _cat(spark, sf_dir)
    cust = c.table("customer")
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("a"))
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .select("c_custkey", "c_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


@query(
    "agg_pivot_event_types",
    """SELECT user_id,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'click' THEN value END), 0), 2) AS click,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'error' THEN value END), 0), 2) AS error,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN value END), 0), 2) AS purchase,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'signup' THEN value END), 0), 2) AS signup,
           ROUND(COALESCE(SUM(CASE WHEN event_type = 'view' THEN value END), 0), 2) AS view
    FROM events GROUP BY user_id""",
)
def q_agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: long→wide per-user value sums by event type. The explicit value
    list matters at scale — without it Spark runs an extra distinct pass to
    discover columns."""
    ev = _cat(spark, sf_dir).table("events")
    types = ["click", "error", "purchase", "signup", "view"]
    piv = ev.groupBy("user_id").pivot("event_type", types).agg(F.round(F.sum("value"), 2))
    # NULL->0 must happen AFTER the pivot: a coalesce inside the agg never
    # fires for (user, type) cells with zero rows (PivotFirst emits NULL
    # directly), which would diverge from the oracle's COALESCE(..., 0) on
    # any corpus where a user lacks an event type
    return piv.select(
        "user_id", *[F.coalesce(F.col(t), F.lit(0.0)).alias(t) for t in types]
    )


@query(
    "agg_grouping_sets",
    """SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT) AS gid,
           ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())""",
)
def q_agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + grouping_id disambiguation (a NULL group
    value vs a NULL from the rollup level are different things — gid is how
    consumers tell them apart)."""
    _cat(spark, sf_dir)
    return spark.sql(
        """SELECT l_returnflag, l_linestatus,
               CAST(grouping(l_returnflag) * 2 + grouping(l_linestatus) AS BIGINT) AS gid,
               ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())"""
    )


@query(
    "tpch_q10_returned_items",
    """SELECT c.c_custkey, c.c_name, n.n_name,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM customer c
    JOIN orders o ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey LIMIT 20""",
)
def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: who cost us returned-item revenue — 3 joins + top-20.

    Scale notes: the returnflag and orderdate predicates sit on the FACT
    sides before any join (pushed to the scans), nation broadcasts (fixed
    25 rows), customer/orders/lineitem shuffle on their join keys, and the
    final top-20 plans as TakeOrderedAndProject — no total sort of the
    aggregate.

    The revenue sum runs in DECIMAL, not double: a per-customer sum has
    enough terms that double addition order (partial-agg tree shape vs the
    oracle's sequential fold) can flip the rounded cent — decimal addition
    is exact, so the result is engine- and partitioning-independent. The
    per-term double product is IEEE-identical in both engines; only the
    ACCUMULATION needed hardening."""
    c = _cat(spark, sf_dir)
    rev = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    li = c.table("lineitem").filter(F.col("l_returnflag") == "R")
    orders = c.table("orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    return (
        c.table("customer")
        .join(orders, F.col("o_custkey") == F.col("c_custkey"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.table("nation")), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "tpch_q19_disjunctive",
    """SELECT ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity BETWEEN 15 AND 40)""",
)
def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: OR-of-ANDs predicate spanning both join sides.

    The optimizer test here: Catalyst factors each disjunct's single-side
    conjuncts into per-table prefilters (l_quantity BETWEEN 1 AND 40,
    p_brand IN (...) AND p_size BETWEEN 1 AND 30 reach the scans as
    PushedFilters), so the join sees pre-shrunk inputs and only the residual
    cross-side OR is evaluated post-join — written as one declarative filter
    and left to the optimizer, exactly as it should be."""
    c = _cat(spark, sf_dir)
    d1 = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    )
    d2 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(15, 40)
    )
    return (
        c.table("lineitem")
        .join(c.table("part"), F.col("p_partkey") == F.col("l_partkey"))
        .filter(d1 | d2)
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@query(
    "ml_quantile_bin",
    """WITH binned AS (
        SELECT event_type, value,
               NTILE(4) OVER (PARTITION BY event_type
                              ORDER BY value, event_id) AS bin
        FROM events WHERE value IS NOT NULL)
    SELECT event_type, bin,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 6) AS lo,
           ROUND(MAX(value), 6) AS hi,
           ROUND(AVG(value), 6) AS mean
    FROM binned GROUP BY event_type, bin""",
)
def q_ml_quantile_bin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretization (feature binning): quartile assignment of
    ``value`` per event_type plus per-bin summary stats — the standard
    numeric-feature prep step (equal-frequency bins are robust to skew
    where equal-width bins are not; histogram_value_buckets is the
    equal-width twin).

    Scale shape: ONE window shuffle on the type key (ntile needs the
    per-type total order — at 100 TB use ml_quantile_bin_approx below:
    approximate quantile BOUNDARIES + broadcast range lookup, no window;
    this exact form IS the oracle), then a hash aggregate that
    reuses nothing data-sized. Ties order deterministically via
    (value, event_id) so both engines cut identical bins."""
    ev = _cat(spark, sf_dir).table("events").filter(F.col("value").isNotNull())
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select("event_type", "value", F.ntile(4).over(w).cast("bigint").alias("bin"))
        .groupBy("event_type", "bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
            F.round(F.avg("value"), 6).alias("mean"),
        )
    )


APPROX_BIN_ACCURACY = 10_000  # percentile_approx accuracy (1/eps)


def quantile_bin_approx(
    df: DataFrame,
    key_col: str,
    value_col: str,
    n_bins: int = 4,
    accuracy: int = APPROX_BIN_ACCURACY,
) -> DataFrame:
    """Equal-frequency binning by APPROXIMATE boundaries — the 100 TB path
    ml_quantile_bin's docstring promises: per-key ``percentile_approx``
    (t-digest-style sketch with mergeable map-side partials — one ordinary
    hash-aggregate shuffle, NO per-key total order) computes the interior
    boundaries, then every row bins by range lookup against the broadcast
    boundary frame. Contrast with the exact ntile form, whose window sort
    cannot avoid materializing each key's full value order.

    Semantics at ties differ from ntile by construction: range binning puts
    equal values in the same bin (ntile splits them to even out counts), so
    per-bin counts deviate from N/n_bins by the tied mass at a boundary —
    the documented, tested tolerance (tests/test_quantile_bin_approx.py)."""
    qs = ", ".join(f"{i / n_bins!r}" for i in range(1, n_bins))
    bounds = df.groupBy(key_col).agg(
        F.expr(f"percentile_approx({value_col}, array({qs}), {accuracy})").alias("_qb")
    )
    binned = df.join(F.broadcast(bounds), key_col)
    bin_expr = F.lit(1).cast("bigint")
    for i in range(1, n_bins):
        bin_expr = bin_expr + (F.col(value_col) > F.col("_qb")[i - 1]).cast("bigint")
    return binned.select(key_col, value_col, bin_expr.alias("bin"))


@query("ml_quantile_bin_approx")  # rows-only: sketch boundaries aren't
# engine-replayable (same registry tier as the GK/t-digest sketches);
# tolerance vs the exact ntile form is pinned by unit test instead
def q_ml_quantile_bin_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-boundary quartile binning of ``value`` per event_type —
    the scale twin of ml_quantile_bin (see quantile_bin_approx for the
    plan-shape argument). Same output shape as the exact form."""
    ev = _cat(spark, sf_dir).table("events").filter(F.col("value").isNotNull())
    return (
        quantile_bin_approx(ev, "event_type", "value")
        .groupBy("event_type", "bin")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.round(F.min("value"), 6).alias("lo"),
            F.round(F.max("value"), 6).alias("hi"),
            F.round(F.avg("value"), 6).alias("mean"),
        )
    )
