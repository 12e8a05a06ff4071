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
    """TPC-H Q5 shape: five joins, three broadcastable dims, a local-supplier
    correlation predicate (c_nationkey = s_nationkey) applied post-join."""
    c = _cat(spark, sf_dir)
    return (
        c.table("customer")
        .join(c.table("orders"), F.col("c_custkey") == F.col("o_custkey"))
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(c.table("lineitem"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
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
        cust.withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 5)
        .select("c_nationkey", "c_custkey", "c_acctbal", "rnk")
    )
