"""TPC-H long tail: the remaining canonical query shapes (Q2, Q7, Q8, Q9,
Q11, Q13, Q15, Q16, Q17, Q20, Q21, Q22), adapted to the driver testdata's
columns (no partsupp table, no comment/phone/commitdate columns — each
docstring names the substitution).

Together with operators/analytics.py (Q1/Q3/Q4/Q5/Q6/Q10/Q12/Q14/Q18/Q19)
this completes all 22 TPC-H plan shapes, each with a DuckDB oracle.

Determinism rules (same as Q10, see analytics.py): many-term monetary sums
accumulate in DECIMAL(18,6) — exact, partitioning-independent — and cast to
double only after ROUND; year() casts to bigint on the Spark side (DuckDB's
year() is BIGINT); every computed column is aliased identically in both
engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog
from temporalvault_spark.registry import query


def _cat(spark: SparkSession, sf_dir: str):
    return load_catalog(spark, sf_dir)


def _dec(col):
    return col.cast("decimal(18,6)")


_REV = "l_extendedprice * (1 - l_discount)"


@query(
    "tpch_q2_min_cost_supplier",
    """WITH pair_cost AS (
      SELECT l.l_partkey, l.l_suppkey,
             ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*), 4) AS cost
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
      GROUP BY l.l_partkey, l.l_suppkey)
    SELECT p.p_partkey, pc.l_suppkey AS s_suppkey, pc.cost
    FROM (SELECT *, MIN(cost) OVER (PARTITION BY l_partkey) AS min_cost
          FROM pair_cost) pc
    JOIN part p ON p.p_partkey = pc.l_partkey
    WHERE pc.cost = pc.min_cost
      AND p.p_size BETWEEN 10 AND 12 AND p.p_type = 'STANDARD'
    ORDER BY p.p_partkey, s_suppkey""",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: groupwise-min correlated subquery (cheapest supplier
    per part). No partsupp table in the testdata, so supply cost :=
    round(avg lineitem price) per (part, supplier) pair, restricted to
    EUROPE suppliers.

    Scale notes: the min-per-part is a WINDOW over the pair aggregate —
    one shuffle on l_partkey serves both the aggregate and the window
    (vs the naive self-join that would rescan and reshuffle the pairs);
    region/nation broadcast into the supplier probe; avg accumulates in
    decimal so the min comparison is partitioning-independent."""
    c = _cat(spark, sf_dir)
    pairs = (
        c.table("lineitem")
        .join(c.table("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(c.table("nation")), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.round(
                F.sum(_dec(F.col("l_extendedprice"))).cast("double") / F.count("*"), 4
            ).alias("cost")
        )
    )
    w = Window.partitionBy("l_partkey")
    return (
        pairs.withColumn("min_cost", F.min("cost").over(w))
        .filter(F.col("cost") == F.col("min_cost"))
        .join(
            c.table("part").filter(
                F.col("p_size").between(10, 12) & (F.col("p_type") == "STANDARD")
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select("p_partkey", F.col("l_suppkey").alias("s_suppkey"), "cost")
        .orderBy("p_partkey", "s_suppkey")
    )


@query(
    "tpch_q7_volume_shipping",
    f"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
           CAST(ROUND(SUM(CAST({_REV} AS DECIMAL(18,6))), 2) AS DOUBLE) AS revenue
    FROM lineitem l
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year""",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: bilateral trade volume between two nations by year.
    The nation-pair disjunction spans the supplier and customer sides, so
    it can only apply post-join — but each side still gets a pushable
    IN ('NATION_1','NATION_2') prefilter derived here by joining against
    pre-filtered broadcast nation dims, which shrinks both fact inputs
    before the orders/customer shuffles."""
    c = _cat(spark, sf_dir)
    two = F.col("n_name").isin("NATION_1", "NATION_2")
    n1 = c.table("nation").filter(two).select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = c.table("nation").filter(two).select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    li = c.table("lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    return (
        li.join(c.table("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n1), F.col("sn_key") == F.col("s_nationkey"))
        .join(c.table("orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c.table("customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2), F.col("cn_key") == F.col("c_nationkey"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .withColumn("l_year", F.year("l_shipdate").cast("bigint"))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.round(F.sum(rev), 2).cast("double").alias("revenue"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@query(
    "tpch_q8_market_share",
    f"""SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           ROUND(CAST(SUM(CASE WHEN n1.n_name = 'NATION_5'
                               THEN CAST({_REV} AS DECIMAL(18,6))
                               ELSE CAST(0 AS DECIMAL(18,6)) END) AS DOUBLE)
                 / CAST(SUM(CAST({_REV} AS DECIMAL(18,6))) AS DOUBLE), 6) AS mkt_share
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n1 ON n1.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
    JOIN region r ON r.r_regionkey = n2.n_regionkey
    WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
    GROUP BY o_year ORDER BY o_year""",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: national market share — ratio of a conditional
    decimal sum to the total, per order year, for one part type sold into
    one region. Both sums accumulate exactly (decimal) so the final
    double division sees identical operands in both engines.

    Scale notes: the p_type filter prunes part before its join (the most
    selective edge), nation/region broadcast, and the two sums share one
    aggregation pass — no separate numerator/denominator jobs."""
    c = _cat(spark, sf_dir)
    rev = _dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))
    zero = F.lit(0).cast("decimal(18,6)")
    n2r = (
        c.table("nation")
        .join(F.broadcast(c.table("region")), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "ASIA")
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    return (
        c.table("lineitem")
        .join(
            c.table("part").filter(F.col("p_type") == "PROMO").select("p_partkey"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(c.table("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(c.table("nation").select("n_nationkey", "n_name")),
            F.col("n_nationkey") == F.col("s_nationkey"),
        )
        .join(c.table("orders"), F.col("o_orderkey") == F.col("l_orderkey"))
        .join(c.table("customer"), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n2r), F.col("cn_key") == F.col("c_nationkey"), "left_semi")
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(F.when(F.col("n_name") == "NATION_5", rev).otherwise(zero)).cast(
                    "double"
                )
                / F.sum(rev).cast("double"),
                6,
            ).alias("mkt_share")
        )
        .orderBy("o_year")
    )


@query(
    "tpch_q9_product_profit",
    """SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
           CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                               - p.p_retailprice * l.l_quantity * 0.1
                               AS DECIMAL(18,6))), 2) AS DOUBLE) AS profit
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN orders o ON o.o_orderkey = l.l_orderkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC""",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit per supplier-nation per year over parts whose
    name matches a token. No partsupp.ps_supplycost in the testdata, so
    cost := 10% of retail price per unit (p_retailprice * l_quantity * 0.1).
    The LIKE prunes part before the join; profit accumulates in decimal."""
    c = _cat(spark, sf_dir)
    profit = _dec(
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.col("p_retailprice") * F.col("l_quantity") * 0.1
    )
    return (
        c.table("lineitem")
        .join(
            c.table("part")
            .filter(F.col("p_name").like("%red%"))
            .select("p_partkey", "p_retailprice"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(c.table("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(c.table("nation")), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(
            c.table("orders").select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .withColumn("o_year", F.year("o_orderdate").cast("bigint"))
        .groupBy(F.col("n_name").alias("nation"), F.col("o_year"))
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
        .orderBy(F.asc("nation"), F.desc("o_year"))
    )


@query(
    "tpch_q11_important_stock",
    """WITH val AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_quantity * l.l_extendedprice AS DECIMAL(18,6))) AS value_d
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey)
    SELECT l_partkey AS p_partkey,
           CAST(ROUND(value_d, 2) AS DOUBLE) AS stock_value
    FROM val
    WHERE CAST(value_d AS DOUBLE) > (SELECT 0.002 * CAST(SUM(value_d) AS DOUBLE) FROM val)
    ORDER BY stock_value DESC, p_partkey""",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-part value from one nation's suppliers, keeping
    parts above a fraction of the total (HAVING vs a scalar subquery).
    Stock value := sum(quantity * price) over lineitem (no partsupp).

    Scale notes: the per-part aggregate computes ONCE and feeds both the
    grand total (a 1-row broadcast) and the filter — the threshold join is
    a broadcast nested loop over one row, not a recompute."""
    c = _cat(spark, sf_dir)
    val = (
        c.table("lineitem")
        .join(c.table("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(c.table("nation").filter(F.col("n_name") == "NATION_3")),
            F.col("n_nationkey") == F.col("s_nationkey"),
            "left_semi",
        )
        .groupBy("l_partkey")
        .agg(F.sum(_dec(F.col("l_quantity") * F.col("l_extendedprice"))).alias("value_d"))
    )
    total = val.agg((0.002 * F.sum("value_d").cast("double")).alias("threshold"))
    return (
        val.join(F.broadcast(total))
        .filter(F.col("value_d").cast("double") > F.col("threshold"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round("value_d", 2).cast("double").alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), F.asc("p_partkey"))
    )


@query(
    "tpch_q13_customer_distribution",
    """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
          FROM customer c
          LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                            AND o.o_orderpriority <> '1-URGENT'
          GROUP BY c.c_custkey) t
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC""",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: customer order-count distribution — a left join
    whose extra predicate lives in the ON clause (customers with zero
    qualifying orders must still appear with c_count = 0), then a
    two-level aggregate. COUNT(o_orderkey) counts non-nulls, which is
    exactly what the unmatched left rows need."""
    c = _cat(spark, sf_dir)
    orders = c.table("orders").filter(F.col("o_orderpriority") != "1-URGENT")
    per_cust = (
        c.table("customer")
        .join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count("*").alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "tpch_q15_top_supplier",
    f"""WITH rev AS (
      SELECT l_suppkey,
             CAST(ROUND(SUM(CAST({_REV} AS DECIMAL(18,6))), 2) AS DOUBLE) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey, s.s_name, r.total_rev
    FROM rev r JOIN supplier s ON s.s_suppkey = r.l_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)
    ORDER BY s.s_suppkey""",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    an aggregate view compared against its own MAX (ties all surface).
    The revenue rounds from an exact decimal sum BEFORE the max/equality,
    so the tie comparison is bit-identical in both engines.

    Scale notes: rev computes once; the max is a 1-row broadcast back onto
    it (no window over, and no re-aggregation of, the quarter's lineitem)."""
    c = _cat(spark, sf_dir)
    rev = (
        c.table("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(F.sum(_dec(F.col("l_extendedprice") * (1 - F.col("l_discount")))), 2)
            .cast("double")
            .alias("total_rev")
        )
    )
    best = rev.agg(F.max("total_rev").alias("best_rev"))
    return (
        rev.join(F.broadcast(best))
        .filter(F.col("total_rev") == F.col("best_rev"))
        .join(c.table("supplier"), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q16_parts_supplier_cnt",
    """SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#1'
      AND p.p_size IN (1, 4, 7, 10, 13, 16, 19, 22)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per (brand, type, size)
    with a NOT IN exclusion list. No partsupp, so the part-supplier
    relation is lineitem; no s_comment, so the excluded set is suppliers
    with negative balance. NOT IN over a non-null key plans as a
    broadcast anti join (the exclusion list is tiny)."""
    c = _cat(spark, sf_dir)
    bad = c.table("supplier").filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        c.table("lineitem")
        .join(F.broadcast(bad), F.col("s_suppkey") == F.col("l_suppkey"), "left_anti")
        .join(
            c.table("part").filter(
                (F.col("p_brand") != "Brand#1")
                & F.col("p_size").isin(1, 4, 7, 10, 13, 16, 19, 22)
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


@query(
    "tpch_q17_small_qty_revenue",
    """WITH thr AS (
      SELECT l.l_partkey,
             0.5 * CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*) AS qty_thr
      FROM lineitem l
      WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_brand = 'Brand#2')
      GROUP BY l.l_partkey)
    SELECT ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) AS DOUBLE)
                 / 7.0, 2) AS avg_yearly,
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN thr t ON t.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#2' AND l.l_quantity < t.qty_thr""",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small orders — each line compares
    against a per-part average-quantity threshold (correlated aggregate →
    aggregate + self-join). 0.5×avg instead of the spec's 0.2×avg so the
    synthetic uniform quantities yield rows.

    Scale notes: the threshold aggregates ONLY the brand's parts' lines
    (semi-join pushdown into the CTE), not all of lineitem — at 100 TB the
    difference is the whole fact table. The avg derives from an exact
    decimal sum over an int count, so the `<` cut is engine-stable."""
    c = _cat(spark, sf_dir)
    brand_parts = c.table("part").filter(F.col("p_brand") == "Brand#2").select("p_partkey")
    li = c.table("lineitem").join(
        F.broadcast(brand_parts), F.col("p_partkey") == F.col("l_partkey"), "left_semi"
    )
    thr = li.groupBy("l_partkey").agg(
        (0.5 * F.sum(_dec(F.col("l_quantity"))).cast("double") / F.count("*")).alias(
            "qty_thr"
        )
    )
    return (
        li.join(
            thr.select(F.col("l_partkey").alias("t_partkey"), "qty_thr"),
            F.col("t_partkey") == F.col("l_partkey"),
        )
        .filter(F.col("l_quantity") < F.col("qty_thr"))
        .agg(
            F.round(F.sum(_dec(F.col("l_extendedprice"))).cast("double") / 7.0, 2).alias(
                "avg_yearly"
            ),
            F.count("*").alias("n_lines"),
        )
    )


@query(
    "tpch_q20_potential_promotion",
    """SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'EUROPE'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        WHERE p.p_name LIKE 'red%'
          AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l.l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING SUM(l.l_quantity) > 100)
    ORDER BY s.s_suppkey""",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested IN subqueries → a semi-join chain. Suppliers
    in one region who moved more than a threshold quantity of a named part
    family in a year (availqty stand-in: shipped quantity). The inner
    HAVING aggregate runs on lineitem pre-shrunk by the part-name semi
    join; the outer membership test is a broadcast semi join."""
    c = _cat(spark, sf_dir)
    red_parts = c.table("part").filter(F.col("p_name").like("red%")).select("p_partkey")
    movers = (
        c.table("lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
        )
        .join(F.broadcast(red_parts), F.col("p_partkey") == F.col("l_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100)
        .select("l_suppkey")
    )
    return (
        c.table("supplier")
        .join(F.broadcast(c.table("nation")), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("r_regionkey") == F.col("n_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .join(F.broadcast(movers), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "tpch_q21_waiting_supplier",
    """WITH fl AS (
      SELECT l.l_orderkey, l.l_suppkey,
             (l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY) AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'),
    st AS (
      SELECT l_orderkey, COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
      FROM fl GROUP BY l_orderkey)
    SELECT s.s_name, COUNT(DISTINCT fl.l_orderkey) AS numwait
    FROM fl
    JOIN st ON st.l_orderkey = fl.l_orderkey
    JOIN supplier s ON s.s_suppkey = fl.l_suppkey
    WHERE fl.late AND st.n_supp > 1 AND st.n_late = 1
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name LIMIT 10""",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who kept finished orders waiting — the
    EXISTS (another supplier on the order) AND NOT EXISTS (another LATE
    supplier) pair rewritten as ONE per-order aggregate (distinct supplier
    count + distinct late-supplier count) joined back to the late lines:
    n_supp > 1 ≡ EXISTS, n_late = 1 ≡ NOT EXISTS (the one late supplier is
    this row's). No l_commitdate in the testdata, so late := shipped more
    than 60 days after the order date.

    Scale notes: the classic 4-way self-join of lineitem becomes one
    shuffle on l_orderkey (fl feeds both the aggregate and the probe),
    then a broadcast of the small supplier dim; top-10 is
    TakeOrderedAndProject."""
    c = _cat(spark, sf_dir)
    fl = (
        c.table("lineitem")
        .join(
            c.table("orders")
            .filter(F.col("o_orderstatus") == "F")
            .select("o_orderkey", "o_orderdate"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAYS")).alias("late"),
        )
    )
    st = fl.groupBy(F.col("l_orderkey").alias("st_orderkey")).agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    return (
        fl.filter(F.col("late"))
        .join(
            st.filter((F.col("n_supp") > 1) & (F.col("n_late") == 1)),
            F.col("st_orderkey") == F.col("l_orderkey"),
        )
        .join(F.broadcast(c.table("supplier")), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.countDistinct("l_orderkey").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


@query(
    "tpch_q22_global_sales",
    """WITH pool AS (
      SELECT * FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13)),
    thr AS (SELECT AVG(c_acctbal) AS avg_bal FROM pool WHERE c_acctbal > 0)
    SELECT c.c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(CAST(c.c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
    FROM pool c, thr
    WHERE c.c_acctbal > thr.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c.c_nationkey
    ORDER BY c.c_nationkey""",
)
def q_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: promising dormant accounts — customers from a
    nation set (phone-prefix stand-in: c_nationkey IN (...)) with
    above-average balance and no recent orders. The scalar AVG broadcasts
    into the filter; NOT EXISTS is a left-anti join against orders
    pre-filtered to the recency window (anti join input shrinks BEFORE the
    shuffle — at scale that's most of the orders table gone)."""
    c = _cat(spark, sf_dir)
    pool = c.table("customer").filter(F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13))
    thr = pool.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("avg_bal"))
    recent = c.table("orders").filter(
        F.col("o_orderdate") >= F.lit("1999-01-01 00:00:00").cast("timestamp")
    )
    return (
        pool.join(F.broadcast(thr))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(
            F.count("*").alias("numcust"),
            F.round(F.sum(_dec(F.col("c_acctbal"))), 2).cast("double").alias("totacctbal"),
        )
        .orderBy("c_nationkey")
    )
