"""Data-quality expectations: the constraint gate a production pipeline
runs before trusting a batch (the Delta Live Tables "expectations" /
Great Expectations pattern).

The reference gets integrity from PostgreSQL itself — NOT NULL columns,
the primary key, and the unique version index (reference app/models.py:
11-24) reject bad rows at insert time. A lake engine has no constraint
enforcement in the storage layer, so the equivalent is a VALIDATION
OPERATOR: declarative rules → one violations report, run before a batch
is published.

Scale shape:
  * all row-predicate rules for one table FUSE into a single aggregate —
    one scan per table regardless of rule count (`sum(case when violated)`
    per rule), map-side combined to a 1-row frame;
  * uniqueness is `count - count(distinct key)` inside that same
    aggregate — no self-join;
  * referential integrity is a left-anti join on the key, the same
    shuffle any FK-existence query pays (AQE handles skewed keys); only
    the anti-join's count leaves the join;
  * the report is a union of 1-row frames — bytes, not data.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog
from temporalvault_spark.registry import query


def fused_rule_counts(
    df: DataFrame, rules: dict[str, object], unique_keys: dict[str, str] | None = None
) -> DataFrame:
    """(rule, n_violations) for row-predicate rules AND key-uniqueness
    rules, ONE aggregate over one scan. Each value of ``rules`` is a
    boolean Column that is true when the row VIOLATES the rule;
    ``unique_keys`` maps rule name → column that must be unique
    (violations = extra copies, COUNT(key) - COUNT(DISTINCT key), riding
    the same aggregate — no second scan, no self-join). coalesce(0) keeps
    an EMPTY batch a definite pass — SUM over zero rows is NULL, and a
    NULL verdict neither passes nor fails a gate."""
    unique_keys = unique_keys or {}
    agg = df.agg(
        *[
            F.coalesce(F.sum(F.when(cond, 1).otherwise(0)), F.lit(0))
            .cast("bigint")
            .alias(name)
            for name, cond in rules.items()
        ],
        *[
            (F.count(key) - F.count_distinct(F.col(key))).cast("bigint").alias(name)
            for name, key in unique_keys.items()
        ],
    )
    names = [*rules, *unique_keys]
    stack = ", ".join(f"'{name}', {name}" for name in names)
    return agg.selectExpr(
        f"stack({len(names)}, {stack}) AS (rule, n_violations)"
    )


def fk_violations(child: DataFrame, key: str, parent: DataFrame, pkey: str, rule: str) -> DataFrame:
    orphans = child.select(F.col(key)).filter(F.col(key).isNotNull()).join(
        parent.select(F.col(pkey).alias(key)), key, "left_anti"
    )
    return orphans.agg(F.count(F.lit(1)).cast("bigint").alias("n_violations")).select(
        F.lit(rule).alias("rule"), "n_violations"
    )


def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_catalog(spark, sf_dir)
    orders, lineitem, customer = c.table("orders"), c.table("lineitem"), c.table("customer")
    documents, embeddings = c.table("documents"), c.table("embeddings")
    parts = [
        fused_rule_counts(
            orders,
            {
                "orders_orderkey_not_null": F.col("o_orderkey").isNull(),
                "orders_totalprice_nonneg": F.col("o_totalprice") < 0,
                "orders_orderdate_not_null": F.col("o_orderdate").isNull(),
            },
            unique_keys={"orders_orderkey_unique": "o_orderkey"},
        ),
        fused_rule_counts(
            lineitem,
            {
                "lineitem_quantity_in_range": ~F.col("l_quantity").between(1, 50),
                "lineitem_discount_in_range": ~F.col("l_discount").between(0, 1),
                "lineitem_price_positive": F.col("l_extendedprice") <= 0,
            },
        ),
        fk_violations(orders, "o_custkey", customer, "c_custkey", "orders_custkey_fk_customer"),
        fk_violations(lineitem, "l_orderkey", orders, "o_orderkey", "lineitem_orderkey_fk_orders"),
        fused_rule_counts(
            documents,
            {
                "documents_nchars_nonneg": F.col("n_chars") < 0,
                "documents_text_not_null": F.col("text").isNull(),
            },
            unique_keys={"documents_docid_unique": "doc_id"},
        ),
        fused_rule_counts(
            embeddings,
            {"embeddings_vector_not_null": F.col("embedding").isNull()},
            unique_keys={"embeddings_vecid_unique": "vec_id"},
        ),
    ]
    report = reduce(DataFrame.unionByName, parts)
    return report.withColumn("passed", F.col("n_violations") == 0)


@query(
    "dq_expectations",
    """WITH o AS (
        SELECT 'orders_orderkey_not_null' AS rule,
               CAST(COALESCE(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_violations
        FROM orders
        UNION ALL
        SELECT 'orders_totalprice_nonneg',
               CAST(COALESCE(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orders
        UNION ALL
        SELECT 'orders_orderdate_not_null',
               CAST(COALESCE(SUM(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT) FROM orders
        UNION ALL
        SELECT 'orders_orderkey_unique',
               CAST(COUNT(o_orderkey) - COUNT(DISTINCT o_orderkey) AS BIGINT) FROM orders
        UNION ALL
        SELECT 'lineitem_quantity_in_range',
               CAST(COALESCE(SUM(CASE WHEN NOT (l_quantity BETWEEN 1 AND 50) THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_discount_in_range',
               CAST(COALESCE(SUM(CASE WHEN NOT (l_discount BETWEEN 0 AND 1) THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM lineitem
        UNION ALL
        SELECT 'lineitem_price_positive',
               CAST(COALESCE(SUM(CASE WHEN l_extendedprice <= 0 THEN 1 ELSE 0 END), 0) AS BIGINT) FROM lineitem
        UNION ALL
        SELECT 'orders_custkey_fk_customer',
               CAST(COUNT(*) AS BIGINT)
        FROM orders WHERE o_custkey IS NOT NULL
          AND o_custkey NOT IN (SELECT c_custkey FROM customer)
        UNION ALL
        SELECT 'lineitem_orderkey_fk_orders',
               CAST(COUNT(*) AS BIGINT)
        FROM lineitem WHERE l_orderkey IS NOT NULL
          AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)
        UNION ALL
        SELECT 'documents_nchars_nonneg',
               CAST(COALESCE(SUM(CASE WHEN n_chars < 0 THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'documents_text_not_null',
               CAST(COALESCE(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'documents_docid_unique',
               CAST(COUNT(doc_id) - COUNT(DISTINCT doc_id) AS BIGINT) FROM documents
        UNION ALL
        SELECT 'embeddings_vector_not_null',
               CAST(COALESCE(SUM(CASE WHEN embedding IS NULL THEN 1 ELSE 0 END), 0) AS BIGINT)
        FROM embeddings
        UNION ALL
        SELECT 'embeddings_vecid_unique',
               CAST(COUNT(vec_id) - COUNT(DISTINCT vec_id) AS BIGINT) FROM embeddings)
    SELECT rule, n_violations, n_violations = 0 AS passed FROM o""",
)
def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint gate over the star schema: NOT NULL / range / uniqueness /
    referential integrity as one violations report (the lake substitute for
    the reference's NOT NULL columns, primary key, and unique version index,
    app/models.py:11-24). Row-predicate rules fuse into one aggregate per
    table; FK checks are left-anti joins; the report is a union of 1-row
    frames."""
    return dq_expectations(spark, sf_dir)


def dq_version_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integrity of the derived version log itself — the invariants the
    reference's write path maintains row-at-a-time (app/main.py:77-92:
    next-version assignment reads the latest row; models.py:19: the
    previous_version back-link) and this engine maintains set-at-once:

      * versions are contiguous per key (max version_num == row count);
      * previous_version of v_n is exactly v_{n-1} (v_1 has none);
      * second-truncated ts is non-decreasing along the chain (the log is
        append-ordered; raw-arrival order is the window's sort key).

    One window + one aggregate over the record_id partitioning every
    temporal operator already shares."""
    return version_chain_report(load_catalog(spark, sf_dir).table("temporal_records"))


def version_chain_report(tr: DataFrame) -> DataFrame:
    from pyspark.sql import Window

    w = Window.partitionBy("record_id").orderBy("version_num")
    checked = tr.select(
        "record_id",
        "version_num",
        "ts",
        "previous_version",
        F.lag("ts").over(w).alias("prev_ts"),
        F.lag(F.col("version")).over(w).alias("expect_prev"),
    )
    return checked.agg(
        F.sum(
            F.when(~F.col("previous_version").eqNullSafe(F.col("expect_prev")), 1).otherwise(0)
        ).cast("bigint").alias("broken_links"),
        F.sum(
            F.when(F.col("prev_ts").isNotNull() & (F.col("ts") < F.col("prev_ts")), 1).otherwise(0)
        ).cast("bigint").alias("ts_regressions"),
        (F.count(F.lit(1)) - F.sum(F.when(F.col("version_num") == 1, 1).otherwise(0)))
        .cast("bigint").alias("n_chained"),
    ).crossJoin(
        tr.groupBy("record_id")
        .agg((F.max("version_num") != F.count(F.lit(1))).alias("gap"))
        .agg(F.sum(F.when(F.col("gap"), 1).otherwise(0)).cast("bigint").alias("gapped_keys"))
    ).select("broken_links", "ts_regressions", "n_chained", "gapped_keys")


def register_temporal_dq() -> None:
    from temporalvault_spark.catalog import temporal_oracle

    query(
        "dq_version_chain",
        temporal_oracle(
            """SELECT
                 CAST(SUM(CASE WHEN previous_version IS DISTINCT FROM expect_prev
                               THEN 1 ELSE 0 END) AS BIGINT) AS broken_links,
                 CAST(SUM(CASE WHEN prev_ts IS NOT NULL AND ts < prev_ts
                               THEN 1 ELSE 0 END) AS BIGINT) AS ts_regressions,
                 CAST(COUNT(*) - SUM(CASE WHEN version_num = 1 THEN 1 ELSE 0 END)
                      AS BIGINT) AS n_chained,
                 (SELECT CAST(SUM(CASE WHEN mx != cnt THEN 1 ELSE 0 END) AS BIGINT)
                  FROM (SELECT record_id, MAX(version_num) AS mx, COUNT(*) AS cnt
                        FROM temporal_records GROUP BY record_id)) AS gapped_keys
               FROM (
                 SELECT record_id, version_num, ts, previous_version,
                        LAG(ts) OVER w AS prev_ts,
                        LAG(version) OVER w AS expect_prev
                 FROM temporal_records
                 WINDOW w AS (PARTITION BY record_id ORDER BY version_num))"""
        ),
    )(dq_version_chain)


register_temporal_dq()
