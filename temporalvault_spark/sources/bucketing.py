"""Bucketed tables: co-located joins and aggregations without a shuffle.

At 100 TB the repeated cost in a star/fact pipeline is re-shuffling the fact
table on the same join key (orderkey, user_id) query after query. Bucketing
pays that shuffle ONCE at write time: both sides hash-partitioned into the
same bucket count by the join key means a sort-merge join with NO Exchange on
either side (asserted in tests/test_bucketing.py), and groupBy on the bucket
key skips its exchange too.

Spark's bucketing rides the session catalog (saveAsTable) — bucket metadata
lives in the metastore, so ``spark.table(name)`` exposes the bucketing spec
to the planner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.
    ``n_buckets`` should match across tables meant to join with each other —
    equal bucket counts are what lets the planner drop both exchanges."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str, key: str) -> DataFrame:
    """Join two same-bucketed tables on their bucket key — plans as a
    sort-merge join with zero Exchange operators."""
    return spark.table(left_table).join(spark.table(right_table), key)
