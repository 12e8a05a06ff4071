"""Bucketed tables must join and aggregate WITHOUT shuffling — the plan is
the proof."""

import os

import pytest
from pyspark.sql import functions as F

from temporalvault_spark.plans import executed_plan, plan_counts
from temporalvault_spark.sources.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed(spark, sf_dir):
    # warehouse.dir is a static conf — managed tables land in the session's
    # default warehouse (a per-process tmpdir via get_spark). Belt and
    # braces for driver-owned sessions: DROP TABLE can't see orphan
    # directories left by a SIGKILL'd run, so rmtree the locations too.
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
    for tbl in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {tbl}")
        shutil.rmtree(os.path.join(wh, tbl), ignore_errors=True)
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "orders_b", "o_orderkey", n_buckets=8)
    write_bucketed(li, "lineitem_b", "o_orderkey", n_buckets=8)
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    # force the join path (not broadcast) to prove bucketing removes the shuffle
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed_join(spark, "orders_b", "lineitem_b", "o_orderkey")
        c = plan_counts(j)
        assert c["SortMergeJoin"] == 1
        assert c["Exchange hashpartitioning"] == 0, executed_plan(j)[:500]
        # and it's not just a pretty plan — it computes
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_agg_skips_exchange(spark, bucketed):
    agg = spark.table("lineitem_b").groupBy("o_orderkey").agg(F.sum("l_quantity").alias("q"))
    c = plan_counts(agg)
    assert c["Exchange hashpartitioning"] == 0
    assert agg.count() > 0


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join over plain parquet needs exchanges."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        j = orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        assert plan_counts(j)["Exchange hashpartitioning"] >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
