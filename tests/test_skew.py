"""Salted aggregation / join equivalence on a deliberately skewed key."""

import pytest
from pyspark.sql import functions as F

from temporalvault_spark.functions.skew import salted_agg, salted_join_skewed_left


@pytest.fixture(scope="module")
def skewed(spark):
    # 90% of rows share key 0 — the shape AQE's agg path can't split
    return spark.range(20000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 100).alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_agg_equals_plain(spark, skewed):
    plain = {
        (r["k"]): (r["s"], r["n"], r["mx"])
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        (r["k"]): (r["s"], r["n"], r["mx"])
        for r in salted_agg(
            skewed, ["k"], {"s": ("sum", "v"), "n": ("count", "v"), "mx": ("max", "v")}
        ).collect()
    }
    assert plain == salted


def test_salted_agg_rejects_non_mergeable(spark, skewed):
    with pytest.raises(ValueError, match="not re-aggregatable"):
        salted_agg(skewed, ["k"], {"a": ("avg", "v")})


def test_salted_join_equals_plain(spark, skewed):
    dim = spark.range(100).select(F.col("id").alias("k"), F.concat(F.lit("n"), "id").alias("name"))
    plain = sorted(
        (r["k"], r["v"], r["name"]) for r in skewed.join(dim, "k").collect()
    )
    salted = sorted(
        (r["k"], r["v"], r["name"])
        for r in salted_join_skewed_left(skewed, dim, "k", salt=8).collect()
    )
    assert plain == salted


def test_salted_join_hint_forces_shuffle_path(spark, skewed):
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(3)], "k int, name string")
    out = salted_join_skewed_left(skewed, dim, "k", salt=8, join_hint="shuffle_hash")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "ShuffledHashJoin" in plan
    assert "BroadcastHashJoin" not in plan
    # and the forced path still matches the plain join
    plain = sorted((r["k"], r["v"], r["name"]) for r in skewed.join(dim, "k").collect())
    salted = sorted((r["k"], r["v"], r["name"]) for r in out.collect())
    assert plain == salted
