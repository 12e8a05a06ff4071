"""Approximate aggregates sanity + source/sink roundtrips."""

from pyspark.sql import functions as F

from temporalvault_spark.functions import approx_distinct_by, approx_quantiles_by, sample_fraction
from temporalvault_spark.sources import read_table, write_partitioned


def test_approx_distinct_close_to_exact(spark, sf_dir):
    ev = read_table(spark, f"{sf_dir}/events.parquet", ts_cols=("ts",))
    exact = {r["event_type"]: r["n"] for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n")).collect()}
    approx = {r["event_type"]: r["approx_n_user_id"] for r in approx_distinct_by(ev, "event_type", "user_id").collect()}
    for k, n in exact.items():
        assert abs(approx[k] - n) <= max(2, 0.1 * n)


def test_approx_quantiles_bracket_exact(spark, sf_dir):
    ev = read_table(spark, f"{sf_dir}/events.parquet", ts_cols=("ts",))
    q = approx_quantiles_by(ev, "event_type", "value", quantiles=(0.5,)).collect()
    for r in q:
        mn, mx = ev.filter(F.col("event_type") == r["event_type"]).agg(F.min("value"), F.max("value")).first()
        assert mn <= r["p50"] <= mx


def test_sample_fraction_seeded_and_sized(spark, sf_dir):
    ev = read_table(spark, f"{sf_dir}/events.parquet", ts_cols=("ts",))
    s1 = sample_fraction(ev, 0.1).count()
    s2 = sample_fraction(ev, 0.1).count()
    assert s1 == s2  # seeded determinism
    assert 0.03 * ev.count() < s1 < 0.25 * ev.count()


def test_csv_json_roundtrip(spark, tmp_path):
    df = spark.range(100).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("part"),
        (F.col("id") * 1.5).alias("x"),
    )
    for fmt in ("csv", "json", "parquet", "orc"):
        path = str(tmp_path / f"rt_{fmt}")
        write_partitioned(df, path, fmt=fmt, partition_by=("part",))
        back = read_table(
            spark, path, fmt=fmt, schema="id bigint, x double, part string"
        )
        assert back.count() == 100
        assert {r["part"] for r in back.select("part").distinct().collect()} == {"0", "1", "2"}
        got = sorted((r["id"], r["x"]) for r in back.collect())
        assert got == [(i, i * 1.5) for i in range(100)]


def test_ts_normalization_matches_catalog(spark, sf_dir):
    via_source = read_table(spark, f"{sf_dir}/events.parquet", ts_cols=("ts",))
    assert dict(via_source.dtypes)["ts"].startswith("timestamp")


def test_hll_sketch_rollup_merge_consistent_and_accurate(spark):
    """The persisted-sketch pattern's load-bearing property: merging
    per-slice sketches must answer the same estimate as sketching the raw
    union directly (HLL union is lossless over sketches of equal lg_k), and
    the estimate must be within HLL error of the exact count at a
    cardinality (50k) where exact != estimate is plausible."""
    from temporalvault_spark.functions.approx import (
        hll_merge_estimate,
        hll_sketch_rollup,
    )

    # 50k distinct ids spread over 10 'days', every id in one group
    df = spark.range(50_000).select(
        F.lit("g").alias("g"), (F.col("id") % 10).alias("day"), F.col("id")
    )
    daily = hll_sketch_rollup(df, ["g", "day"], "id")
    assert daily.count() == 10
    merged = hll_merge_estimate(daily, ["g"], "est").collect()[0]["est"]
    direct = hll_merge_estimate(
        hll_sketch_rollup(df, ["g"], "id"), ["g"], "est"
    ).collect()[0]["est"]
    assert merged == direct  # merge-of-slices == sketch-of-union
    assert abs(merged - 50_000) <= 0.05 * 50_000  # ~1.6% rsd at lg_k=12


def test_read_table_schema_evolution(spark, tmp_path):
    """Schema evolution through the one reader: a later batch adds a
    column; mergeSchema=true unions the footers (old rows NULL in the new
    column), and the production pattern — an explicit evolved schema, no
    merge pass — reads both batches identically. At 100 TB the explicit
    schema is the right default (mergeSchema reads every file footer), so
    both paths must work."""
    from temporalvault_spark.sources.io import read_table

    path = str(tmp_path / "evolve")
    spark.range(3).select(F.col("id"), (F.col("id") * 2.0).alias("x")).write.parquet(path)
    spark.range(3, 5).select(
        F.col("id"), (F.col("id") * 2.0).alias("x"), F.lit("tag").alias("y")
    ).write.mode("append").parquet(path)

    merged = read_table(spark, path, mergeSchema="true")
    assert set(merged.columns) == {"id", "x", "y"}
    rows = {r["id"]: r["y"] for r in merged.collect()}
    assert rows[0] is None and rows[4] == "tag" and len(rows) == 5

    explicit = read_table(spark, path, schema="id bigint, x double, y string")
    assert {r["id"]: r["y"] for r in explicit.collect()} == rows
