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
