"""Persisted IVF index: probes must physically prune cluster partitions and
agree with the oracle-checked in-memory sim_ivf_ann."""

import re

import pytest

import __spark_entry__ as entrymod
from temporalvault_spark.operators.ivf_index import build_ivf_index, ivf_search
from temporalvault_spark.plans import executed_plan


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "index")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    build_ivf_index(emb, path)
    return path


def test_probe_prunes_partitions(spark, sf_dir, index_path):
    probe = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id = 0")
        .selectExpr("cast(embedding as array<double>)")
        .first()[0]
    )
    res = ivf_search(spark, index_path, probe, k=10, nprobe=4)
    plan = executed_plan(res)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), plan[:800]
    assert res.count() == 10


def test_probe_matches_inmemory_ivf(spark, sf_dir, index_path):
    probe = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id = 0")
        .selectExpr("cast(embedding as array<double>)")
        .first()[0]
    )
    got = [
        (r["vec_id"], r["centroid_id"], r["cosine"])
        for r in ivf_search(spark, index_path, probe, k=10, nprobe=4).collect()
    ]
    expected = [
        (r["vec_id"], r["centroid_id"], r["cosine"])
        for r in entrymod.queries()["sim_ivf_ann"](spark, sf_dir).collect()
    ]
    assert got == expected
