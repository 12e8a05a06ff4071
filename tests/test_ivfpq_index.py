"""Persisted IVF-PQ index: partition-pruned ADC probes must equal the
oracle-checked in-memory ivfpq_topk exactly, the main index must store
codes only (the 32x compression is structural, not aspirational), and the
probe plan must prune partitions and stay join-free."""

import re

import pytest

import __spark_entry__ as entrymod
from temporalvault_spark.operators.ivfpq_index import build_ivfpq_index, ivfpq_search
from temporalvault_spark.plans import executed_plan, plan_counts


@pytest.fixture(scope="module")
def index_path(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivfpq") / "index")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    build_ivfpq_index(emb, path)
    return path


@pytest.fixture(scope="module")
def probe_vec(spark, sf_dir):
    return (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter("vec_id = 0")
        .selectExpr("cast(embedding as array<double>)")
        .first()[0]
    )


def test_probe_prunes_partitions_and_joins_nothing(spark, index_path, probe_vec):
    res = ivfpq_search(spark, index_path, probe_vec, k=10, nprobe=4)
    plan = executed_plan(res)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), plan[:800]
    c = plan_counts(res)
    # the distance table is a literal: no join of ANY kind in the probe
    assert all(
        c[k] == 0
        for k in (
            "BroadcastHashJoin",
            "SortMergeJoin",
            "ShuffledHashJoin",
            "BroadcastNestedLoopJoin",
            "CartesianProduct",
        )
    )
    assert c["TakeOrderedAndProject"] == 1
    assert res.count() == 10


def test_probe_matches_inmemory_ivfpq(spark, sf_dir, index_path, probe_vec):
    """The persisted probe must reproduce ivfpq_topk (same fixed centroid
    set, same codebook, same nprobe/k) row for row — build-vs-query
    assignment or encode drift would surface here."""
    got = [
        (r["vec_id"], r["centroid_id"], r["adc_dist"])
        for r in ivfpq_search(spark, index_path, probe_vec, k=10, nprobe=4).collect()
    ]
    expected = [
        (r["vec_id"], r["centroid_id"], r["adc_dist"])
        for r in entrymod.queries()["ivfpq_topk"](spark, sf_dir).collect()
    ]
    assert got == expected


def test_index_stores_codes_not_floats(spark, index_path):
    """The compression is structural: the main index holds the M sub-codes
    and ids only — no raw embedding column survives the build."""
    idx = spark.read.parquet(index_path)
    assert set(idx.columns) == {"vec_id", "label", "codes", "centroid_id"}
    row = idx.first()
    assert len(row["codes"]) == 8
