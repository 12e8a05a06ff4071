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


def test_append_searchable_and_consistent(spark, sf_dir, tmp_path_factory):
    """An appended near-twin of vec 0 must (a) receive the same codes as
    its original — assignment and encode run against the PERSISTED
    sidecars, not recomputed ones — and (b) rank directly adjacent to it
    in a subsequent probe."""
    from pyspark.sql import functions as F

    from temporalvault_spark.operators.ivfpq_index import append_to_ivfpq_index

    path = str(tmp_path_factory.mktemp("ivfpq_app") / "index")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    build_ivfpq_index(emb, path)

    twin = emb.filter("vec_id = 0").select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding", "label"
    )
    append_to_ivfpq_index(twin, path)

    idx = spark.read.parquet(path)
    orig = idx.filter("vec_id = 0").first()
    app = idx.filter("vec_id = 1000000").first()
    assert list(app["codes"]) == list(orig["codes"])
    assert app["centroid_id"] == orig["centroid_id"]

    probe = (
        emb.filter("vec_id = 0").selectExpr("cast(embedding as array<double>)").first()[0]
    )
    top = ivfpq_search(spark, path, probe, k=2, nprobe=4).collect()
    assert {r["vec_id"] for r in top} == {0, 1_000_000}
    assert top[0]["adc_dist"] == top[1]["adc_dist"]


def test_search_validates_probe_and_codebook(spark, sf_dir, index_path, probe_vec, tmp_path_factory):
    """The read path must refuse plausible-but-wrong inputs (ADVICE r4): a
    short probe vector would silently truncate the per-subspace zips, and a
    codebook sidecar missing a cell would leave ADC table entries at 0.0 —
    both must raise instead of ranking wrongly."""
    import shutil

    with pytest.raises(ValueError, match="probe_vec"):
        ivfpq_search(spark, index_path, probe_vec[:-1], k=5)

    corrupt = str(tmp_path_factory.mktemp("ivfpq_corrupt") / "index")
    shutil.copytree(index_path, corrupt)
    cb = spark.read.parquet(f"{index_path}/_codebook")
    shutil.rmtree(f"{corrupt}/_codebook")
    cb.filter("NOT (sub = 0 AND code = 0)").coalesce(1).write.parquet(
        f"{corrupt}/_codebook"
    )
    with pytest.raises(ValueError, match="cells"):
        ivfpq_search(spark, corrupt, probe_vec, k=5)


def test_search_rejects_duplicate_codebook_rows(spark, index_path, probe_vec, tmp_path_factory):
    """A codebook holding the full grid PLUS a duplicate (sub, code) row
    with a conflicting codeword passes the distinct-coverage check (filled
    is a set) yet leaves the ADC entry dependent on collect() order — the
    row-count check must refuse it (ADVICE r5)."""
    import shutil

    from pyspark.sql import functions as F

    dup = str(tmp_path_factory.mktemp("ivfpq_dup") / "index")
    shutil.copytree(index_path, dup)
    cb = spark.read.parquet(f"{index_path}/_codebook")
    extra = cb.filter("sub = 0 AND code = 0").withColumn(
        "cw", F.expr("transform(cw, x -> x + 1000.0)")
    )
    shutil.rmtree(f"{dup}/_codebook")
    cb.unionByName(extra).coalesce(1).write.parquet(f"{dup}/_codebook")
    with pytest.raises(ValueError, match="one row per cell"):
        ivfpq_search(spark, dup, probe_vec, k=5)


# --- growth contract ----------------------------------------------------------


def _rand_emb64(spark, n, seed=7, start=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = [
        (start + i, [float(x) for x in rng.uniform(-1, 1, 64)], int(i % 3))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )


def test_ivfpq_occupancy_and_retrain_cycle(spark, tmp_path_factory):
    """The compressed sibling of the ivf growth contract: fresh index is
    not grown; a 3x append trips the size-drift arm; the retrain (caller
    supplies the corpus — codes cannot reconstruct vectors) swaps in an
    index code-identical to a from-scratch build over the union, and the
    refreshed _meta closes the contract."""
    from temporalvault_spark.operators.ivfpq_index import (
        append_to_ivfpq_index,
        ivfpq_index_occupancy,
        rebuild_ivfpq_index_if_grown,
    )

    root = tmp_path_factory.mktemp("ivfpq_grow")
    path, fresh = str(root / "index"), str(root / "fresh")
    base = _rand_emb64(spark, 60, seed=1)
    batch = _rand_emb64(spark, 180, seed=2, start=60)
    union = base.unionByName(batch)

    build_ivfpq_index(base, path)
    rep = ivfpq_index_occupancy(spark, path)
    assert rep["grown"] is False and rep["k"] == 16 and rep["n_built"] == 60

    append_to_ivfpq_index(batch, path)
    rep = ivfpq_index_occupancy(spark, path)
    assert rep["grown"] is True and rep["n_vecs"] == 240

    out = rebuild_ivfpq_index_if_grown(spark, path, union)
    assert out["rebuilt"] is True
    rep2 = ivfpq_index_occupancy(spark, path)
    assert rep2["n_built"] == 240 and rep2["grown"] is False

    build_ivfpq_index(union, fresh)
    got = {
        (r["vec_id"], r["centroid_id"], tuple(r["codes"]))
        for r in spark.read.parquet(path).collect()
    }
    want = {
        (r["vec_id"], r["centroid_id"], tuple(r["codes"]))
        for r in spark.read.parquet(fresh).collect()
    }
    assert got == want and len(got) == 240


def test_ivfpq_rebuild_noop_below_dial(spark, tmp_path_factory):
    from temporalvault_spark.operators.ivfpq_index import (
        append_to_ivfpq_index,
        rebuild_ivfpq_index_if_grown,
    )

    path = str(tmp_path_factory.mktemp("ivfpq_noop") / "index")
    base = _rand_emb64(spark, 100, seed=3)
    batch = _rand_emb64(spark, 10, seed=4, start=100)
    build_ivfpq_index(base, path)
    append_to_ivfpq_index(batch, path)
    out = rebuild_ivfpq_index_if_grown(spark, path, base.unionByName(batch))
    assert out["rebuilt"] is False and out["grown"] is False
    assert out["n_vecs"] == 110 and out["n_built"] == 100
