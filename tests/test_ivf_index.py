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


def test_trained_centroids_deterministic_and_recall(spark, sf_dir, tmp_path_factory):
    """k-means||-trained index: (a) the build is deterministic under a seed,
    (b) probe recall@10 vs exact brute-force beats the fixed-centroid
    stand-in's recall floor at the same nprobe — the reason to train at all."""
    from pyspark.sql import functions as F

    from temporalvault_spark.operators.similarity import (
        cosine_scores,
        train_centroids,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    e = emb.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("e"))
    c1 = train_centroids(e, seed=7)
    c2 = train_centroids(e, seed=7)
    v1 = sorted(tuple(round(x, 9) for x in r["ce"]) for r in c1.collect())
    v2 = sorted(tuple(round(x, 9) for x in r["ce"]) for r in c2.collect())
    assert v1 == v2  # seeded build reproduces bit-for-bit

    path = str(tmp_path_factory.mktemp("ivf_km") / "index")
    build_ivf_index(emb, path, centroids=c1)

    # recall@10 averaged over a few probes, vs exact cosine top-10
    recalls = []
    for pid in (0, 17, 101):
        probe_row = emb.filter(F.col("vec_id") == pid)
        probe = probe_row.selectExpr("cast(embedding as array<double>)").first()[0]
        exact = {
            r["vec_id"]
            for r in cosine_scores(emb, probe_row)
            .orderBy(F.desc("cosine"), F.asc("vec_id"))
            .limit(10)
            .collect()
        }
        got = {r["vec_id"] for r in ivf_search(spark, path, probe, k=10, nprobe=4).collect()}
        recalls.append(len(exact & got) / 10)
    assert sum(recalls) / len(recalls) >= 0.5, recalls


def test_trained_beats_fixed_centroids_on_crafted_clusters(spark, tmp_path_factory):
    """On a corpus with KNOWN cluster structure (4 well-separated directions,
    deterministic — no randomness), the k-means||-trained index must reach
    perfect recall@10 at nprobe=1, strictly beating the fixed first-N
    stand-in (whose 'centroids' all come from cluster 0, so probes of other
    clusters land in arbitrarily-assigned buckets). Probes of the trained
    index must also stay partition-pruned — trained centroids change the
    layout, never the pruning."""
    import re

    from pyspark.sql import functions as F

    from temporalvault_spark.operators.similarity import train_centroids

    # 4 orthogonal-ish clusters x 32 members in 8-dim space; member vectors
    # are the cluster direction plus a tiny deterministic per-member wobble
    dims = 8
    rows = []
    for cl in range(4):
        base = [0.0] * dims
        base[cl] = 10.0
        base[cl + 4] = 5.0
        for m in range(32):
            vec = list(base)
            vec[(cl + m) % dims] += 0.01 * (m + 1)  # deterministic wobble
            rows.append((cl * 32 + m, f"cl{cl}", vec))
    emb = spark.createDataFrame(
        rows, "vec_id bigint, label string, embedding array<double>"
    )
    e = emb.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("e"))

    def recall_at_10(path, pid):
        probe = emb.filter(F.col("vec_id") == pid).first()["embedding"]
        res = ivf_search(spark, path, probe, k=10, nprobe=1)
        got = {r["vec_id"] for r in res.collect()}
        # exact top-10 ⊆ the probe's own cluster: within-cluster cosines
        # dwarf cross-cluster ones by construction, so recall is measured
        # against cluster membership
        cluster = pid // 32
        exact = set(range(cluster * 32, cluster * 32 + 32))
        return len(got & exact) / 10, res

    trained = train_centroids(e, k=4, seed=11)
    p_trained = str(tmp_path_factory.mktemp("ivf_crafted") / "trained")
    build_ivf_index(emb, p_trained, centroids=trained)
    p_fixed = str(tmp_path_factory.mktemp("ivf_crafted") / "fixed")
    build_ivf_index(emb, p_fixed)  # first-16 vectors: ALL from cluster 0

    probes = (0, 40, 70, 100)  # one per crafted cluster
    r_trained, r_fixed = [], []
    for pid in probes:
        rt, res = recall_at_10(p_trained, pid)
        r_trained.append(rt)
        rf, _ = recall_at_10(p_fixed, pid)
        r_fixed.append(rf)
    assert all(r == 1.0 for r in r_trained), r_trained  # perfect at nprobe=1
    assert sum(r_trained) > sum(r_fixed), (r_trained, r_fixed)
    # pruning holds on the trained layout too
    plan = executed_plan(res)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), plan[:800]


def test_knn_join_ivf_matches_exact_within_clusters(spark):
    """Crafted corpus where every true neighbor co-clusters with its probe:
    the IVF knn join must return exactly the exact knn join's answer (the
    approximation is lossless when neighbors never cross clusters); ranks
    and cosines must agree."""
    import math

    from temporalvault_spark.operators.similarity import knn_join, knn_join_ivf

    dim = 8
    rows = [(i, [float(i % dim == j) for j in range(dim)], 0) for i in range(16)]
    # per axis a in {0,1,2}: two tight satellites around the axis vector
    for a in range(3):
        for s in range(2):
            v = [0.0] * dim
            v[a] = 1.0
            v[(a + 4) % dim] = 0.03 + 0.01 * s  # tiny off-axis tilt
            n = math.sqrt(sum(x * x for x in v))
            rows.append((100 + 10 * a + s, [x / n for x in v], 1))
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    probes = emb.filter("vec_id >= 100")

    exact = {
        (r["probe_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in knn_join(emb, probes, k=3).collect()
    }
    ivf = {
        (r["probe_id"], r["rank"]): (r["neighbor_id"], r["cosine"])
        for r in knn_join_ivf(emb, probes, k=3, nprobe=2).collect()
    }
    # top-1 must always match (the satellite's twin / axis anchor co-cluster)
    for pid in (100, 101, 110, 111, 120, 121):
        assert ivf[(pid, 1)] == exact[(pid, 1)], (pid, ivf[(pid, 1)], exact[(pid, 1)])
    # every IVF hit must carry the exact cosine for that neighbor
    exact_by_neighbor = {
        (pk[0], v[0]): v[1] for pk, v in exact.items()
    }
    for (pid, _rank), (nid, cos) in ivf.items():
        if (pid, nid) in exact_by_neighbor:
            assert cos == exact_by_neighbor[(pid, nid)]


def test_append_to_ivf_index_searchable_and_consistent(spark, sf_dir, tmp_path_factory):
    """Appended vectors assign against the index's persisted centroids (not
    recomputed), land in the same partition layout, and become immediately
    searchable: an appended near-copy of the probe must rank first."""
    from temporalvault_spark.operators.ivf_index import append_to_ivf_index

    path = str(tmp_path_factory.mktemp("ivf_app") / "index")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    build_ivf_index(emb, path)
    n0 = spark.read.parquet(path).count()

    probe_row = emb.filter("vec_id = 0").first()
    probe = [float(x) for x in probe_row["embedding"]]
    twin = [x * 0.999 for x in probe]  # near-identical direction, new id
    batch = spark.createDataFrame(
        [(900000, twin, 9)], "vec_id bigint, embedding array<float>, label int"
    )
    append_to_ivf_index(batch, path)

    idx = spark.read.parquet(path)
    assert idx.count() == n0 + 1
    # the appended vector shares the probe's cluster (same centroid set)
    c_twin = idx.filter("vec_id = 900000").first()["centroid_id"]
    c_probe = idx.filter("vec_id = 0").first()["centroid_id"]
    assert c_twin == c_probe
    top = ivf_search(spark, path, probe, k=2, nprobe=4).collect()
    assert {r["vec_id"] for r in top} >= {900000}  # twin in the top-2


def test_knn_join_ivf_multiprobe_recall_on_boundary_vectors(spark):
    """The multi-probe contract (round-3 verdict #6): a true neighbor that
    lands JUST ACROSS a cluster boundary is invisible at nprobe=1 and found
    at nprobe=2, so recall@k strictly improves with nprobe and converges to
    the exact knn_join answer. Crafted 2-D geometry: centroids c0=0°,
    c1=90°; probe at 44° (nearest centroid c0); its true nearest neighbor v
    at 53° is assigned to c1 — exactly the boundary miss IVF's nprobe dial
    exists for."""
    import math

    from temporalvault_spark.operators.similarity import knn_join, knn_join_ivf

    def vec(deg):
        return [math.cos(math.radians(deg)), math.sin(math.radians(deg))]

    # ids 0..15 are the centroid seeds (centroid_frame takes the first 16):
    # c0 at 0°, c1 at 90°, the rest spread far away (150°..280°) so they
    # form inert single-member clusters
    rows = [(0, vec(0), 0), (1, vec(90), 0)]
    rows += [(i, vec(150 + 10 * i), 0) for i in range(2, 16)]
    rows += [(20, vec(53), 1),   # true NN of the probe, but lands in c1
             (21, vec(10), 1)]   # decoy in c0, further from the probe
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    probes = spark.createDataFrame(
        [(100, vec(44), 9)], "vec_id bigint, embedding array<double>, label int"
    )

    exact = [r["neighbor_id"] for r in knn_join(emb, probes, k=2).collect()]
    assert exact[0] == 20  # v is the true nearest neighbor

    def ivf_ids(nprobe):
        return {
            r["neighbor_id"]
            for r in knn_join_ivf(emb, probes, k=2, nprobe=nprobe).collect()
        }

    r1 = len(ivf_ids(1) & set(exact)) / 2
    r2 = len(ivf_ids(2) & set(exact)) / 2
    assert r1 < r2, (r1, r2)          # recall STRICTLY improves with nprobe
    assert 20 not in ivf_ids(1)       # the boundary miss at nprobe=1
    assert ivf_ids(2) == set(exact)   # nprobe=2 recovers the exact answer


def test_build_null_embedding_never_becomes_centroid(spark, tmp_path_factory):
    """ADVICE r4: a NULL embedding among vec_id < k must not be selected as
    a centroid (its similarity would be NULL against every vector) nor
    counted toward the adaptive k; NULL rows are excluded from the index
    entirely, matching build_ivfpq_index's pre-filter."""
    import math

    path = str(tmp_path_factory.mktemp("ivf_null") / "index")
    rows = [(0, None, 0)] + [
        (i, [math.cos(i / 7.0), math.sin(i / 7.0)], 0) for i in range(1, 40)
    ]
    emb = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )
    build_ivf_index(emb, path)

    cents = spark.read.parquet(f"{path}/_centroids").collect()
    assert all(r["ce"] is not None for r in cents)
    assert 0 not in {r["centroid_id"] for r in cents}

    idx = spark.read.parquet(path)
    assert idx.count() == 39  # NULL row excluded from the index
    probe = [math.cos(3 / 7.0), math.sin(3 / 7.0)]
    top = ivf_search(spark, path, probe, k=3, nprobe=4).collect()
    assert top and top[0]["vec_id"] == 3


# --- growth contract ----------------------------------------------------------


def _rand_emb(spark, n, dim=4, seed=7, start=0):
    import numpy as np

    rng = np.random.RandomState(seed)
    rows = [
        (start + i, [float(x) for x in rng.uniform(-1, 1, dim)], int(i % 3))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    )


def test_ivf_occupancy_fresh_index_not_grown(spark, tmp_path_factory):
    from temporalvault_spark.operators.ivf_index import ivf_index_occupancy

    path = str(tmp_path_factory.mktemp("ivf_occ") / "index")
    build_ivf_index(_rand_emb(spark, 200), path)
    rep = ivf_index_occupancy(spark, path)
    assert rep["k"] == 16 and rep["n_built"] == 200 and rep["n_vecs"] == 200
    assert rep["target_k"] == 16 and rep["grown"] is False
    assert rep["rows"] == 200 and rep["n_clusters_used"] <= 16
    assert rep["occupancy"] == 12.5  # 200 / 16


def test_ivf_rebuild_fires_on_size_drift_and_equals_fresh_build(
    spark, tmp_path_factory
):
    """Append 3x the build size: the default growth factor (2.0) trips,
    the retrain swaps in a fresh adaptive-k build, and the rebuilt index is
    row-identical (vec_id -> centroid_id) to a from-scratch build over the
    union — the value the rebuild oracle checks at corpus scale."""
    from temporalvault_spark.operators.ivf_index import (
        append_to_ivf_index,
        ivf_index_occupancy,
        rebuild_ivf_index_if_grown,
    )

    root = tmp_path_factory.mktemp("ivf_grow")
    path, fresh = str(root / "index"), str(root / "fresh")
    base = _rand_emb(spark, 100, seed=1)
    batch = _rand_emb(spark, 300, seed=2, start=100)
    build_ivf_index(base, path)
    append_to_ivf_index(batch, path)

    rep = ivf_index_occupancy(spark, path)
    assert rep["grown"] is True and rep["n_vecs"] == 400 and rep["n_built"] == 100

    out = rebuild_ivf_index_if_grown(spark, path)
    assert out["rebuilt"] is True
    # post-rebuild: meta reflects the union, contract is closed again
    rep2 = ivf_index_occupancy(spark, path)
    assert rep2["n_built"] == 400 and rep2["grown"] is False

    build_ivf_index(base.unionByName(batch), fresh)
    got = {
        (r["vec_id"], r["centroid_id"])
        for r in spark.read.parquet(path).select("vec_id", "centroid_id").collect()
    }
    want = {
        (r["vec_id"], r["centroid_id"])
        for r in spark.read.parquet(fresh).select("vec_id", "centroid_id").collect()
    }
    assert got == want and len(got) == 400


def test_ivf_rebuild_noop_below_dial(spark, tmp_path_factory):
    from temporalvault_spark.operators.ivf_index import (
        append_to_ivf_index,
        rebuild_ivf_index_if_grown,
    )

    path = str(tmp_path_factory.mktemp("ivf_noop") / "index")
    build_ivf_index(_rand_emb(spark, 200, seed=3), path)
    append_to_ivf_index(_rand_emb(spark, 20, seed=4, start=200), path)
    out = rebuild_ivf_index_if_grown(spark, path)  # 220 < 2.0 * 200
    assert out["rebuilt"] is False and out["grown"] is False
    assert out["n_vecs"] == 220 and out["n_built"] == 200


def test_ivf_rebuild_fires_on_adaptive_k_widening(spark, tmp_path_factory):
    """Grow the corpus past the k floor (adaptive_n_centroids: 6800 vectors
    -> k=17 > 16): the SECOND detector arm fires even under a growth factor
    too loose to trip, and the retrain widens the persisted centroid set."""
    from temporalvault_spark.operators.ivf_index import (
        _read_ivf_meta,
        append_to_ivf_index,
        rebuild_ivf_index_if_grown,
    )

    path = str(tmp_path_factory.mktemp("ivf_widen") / "index")
    build_ivf_index(_rand_emb(spark, 3500, seed=5), path)
    append_to_ivf_index(_rand_emb(spark, 3300, seed=6, start=3500), path)
    out = rebuild_ivf_index_if_grown(spark, path, growth_factor=10.0)
    assert out["rebuilt"] is True and out["target_k"] == 17
    k, n_built = _read_ivf_meta(spark, path)
    assert k == 17 and n_built == 6800


def test_semantic_decontam_indexed_prunes_partitions(spark, sf_dir):
    """The indexed semantic-decontamination probe must stay a
    partition-pruned scan — centroid_id IN (union of the benchmark suite's
    probed clusters) must reach the FileScan's PartitionFilters, and the
    flagged set must agree with the oracle-shaped recomputation (the
    cross-engine value hash covers values; this pins the PLAN)."""
    from temporalvault_spark.operators.ivf_index import (
        q_decontaminate_semantic_indexed,
    )

    res = q_decontaminate_semantic_indexed(spark, sf_dir)
    plan = executed_plan(res)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "centroid_id" in m.group(1), plan[:800]
    rows = res.collect()
    assert rows, "registered threshold must flag a nonzero set at every sf"
    assert all(r["max_cos"] >= 0.35 and r["n_bench_hits"] >= 1 for r in rows)
