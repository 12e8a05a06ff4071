"""Round-13 dimension gate (round-12 verdict task 1): the embedding tier's
per-dimension sums — PCA mean + power rounds (pca_power_top), the Lloyd
mean update (kmeans_lloyd), ABTT's three centered dots (abtt_topk) — exist
in two independently-written forms: UNROLLED (dim column expressions) and
FOLD (zip_with/aggregate folds + posexplode partial aggregates).

The fold form is the default (DIM_UNROLL_MAX = 0) because it is both
scale-safe — O(dim) expression nodes cross Janino's 64KB method limit at
production dims (768–1536) — AND measured faster at every dim including
the testdata's 64 (SCALE.md round 13). The unrolled form is kept as the
differential twin; these tests prove the two paths are interchangeable at
the module's quantization contract: identical REGISTERED-QUERY output at
the oracled dim (64) and identical results at dim 512 — the differential
unit the round-12 verdict asked for.

Note on exactness: the two paths differ in low-bit summation order
(_tree_sum pairwise vs ascending-j folds), so these exact-equality
assertions hold because the pinned seeds/testdata land no value within a
summation-order ULP of a half-microunit rounding boundary — deterministic
today; if a reseed ever fails here by one unit in the 6th decimal, that
boundary is the cause, not an implementation regression (r13 review note).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from temporalvault_spark.operators import similarity as sim

FORCE_UNROLL = 1 << 20  # gate above any test dim -> unrolled path


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "qname",
    [
        "embed_pca_power",
        "embed_abtt_topk",
        "cluster_kmeans_lloyd",
        "corpus_cluster_sample",  # the 4th riding query (r13 pass 3)
    ],
)
def test_dim64_unrolled_twin_matches_default_fold_output(
    spark, sf_dir, qname, monkeypatch
):
    """At the oracled dim (64) the fold path is the default and is
    hash-checked against DuckDB every round; forcing the unrolled twin must
    reproduce the exact same registered-query rows (rounded/quantized
    values — the same tolerance contract that makes DuckDB parity hold)."""
    q = entrymod.queries()[qname]
    fold = _rows(q(spark, sf_dir))
    monkeypatch.setattr(sim, "DIM_UNROLL_MAX", FORCE_UNROLL)
    unrolled = _rows(q(spark, sf_dir))
    assert fold == unrolled


def _emb_frame(spark, n=80, dim=512, seed=13):
    rng = np.random.RandomState(seed)
    rows = [
        (i, [float(x) for x in rng.uniform(-1, 1, dim)], int(i % 3))
        for i in range(n)
    ]
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>, label int"
    ).select("vec_id", "label", F.col("embedding").alias("e"))


def test_dim512_pca_paths_agree(spark, monkeypatch):
    """dim 512: the default fold path vs the forced unrolled twin must land
    the same eigenvector/eigenvalue/mean to well past the micro-unit (the
    last-ULP summation-order difference the module's quantization is built
    to absorb)."""
    e = _emb_frame(spark).select("vec_id", "e")
    v_fold, lam_fold, n_fold, m_fold = sim.pca_power_top(e)
    monkeypatch.setattr(sim, "DIM_UNROLL_MAX", FORCE_UNROLL)
    v_unr, lam_unr, n_unr, m_unr = sim.pca_power_top(e)
    assert n_fold == n_unr == 80
    assert abs(lam_fold - lam_unr) <= 1e-9 * max(1.0, abs(lam_unr))
    assert max(abs(a - b) for a, b in zip(m_fold, m_unr)) < 1e-9
    assert max(abs(a - b) for a, b in zip(v_fold, v_unr)) < 1e-8


def test_dim512_kmeans_paths_agree(spark, monkeypatch):
    """The Lloyd update quantizes means to the micro-unit between rounds on
    BOTH paths, so the exploded-aggregate path and the unrolled path feed
    the next argmax identical centroids — assignments and final centroids
    must match exactly."""
    e = _emb_frame(spark)
    a_fold, c_fold = sim.kmeans_lloyd(e, k=4, iters=2)
    asg_fold = _rows(a_fold.select("vec_id", "centroid_id"))
    cents_fold = {
        int(r["centroid_id"]): list(r["ce"]) for r in c_fold.collect()
    }
    monkeypatch.setattr(sim, "DIM_UNROLL_MAX", FORCE_UNROLL)
    a_unr, c_unr = sim.kmeans_lloyd(e, k=4, iters=2)
    assert _rows(a_unr.select("vec_id", "centroid_id")) == asg_fold
    cents_unr = {int(r["centroid_id"]): list(r["ce"]) for r in c_unr.collect()}
    assert cents_unr.keys() == cents_fold.keys()
    for cid in cents_fold:
        assert cents_unr[cid] == cents_fold[cid], f"centroid {cid} drifted"


def test_dim512_abtt_paths_agree(spark, monkeypatch):
    """ABTT's fold path accumulates the three centered dots in ascending-j
    order while the unrolled twin sums pairwise (_tree_sum); at dim 512 the
    top-k rows (rounded cosines — the query's own output contract) must be
    identical under the module's quantization."""
    e = _emb_frame(spark).select("vec_id", "e")
    fold = _rows(sim.abtt_topk(e, probe_vec_id=0, k=10))
    monkeypatch.setattr(sim, "DIM_UNROLL_MAX", FORCE_UNROLL)
    unrolled = _rows(sim.abtt_topk(e, probe_vec_id=0, k=10))
    assert fold == unrolled and len(fold) == 10


def test_dim512_mean_vector_null_rows_twin_equal(spark, monkeypatch):
    """Round-13 review closure: a frame with NULL vectors must yield the
    SAME (m, n) from both gated paths — the fold path counts the FRAME
    (posexplode drops NULL arrays), matching the unrolled COUNT(*)."""
    e = _emb_frame(spark, n=20).select("vec_id", "e")
    with_null = e.unionByName(
        spark.createDataFrame(
            [(999, None)], "vec_id bigint, e array<double>"
        )
    )
    m_fold, n_fold = sim._mean_vector(with_null, 512)
    monkeypatch.setattr(sim, "DIM_UNROLL_MAX", FORCE_UNROLL)
    m_unr, n_unr = sim._mean_vector(with_null, 512)
    assert n_fold == n_unr == 21  # the NULL row counts in both
    assert max(abs(a - b) for a, b in zip(m_fold, m_unr)) < 1e-12


def test_local_centroid_assign_matches_broadcast_assign(spark):
    """Round-14 optimization pin: kmeans_lloyd's literal-centroid assign
    (assign_to_local_centroids — centroids shipped as a literal expression,
    no per-round createDataFrame → agg → broadcast-build job) must produce
    the EXACT assignment of the broadcast-frame form on the real corpus,
    and its driver-side cn (_py_norm, the same left-to-right fold as _dot)
    must equal the engine-folded cn bit-for-bit."""
    from temporalvault_spark.catalog import load_catalog

    sf = "/root/testdata/sf0.001"
    load_catalog(spark, sf)
    e = sim._emb(spark, sf).select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cents = e.filter(F.col("vec_id") < sim.KMEANS_K).select(
        F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")
    )
    cent_local = {
        int(r["centroid_id"]): [float(x) for x in r["ce"]] for r in cents.collect()
    }
    # cn bit-equality: driver fold == engine fold, per centroid
    engine_cn = {
        int(r["centroid_id"]): r["cn"]
        for r in cents.withColumn("cn", sim._norm(F.col("ce"))).collect()
    }
    for cid, vec in cent_local.items():
        assert sim._py_norm(vec) == engine_cn[cid], f"cn drifted for {cid}"
    # full-assignment equality on every corpus row
    cents_df = spark.createDataFrame(
        sorted(cent_local.items()), "centroid_id bigint, ce array<double>"
    )
    bcast = _rows(sim.assign_to_centroids(e, cents_df).select("vec_id", "centroid_id"))
    lit = _rows(
        sim.assign_to_local_centroids(e, cent_local).select("vec_id", "centroid_id")
    )
    assert bcast == lit and len(bcast) > 0
