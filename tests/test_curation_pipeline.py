"""End-to-end corpus-curation scenario: the REAL operators chained the way
a training-data pipeline composes them — dedup → quality filter → budget
selection → split — with the cross-stage invariants asserted. Each stage is
individually oracle-checked; this suite pins that their CONTRACTS compose
(ids survive joins, stages only ever shrink the corpus, the budget holds
over the surviving set, splits stay disjoint and stable)."""

import pytest
from pyspark.sql import functions as F

from temporalvault_spark.operators.corpus import (
    dedup_apply,
    gopher_quality,
    sample_weighted_k,
    select_to_token_budget,
    split_train_val_test,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_curation_chain_invariants(spark, docs):
    n0 = docs.count()

    # stage 1: exact dedup — keep lowest-id copy per normalized text
    kept = dedup_apply(docs)
    n1 = kept.count()
    assert 0 < n1 <= n0
    survivors = docs.join(kept.select("doc_id"), "doc_id", "semi")
    assert survivors.count() == n1  # every kept id exists exactly once

    # stage 2: gopher quality filter over the deduped corpus
    gq = gopher_quality(survivors)
    n2 = gq.filter("keep").count()
    assert 0 < n2 <= n1
    quality = survivors.join(
        gq.filter("keep").select("doc_id"), "doc_id", "semi"
    )

    # stage 3: token-budget selection over the quality corpus
    sel = select_to_token_budget(quality, budget=5_000)
    tot = sel.agg(F.sum("n_tok").alias("s")).first()["s"] or 0
    assert tot <= 5_000  # the budget is a hard ceiling
    n3 = sel.count()
    assert 0 < n3 <= n2
    # selection is a subset of its input
    assert sel.join(quality.select("doc_id"), "doc_id", "left_anti").count() == 0

    # stage 4: split assignment over the selected set — disjoint and total
    chosen = quality.join(sel.select("doc_id"), "doc_id", "semi")
    sp = split_train_val_test(chosen)
    assert sp.count() == n3
    assert sp.select("doc_id").distinct().count() == n3  # one split per doc
    names = {r["split"] for r in sp.select("split").distinct().collect()}
    assert names <= {"train", "val", "test"}

    # stability: a doc's split never depends on what else survived —
    # the full-corpus assignment restricted to the chosen set is identical
    sp_full = split_train_val_test(docs).join(sel.select("doc_id"), "doc_id", "semi")
    a = {(r["doc_id"], r["split"]) for r in sp.collect()}
    b = {(r["doc_id"], r["split"]) for r in sp_full.collect()}
    assert a == b


def test_curation_chain_is_deterministic(spark, docs):
    """Two full runs of the chained pipeline select byte-identical sets —
    the reproducibility property every stage individually promises must
    survive composition."""
    def run():
        kept = dedup_apply(docs)
        quality = docs.join(kept.select("doc_id"), "doc_id", "semi")
        gq = gopher_quality(quality).filter("keep").select("doc_id")
        q = quality.join(gq, "doc_id", "semi")
        sel = select_to_token_budget(q, budget=5_000)
        return {(r["doc_id"], r["w"], r["n_tok"]) for r in sel.collect()}

    assert run() == run()


def test_weighted_sample_respects_upstream_dedup(spark, docs):
    """Sampling AFTER dedup never resurrects a dropped duplicate."""
    kept = dedup_apply(docs)
    deduped = docs.join(kept.select("doc_id"), "doc_id", "semi")
    samp = sample_weighted_k(deduped, k=50)
    assert samp.count() == min(50, deduped.count())
    dropped = docs.join(kept.select("doc_id"), "doc_id", "left_anti")
    assert samp.join(dropped.select("doc_id"), "doc_id", "semi").count() == 0


def test_embed_curate_composition_consistency(spark, sf_dir):
    """The embedding capstone's output must be exactly consistent with its
    independently-computed stage frames: every sampled vector is a
    training-side SemDeDup keeper, none is contamination-flagged, clusters
    cap at CLUSTER_SAMPLE_K, and a surviving cluster with >= K survivors
    yields exactly K rows (the ticket window neither over- nor
    under-draws)."""
    from temporalvault_spark.operators.curation import q_embed_curate_end_to_end
    from temporalvault_spark.operators.similarity import (
        CLUSTER_SAMPLE_K,
        SEMDECON_BENCH_VECS,
        _emb,
        centroid_frame,
        semantic_contamination,
        semdedup_verdicts,
    )

    out = q_embed_curate_end_to_end(spark, sf_dir).collect()
    assert out, "capstone returned no rows"
    got = {r["vec_id"] for r in out}
    assert all(v >= SEMDECON_BENCH_VECS for v in got)

    emb = _emb(spark, sf_dir)
    e = emb.select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
    verdicts = semdedup_verdicts(emb).collect()
    keep = {r["vec_id"] for r in verdicts if r["keep"]}
    cluster_of = {r["vec_id"]: r["centroid_id"] for r in verdicts}
    contam = {
        r["vec_id"]
        for r in semantic_contamination(
            e.filter(F.col("vec_id") >= SEMDECON_BENCH_VECS),
            e.filter(F.col("vec_id") < SEMDECON_BENCH_VECS),
            centroid_frame(e),
        )
        .filter("contaminated")
        .collect()
    }
    assert got <= keep
    assert not (got & contam)
    # the output's cluster_id is the SemDeDup assignment's
    assert all(cluster_of[r["vec_id"]] == r["cluster_id"] for r in out)

    # per-cluster counts: capped at K, and exactly K where survivors allow
    surv_per_cluster: dict[int, int] = {}
    for v in keep:
        if v >= SEMDECON_BENCH_VECS and v not in contam:
            c = cluster_of[v]
            surv_per_cluster[c] = surv_per_cluster.get(c, 0) + 1
    out_per_cluster: dict[int, int] = {}
    for r in out:
        out_per_cluster[r["cluster_id"]] = out_per_cluster.get(r["cluster_id"], 0) + 1
    for c, n_surv in surv_per_cluster.items():
        assert out_per_cluster.get(c, 0) == min(n_surv, CLUSTER_SAMPLE_K)
