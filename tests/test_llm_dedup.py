"""Near-dup operators must actually FIND near-duplicates: crafted corpora
with known duplicate pairs (the testdata has none, so oracle parity alone
can't prove recall)."""

import pytest

from temporalvault_spark.operators.llm import ngram_jaccard_pairs

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun near the garden"
)
# one token changed; shingle jaccard = 0.833, and the pair collides in
# bands 0/2/3 of the salted scheme (verified offline), so blocking finds it
NEAR = BASE.replace("quick", "cold")
FAR = "completely different content about spark query engines and shuffles at scale"


@pytest.fixture()
def crafted(spark):
    # doc 0/1: near-dups; doc 2: exact dup of 0; doc 3: unrelated
    return spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate([BASE, NEAR, BASE, FAR])],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def test_jaccard_finds_crafted_dups(spark, crafted):
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(crafted).collect()}
    assert got[(0, 2)] == 1.0  # exact dup
    assert (0, 1) in got and 0.6 <= got[(0, 1)] < 1.0  # near-dup caught
    assert not any(3 in pair for pair in got)  # unrelated never paired


def test_embedding_cosine_finds_crafted_dups(spark):
    """Near-identical vectors land in the same IVF cluster and must be paired;
    orthogonal vectors must not."""
    import math

    from temporalvault_spark.operators.similarity import embedding_cosine_pairs

    dim = 8
    base = [1.0] + [0.0] * (dim - 1)
    near = [0.99] + [math.sqrt(1 - 0.99**2)] + [0.0] * (dim - 2)
    # diagonal between two axes: cosine 0.707 with every centroid (< 0.9),
    # so it joins a cluster but pairs with nothing
    ortho = [0.0, 2 ** -0.5, 2 ** -0.5] + [0.0] * (dim - 3)
    # vec_ids 0..15 are centroids by contract; put the probes above that range
    rows = [(i, [float(i % dim == j) for j in range(dim)], 0) for i in range(16)]
    rows += [(100, base, 1), (101, near, 1), (102, ortho, 1)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    got = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in embedding_cosine_pairs(emb, 0.9).collect()}
    assert (100, 101) in got and got[(100, 101)] >= 0.98
    assert not any(102 in p for p in got)


def test_jaccard_multi_band_beats_single_band_recall(spark):
    """A genuine near-dup pair (jaccard 0.667) whose band-0 min-hashes differ
    but whose band-1/3 min-hashes collide (verified offline with the same
    md5(band:shingle) scheme): a single band MISSES it, the default 4 bands
    FIND it — the 1-(1-j)^b recall win multi-band banding exists for."""
    a = "w37 w36 w40 w12 w23 w6 w35 w45 w4 w36 w3 w39"
    b = "w37 w36 w40 w12 w23 w6 w35 w45 w4 w36 w31 w39"
    df = spark.createDataFrame(
        [(0, a, "en", "s", len(a)), (1, b, "en", "s", len(b))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    assert ngram_jaccard_pairs(df, n_bands=1).count() == 0  # band-0 min differs
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(df).collect()}
    assert (0, 1) in got and got[(0, 1)] == pytest.approx(2 / 3, abs=1e-6)


def test_jaccard_candidate_shuffle_carries_no_shingle_arrays(spark, crafted):
    """The scale contract: after AQE's final planning, NO shuffle exchange
    carries the shingle arrays — candidates travel as (doc_id, n_sh, band,
    min_h), and the arrays re-attach to the semi-join-reduced candidate docs
    via broadcasts."""
    from temporalvault_spark.plans import shuffle_inputs

    df = ngram_jaccard_pairs(crafted)
    df.collect()  # materialize so the plan reflects AQE's final join choices
    shuffles = shuffle_inputs(df)
    assert shuffles, "expected at least the banded candidate shuffle"
    for cols in shuffles:
        assert "shingles" not in cols, f"shingle array rides a shuffle: {cols}"


def test_connected_components_crafted_graph(spark):
    """Exact components on a known graph: {1,2,3} chained, {10,11}, isolated
    nodes absent (only nodes appearing in edges get labels)."""
    from temporalvault_spark.operators.dedup_cluster import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (3, 7)], "src bigint, dst bigint"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 1, 10: 10, 11: 10}


def test_dedup_components_groups_transitively(spark, crafted):
    """doc0==doc2 exactly and doc1 near-dups doc0 -> one component {0,1,2};
    doc3 unrelated -> not present (no edges)."""
    from temporalvault_spark.operators.dedup_cluster import connected_components
    from temporalvault_spark.operators.llm import ngram_jaccard_pairs
    import pyspark.sql.functions as F

    pairs = ngram_jaccard_pairs(crafted).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    comps = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert comps == {0: 0, 1: 0, 2: 0}
