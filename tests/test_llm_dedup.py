"""Near-dup operators must actually FIND near-duplicates: crafted corpora
with known duplicate pairs (the testdata has none, so oracle parity alone
can't prove recall)."""

import pytest

from temporalvault_spark.operators.llm import ngram_jaccard_pairs

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun near the garden"
)
# one token changed such that the min-md5 shingle is preserved (verified:
# md5('near the garden') stays minimal), so the single-band block still
# collides; shingle jaccard = 0.833
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


def test_jaccard_single_band_recall_miss_is_possible(spark):
    """Documents whose minimum shingle differs are NOT candidates — the
    documented single-band recall trade-off (multi-band = dedup_minhash)."""
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "iota kappa lambda mu nu xi omicron pi"  # disjoint: jaccard 0
    df = spark.createDataFrame(
        [(0, a, "en", "s", len(a)), (1, b, "en", "s", len(b))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    assert ngram_jaccard_pairs(df).count() == 0


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
