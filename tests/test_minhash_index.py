"""Persisted MinHash band index: build-once / query-batch near-dup detection
with directory-level pruning (the incremental twin of ngram_jaccard_pairs)."""

import re

import pytest

from temporalvault_spark.operators.llm import ngram_jaccard_pairs
from temporalvault_spark.operators.minhash_index import (
    build_minhash_index,
    query_minhash_index,
)
from temporalvault_spark.plans import executed_plan

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun near the garden"
)
NEAR = BASE.replace("quick", "cold")
FAR = "completely different content about spark query engines and shuffles at scale"
NOVEL = "a brand new document mentioning topics nothing in the corpus covers today"


def _docs_df(spark, texts, id0=0):
    return spark.createDataFrame(
        [(id0 + i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    corpus = _docs_df(spark, [BASE, FAR, "another unrelated corpus member entirely here now"])
    path = str(tmp_path_factory.mktemp("mh_index") / "idx")
    build_minhash_index(corpus, path)
    return path


def test_query_finds_near_dup_with_exact_jaccard(spark, index_path):
    """The NEAR batch doc must pair with the indexed BASE doc, and the
    jaccard must equal the in-memory operator's value for the same pair."""
    batch = _docs_df(spark, [NEAR, NOVEL], id0=100)
    got = {
        (r["query_doc"], r["index_doc"]): r["jaccard"]
        for r in query_minhash_index(spark, index_path, batch).collect()
    }
    assert (100, 0) in got
    both = _docs_df(spark, [BASE, NEAR])
    expected = {
        (r["doc_a"], r["doc_b"]): r["jaccard"] for r in ngram_jaccard_pairs(both).collect()
    }[(0, 1)]
    assert got[(100, 0)] == expected
    # the novel doc pairs with nothing
    assert not any(q == 101 for q, _ in got)


def test_query_scan_is_partition_pruned(spark, index_path):
    """The index scan must carry PartitionFilters on (band, bkt) — the proof
    that a batch probe reads only its own band-bucket directories."""
    batch = _docs_df(spark, [NEAR], id0=100)
    df = query_minhash_index(spark, index_path, batch)
    df.collect()
    plan = executed_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "band" in m.group(1) and "bkt" in m.group(1), plan[:1500]


def test_empty_batch_returns_empty(spark, index_path):
    batch = _docs_df(spark, ["xx yy"], id0=200)  # < 3 tokens -> no shingles
    assert query_minhash_index(spark, index_path, batch).count() == 0
