"""Persisted MinHash band index: build-once / query-batch near-dup detection
with directory-level pruning (the incremental twin of ngram_jaccard_pairs)."""

import os
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


def test_dedup_ingest_stream_end_to_end(spark, tmp_path_factory):
    """Streaming incremental-dedup gate over two micro-batches:
    batch 1 seeds the corpus+index; batch 2's cross-batch near-dup is
    rejected, its within-batch dup group keeps only the lowest id, its
    novel doc is accepted and indexed. A replay with a fresh checkpoint
    (same batch ids) must be a no-op (marker idempotency)."""
    from temporalvault_spark.streaming import dedup_ingest_stream

    root = tmp_path_factory.mktemp("dedup_ingest")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
    schema = "doc_id bigint, text string, lang string, source string, n_chars bigint"

    b2_base = (
        "observing elephants requires patience since wild herds wander across "
        "open savanna daily seeking water shade and fresh grass before dusk"
    )
    batch1 = _docs_df(spark, [BASE, FAR])                      # ids 0, 1
    batch2 = spark.createDataFrame(
        [
            (100, NEAR, "en", "s", 1),                          # cross-batch dup of 0
            (101, NOVEL, "en", "s", 1),                         # novel -> accepted
            (102, b2_base, "en", "s", 1),                       # within-batch pair,
            (103, b2_base.replace("patience", "stamina"), "en", "s", 1),  # keep 102
        ],
        schema,
    )

    batch1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(batch1.schema).parquet(f"{src}/*.parquet")
    dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    assert {r["doc_id"] for r in spark.read.parquet(acc).collect()} == {0, 1}

    batch2.write.mode("overwrite").parquet(f"{src}/b2.parquet")
    dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    got = {r["doc_id"] for r in spark.read.parquet(acc).collect()}
    assert got == {0, 1, 101, 102}  # 100 rejected cross-batch, 103 within-batch

    # later batches dedup against batch-2 survivors too: 102 is indexed now
    probe = _docs_df(spark, [b2_base.replace("daily", "nightly")], id0=300)
    from temporalvault_spark.operators.minhash_index import query_minhash_index

    hits = query_minhash_index(spark, idx, probe).collect()
    assert {(r["query_doc"], r["index_doc"]) for r in hits} == {(300, 102)}

    # replay idempotency: fresh checkpoint -> same batch ids -> markers skip
    dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))
    assert {r["doc_id"] for r in spark.read.parquet(acc).collect()} == got


def test_dedup_ingest_crash_window_replay_is_idempotent(spark, tmp_path_factory):
    """Crash BETWEEN the appends and the marker write: the replay must not
    double rows. The accepted corpus heals via dynamic partition overwrite
    (a replayed batch rewrites its own ingest_batch partition) combined
    with index self-dedup (the replayed docs near-dup their own indexed
    copies, so survivors are empty); the query path stays duplicate-free
    via the signature doc_id dedup guard."""
    from temporalvault_spark.streaming import dedup_ingest_stream

    root = tmp_path_factory.mktemp("dedup_crash")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
    batch1 = _docs_df(spark, [BASE, FAR])
    batch1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(batch1.schema).parquet(f"{src}/*.parquet")

    dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    import os

    marker = f"{acc}/_ingest_batches/0"
    assert os.path.exists(marker)
    os.remove(marker)  # simulate: appends landed, marker write lost

    dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))  # replay batch 0
    rows = spark.read.parquet(acc).collect()
    assert sorted(r["doc_id"] for r in rows) == [0, 1]  # no duplicate rows
    assert os.path.exists(marker)  # marker restored by the replay

    # query path: exactly one pair for a near-dup probe, never duplicates
    probe = _docs_df(spark, [NEAR], id0=500)
    hits = query_minhash_index(spark, idx, probe).collect()
    assert [(r["query_doc"], r["index_doc"]) for r in hits] == [(500, 0)]


def test_pre_meta_index_readable_via_bkt_chars_fallback(spark, tmp_path_factory, monkeypatch):
    """An index persisted by pre-sidecar code (fixed 2-char buckets, no
    _meta directory) must stay readable: _read_bkt_chars falls back to
    bkt_chars=2 instead of dying in a parquet AnalysisException. Simulated
    by building with a forced 2-char width, then deleting _meta."""
    import os
    import shutil

    from temporalvault_spark.operators import minhash_index as mi

    monkeypatch.setattr(mi, "_bkt_chars_for", lambda n, wt=0: 2)  # the old format
    corpus = _docs_df(spark, [BASE, FAR])
    path = str(tmp_path_factory.mktemp("mh_premeta") / "idx")
    build_minhash_index(corpus, path)
    with_meta = {
        (r["query_doc"], r["index_doc"]): r["jaccard"]
        for r in query_minhash_index(spark, path, _docs_df(spark, [NEAR], id0=100)).collect()
    }
    shutil.rmtree(f"{path}/_meta")
    assert not os.path.exists(f"{path}/_meta")
    no_meta = {
        (r["query_doc"], r["index_doc"]): r["jaccard"]
        for r in query_minhash_index(spark, path, _docs_df(spark, [NEAR], id0=100)).collect()
    }
    assert no_meta == with_meta and (100, 0) in no_meta


def test_build_and_probe_with_pre_staged_signatures(spark, tmp_path_factory):
    """The signatures= short-circuit (one md5 pass per session) must be
    value-identical to the self-computed path on both the build and probe
    sides."""
    from temporalvault_spark.operators.llm import shingle_signatures

    corpus = _docs_df(spark, [BASE, FAR])
    batch = _docs_df(spark, [NEAR, NOVEL], id0=100)
    root = tmp_path_factory.mktemp("mh_sig")

    # the staged-artifact shape: signatures round-tripped through parquet
    sig_all = str(root / "sigs")
    shingle_signatures(corpus.unionByName(batch)).write.parquet(sig_all)
    sigs = spark.read.parquet(sig_all)

    p_plain, p_staged = str(root / "idx_plain"), str(root / "idx_staged")
    build_minhash_index(corpus, p_plain)
    build_minhash_index(corpus, p_staged, signatures=sigs.filter("doc_id < 100"))

    plain = {
        (r["query_doc"], r["index_doc"]): r["jaccard"]
        for r in query_minhash_index(spark, p_plain, batch).collect()
    }
    staged = {
        (r["query_doc"], r["index_doc"]): r["jaccard"]
        for r in query_minhash_index(
            spark, p_staged, batch, signatures=sigs.filter("doc_id >= 100")
        ).collect()
    }
    assert staged == plain and (100, 0) in staged


def test_corrupted_meta_raises(spark, tmp_path_factory):
    """A persisted bkt_chars outside [1, MIN_H_CHARS] (hand-edited /
    future-format index) would make every probe's substring keys match
    zero partitions — must raise, not silently find nothing."""
    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("mh_badmeta") / "idx")
    build_minhash_index(_docs_df(spark, [BASE, FAR]), path)
    spark.range(0, 1, 1, 1).select(
        F.lit(9).cast("int").alias("bkt_chars"),  # > MIN_H_CHARS: invalid
        F.lit(2).cast("bigint").alias("n_built"),
    ).write.mode("overwrite").parquet(f"{path}/_meta")
    with pytest.raises(ValueError, match="invalid _meta"):
        query_minhash_index(spark, path, _docs_df(spark, [NEAR], id0=100))


def test_growth_contract_occupancy_and_rebuild(spark, tmp_path_factory):
    """The minhash side of the r9-verdict growth contract: grow a 1-char
    index past a lowered widening threshold, see the occupancy probe flag
    it, rebuild from the _signatures sidecar (no fresh md5 pass) at 2-char
    keys via atomic sibling swap, and verify probes are value-identical
    across the swap with the wider partition pruning in effect."""
    from temporalvault_spark.operators.minhash_index import (
        _read_meta_full,
        minhash_index_occupancy,
        rebuild_minhash_index_if_grown,
    )

    path = str(tmp_path_factory.mktemp("mh_grow") / "idx")
    seeds = [f"{BASE} variation token{i} extra{i} more{i}" for i in range(6)]
    build_minhash_index(_docs_df(spark, seeds[:2]), path)  # n=2 -> 1 char
    build_minhash_index(_docs_df(spark, seeds[2:], id0=10), path, append=True)

    rep = minhash_index_occupancy(spark, path, wide_threshold=4)
    assert rep["bkt_chars"] == 1 and rep["n_built"] == 2 and rep["n_docs"] == 6
    assert rep["target_bkt_chars"] == 2 and rep["grown"]

    probe = _docs_df(spark, [NEAR], id0=100)
    before = {
        (r["query_doc"], r["index_doc"]): r["jaccard"]
        for r in query_minhash_index(spark, path, probe).collect()
    }
    assert before  # NEAR pairs with the BASE variants

    res = rebuild_minhash_index_if_grown(spark, path, wide_threshold=4)
    assert res["rebuilt"]
    bkt_chars, n_built = _read_meta_full(spark, path)
    assert bkt_chars == 2 and n_built == 6
    assert not minhash_index_occupancy(spark, path, wide_threshold=4)["grown"]

    after = {
        (r["query_doc"], r["index_doc"]): r["jaccard"]
        for r in query_minhash_index(spark, path, probe).collect()
    }
    assert after == before

    # no-op on a second call; post-rebuild append derives the NEW keys
    assert not rebuild_minhash_index_if_grown(spark, path, wide_threshold=4)["rebuilt"]
    build_minhash_index(_docs_df(spark, [BASE], id0=50), path, append=True)
    got = {
        (r["query_doc"], r["index_doc"])
        for r in query_minhash_index(spark, path, probe).collect()
    }
    assert (100, 50) in got


def test_crash_replay_does_not_grow_index(spark, tmp_path_factory):
    """Marker-lost crash replay must leave sketch and signature sidecars at
    the same row counts — the ingest partition layer rewrites instead of
    appending. (Batch 2 is the interesting case: its replay takes the
    APPEND path against a live index.)"""
    import os

    from temporalvault_spark.streaming import dedup_ingest_stream

    root = tmp_path_factory.mktemp("mh_crash_rows")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
    b1 = _docs_df(spark, [BASE, FAR])
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))

    _docs_df(spark, [NOVEL, NEAR], id0=100).write.mode("overwrite").parquet(
        f"{src}/b2.parquet"
    )
    dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    n_idx = spark.read.parquet(idx).count()
    n_sig = spark.read.parquet(f"{idx}/_signatures").count()
    accepted = {r["doc_id"] for r in spark.read.parquet(acc).collect()}
    assert 100 in accepted and 101 not in accepted  # NEAR rejected vs BASE

    os.remove(f"{acc}/_ingest_batches/1")  # batch-2 appends landed, marker lost
    dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))  # replay
    assert spark.read.parquet(idx).count() == n_idx
    assert spark.read.parquet(f"{idx}/_signatures").count() == n_sig
    assert {r["doc_id"] for r in spark.read.parquet(acc).collect()} == accepted


def test_first_batch_torn_build_self_repairs(spark, tmp_path_factory):
    """Crash inside the FIRST batch's index build after _signatures landed
    but before _meta (and the marker): the replay must key existence on
    _meta — the LAST artifact written — and run a full rebuild, not wedge
    on the append path's torn-write raise (the round-10 review's finding)."""
    import shutil as _sh

    from temporalvault_spark.streaming import dedup_ingest_stream

    root = tmp_path_factory.mktemp("mh_torn_gate")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
    b1 = _docs_df(spark, [BASE, FAR])
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))

    # simulate the torn first-batch build: signatures exist, _meta lost,
    # marker lost (crash before both)
    _sh.rmtree(f"{idx}/_meta")
    os.remove(f"{acc}/_ingest_batches/0")

    dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))  # must not raise
    assert {r["doc_id"] for r in spark.read.parquet(acc).collect()} == {0, 1}
    assert os.path.exists(f"{idx}/_meta")  # rebuilt
    hits = query_minhash_index(spark, idx, _docs_df(spark, [NEAR], id0=500)).collect()
    assert [(r["query_doc"], r["index_doc"]) for r in hits] == [(500, 0)]
