"""Round-11 ADVICE closures on the band-index family's crash windows:

- ``atomic_swap_rebuild``'s two-rename swap has a crash window that leaves
  no index at ``path`` and the complete old index at ``path.old`` —
  ``adopt_swapped`` (adopt-on-read) must rename it back on the next touch,
  so probes and gates never read a mid-swap crash as "no index";
- a torn (present-but-unreadable) ``_meta`` must NOT be classified as the
  pre-sidecar legacy format, even when the bucket directories happen to be
  2 chars wide — absent and torn have different remedies;
- the streaming gates must refuse to cold-build when committed-batch
  markers prove an index existed — a vanished index fails loudly instead
  of silently restarting dedup coverage from one batch;
- ``_META_ROW_CACHE`` is bounded: one entry per live index path, not one
  per (path, mtime) forever.
"""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from temporalvault_spark.operators.index_common import (
    _META_ROW_CACHE,
    adopt_swapped,
    index_ready,
    meta_row,
)
from temporalvault_spark.operators.minhash_index import (
    build_minhash_index,
    query_minhash_index,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill in the afternoon sun near the garden"
)
NEAR = BASE.replace("quick", "cold")
FAR = "completely different content about spark query engines and shuffles at scale"


def _docs_df(spark, texts, id0=0):
    return spark.createDataFrame(
        [(id0 + i, t, "en", "s", len(t)) for i, t in enumerate(texts)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )


def _crash_mid_swap(path):
    """Reproduce atomic_swap_rebuild's crash window: the first rename ran
    (path -> path.old), the second never did."""
    os.rename(path, f"{path}.old")
    assert not os.path.exists(path) and os.path.isdir(f"{path}.old")


def test_adopt_swapped_recovers_mid_swap_crash(spark, tmp_path_factory):
    """After a crash between the swap's two renames, the next sidecar read
    adopts path.old back: index_ready stays True and probes return the
    exact pre-crash hits — the old silent-cold-rebuild path never fires."""
    path = str(tmp_path_factory.mktemp("adopt") / "idx")
    build_minhash_index(_docs_df(spark, [BASE, FAR]), path)
    before = {
        (r["query_doc"], r["index_doc"])
        for r in query_minhash_index(spark, path, _docs_df(spark, [NEAR], id0=100)).collect()
    }
    assert before == {(100, 0)}

    _crash_mid_swap(path)
    # index_ready (the gates' build-vs-append key) must self-heal, not
    # report "no index"
    assert index_ready(spark, path)
    assert os.path.isdir(path) and not os.path.exists(f"{path}.old")
    after = {
        (r["query_doc"], r["index_doc"])
        for r in query_minhash_index(spark, path, _docs_df(spark, [NEAR], id0=100)).collect()
    }
    assert after == before


def test_adopt_swapped_sweeps_stale_old_next_to_live_index(tmp_path):
    """A leftover path.old NEXT TO a live index (crash after the second
    rename, before the cleanup rmtree) must not be adopted — the new index
    won the swap — and must be REMOVED: left lingering, a later external
    deletion of the live index would silently resurrect the stale
    pre-rebuild index instead of tripping the gates' markers-without-index
    guard (review finding, round 11)."""
    live, old = str(tmp_path / "idx"), str(tmp_path / "idx.old")
    os.makedirs(live)
    os.makedirs(old)
    with open(f"{live}/marker", "w") as f:
        f.write("new")
    assert adopt_swapped(live) is False
    assert os.path.exists(f"{live}/marker")  # live index untouched
    assert not os.path.exists(old)  # crashed cleanup completed

    # and therefore: external deletion of the live index now fails loudly
    # at the next read instead of resurrecting the stale copy
    shutil.rmtree(live)
    assert adopt_swapped(live) is False and not os.path.exists(live)


def test_torn_meta_is_not_misread_as_legacy_width(spark, tmp_path_factory, monkeypatch):
    """A _meta that EXISTS but cannot be read (crash during the sidecar
    write) must raise even when the bucket dirs are 2 chars wide — the
    legacy fallback is only for a truly absent sidecar."""
    from temporalvault_spark.operators import minhash_index as mi

    monkeypatch.setattr(mi, "_bkt_chars_for", lambda n, wt=0: 2)  # legacy-looking dirs
    path = str(tmp_path_factory.mktemp("torn") / "idx")
    build_minhash_index(_docs_df(spark, [BASE, FAR]), path)

    # torn sidecar: the directory entry exists, but no committed parquet
    shutil.rmtree(f"{path}/_meta")
    os.makedirs(f"{path}/_meta/_temporary")
    with pytest.raises(ValueError, match="torn/partial sidecar"):
        query_minhash_index(spark, path, _docs_df(spark, [NEAR], id0=100))

    # truly ABSENT sidecar over 2-char dirs: the legacy fallback applies
    shutil.rmtree(f"{path}/_meta")
    hits = {
        (r["query_doc"], r["index_doc"])
        for r in query_minhash_index(spark, path, _docs_df(spark, [NEAR], id0=100)).collect()
    }
    assert hits == {(100, 0)}


def test_meta_row_cache_is_bounded_per_path(spark, tmp_path):
    """Rewriting _meta N times leaves ONE cache entry for the path (keyed
    path -> (mtime, row)), not N stale (path, mtime) entries."""
    path = str(tmp_path / "idx")
    meta = f"{path}/_meta"
    key = os.path.normpath(meta)
    for i in range(3):
        spark.range(0, 1, 1, 1).select(
            F.lit(i).cast("int").alias("bkt_chars"),
            F.lit(i).cast("bigint").alias("n_built"),
        ).write.mode("overwrite").parquet(meta)
        got = meta_row(spark, path)
        assert got["bkt_chars"] == i
    assert sum(1 for k in _META_ROW_CACHE if k == key) == 1


def test_gate_refuses_cold_build_when_markers_exist(spark, tmp_path):
    """_gate_index_ready: fresh gate (no markers) -> False (cold-build ok);
    live index -> True; markers present but index gone -> loud ValueError,
    never a silent single-batch restart."""
    from temporalvault_spark.streaming.jobs import _gate_index_ready

    idx, acc = str(tmp_path / "idx"), str(tmp_path / "acc")
    assert _gate_index_ready(spark, idx, acc) is False  # fresh gate

    build_minhash_index(_docs_df(spark, [BASE, FAR]), idx)
    assert _gate_index_ready(spark, idx, acc) is True

    os.makedirs(f"{acc}/_ingest_batches")
    with open(f"{acc}/_ingest_batches/0", "w") as f:
        f.write("committed")
    shutil.rmtree(idx)  # the index vanished outside any repairable window
    with pytest.raises(ValueError, match="committed-batch markers"):
        _gate_index_ready(spark, idx, acc)

    # but a mid-swap crash WITH markers is the repairable window: adopted
    build_minhash_index(_docs_df(spark, [BASE, FAR]), idx)
    _crash_mid_swap(idx)
    assert _gate_index_ready(spark, idx, acc) is True


def test_atomic_swap_retries_past_racing_adoption(tmp_path, monkeypatch):
    """A reader adopting path.old between the swap's two renames must not
    kill the rebuild: atomic_swap_rebuild re-parks the adopted directory
    and retries, converging with the NEW index at path and no leftovers."""
    import os as real_os

    from temporalvault_spark.operators import index_common

    path = str(tmp_path / "idx")
    os.makedirs(path)
    with open(f"{path}/marker", "w") as f:
        f.write("old")

    def build_to(tmp):
        os.makedirs(tmp)
        with open(f"{tmp}/marker", "w") as f:
            f.write("new")

    real_rename = real_os.rename
    raced = {"n": 0}

    def racing_rename(src, dst):
        # simulate a racing reader: just before the writer's FIRST attempt
        # at (tmp_new -> path), adopt path.old back into path
        if src == f"{path}.rebuild" and raced["n"] == 0:
            raced["n"] = 1
            real_rename(f"{path}.old", path)
        return real_rename(src, dst)

    monkeypatch.setattr(index_common.os, "rename", racing_rename)
    index_common.atomic_swap_rebuild(path, build_to)

    assert open(f"{path}/marker").read() == "new"
    assert not os.path.exists(f"{path}.old")
    assert not os.path.exists(f"{path}.rebuild")
    assert raced["n"] == 1  # the race actually fired
