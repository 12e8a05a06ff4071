"""Persisted audio-fingerprint band index + streaming audio gate: the audio
cell of the incremental-index family. The MECHANICS are band64_index
(shared with the image family and exhaustively tested in
tests/test_phash_index.py / test_index_recovery.py); these tests pin the
audio instantiation: kernel wiring, probe semantics, plan pruning, the
gate, and the growth contract's audio-keyed report."""

import os
import re

import pytest

from temporalvault_spark.operators.afp_index import (
    afp_index_occupancy,
    build_afp_index,
    query_afp_index,
    rebuild_afp_index_if_grown,
)
from temporalvault_spark.operators.audio_fp import (
    AFP_FRAMES,
    AFP_SAMPLES,
    afp_frame,
)
from temporalvault_spark.plans import executed_plan
from tests.test_audio_fp import _wav


def _clip(frame_bits, tweak=None):
    """A WAV whose envelope fingerprint IS frame_bits: loud frames for '1',
    silent for '0'. ``tweak``: (sample_idx, value) one-sample nudges."""
    flen = AFP_SAMPLES // AFP_FRAMES
    samples = []
    for b in frame_bits:
        samples += [20000, -20000] * (flen // 2) if b == "1" else [0] * flen
    if tweak:
        for i, v in tweak:
            samples[i] = v
    return _wav(samples)


BASE = "0" * 32 + "1" * 32
FAR = "10" * 32


def _flip(bits, *idx):
    out = list(bits)
    for i in idx:
        out[i] = "0" if out[i] == "1" else "1"
    return "".join(out)


def _auds(spark, rows):
    return spark.createDataFrame(rows, "aud_id bigint, audio binary")


def _hashes(spark, rows):
    return afp_frame(_auds(spark, rows)).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("afp_index") / "idx")
    build_afp_index(
        _hashes(
            spark,
            [
                (1, _clip(BASE)),
                (2, _clip(_flip(BASE, 3))),  # 1-frame variant of 1
                (3, _clip(FAR)),
            ],
        ),
        path,
    )
    return path


def test_probe_finds_near_dup_with_exact_hamming(spark, index_path):
    probe = _hashes(spark, [(100, _clip(_flip(BASE, 7)))])
    got = {
        (r["query_aud"], r["index_aud"]): r["hamming"]
        for r in query_afp_index(spark, index_path, probe).collect()
    }
    assert set(got) == {(100, 1), (100, 2)}
    assert got[(100, 1)] == 1 and got[(100, 2)] == 2


def test_probe_scan_is_partition_pruned(spark, index_path):
    probe = _hashes(spark, [(100, _clip(BASE))])
    df = query_afp_index(spark, index_path, probe)
    df.collect()
    plan = executed_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "band" in m.group(1) and "bkt" in m.group(1), plan[:1500]


def test_self_pairs_excluded(spark, index_path):
    probe = _hashes(spark, [(1, _clip(BASE))])
    got = {
        (r["query_aud"], r["index_aud"])
        for r in query_afp_index(spark, index_path, probe).collect()
    }
    assert (1, 1) not in got and (1, 2) in got


def test_growth_contract_occupancy_and_rebuild(spark, tmp_path_factory):
    """The audio family's growth contract: audio-keyed occupancy report
    (n_auds), rebuild at the fresh width, probes value-identical across
    the swap."""
    path = str(tmp_path_factory.mktemp("afp_grow") / "idx")
    clips = [(i, _clip(_flip(BASE, i, i + 16, i + 40))) for i in range(1, 9)]
    build_afp_index(_hashes(spark, clips[:2]), path)  # n=2 -> 2 chars
    build_afp_index(_hashes(spark, clips[2:]), path, append=True)

    rep = afp_index_occupancy(spark, path, wide_threshold=4)
    assert rep["bkt_chars"] == 2 and rep["n_built"] == 2 and rep["n_auds"] == 8
    assert rep["target_bkt_chars"] == 4 and rep["grown"]

    probe = _hashes(spark, [(100, _clip(BASE))])
    before = {
        (r["query_aud"], r["index_aud"]): r["hamming"]
        for r in query_afp_index(spark, path, probe).collect()
    }
    assert before

    assert rebuild_afp_index_if_grown(spark, path, wide_threshold=4)["rebuilt"]
    rep2 = afp_index_occupancy(spark, path, wide_threshold=4)
    assert rep2["bkt_chars"] == 4 and not rep2["grown"]
    after = {
        (r["query_aud"], r["index_aud"]): r["hamming"]
        for r in query_afp_index(spark, path, probe).collect()
    }
    assert after == before


def test_audio_dedup_ingest_stream_end_to_end(spark, tmp_path_factory):
    """Two micro-batches through the audio gate: cross-batch near-dup
    rejected, within-batch dup group keeps the lowest id, novel clip
    accepted and indexed (a later probe finds it); marker idempotency on
    replay with a fresh checkpoint."""
    from temporalvault_spark.streaming import audio_dedup_ingest_stream

    root = tmp_path_factory.mktemp("aud_ingest")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")

    third = "0" * 16 + "1" * 16 + "0" * 16 + "1" * 16  # far from BASE and FAR
    b1 = _auds(spark, [(0, _clip(BASE)), (1, _clip(FAR))])
    b2 = _auds(
        spark,
        [
            (100, _clip(_flip(BASE, 5))),        # cross-batch dup of 0
            (101, _clip(_flip(FAR, *range(0, 64, 2)))),  # novel
            (102, _clip(_flip(third, 9))),        # local pair with 103,
            (103, _clip(_flip(third, 9, 30))),    # keep 102
        ],
    )
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    audio_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    assert {r["aud_id"] for r in spark.read.parquet(acc).collect()} == {0, 1}

    b2.write.mode("overwrite").parquet(f"{src}/b2.parquet")
    audio_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    got = {r["aud_id"] for r in spark.read.parquet(acc).collect()}
    assert got == {0, 1, 101, 102}  # 100 cross-rejected; 103 within-batch

    probe = _hashes(spark, [(300, _clip(_flip(third, 9, 44)))])
    hits = query_afp_index(spark, idx, probe).collect()
    assert (300, 102) in {(r["query_aud"], r["index_aud"]) for r in hits}

    audio_dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))  # replay
    assert {r["aud_id"] for r in spark.read.parquet(acc).collect()} == got


def test_audio_ingest_crash_replay_does_not_grow_index(spark, tmp_path_factory):
    """Marker-lost crash replay rewrites its own ingest partitions: index
    and accepted-corpus row counts unchanged; a pre-built base index
    (bulk namespace ingest=-1) survives a batch-0 replay untouched."""
    from temporalvault_spark.operators.afp_index import _index_frame
    from temporalvault_spark.streaming import audio_dedup_ingest_stream

    root = tmp_path_factory.mktemp("aud_crash")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
    build_afp_index(_hashes(spark, [(1, _clip(BASE))]), idx)  # pre-built

    b1 = _auds(spark, [(100, _clip(_flip(BASE, 8))), (101, _clip(FAR))])
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    audio_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    assert {r["aud_id"] for r in spark.read.parquet(acc).collect()} == {101}
    n_idx = spark.read.parquet(idx).count()

    os.remove(f"{acc}/_ingest_batches/0")  # appends landed, marker lost
    audio_dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))
    assert {r["aud_id"] for r in spark.read.parquet(acc).collect()} == {101}
    assert spark.read.parquet(idx).count() == n_idx
    assert _index_frame(spark, idx).filter("ingest = -1").count() > 0
    probe = _hashes(spark, [(500, _clip(_flip(BASE, 44)))])
    hits = query_afp_index(spark, idx, probe).collect()
    assert (500, 1) in {(r["query_aud"], r["index_aud"]) for r in hits}


def test_compact_ingest_folds_batches_same_width(spark, tmp_path):
    """After streaming appends, compact_ingest folds every ingest layer
    into the bulk namespace at the SAME key width: probes value-identical,
    one ingest layer, row count unchanged (ids unique across appends)."""
    import os as _os

    from temporalvault_spark.operators.afp_index import (
        _index_frame,
        compact_afp_index,
    )

    path = str(tmp_path / "idx")
    build_afp_index(_hashes(spark, [(1, _clip(BASE)), (2, _clip(FAR))]), path)
    build_afp_index(
        _hashes(spark, [(10, _clip(_flip(BASE, 3)))]), path,
        append=True, ingest_id=0,
    )
    build_afp_index(
        _hashes(spark, [(11, _clip(_flip(FAR, 7)))]), path,
        append=True, ingest_id=1,
    )
    probe = _hashes(spark, [(100, _clip(BASE))])
    before = {
        (r["query_aud"], r["index_aud"]): r["hamming"]
        for r in query_afp_index(spark, path, probe).collect()
    }
    n_rows = _index_frame(spark, path).count()
    meta_mtime = _os.stat(f"{path}/_meta").st_mtime_ns

    rep = compact_afp_index(spark, path)
    assert rep["compacted"] and rep["n_ingest_layers"] == 3

    idx = _index_frame(spark, path)
    assert idx.select("ingest").distinct().count() == 1
    assert idx.filter("ingest = -1").count() == n_rows
    after = {
        (r["query_aud"], r["index_aud"]): r["hamming"]
        for r in query_afp_index(spark, path, probe).collect()
    }
    assert after == before and (100, 1) in after and (100, 10) in after
    # width preserved (the compaction is NOT a widening rebuild), meta
    # rewritten (new build) — and a second compact is a no-op
    assert _os.stat(f"{path}/_meta").st_mtime_ns != meta_mtime
    assert compact_afp_index(spark, path)["compacted"] is False
