"""Persisted video-fingerprint band index + streaming video gate: the video
cell of the incremental-index family. The MECHANICS are band64_index
(shared, exhaustively tested via the image/audio families); these tests pin
the video instantiation: fid packing, the same-position VOTING verdict on
top of the frame-level probe, plan pruning, the gate, and the growth
contract's frame-keyed report."""

import os
import re

import numpy as np
import pytest

from temporalvault_spark.operators.multimodal import gif_encode_frames
from temporalvault_spark.operators.vfp_index import (
    _as_fid,
    build_vfp_index,
    query_vfp_index,
    rebuild_vfp_index_if_grown,
    vfp_index_occupancy,
)
from temporalvault_spark.operators.videohash import (
    VID_FRAMES,
    VID_SIDE,
    vfp_frame,
)
from temporalvault_spark.plans import executed_plan

BASE = "0" * 32 + "1" * 32
FAR = "10" * 32
THIRD = "0" * 16 + "1" * 16 + "0" * 16 + "1" * 16


def _flip(bits, *idx):
    out = list(bits)
    for i in idx:
        out[i] = "0" if out[i] == "1" else "1"
    return "".join(out)


def _frame_from_pattern(bits):
    """A 16x16 gray frame whose aHash IS ``bits``: 2x2 pixel blocks set to
    255 for '1', 0 for '0' (mixed patterns only — the block mean separates
    cleanly)."""
    g = np.zeros((VID_SIDE, VID_SIDE), np.uint8)
    for k, b in enumerate(bits):
        if b == "1":
            by, bx = divmod(k, 8)
            g[by * 2 : by * 2 + 2, bx * 2 : bx * 2 + 2] = 255
    return np.stack([g, g, g], axis=2)


def _gif(pattern, per_frame_flip=None):
    """A VID_FRAMES-frame GIF where every frame hashes to ``pattern``;
    ``per_frame_flip``: {frame_idx: (bit, ...)} flips bits of single
    frames (each flipped block moves per-frame Hamming by 1)."""
    frames = []
    for f in range(VID_FRAMES):
        bits = pattern
        if per_frame_flip and f in per_frame_flip:
            bits = _flip(pattern, *per_frame_flip[f])
        frames.append(_frame_from_pattern(bits))
    return gif_encode_frames(frames)


def _vids(spark, rows):
    return spark.createDataFrame(rows, "vid_id bigint, video binary")


def _fps(spark, rows):
    return vfp_frame(_vids(spark, rows)).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("vfp_index") / "idx")
    build_vfp_index(
        _as_fid(
            _fps(
                spark,
                [
                    (1, _gif(BASE)),
                    (2, _gif(BASE, {f: (f,) for f in range(VID_FRAMES)})),
                    (3, _gif(FAR)),
                ],
            )
        ),
        path,
    )
    return path


def test_probe_votes_same_position_matches(spark, index_path):
    """A variant of video 1 (one block flipped per frame) matches 1 and 2
    at every position; the FAR video never appears."""
    probe = _fps(spark, [(100, _gif(BASE, {f: (63 - f,) for f in range(VID_FRAMES)}))])
    got = {
        (r["query_vid"], r["index_vid"]): r["n_frames_matched"]
        for r in query_vfp_index(spark, index_path, probe).collect()
    }
    assert got == {(100, 1): VID_FRAMES, (100, 2): VID_FRAMES}


def test_probe_below_min_frames_is_no_verdict(spark, index_path):
    """Only 3 of 6 positions near video 1 (the rest far) — under the
    4-position vote, no verdict."""
    # frames 0-2 match BASE; frames 3-5 are flipped 20 bits away
    probe = _fps(
        spark,
        [(200, _gif(BASE, {f: tuple(range(0, 40, 2)) for f in range(3, VID_FRAMES)}))],
    )
    assert query_vfp_index(spark, index_path, probe).count() == 0


def test_probe_scan_is_partition_pruned(spark, index_path):
    probe = _fps(spark, [(100, _gif(BASE))])
    from temporalvault_spark.operators.vfp_index import _FAMILY

    fpairs = _FAMILY.query(spark, index_path, _as_fid(probe), 12)
    fpairs.collect()
    plan = executed_plan(fpairs)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "band" in m.group(1) and "bkt" in m.group(1), plan[:1500]


def test_growth_contract_frame_keyed(spark, tmp_path_factory):
    """Occupancy reports n_frames (the indexed unit); rebuild at the fresh
    width leaves probe verdicts value-identical."""
    path = str(tmp_path_factory.mktemp("vfp_grow") / "idx")
    vids = [(i, _gif(BASE, {f: (i, i + 20) for f in range(VID_FRAMES)})) for i in range(1, 9)]
    build_vfp_index(_as_fid(_fps(spark, vids[:2])), path)  # 12 frames
    build_vfp_index(_as_fid(_fps(spark, vids[2:])), path, append=True)

    rep = vfp_index_occupancy(spark, path, wide_threshold=20)
    assert rep["bkt_chars"] == 2 and rep["n_frames"] == 8 * VID_FRAMES
    assert rep["target_bkt_chars"] == 4 and rep["grown"]

    probe = _fps(spark, [(100, _gif(BASE))])
    before = {
        (r["query_vid"], r["index_vid"]): r["n_frames_matched"]
        for r in query_vfp_index(spark, path, probe).collect()
    }
    assert before

    assert rebuild_vfp_index_if_grown(spark, path, wide_threshold=20)["rebuilt"]
    rep2 = vfp_index_occupancy(spark, path, wide_threshold=20)
    assert rep2["bkt_chars"] == 4 and not rep2["grown"]
    after = {
        (r["query_vid"], r["index_vid"]): r["n_frames_matched"]
        for r in query_vfp_index(spark, path, probe).collect()
    }
    assert after == before


def test_video_dedup_ingest_stream_end_to_end(spark, tmp_path_factory):
    """Two micro-batches through the video gate: cross-batch near-dup
    rejected by the vote, within-batch pair keeps the lowest id, novel
    video accepted and indexed (a later probe finds it); marker
    idempotency on replay with a fresh checkpoint."""
    from temporalvault_spark.streaming import video_dedup_ingest_stream

    root = tmp_path_factory.mktemp("vid_ingest")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")

    b1 = _vids(spark, [(0, _gif(BASE)), (1, _gif(FAR))])
    b2 = _vids(
        spark,
        [
            (100, _gif(BASE, {f: (f,) for f in range(VID_FRAMES)})),  # dup of 0
            (101, _gif(_flip(FAR, *range(1, 41, 2)))),  # novel
            (102, _gif(THIRD, {0: (9,)})),  # local pair with 103, keep 102
            (103, _gif(THIRD, {0: (9,), 1: (30,)})),
        ],
    )
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    video_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    assert {r["vid_id"] for r in spark.read.parquet(acc).collect()} == {0, 1}

    b2.write.mode("overwrite").parquet(f"{src}/b2.parquet")
    video_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    got = {r["vid_id"] for r in spark.read.parquet(acc).collect()}
    assert got == {0, 1, 101, 102}  # 100 cross-rejected; 103 within-batch

    probe = _fps(spark, [(300, _gif(THIRD, {0: (9,), 2: (44,)}))])
    hits = query_vfp_index(spark, idx, probe).collect()
    assert (300, 102) in {(r["query_vid"], r["index_vid"]) for r in hits}

    video_dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))  # replay
    assert {r["vid_id"] for r in spark.read.parquet(acc).collect()} == got


def test_video_ingest_crash_replay_does_not_grow_index(spark, tmp_path_factory):
    """Marker-lost crash replay rewrites its own ingest partitions: index
    and accepted-corpus row counts unchanged; a pre-built base index (bulk
    namespace ingest=-1) survives a batch-0 replay untouched."""
    from temporalvault_spark.operators.vfp_index import _index_frame
    from temporalvault_spark.streaming import video_dedup_ingest_stream

    root = tmp_path_factory.mktemp("vid_crash")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
    build_vfp_index(_as_fid(_fps(spark, [(1, _gif(BASE))])), idx)

    b1 = _vids(
        spark,
        [
            (100, _gif(BASE, {f: (8,) for f in range(VID_FRAMES)})),  # dup of 1
            (101, _gif(FAR)),  # novel
        ],
    )
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    video_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    assert {r["vid_id"] for r in spark.read.parquet(acc).collect()} == {101}
    n_idx = spark.read.parquet(idx).count()

    os.remove(f"{acc}/_ingest_batches/0")  # appends landed, marker lost
    video_dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))
    assert {r["vid_id"] for r in spark.read.parquet(acc).collect()} == {101}
    assert spark.read.parquet(idx).count() == n_idx
    assert _index_frame(spark, idx).filter("ingest = -1").count() > 0
    probe = _fps(spark, [(500, _gif(BASE, {f: (44,) for f in range(VID_FRAMES)}))])
    hits = query_vfp_index(spark, idx, probe).collect()
    assert (500, 1) in {(r["query_vid"], r["index_vid"]) for r in hits}


def test_as_fid_drops_quarantine_rows(spark):
    """vfp_frame quarantine rows (frame_idx = -1) never reach the index:
    their packed fid would collide with the previous video's last frame
    (vid*6 - 1 == (vid-1)*6 + 5) — the review-pass finding."""
    fps = spark.createDataFrame(
        [(5, -1, None), (4, 5, "01" * 32)],
        "vid_id bigint, frame_idx int, hash64 string",
    )
    rows = _as_fid(fps).collect()
    assert [(r["fid"], r["hash64"]) for r in rows] == [(29, "01" * 32)]


def test_video_gate_quarantines_corrupt_payload(spark, tmp_path_factory):
    """A corrupt container in a micro-batch must not wedge the stream in an
    infinite batch-replay loop (errors='raise' would fail the batch, the
    replay hits the same payload, forever): the gate decodes with
    errors='quarantine', routes the corrupt row to {acc}/_quarantine, and
    the corrupt id is neither a survivor nor an index row. A replay with a
    fresh checkpoint is idempotent for the quarantine sink too."""
    from temporalvault_spark.streaming import video_dedup_ingest_stream

    root = tmp_path_factory.mktemp("vid_quar")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")

    b1 = _vids(
        spark,
        [
            (0, _gif(BASE)),
            (1, bytearray(b"\x00not-a-gif-container" * 4)),  # corrupt
            (2, _gif(FAR)),
        ],
    )
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    video_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))

    assert {r["vid_id"] for r in spark.read.parquet(acc).collect()} == {0, 2}
    quar = spark.read.parquet(f"{acc}/_quarantine")
    assert {r["vid_id"] for r in quar.collect()} == {1}
    # the corrupt id never reached the index (fid packs vid_id * VID_FRAMES)
    assert (
        spark.read.parquet(idx)
        .filter(f"CAST(floor(fid / {VID_FRAMES}) AS BIGINT) = 1")
        .count()
        == 0
    )

    # marker replay: nothing grows, including the quarantine sink
    video_dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))
    assert spark.read.parquet(f"{acc}/_quarantine").count() == 1


def test_video_gate_clean_replay_clears_stale_quarantine(spark, tmp_path_factory):
    """Quarantine decisions are environment-dependent (optional decode
    adapters): a marker-lost replay that now decodes a payload cleanly must
    CLEAR the stale quarantine partition its previous run left — else the
    row sits in both the accepted corpus and the quarantine sink. Simulated
    by planting a stale partition for a clean batch and replaying."""
    from temporalvault_spark.streaming import video_dedup_ingest_stream

    root = tmp_path_factory.mktemp("vid_stale_quar")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
    b1 = _vids(spark, [(0, _gif(BASE))])
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    video_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    assert {r["vid_id"] for r in spark.read.parquet(acc).collect()} == {0}

    # as if a previous (adapter-less) environment had quarantined vid 0
    stale = f"{acc}/_quarantine/ingest_batch=0"
    os.makedirs(stale, exist_ok=True)
    with open(f"{stale}/part-stale.txt", "w") as f:
        f.write("stale")
    os.remove(f"{acc}/_ingest_batches/0")  # marker lost -> batch replays

    video_dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))
    assert not os.path.exists(stale)
    assert {r["vid_id"] for r in spark.read.parquet(acc).collect()} == {0}
