"""The capstone multimodal ingest gate: one stream of full documents
(text + image + audio + video payloads), one verdict — ANY modality's
near-dup match rejects the row. Reuses the per-modality payload builders
from the sibling suites (the cross-suite import precedent)."""

import os

import numpy as np
import pytest

from temporalvault_spark.operators.multimodal import gif_encode_frames, png_encode_rgb
from tests.test_afp_index import _clip
from tests.test_vfp_index import VID_FRAMES, _flip, _frame_from_pattern


def _pat(seed):
    """A random-but-deterministic 64-bit pattern; distinct seeds sit ~32
    bits apart (whp far beyond every threshold)."""
    rng = np.random.RandomState(seed)
    return "".join(rng.choice(["0", "1"], 64))


def _img(pattern):
    return png_encode_rgb(_frame_from_pattern(pattern))


def _vid(pattern, flip=None):
    frames = [
        _frame_from_pattern(_flip(pattern, *flip) if flip else pattern)
        for _ in range(VID_FRAMES)
    ]
    return gif_encode_frames(frames)


def _text(seed, tweak=False):
    words = [f"w{seed}x{j}" for j in range(30)]
    if tweak:
        words[-1] = "zz"
    return " ".join(words)


_SCHEMA = "doc_id bigint, text string, image binary, audio binary, video binary"


def _row(i, text_seed, img_pat, aud_bits, vid_pat, **kw):
    return (
        i,
        kw.get("text", _text(text_seed)),
        kw.get("image", _img(img_pat)),
        kw.get("audio", _clip(aud_bits)),
        kw.get("video", _vid(vid_pat)),
    )


def test_multimodal_gate_any_modality_rejects(spark, tmp_path_factory):
    """Batch 2's rows each near-dup batch 1 in exactly ONE modality — every
    one is rejected by that modality; the all-novel row and a text-only
    (NULL payloads) row survive; a within-batch text pair keeps the lower
    id; markers make a replay idempotent."""
    from temporalvault_spark.streaming import multimodal_dedup_ingest_stream

    root = tmp_path_factory.mktemp("mm_gate")
    src, acc = str(root / "src"), str(root / "acc")
    paths = {k: str(root / f"idx_{k}") for k in ("text", "image", "audio", "video")}

    b1 = spark.createDataFrame(
        [_row(0, 0, _pat(10), _pat(20), _pat(30)), _row(1, 1, _pat(11), _pat(21), _pat(31))],
        _SCHEMA,
    )
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    multimodal_dedup_ingest_stream(stream, paths, acc, str(root / "ck1"))
    assert {r["doc_id"] for r in spark.read.parquet(acc).collect()} == {0, 1}

    b2 = spark.createDataFrame(
        [
            # text near-dups doc 0 (last word changed), everything else novel
            _row(100, 0, _pat(40), _pat(50), _pat(60), text=_text(0, tweak=True)),
            # image 1 bit from doc 0's
            _row(101, 101, _pat(10), _pat(51), _pat(61), image=_img(_flip(_pat(10), 7))),
            # audio 1 frame-bit from doc 0's
            _row(102, 102, _pat(42), _pat(20), _pat(62), audio=_clip(_flip(_pat(20), 9))),
            # video: every frame 1 bit from doc 0's pattern
            _row(103, 103, _pat(43), _pat(53), _pat(30), video=_vid(_pat(30), flip=(5,))),
            # novel in every modality
            _row(104, 104, _pat(44), _pat(54), _pat(64)),
            # text-only row (NULL binary payloads), novel text
            (105, _text(105), None, None, None),
            # within-batch text pair: 106 survives, 107 falls
            _row(106, 206, _pat(46), _pat(56), _pat(66)),
            _row(107, 207, _pat(47), _pat(57), _pat(67), text=_text(206, tweak=True)),
        ],
        _SCHEMA,
    )
    b2.write.mode("overwrite").parquet(f"{src}/b2.parquet")
    multimodal_dedup_ingest_stream(stream, paths, acc, str(root / "ck1"))
    got = {r["doc_id"] for r in spark.read.parquet(acc).collect()}
    assert got == {0, 1, 104, 105, 106}

    # replay with a fresh checkpoint: markers skip everything
    multimodal_dedup_ingest_stream(stream, paths, acc, str(root / "ck2"))
    assert {r["doc_id"] for r in spark.read.parquet(acc).collect()} == got


def test_multimodal_gate_marker_lost_replay_is_idempotent(spark, tmp_path_factory):
    """Pre-built base indexes + one batch; the marker vanishes after the
    appends landed — the replay rewrites its own ingest partitions in ALL
    FOUR indexes and the accepted corpus (no row growth anywhere)."""
    from temporalvault_spark.operators.afp_index import build_afp_index
    from temporalvault_spark.operators.audio_fp import afp_frame
    from temporalvault_spark.operators.minhash_index import build_minhash_index
    from temporalvault_spark.operators.phash import ahash_frame
    from temporalvault_spark.operators.phash_index import build_phash_index
    from temporalvault_spark.operators.vfp_index import _as_fid, build_vfp_index
    from temporalvault_spark.operators.videohash import vfp_frame
    from temporalvault_spark.streaming import multimodal_dedup_ingest_stream

    root = tmp_path_factory.mktemp("mm_crash")
    src, acc = str(root / "src"), str(root / "acc")
    paths = {k: str(root / f"idx_{k}") for k in ("text", "image", "audio", "video")}

    base = _row(1, 1, _pat(11), _pat(21), _pat(31))
    build_minhash_index(
        spark.createDataFrame([(1, base[1])], "doc_id bigint, text string"),
        paths["text"],
    )
    build_phash_index(
        ahash_frame(
            spark.createDataFrame([(1, base[2])], "img_id bigint, image binary")
        ),
        paths["image"],
    )
    build_afp_index(
        afp_frame(
            spark.createDataFrame([(1, base[3])], "aud_id bigint, audio binary")
        ),
        paths["audio"],
    )
    build_vfp_index(
        _as_fid(
            vfp_frame(
                spark.createDataFrame([(1, base[4])], "vid_id bigint, video binary")
            )
        ),
        paths["video"],
    )

    b1 = spark.createDataFrame(
        [
            _row(100, 100, _pat(80), _pat(81), _pat(82)),  # novel -> accepted
            _row(101, 1, _pat(83), _pat(84), _pat(85)),  # text-dups base doc 1
        ],
        _SCHEMA,
    )
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    multimodal_dedup_ingest_stream(stream, paths, acc, str(root / "ck1"))
    assert {r["doc_id"] for r in spark.read.parquet(acc).collect()} == {100}
    counts = {k: spark.read.parquet(p).count() for k, p in paths.items()}

    os.remove(f"{acc}/_ingest_batches/0")  # appends landed, marker lost
    multimodal_dedup_ingest_stream(stream, paths, acc, str(root / "ck2"))
    assert {r["doc_id"] for r in spark.read.parquet(acc).collect()} == {100}
    for k, p in paths.items():
        assert spark.read.parquet(p).count() == counts[k], k


def test_multimodal_gate_requires_all_index_paths(spark):
    from temporalvault_spark.streaming import multimodal_dedup_ingest_stream

    with pytest.raises(ValueError, match="index_paths missing"):
        multimodal_dedup_ingest_stream(None, {"text": "x"}, "a", "c")


def test_multimodal_gate_quarantines_corrupt_payloads(spark, tmp_path_factory):
    """One corrupt payload in ANY modality routes the whole document to the
    joint quarantine sink (neither survivor nor index row in any modality)
    instead of wedging the stream: corrupt image, corrupt audio, and
    corrupt video rows all quarantine; clean rows are unaffected; the
    quarantined ids appear in NO index and a marker replay is idempotent."""
    from temporalvault_spark.streaming import multimodal_dedup_ingest_stream

    root = tmp_path_factory.mktemp("mm_quar")
    src, acc = str(root / "src"), str(root / "acc")
    paths = {k: str(root / f"idx_{k}") for k in ("text", "image", "audio", "video")}
    garbage = bytearray(b"\x00corrupt-payload-bytes" * 4)

    b1 = spark.createDataFrame(
        [
            _row(0, 0, _pat(10), _pat(20), _pat(30)),
            _row(1, 1, _pat(11), _pat(21), _pat(31), image=garbage),
            _row(2, 2, _pat(12), _pat(22), _pat(32), audio=garbage),
            _row(3, 3, _pat(13), _pat(23), _pat(33), video=garbage),
            # clean doc whose IMAGE near-dups quarantined doc 2's healthy
            # image: a withdrawn document's healthy modalities must not
            # reject siblings (else the content survives NOWHERE — the
            # review-pass finding), so 4 must SURVIVE
            _row(4, 4, _pat(14), _pat(24), _pat(34), image=_img(_flip(_pat(12), 3))),
        ],
        _SCHEMA,
    )
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    multimodal_dedup_ingest_stream(stream, paths, acc, str(root / "ck1"))

    assert {r["doc_id"] for r in spark.read.parquet(acc).collect()} == {0, 4}
    quar = spark.read.parquet(f"{acc}/_quarantine")
    assert {r["doc_id"] for r in quar.collect()} == {1, 2, 3}
    # quarantined ids reached NO index (text index included: doc 1's text
    # was decodable, but its corrupt image quarantines the whole document)
    for k, id_col in (
        ("text", "doc_id"),
        ("image", "img_id"),
        ("audio", "aud_id"),
    ):
        got = {
            r[id_col] for r in spark.read.parquet(paths[k]).select(id_col).collect()
        }
        assert got == {0, 4}, f"{k} index holds {got}"
    # video index ids are frame-packed fids: survivors 0 and 4 only
    vid_fids = {
        r["fid"] for r in spark.read.parquet(paths["video"]).select("fid").collect()
    }
    assert vid_fids == set(range(VID_FRAMES)) | set(
        range(4 * VID_FRAMES, 5 * VID_FRAMES)
    )

    multimodal_dedup_ingest_stream(stream, paths, acc, str(root / "ck2"))
    assert spark.read.parquet(f"{acc}/_quarantine").count() == 3


def test_multimodal_gate_quality_tier(spark, tmp_path_factory):
    """quality_gate=True prepends the curation policy's first stage: a doc
    whose text fails the Gopher rules is rejected BEFORE dedup — not
    accepted, not indexed in any modality — and (the capstone's
    quality-survivor edge restriction) its healthy modalities cannot
    reject a later near-dup sibling; replays decide identically."""
    from temporalvault_spark.streaming import multimodal_dedup_ingest_stream

    root = tmp_path_factory.mktemp("mm_quality")
    src, acc = str(root / "src"), str(root / "acc")
    paths = {k: str(root / f"idx_{k}") for k in ("text", "image", "audio", "video")}

    b1 = spark.createDataFrame(
        [
            _row(0, 0, _pat(10), _pat(20), _pat(30)),
            # fails MIN_TOKENS (2 words << 30): quality-rejected
            _row(1, 1, _pat(11), _pat(21), _pat(31), text="too short"),
            # near-dups ONLY the quality-rejected doc's image: must survive
            _row(2, 2, _pat(12), _pat(22), _pat(32), image=_img(_flip(_pat(11), 5))),
        ],
        _SCHEMA,
    )
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    multimodal_dedup_ingest_stream(
        stream, paths, acc, str(root / "ck1"), quality_gate=True
    )

    assert {r["doc_id"] for r in spark.read.parquet(acc).collect()} == {0, 2}
    # the rejected doc reached NO index; quality rejection is not quarantine
    for k, id_col in (("text", "doc_id"), ("image", "img_id"), ("audio", "aud_id")):
        got = {
            r[id_col] for r in spark.read.parquet(paths[k]).select(id_col).collect()
        }
        assert got == {0, 2}, f"{k} index holds {got}"
    assert not os.path.isdir(f"{acc}/_quarantine")

    # a replayed clean run (fresh checkpoint, markers skip) changes nothing
    multimodal_dedup_ingest_stream(
        stream, paths, acc, str(root / "ck2"), quality_gate=True
    )
    assert {r["doc_id"] for r in spark.read.parquet(acc).collect()} == {0, 2}
