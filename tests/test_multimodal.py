"""Multimodal plumbing tests: real Spark schemas/batching, stubbed codecs."""

import pytest
from pyspark.sql import functions as F

from temporalvault_spark.operators import multimodal as mm


@pytest.fixture(scope="module")
def media(spark):
    # synthesize binary payloads (documents.text bytes) — the payload is
    # opaque to the engine, which is the point
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kinds.alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(F.lit("source"), F.col("source")).alias("meta"),
    )


def test_decode_requires_explicit_fake(spark, media):
    # this sandbox has no Pillow/soundfile, so the real-codec tier must fail
    # loudly with the install hint, never fall back silently
    with pytest.raises(Exception, match="NotImplementedError|Pillow|soundfile"):
        mm.decode_media(media).collect()


def test_decode_kernel_injection(spark, media):
    """Tier 2: a caller-supplied kernel ships to the workers inside the task
    closure and replaces the codec — the seam a real PIL/ffmpeg deployment
    (or a test) plugs into."""

    def kernel(payload: bytes, kind: str) -> dict:
        return {
            "width": 7,
            "height": 9,
            "n_frames": 1,
            "sample_rate": 0,
            "n_bytes": len(payload),
        }

    rows = mm.decode_media(media, kernel=kernel).collect()
    assert len(rows) == 30
    assert all(r["width"] == 7 and r["height"] == 9 for r in rows)
    assert all(r["n_bytes"] > 0 for r in rows)

    resized = mm.resize_images(
        media,
        max_side=10,
        kernel=lambda p, m: {"width": m, "height": m, "payload": p[:4]},
    ).collect()
    assert resized and all(r["width"] == 10 and bytes(r["payload"]) for r in resized)


def test_decode_schema_and_determinism(spark, media):
    out = mm.decode_media(media, fake=True)
    assert out.columns == ["media_id", "kind", "width", "height", "n_frames", "sample_rate", "n_bytes"]
    rows1 = sorted(tuple(r) for r in out.collect())
    rows2 = sorted(tuple(r) for r in mm.decode_media(media, fake=True).collect())
    assert rows1 == rows2 and len(rows1) == 30
    audio = [r for r in rows1 if r[1] == "audio"]
    assert all(r[5] == 16000 and r[2] == 0 for r in audio)


def test_feature_extraction_unit_norm(spark, media):
    out = mm.extract_features(media, dim=16, fake=True).collect()
    assert len(out) == 30
    for r in out:
        assert len(r["feature"]) == 16
        assert abs(sum(x * x for x in r["feature"]) - 1.0) < 1e-5


def test_frame_sampling_explodes_videos_only(spark, media):
    frames = mm.sample_frames(media, every_n=30, fake=True)
    rows = frames.collect()
    video_ids = {r["media_id"] for r in media.filter(F.col("kind") == "video").collect()}
    assert {r["media_id"] for r in rows} <= video_ids
    assert all(r["frame_idx"] % 30 == 0 for r in rows)
    assert all(len(bytes(r["frame_payload"])) == 16 for r in rows)


def test_resize_respects_max_side_and_aspect(spark, media):
    out = mm.resize_images(media, max_side=100, fake=True).collect()
    images = media.filter(F.col("kind") == "image").count()
    assert len(out) == images > 0
    for r in out:
        assert max(r["width"], r["height"]) <= 100
        assert r["width"] > 0 and r["height"] > 0
        assert len(bytes(r["payload"])) == 16
