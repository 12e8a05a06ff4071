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
    with pytest.raises(Exception, match="NotImplementedError|real media codecs"):
        mm.decode_media(media).collect()


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
