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


def _png(w, h):
    import struct
    import zlib

    def chunk(tag, data):
        c = tag + data
        return struct.pack(">I", len(data)) + c + struct.pack(">I", zlib.crc32(c))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + b"\x10\x20\x30" * w for _ in range(h))
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _jpeg(w, h):
    import struct

    # SOI, APP0 stub, DQT stub, SOF0 with dims, EOI — a valid marker walk
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def _gif(w, h):
    import struct

    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 20


def _bmp(w, h):
    import struct

    # 14-byte file header, then BITMAPINFOHEADER (size field = 40)
    return (
        b"BM" + b"\x00" * 12 + struct.pack("<I", 40)
        + struct.pack("<ii", w, -h) + b"\x00" * 20
    )


def _ppm(w, h, px=b"\x01\x02\x03"):
    return b"P6\n# a comment\n%d %d\n255\n" % (w, h) + px * (w * h)


def _wav(n_frames, rate):
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"\x00\x01" * n_frames)
    return buf.getvalue()


def test_real_decode_stdlib_headers_end_to_end(spark):
    """The tier-3a REAL paths — container-header dims for PNG/GIF/BMP/JPEG/
    PPM and wave-module WAV — run end-to-end through the Spark mapInPandas
    operator in THIS sandbox (no PIL/soundfile): crafted payloads with
    known ground-truth metadata decode exactly."""
    payloads = [
        (1, "image", _png(640, 360), (640, 360, 0)),
        (2, "image", _jpeg(123, 45), (123, 45, 0)),
        (3, "image", _gif(77, 33), (77, 33, 0)),
        (4, "image", _bmp(50, 20), (50, 20, 0)),  # top-down BMP: negative h
        (5, "image", _ppm(6, 4), (6, 4, 0)),
        (6, "audio", _wav(8000, 16000), (0, 0, 16000)),
    ]
    df = spark.createDataFrame(
        [(m, k, p, {}) for m, k, p, _ in payloads], mm.MEDIA_SCHEMA
    )
    got = {r["media_id"]: r for r in mm.decode_media(df).collect()}
    for m, _k, p, (w, h, sr) in payloads:
        r = got[m]
        assert (r["width"], r["height"], r["sample_rate"]) == (w, h, sr), r
        assert r["n_bytes"] == len(p)
    assert got[6]["n_frames"] == 8000  # WAV frame count is real


def test_real_decode_unknown_container_still_raises(spark):
    """A payload matching no stdlib container must still fail loudly toward
    the library tier (no silent fake fallback)."""
    df = spark.createDataFrame(
        [(1, "image", b"\x00\x01notaformat", {})], mm.MEDIA_SCHEMA
    )
    with pytest.raises(Exception, match="Pillow|NotImplementedError"):
        mm.decode_media(df).collect()


def test_real_ppm_resize_numpy_pixels(spark):
    """Tier-3a pixel path: binary-PPM nearest-neighbor resize runs fully in
    numpy, end-to-end through resize_images, and the output payload is
    itself a valid PPM with the expected downscaled pixels."""
    px = bytes(range(4 * 2 * 3))  # 4x2 RGB, every byte distinct
    payload = b"P6\n4 2\n255\n" + px
    df = spark.createDataFrame([(1, "image", payload, {})], mm.MEDIA_SCHEMA)
    rows = mm.resize_images(df, max_side=2).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["width"], r["height"]) == (2, 1)
    out = bytes(r["payload"])
    assert out.startswith(b"P6\n2 1\n255\n")
    body = out[len(b"P6\n2 1\n255\n"):]
    import numpy as np

    img = np.frombuffer(px, dtype=np.uint8).reshape(2, 4, 3)
    expect = img[[0]][:, [0, 2]].tobytes()  # nearest-neighbor rows/cols
    assert body == expect


def test_real_gif_frame_count_block_walk(spark):
    """GIF frame counting walks the block structure: a crafted 2-frame
    animation (with a graphics-control extension and per-frame LZW
    sub-blocks whose DATA bytes contain 0x2C decoys) counts exactly 2."""
    import struct

    def frame(x=0, y=0, w=2, h=2):
        desc = b"\x2c" + struct.pack("<HHHH", x, y, w, h) + b"\x00"
        # LZW min code size + one data sub-block containing 0x2C decoy bytes
        return desc + b"\x02" + bytes([3, 0x2C, 0x2C, 0x2C]) + b"\x00"

    gce = b"\x21\xf9" + bytes([4, 0, 0, 0, 0]) + b"\x00"
    payload = (
        b"GIF89a"
        + struct.pack("<HH", 2, 2)
        + b"\x00\x00\x00"  # no global color table
        + gce + frame() + gce + frame()
        + b"\x3b"
    )
    df = spark.createDataFrame([(1, "image", payload, {})], mm.MEDIA_SCHEMA)
    r = mm.decode_media(df).collect()[0]
    assert (r["width"], r["height"], r["n_frames"]) == (2, 2, 2)


def test_real_features_ppm_histogram_and_wav_bands(spark):
    """Tier-3a REAL features, end-to-end through extract_features: a
    uniform-gray PPM's luminance histogram is a one-hot on the bin holding
    its gray level; a pure-tone WAV's FFT band energies peak in the band
    containing the tone's frequency. Both unit-norm."""
    import math
    import struct

    import numpy as np

    gray = bytes([128, 128, 128])  # luma 128 -> bin 8 of 16
    ppm = b"P6\n4 4\n255\n" + gray * 16

    import io
    import wave

    rate, n = 8000, 2048
    tone = [int(12000 * math.sin(2 * math.pi * 1100 * t / rate)) for t in range(n)]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(struct.pack(f"<{n}h", *tone))
    wav = buf.getvalue()

    df = spark.createDataFrame(
        [(1, "image", ppm, {}), (2, "audio", wav, {})], mm.MEDIA_SCHEMA
    )
    got = {r["media_id"]: np.array(r["feature"]) for r in mm.extract_features(df).collect()}
    img = got[1]
    assert img.argmax() == 8 and abs(float(np.linalg.norm(img)) - 1.0) < 1e-5
    assert img[8] > 0.99  # one-hot: every pixel shares one luminance bin
    aud = got[2]
    # 1.1 kHz tone on an 8 kHz-rate signal: spectrum spans 0..4 kHz over 16
    # bands of ~250 Hz -> energy peaks in band 4 (bin 281 of 1025)
    assert aud.argmax() == 4 and abs(float(np.linalg.norm(aud)) - 1.0) < 1e-5


def test_real_features_unknown_container_raises(spark):
    df = spark.createDataFrame([(1, "image", b"\x00opaque", {})], mm.MEDIA_SCHEMA)
    with pytest.raises(Exception, match="PPM|WAV|NotImplementedError"):
        mm.extract_features(df).collect()


def test_end_to_end_media_pipeline_all_real(spark):
    """The full media pipeline — decode -> resize -> features -> cosine
    neighbors — with every kernel REAL (no fake tier): corpus text bytes
    are rendered as valid 8x8 P6 images (deterministic, no codec needed),
    then header-decoded, numpy-resized to 4x4, histogram-featurized, and
    matched by cosine. A byte-identical duplicate document must land an
    exact-similarity top-1 neighbor; features must be unit-norm and
    deterministic across runs."""
    import numpy as np

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").filter(
        "text IS NOT NULL"
    ).limit(10)
    # duplicate doc 0's payload under a new id: its top neighbor must be it
    from pyspark.sql import functions as F

    pixels = F.expr(
        "substring(rpad(encode(text, 'utf-8'), 192, X'20'), 1, 192)"
    )  # 8*8*3 bytes, space-padded
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("kind"),
        F.concat(F.lit(b"P6\n8 8\n255\n"), pixels).alias("payload"),
        F.create_map().alias("meta"),
    )
    min_id = media.agg(F.min("media_id")).first()[0]
    dup = media.filter(F.col("media_id") == min_id).select(
        (F.col("media_id") + 1_000_000).alias("media_id"), "kind", "payload", "meta"
    )
    media = media.unionByName(dup)

    decoded = mm.decode_media(media)  # real header parse
    assert {(r["width"], r["height"]) for r in decoded.collect()} == {(8, 8)}

    resized = mm.resize_images(media, max_side=4)  # real numpy path
    assert {(r["width"], r["height"]) for r in resized.collect()} == {(4, 4)}

    feats = mm.extract_features(
        resized.select("media_id", F.lit("image").alias("kind"), "payload")
    )
    rows = feats.collect()
    by_id = {r["media_id"]: np.array(r["feature"]) for r in rows}
    assert all(abs(float(np.linalg.norm(v)) - 1.0) < 1e-5 for v in by_id.values())

    # determinism: a second full pass yields bit-identical features
    rows2 = mm.extract_features(
        mm.resize_images(media, max_side=4).select(
            "media_id", F.lit("image").alias("kind"), "payload"
        )
    ).collect()
    assert {r["media_id"]: list(r["feature"]) for r in rows2} == {
        r["media_id"]: list(r["feature"]) for r in rows
    }

    assert np.allclose(by_id[min_id], by_id[min_id + 1_000_000])  # dup identical
