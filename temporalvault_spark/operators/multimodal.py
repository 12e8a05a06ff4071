"""Multimodal (image/audio/video) column handling (north-star extension).

Media are opaque ``binary`` payload columns with typed metadata — the layout
a 100 TB multimodal corpus actually uses (parquet binary + metadata columns;
row groups keep payloads columnar-compressed, metadata predicate-pushable).

Codec resolution is a three-tier seam, decided INSIDE the Python worker (the
import has to happen where the kernel runs, not on the driver):

1. ``fake=True`` → deterministic md5-derived stand-in (tests, this sandbox);
2. ``kernel=...`` → a caller-supplied decode callable, serialized into the
   task closure (dependency injection: tests, custom codecs);
3. default → try importing the real library (PIL for images, soundfile for
   audio) in the worker and use it — the path auto-upgrades to real codecs
   wherever the cluster image has them — else raise NotImplementedError with
   the install hint. Video decode (ffmpeg) has no in-process library tier and
   stays stub-only. This sandbox has neither PIL nor soundfile, so CI covers
   tiers 1–2 and the NotImplementedError of tier 3.

Everything Spark-side — schemas, mapInPandas Arrow batching, UDF signatures,
partition-size control, frame explosion — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, meta map<string,string>"
)

DECODED_SCHEMA = (
    "media_id bigint, kind string, width int, height int, n_frames int, "
    "sample_rate int, n_bytes int"
)

FEATURE_SCHEMA = "media_id bigint, kind string, feature array<float>"

FRAME_SCHEMA = "media_id bigint, frame_idx int, frame_payload binary"


def _fake_decode(payload: bytes, kind: str) -> dict:
    """Deterministic stand-in for a codec: dimensions derived from the
    payload digest. NOT a real decoder — clearly marked; replace with
    PIL/soundfile/ffmpeg in production."""
    h = hashlib.md5(payload).digest()
    return {
        "width": 64 + h[0] % 192 if kind in ("image", "video") else 0,
        "height": 64 + h[1] % 192 if kind in ("image", "video") else 0,
        "n_frames": 1 if kind == "image" else 1 + h[2] % 240,
        "sample_rate": 16000 if kind == "audio" else 0,
        "n_bytes": len(payload),
    }


def _real_decode(payload: bytes, kind: str) -> dict:
    """Tier-3 kernel: real codec decode. Imports resolve here, in the worker
    process, so availability is judged where the kernel actually runs."""
    if kind in ("image", "video"):
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                f"decoding kind={kind!r} needs Pillow in the worker image "
                "(pip install Pillow), or pass fake=True / kernel=..."
            ) from e
        import io

        with Image.open(io.BytesIO(payload)) as img:
            return {
                "width": img.width,
                "height": img.height,
                "n_frames": int(getattr(img, "n_frames", 1)),
                "sample_rate": 0,
                "n_bytes": len(payload),
            }
    if kind == "audio":
        try:
            import soundfile
        except ImportError as e:
            raise NotImplementedError(
                "decoding audio needs soundfile in the worker image "
                "(pip install soundfile), or pass fake=True / kernel=..."
            ) from e
        import io

        info = soundfile.info(io.BytesIO(payload))
        return {
            "width": 0,
            "height": 0,
            "n_frames": int(info.frames),
            "sample_rate": int(info.samplerate),
            "n_bytes": len(payload),
        }
    raise NotImplementedError(f"no decode kernel for kind={kind!r}")


def decode_media(df: DataFrame, fake: bool = False, kernel=None) -> DataFrame:
    """Decode payloads to typed metadata via mapInPandas: one Arrow batch in,
    one out — the Python boundary is crossed per-batch, never per-row, and
    binary columns travel zero-copy through Arrow.

    ``kernel`` (payload: bytes, kind: str) -> dict overrides the decode
    tier; otherwise ``fake`` picks the stand-in, else the real-codec tier
    (see module docstring)."""
    decode = _fake_decode if fake else (kernel or _real_decode)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"media_id": m, "kind": k, **decode(bytes(p), k)}
                for m, k, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(rows, columns=[
                "media_id", "kind", "width", "height", "n_frames",
                "sample_rate", "n_bytes",
            ])

    return df.mapInPandas(run, schema=DECODED_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Per-media feature vector (the embedding step of a multimodal pipeline)
    as a vectorized kernel: the whole Arrow batch becomes one NumPy matrix op.
    Fake kernel = md5-seeded unit vector (deterministic)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real feature extractors are unavailable; pass fake=True"
                )
            if len(pdf) == 0:
                yield pd.DataFrame({"media_id": [], "kind": [], "feature": []})
                continue
            # per-row work is ONLY the md5 (inherently per-payload); the
            # feature math is one (rows, dim) matrix op per Arrow batch —
            # digest bytes expand deterministically into dim floats, then a
            # single vectorized row-normalization
            digests = np.stack(
                [
                    np.frombuffer(
                        hashlib.md5(bytes(p) + i.to_bytes(2, "big")).digest(),
                        dtype=np.uint32,
                    )
                    for p in pdf["payload"]
                    for i in range((dim + 3) // 4)
                ]
            ).reshape(len(pdf), -1)[:, :dim]
            m = (digests.astype(np.float64) / np.iinfo(np.uint32).max) - 0.5
            m = m / np.linalg.norm(m, axis=1, keepdims=True)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": list(m.astype(np.float32)),
                }
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id bigint, kind string, width int, height int, payload binary"
)


def _fake_resize(payload: bytes, max_side: int) -> dict:
    """Fake resize kernel: source dims from the digest decoder, scaled;
    payload replaced by a deterministic digest."""
    meta = _fake_decode(payload, "image")
    w, h = meta["width"], meta["height"]
    scale = min(1.0, max_side / max(w, h)) if max(w, h) else 1.0
    return {
        "width": int(w * scale),
        "height": int(h * scale),
        "payload": hashlib.md5(payload + b"resized").digest(),
    }


def _real_resize(payload: bytes, max_side: int) -> dict:
    """Tier-3 resize kernel: PIL thumbnail (aspect-preserving), re-encoded
    PNG. Imported in the worker, like _real_decode."""
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "resizing needs Pillow in the worker image (pip install Pillow), "
            "or pass fake=True / kernel=..."
        ) from e
    import io

    with Image.open(io.BytesIO(payload)) as img:
        img.thumbnail((max_side, max_side))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        return {"width": img.width, "height": img.height, "payload": buf.getvalue()}


def resize_images(
    df: DataFrame, max_side: int = 256, fake: bool = False, kernel=None
) -> DataFrame:
    """Resize image payloads to fit ``max_side`` (aspect-preserving): decode →
    scale → re-encode, batched through Arrow. Kernel tiers as in
    ``decode_media`` (``kernel`` takes (payload, max_side) -> dict)."""
    resize = _fake_resize if fake else (kernel or _real_resize)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                {"media_id": m, "kind": k, **resize(bytes(p), max_side)}
                for m, k, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "width", "height", "payload"]
            )

    return df.filter(F.col("kind") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 30, fake: bool = False) -> DataFrame:
    """Frame sampling for video payloads in ONE decode pass: a single kernel
    opens each video once, reads its frame count, and emits every
    ``every_n``-th frame. (An earlier shape decoded once for metadata, joined
    the payload back, and decoded again to cut — with a real codec that runs
    the dominant cost twice plus a shuffle; one kernel does neither.)"""

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame extraction unavailable; pass fake=True")
            rows = {"media_id": [], "frame_idx": [], "frame_payload": []}
            for m, k, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                payload = bytes(p)
                n_frames = _fake_decode(payload, k)["n_frames"]  # decode ONCE
                for i in range(0, n_frames, every_n):
                    rows["media_id"].append(m)
                    rows["frame_idx"].append(i)
                    # fake frame: digest of (payload, idx) — deterministic
                    rows["frame_payload"].append(
                        hashlib.md5(payload + i.to_bytes(4, "big")).digest()
                    )
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "video").mapInPandas(cut, schema=FRAME_SCHEMA)
