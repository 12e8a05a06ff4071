"""Multimodal (image/audio/video) column handling (north-star extension).

Media are opaque ``binary`` payload columns with typed metadata — the layout
a 100 TB multimodal corpus actually uses (parquet binary + metadata columns;
row groups keep payloads columnar-compressed, metadata predicate-pushable).

Codec libraries are not available in this environment, so the *decode kernels*
are stubbed: ``decode_media`` raises NotImplementedError unless
``fake=True``, in which case a deterministic md5-derived fake decoder runs
instead. Everything Spark-side — schemas, mapInPandas Arrow batching, UDF
signatures, partition-size control, frame explosion — is real and tested;
swapping the kernel body for PIL/ffmpeg is a one-function change.
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


def decode_media(df: DataFrame, fake: bool = False) -> DataFrame:
    """Decode payloads to typed metadata via mapInPandas: one Arrow batch in,
    one out — the Python boundary is crossed per-batch, never per-row, and
    binary columns travel zero-copy through Arrow."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "real media codecs are unavailable in this environment; "
                    "pass fake=True for the deterministic stand-in decoder"
                )
            rows = [
                {"media_id": m, "kind": k, **_fake_decode(bytes(p), k)}
                for m, k, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"])
            ]
            yield pd.DataFrame(rows)

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
            feats = []
            for p in pdf["payload"]:
                seed = int.from_bytes(hashlib.md5(bytes(p)).digest()[:8], "big")
                rng = np.random.default_rng(seed)
                v = rng.standard_normal(dim)
                feats.append((v / np.linalg.norm(v)).astype(np.float32))
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "kind": pdf["kind"], "feature": feats}
            )

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


RESIZED_SCHEMA = (
    "media_id bigint, kind string, width int, height int, payload binary"
)


def resize_images(df: DataFrame, max_side: int = 256, fake: bool = False) -> DataFrame:
    """Resize image payloads to fit ``max_side`` (aspect-preserving): decode →
    scale → re-encode, batched through Arrow. The fake kernel derives the
    source dims like decode_media and emits a digest payload; swapping in
    PIL's thumbnail() is the one-function production change."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real image codecs unavailable; pass fake=True")
            rows = []
            for m, k, p in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                meta = _fake_decode(bytes(p), k)
                w, h = meta["width"], meta["height"]
                scale = min(1.0, max_side / max(w, h)) if max(w, h) else 1.0
                rows.append(
                    {
                        "media_id": m,
                        "kind": k,
                        "width": int(w * scale),
                        "height": int(h * scale),
                        "payload": hashlib.md5(bytes(p) + b"resized").digest(),
                    }
                )
            yield pd.DataFrame(rows)

    return df.filter(F.col("kind") == "image").mapInPandas(run, schema=RESIZED_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 30, fake: bool = False) -> DataFrame:
    """Frame sampling for video payloads: decode → explode selected frame
    indices. The explosion happens JVM-side (posexplode over an index array);
    only the per-frame extraction crosses into Python."""
    decoded = decode_media(df.filter(F.col("kind") == "video"), fake=fake).select(
        "media_id", "n_frames"
    )
    with_payload = decoded.join(df.select("media_id", "payload"), "media_id")
    idx = F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))

    def cut(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError("real frame extraction unavailable; pass fake=True")
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "frame_idx": pdf["frame_idx"],
                    # fake frame: digest of (payload, idx) — deterministic
                    "frame_payload": [
                        hashlib.md5(bytes(p) + int(i).to_bytes(4, "big")).digest()
                        for p, i in zip(pdf["payload"], pdf["frame_idx"])
                    ],
                }
            )

    return (
        with_payload.select("media_id", "payload", F.explode(idx).alias("frame_idx"))
        .mapInPandas(cut, schema=FRAME_SCHEMA)
    )
