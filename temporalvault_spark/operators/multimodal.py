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
