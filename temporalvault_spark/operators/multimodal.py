"""Multimodal (image/audio/video) column handling (north-star extension).

Media are opaque ``binary`` payload columns with typed metadata — the layout
a 100 TB multimodal corpus actually uses (parquet binary + metadata columns;
row groups keep payloads columnar-compressed, metadata predicate-pushable).

Codec resolution is a three-tier seam, decided INSIDE the Python worker (the
import has to happen where the kernel runs, not on the driver):

1. ``fake=True`` → deterministic md5-derived stand-in (tests, this sandbox);
2. ``kernel=...`` → a caller-supplied decode callable, serialized into the
   task closure (dependency injection: tests, custom codecs);
3. default → REAL decode, itself two sub-tiers:
   a. stdlib/numpy fast path, always available: container-header parsing
      for PNG/GIF/BMP/JPEG/PPM dimensions (no decompression — exactly how
      a production metadata pass over 100 TB of images works: read the
      header bytes, never inflate pixels) and the ``wave`` module for PCM
      WAV (frames + sample rate); PPM pixel resize runs fully in numpy;
   b. library fallback for everything else (PIL for compressed-image
      PIXEL work, soundfile for non-WAV audio) — auto-upgrades wherever
      the cluster image has them, else NotImplementedError with the
      install hint. Video decode (ffmpeg) has no in-process tier and
      stays stub-only. This sandbox has neither PIL nor soundfile, so CI
      covers tiers 1–2, the REAL header/WAV/PPM paths of 3a, and the
      NotImplementedError of 3b.

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


def _image_header_dims(payload: bytes) -> tuple[int, int] | None:
    """Container-header dimension parse for the common image formats —
    REAL decode of the metadata (the bytes every codec spec defines),
    without touching compressed pixel data. Returns (width, height) or
    None when the magic bytes match no supported container."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
        # IHDR is mandated to be the first chunk: width/height at 16..24
        w, h = struct.unpack(">II", payload[16:24])
        return int(w), int(h)
    if payload[:6] in (b"GIF87a", b"GIF89a") and len(payload) >= 10:
        w, h = struct.unpack("<HH", payload[6:10])  # logical screen
        return int(w), int(h)  # frame count via _gif_frame_count
    if payload[:2] == b"BM" and len(payload) >= 26:
        (hdr_size,) = struct.unpack("<I", payload[14:18])
        if hdr_size < 40:
            # OS/2 BITMAPCOREHEADER (12 bytes): dims are uint16 at 18/20 —
            # parsing them as int32 would return garbage, so defer to the
            # library tier instead
            return None
        w, h = struct.unpack("<ii", payload[18:26])  # BITMAPINFOHEADER+
        return int(w), abs(int(h))  # negative h = top-down rows
    if payload[:2] == b"\xff\xd8":  # JPEG: walk markers to a SOF segment
        i = 2
        while i + 9 <= len(payload):
            if payload[i] != 0xFF:
                return None  # corrupt marker stream
            # spec-legal 0xFF fill bytes may pad before any marker
            while i + 9 <= len(payload) and payload[i + 1] == 0xFF:
                i += 1
            if i + 9 > len(payload):
                return None
            marker = payload[i + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            # SOF0..SOF15 minus DHT/JPG/DAC hold the frame dimensions
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return int(w), int(h)
            i += 2 + seg_len
        return None
    if payload[:2] == b"P6":  # binary PPM: ASCII header tokens
        dims = _ppm_header(payload)
        if dims:
            return dims[0], dims[1]
    return None


def _gif_frame_count(payload: bytes) -> int:
    """Real GIF frame count by walking the block structure (not scanning
    for 0x2C bytes, which collide with pixel data): skip the logical
    screen descriptor + optional global color table, then count image
    descriptors, hopping over extension blocks and LZW data sub-blocks by
    their declared lengths. Falls back to 1 on a truncated/corrupt stream
    (header dims already parsed; a partial count would be a lie)."""
    import struct

    try:
        i = 10
        packed = payload[10]
        i += 3  # packed byte + background color index + aspect ratio
        if packed & 0x80:  # global color table present
            i += 3 * (2 ** ((packed & 0x07) + 1))
        frames = 0
        n = len(payload)
        while i < n:
            b = payload[i]
            if b == 0x3B:  # trailer
                break
            if b == 0x21:  # extension: label + length-prefixed sub-blocks
                i += 2
                while payload[i] != 0:
                    i += 1 + payload[i]
                i += 1  # block terminator
            elif b == 0x2C:  # image descriptor
                frames += 1
                i += 10  # descriptor
                lp = payload[i - 1]
                if lp & 0x80:  # local color table
                    i += 3 * (2 ** ((lp & 0x07) + 1))
                i += 1  # LZW minimum code size
                while payload[i] != 0:
                    i += 1 + payload[i]
                i += 1
            else:
                return max(1, frames)  # unknown block: stop, keep what's sure
        return max(1, frames)
    except IndexError:
        return 1


def _ppm_header(payload: bytes) -> tuple[int, int, int, int] | None:
    """(width, height, maxval, pixel_data_offset) of a binary PPM (P6), or
    None. Comments (#...) are legal between any tokens."""
    if payload[:2] != b"P6":
        return None
    toks, i, n = [], 2, len(payload)
    while len(toks) < 3 and i < n:
        c = payload[i : i + 1]
        if c.isspace():
            i += 1
        elif c == b"#":
            while i < n and payload[i : i + 1] != b"\n":
                i += 1
        else:
            j = i
            while j < n and not payload[j : j + 1].isspace():
                j += 1
            toks.append(payload[i:j])
            i = j
    if len(toks) < 3:
        return None
    try:
        w, h, maxval = (int(t) for t in toks)
    except ValueError:
        return None
    return w, h, maxval, i + 1  # +1: the single whitespace after maxval


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_decode_rgb(payload: bytes) -> np.ndarray | None:
    """Full stdlib PNG pixel decode (public spec, RFC 2083 / W3C PNG):
    chunk walk -> zlib-inflate the IDAT stream -> per-scanline unfilter
    (None/Sub/Up/Average/Paeth) -> (h, w, 3) uint8 RGB. Returns None for
    non-PNG payloads (format dispatch); raises NotImplementedError for
    PNG features outside this tier (interlace, palette, bit depth != 8) —
    the honest-seam contract multimodal codecs follow. Grayscale
    replicates to RGB; RGBA drops alpha. This is the real-format pixel
    path that feeds phash.ahash64, so compressed real-world images go
    through the SAME integer hash the PPM tier value-checks."""
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        return None
    pos, ihdr, idat = 8, None, bytearray()
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("png_decode_rgb: PNG signature without IHDR")
    w, h, depth, ctype, _comp, _filt, interlace = ihdr
    if depth != 8 or interlace or ctype not in (0, 2, 6):
        raise NotImplementedError(
            f"png_decode_rgb: depth={depth} color_type={ctype} "
            f"interlace={interlace} is outside the stdlib tier "
            "(8-bit gray/RGB/RGBA, non-interlaced) — needs Pillow in the "
            "worker image"
        )
    nch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * nch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError("png_decode_rgb: IDAT stream length mismatch")
    # Unfilter throughput: None/Sub/Up are fully vectorized (Sub is a
    # per-channel cumulative sum — mod-256 distributes over addition);
    # Average/Paeth have an inherent left-neighbor dependency, so they run
    # as a sequential pass over plain-int lists (no numpy scalar ops:
    # ~10x faster than scalar array indexing and no overflow warnings).
    # For bulk compressed-image ingest at production resolutions the
    # Pillow tier is still the right kernel where installed — this is the
    # dependency-free tier, exact and tested.
    out = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    p = 0
    for y in range(h):
        f = raw[p]
        row = np.frombuffer(raw, np.uint8, stride, p + 1)
        p += 1 + stride
        if f == 0:
            rec = row.copy()
        elif f == 1:  # Sub: per-channel cumsum, vectorized
            rec = (
                np.cumsum(row.reshape(-1, nch).astype(np.int64), axis=0) & 0xFF
            ).astype(np.uint8).reshape(-1)
        elif f == 2:  # Up: uint8 array addition wraps mod 256 — vectorized
            rec = row + prev
        elif f == 3:  # Average (sequential: left-neighbor dependency)
            rl, pl = row.tolist(), prev.tolist()
            rec_l = [0] * stride
            for i in range(stride):
                a = rec_l[i - nch] if i >= nch else 0
                rec_l[i] = (rl[i] + ((a + pl[i]) >> 1)) & 0xFF
            rec = np.array(rec_l, np.uint8)
        elif f == 4:  # Paeth (sequential: left-neighbor dependency)
            rl, pl = row.tolist(), prev.tolist()
            rec_l = [0] * stride
            for i in range(stride):
                a = rec_l[i - nch] if i >= nch else 0
                b = pl[i]
                c = pl[i - nch] if i >= nch else 0
                pa, pb, pc = abs(b - c), abs(a - c), abs(a + b - 2 * c)
                pr = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                rec_l[i] = (rl[i] + pr) & 0xFF
            rec = np.array(rec_l, np.uint8)
        else:
            raise ValueError(f"png_decode_rgb: unknown filter type {f}")
        out[y] = rec
        prev = rec
    arr = out.reshape(h, w, nch)
    if nch == 1:
        return np.repeat(arr, 3, axis=2)
    if nch == 4:
        return np.ascontiguousarray(arr[:, :, :3])
    return arr


def png_encode_rgb(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal stdlib PNG encoder: (h, w, 3) uint8 RGB -> 8-bit truecolor
    non-interlaced PNG, one IDAT chunk. ``filter_type`` applies the same
    scanline filter (0-4) to every row — production writes use 0 (zlib
    already squeezes the synthetic corpus); the other filters exist so
    round-trip tests exercise EVERY unfilter branch of png_decode_rgb."""
    import struct
    import zlib

    h, w, nch = arr.shape
    if nch != 3 or arr.dtype != np.uint8:
        raise ValueError("png_encode_rgb expects (h, w, 3) uint8 RGB")
    stride = w * nch
    raw = bytearray()
    prev = np.zeros(stride, np.int64)
    for y in range(h):
        cur = arr[y].reshape(-1).astype(np.int64)
        if filter_type == 0:
            flt = cur
        elif filter_type == 1:
            left = np.concatenate([np.zeros(nch, np.int64), cur[:-nch]])
            flt = (cur - left) & 0xFF
        elif filter_type == 2:
            flt = (cur - prev) & 0xFF
        elif filter_type == 3:
            left = np.concatenate([np.zeros(nch, np.int64), cur[:-nch]])
            flt = (cur - ((left + prev) >> 1)) & 0xFF
        elif filter_type == 4:
            left = np.concatenate([np.zeros(nch, np.int64), cur[:-nch]])
            ul = np.concatenate([np.zeros(nch, np.int64), prev[:-nch]])
            pa = np.abs(prev - ul)
            pb = np.abs(left - ul)
            pc = np.abs(left + prev - 2 * ul)
            pr = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, ul)
            )
            flt = (cur - pr) & 0xFF
        else:
            raise ValueError(f"png_encode_rgb: unknown filter type {filter_type}")
        raw.append(filter_type)
        raw += flt.astype(np.uint8).tobytes()
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def bmp_decode_rgb(payload: bytes) -> np.ndarray | None:
    """Stdlib BMP pixel decode (public spec: BITMAPFILEHEADER +
    BITMAPINFOHEADER): 24-bit uncompressed BGR rows, 4-byte row padding,
    bottom-up by default (top-down when height is negative) -> (h, w, 3)
    uint8 RGB, fully vectorized. Returns None for non-BMP payloads; raises
    NotImplementedError for BMP features outside this tier (palettes,
    compression, other bit depths) — the honest-seam contract."""
    import struct

    if payload[:2] != b"BM":
        return None
    if len(payload) < 54:
        raise ValueError("bmp_decode_rgb: truncated BMP header")
    off = struct.unpack("<I", payload[10:14])[0]
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        raise NotImplementedError(
            "bmp_decode_rgb: BITMAPCOREHEADER is outside the stdlib tier"
        )
    w, h = struct.unpack("<ii", payload[18:26])
    bpp = struct.unpack("<H", payload[28:30])[0]
    comp = struct.unpack("<I", payload[30:34])[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(
            f"bmp_decode_rgb: bpp={bpp} compression={comp} is outside the "
            "stdlib tier (24-bit uncompressed) — needs Pillow in the worker "
            "image"
        )
    top_down, h = h < 0, abs(h)
    stride = (w * 3 + 3) & ~3
    if len(payload) < off + stride * h:
        raise ValueError("bmp_decode_rgb: pixel data shorter than dimensions")
    rows = np.frombuffer(payload, np.uint8, stride * h, off).reshape(h, stride)
    arr = rows[:, : w * 3].reshape(h, w, 3)
    if not top_down:
        arr = arr[::-1]
    return np.ascontiguousarray(arr[:, :, ::-1])  # BGR -> RGB


def bmp_encode_rgb(arr: np.ndarray, top_down: bool = False) -> bytes:
    """Minimal stdlib BMP encoder: (h, w, 3) uint8 RGB -> 24-bit
    uncompressed BMP (bottom-up by default, like every real writer; pass
    top_down=True to exercise the negative-height branch). Exists so tests
    round-trip the decoder including the row-padding and row-order paths."""
    import struct

    h, w, nch = arr.shape
    if nch != 3 or arr.dtype != np.uint8:
        raise ValueError("bmp_encode_rgb expects (h, w, 3) uint8 RGB")
    stride = (w * 3 + 3) & ~3
    pad = b"\x00" * (stride - w * 3)
    bgr = arr[:, :, ::-1]
    order = range(h) if top_down else range(h - 1, -1, -1)
    body = b"".join(bgr[y].tobytes() + pad for y in order)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if top_down else h, 1, 24, 0,
        len(body), 2835, 2835, 0, 0,
    )
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    return file_hdr + info + body


def _real_decode(payload: bytes, kind: str) -> dict:
    """Tier-3 kernel: real decode. Stdlib sub-tier first (header-native
    image dims, wave-module WAV — always available), then the library
    fallback (PIL/soundfile). Imports resolve here, in the worker process,
    so availability is judged where the kernel actually runs."""
    if kind in ("image", "video"):
        dims = _image_header_dims(payload)
        if dims is not None:
            is_gif = payload[:6] in (b"GIF87a", b"GIF89a")
            return {
                "width": dims[0],
                "height": dims[1],
                # GIF frame count is real (block walk); other containers
                # are single-frame by definition here — video demuxing
                # (ffmpeg) has no in-process tier
                "n_frames": _gif_frame_count(payload) if is_gif else 1,
                "sample_rate": 0,
                "n_bytes": len(payload),
            }
        try:
            from PIL import Image
        except ImportError as e:
            raise NotImplementedError(
                f"kind={kind!r} payload is not a PNG/GIF/BMP/JPEG/PPM "
                "container (header tier) — full decode needs Pillow in the "
                "worker image (pip install Pillow), or pass fake=True / "
                "kernel=..."
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
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            import io
            import wave

            try:
                with wave.open(io.BytesIO(payload)) as wf:
                    return {
                        "width": 0,
                        "height": 0,
                        "n_frames": int(wf.getnframes()),
                        "sample_rate": int(wf.getframerate()),
                        "n_bytes": len(payload),
                    }
            except wave.Error:
                # RIFF/WAVE container the stdlib can't read (IEEE-float,
                # ADPCM, ...): fall through to the soundfile tier, which
                # decoded these before the sniff existed
                pass
        try:
            import soundfile
        except ImportError as e:
            raise NotImplementedError(
                "non-WAV audio needs soundfile in the worker image "
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


def _ppm_histogram_feature(payload: bytes, dim: int) -> np.ndarray | None:
    """REAL image feature for binary PPM: L2-normalized ``dim``-bin
    luminance histogram over the raw RGB plane (Rec.601 weights) — the
    classic color-statistics descriptor, fully numpy. None for non-PPM."""
    hdr = _ppm_header(payload)
    if hdr is None or hdr[2] > 255:
        return None
    w, h, _maxval, off = hdr
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off)
    rgb = px.reshape(-1, 3).astype(np.float64)
    luma = rgb @ np.array([0.299, 0.587, 0.114])
    hist, _ = np.histogram(luma, bins=dim, range=(0.0, 256.0))
    v = hist.astype(np.float64)
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def _wav_band_feature(payload: bytes, dim: int) -> np.ndarray | None:
    """REAL audio feature for PCM WAV: L2-normalized log-energy in ``dim``
    linear frequency bands of the mono-mixed signal's magnitude spectrum
    (np.fft) — the MFCC-shaped descriptor minus the mel warp, fully
    stdlib+numpy. None for non-WAV or non-16-bit payloads."""
    if not (payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"):
        return None
    import io
    import wave

    try:
        with wave.open(io.BytesIO(payload)) as wf:
            if wf.getsampwidth() != 2:
                return None
            nch = wf.getnchannels()
            raw = wf.readframes(wf.getnframes())
    except wave.Error:
        return None  # non-PCM RIFF (float/ADPCM): not this kernel's format
    sig = np.frombuffer(raw, dtype=np.int16).astype(np.float64)
    if nch > 1:
        sig = sig.reshape(-1, nch).mean(axis=1)
    if len(sig) == 0:
        return np.zeros(dim, dtype=np.float32)
    mag = np.abs(np.fft.rfft(sig))
    bands = np.array_split(mag, dim)
    v = np.log1p(np.array([b.sum() for b in bands]))
    n = np.linalg.norm(v)
    return (v / n if n else v).astype(np.float32)


def extract_features(df: DataFrame, dim: int = 16, fake: bool = False) -> DataFrame:
    """Per-media feature vector (the embedding step of a multimodal pipeline)
    as a vectorized kernel: the whole Arrow batch becomes one NumPy matrix op.
    Fake kernel = md5-seeded unit vector (deterministic). The REAL tier
    (fake=False) has a dependency-free 3a sub-tier: luminance histograms
    for binary PPM and FFT band energies for PCM WAV (both numpy-native,
    tested in-sandbox); other containers need a model/codec library and
    raise toward tier 3b."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                if len(pdf) == 0:
                    yield pd.DataFrame({"media_id": [], "kind": [], "feature": []})
                    continue
                feats = []
                for p in pdf["payload"]:
                    b = bytes(p)
                    v = _ppm_histogram_feature(b, dim)
                    if v is None:
                        v = _wav_band_feature(b, dim)
                    if v is None:
                        raise NotImplementedError(
                            "real feature extraction covers binary PPM "
                            "(luminance histogram) and PCM WAV (FFT band "
                            "energies) in-process; other containers need a "
                            "decode library — pass fake=True or decode/"
                            "resize to PPM first"
                        )
                    feats.append(v)
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "kind": pdf["kind"],
                        "feature": feats,
                    }
                )
                continue
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


def _ppm_resize(payload: bytes, max_side: int) -> dict | None:
    """Real, dependency-free pixel resize for binary PPM (P6, maxval<=255):
    numpy nearest-neighbor on the raw RGB plane, re-encoded P6. Returns
    None for non-PPM payloads (caller falls to the library tier)."""
    hdr = _ppm_header(payload)
    if hdr is None or hdr[2] > 255:
        return None
    w, h, _maxval, off = hdr
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=off)
    img = px.reshape(h, w, 3)
    scale = min(1.0, max_side / max(w, h)) if max(w, h) else 1.0
    nw, nh = max(1, int(w * scale)), max(1, int(h * scale))
    ys = (np.arange(nh) * (h / nh)).astype(np.int64)
    xs = (np.arange(nw) * (w / nw)).astype(np.int64)
    out = img[ys][:, xs]
    new_payload = b"P6\n%d %d\n255\n" % (nw, nh) + out.tobytes()
    return {"width": nw, "height": nh, "payload": new_payload}


def _real_resize(payload: bytes, max_side: int) -> dict:
    """Tier-3 resize kernel: numpy-native for PPM (always available), PIL
    thumbnail (aspect-preserving, re-encoded PNG) for compressed formats.
    Imported in the worker, like _real_decode."""
    ppm = _ppm_resize(payload, max_side)
    if ppm is not None:
        return ppm
    try:
        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            "resizing non-PPM formats needs Pillow in the worker image "
            "(pip install Pillow), or pass fake=True / kernel=..."
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
