"""Audio near-dup: envelope fingerprint over real PCM WAV bytes + Hamming-
banded pairs — the AUDIO column of the dedup matrix, completing the four
modalities a training-data pipeline dedups (text: minhash/simhash/...,
embeddings: RP-LSH/semdedup, images: phash, audio: THIS).

Reference parity: the reference (Vinnu124/TemporalVault) stores opaque
payloads and never dedups them (app/main.py:83-92 ingests rows verbatim);
this module supplies the audio near-dup on top of the multimodal tier
(multimodal.py holds the WAV decode / FFT feature kernels).

Pipeline (the phash.py shape, kernel swapped):
  1. audio arrives as a binary column (here: synthesized deterministic
     1024-sample 16-bit PCM WAVs via ``synth_wav_audio`` — an Arrow-batched
     mapInPandas, the same plumbing a real ingest uses; groups of 4
     per-seed variants give the corpus a KNOWN near-dup structure);
  2. ``afp_frame`` decodes each payload with the REAL stdlib ``wave``
     codec and emits a 64-bit energy-envelope fingerprint as a '0'/'1'
     string — integer-only math (per-frame mean |sample| via integer DIV,
     global mean DIV 64, bit = frame >= mean: the aHash recipe in the time
     domain), so the DuckDB oracle replays the ENTIRE sample->fingerprint
     pipeline bit-for-bit and the registered stage query value-hash-checks
     the kernel cross-engine; per-row map, no shuffle;
  3. ``afp_hamming_pairs`` reuses the SHARED 4 x 16-bit banding + exact
     64-position Hamming verify (phash.banded_hamming_pairs — one
     definition for both modalities): candidates collide on one identical
     band, never all-pairs.

A SPECTRAL fingerprint also ships (``afp_spectral64``): sign-quantized
FFT band-energy deltas over the same decoded signal — the Shazam-shaped
descriptor built on the same np.fft the multimodal feature kernel uses.
Floating-point FFT is not replayable in ANSI SQL, so its pair query
registers rows-only (the sim_topk pandas-twin precedent) and the kernel
is pinned by crafted-tone units instead; the envelope kernel carries the
value-hash gate.

At 100 TB: fingerprinting is embarrassingly parallel (one map pass at
ingest); the fingerprint table is 8 bytes of payload per clip; banded
self-join cost is governed by band-bucket occupancy exactly like the
minhash/phash tiers, and the same persisted-index/growth-contract
machinery applies if the corpus is probed incrementally.
"""

from __future__ import annotations

import hashlib
import io
import os
import struct
import wave
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog
from temporalvault_spark.operators.dedup_cluster import connected_components
from temporalvault_spark.operators.phash import banded_hamming_pairs
from temporalvault_spark.registry import query

AFP_SAMPLES = 1024  # synthesized clip length (samples)
AFP_FRAMES = 64  # envelope frames -> 64 bits
AFP_FRAME_LEN = AFP_SAMPLES // AFP_FRAMES  # 16
AFP_RATE = 16000  # synthesized sample rate (Hz)
AFP_THRESHOLD = 12  # max Hamming distance for a near-dup pair
AUD_EVERY = 10  # audio corpus = documents with doc_id % AUD_EVERY == AUD_OFFSET
AUD_OFFSET = 5  # ... disjoint from the image corpus (doc_id % 10 == 0)
VARIANT_GROUP = 4  # synthesized variants per seed group
SPECTRAL_BANDS = 65  # afp_spectral64: 65 bands -> 64 adjacent-delta bits


def _synth_samples(aud_id: int) -> list[int]:
    """The deterministic int16 sample stream for one clip id. Groups of
    VARIANT_GROUP consecutive audio ids share a base signal; variants v>0
    re-roll ~1/256 of the samples (two-hex-char gate — measured to keep
    within-group fingerprint Hamming at 0-3, inside the pigeonhole-
    guaranteed band-recall zone, while cross-seed distances sit ~26-36).
    Every sample is md5-derived — the DuckDB oracle rebuilds the identical
    stream from the same formulas."""
    seed = aud_id // (AUD_EVERY * VARIANT_GROUP)
    v = (aud_id // AUD_EVERY) % VARIANT_GROUP
    out = []
    for i in range(AFP_SAMPLES):
        h = hashlib.md5(f"au:{seed}:{i}".encode()).hexdigest()
        if v > 0:
            p = hashlib.md5(f"aupert:{seed}:{v}:{i}".encode()).hexdigest()
            if p[:2] == "00":
                h = p[2:]  # re-rolled sample (prob 1/256)
        out.append(int(h[0:4], 16) - 32768)
    return out


def _synth_wav(aud_id: int) -> bytes:
    """One deterministic mono 16-bit PCM WAV — a REAL RIFF/WAVE container
    written by the stdlib ``wave`` module, so the decode side exercises the
    same codec path a production WAV ingest hits."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(AFP_RATE)
        wf.writeframes(struct.pack(f"<{AFP_SAMPLES}h", *_synth_samples(aud_id)))
    return buf.getvalue()


def synth_wav_audio(docs: DataFrame) -> DataFrame:
    """(aud_id, audio binary): one deterministic WAV per doc_id % AUD_EVERY
    == AUD_OFFSET document — the synthetic stand-in for an audio ingest
    (real binary payloads through Arrow batches; a deployment swaps this
    map for its object-store fetch)."""
    ids = docs.filter(F.col("doc_id") % AUD_EVERY == AUD_OFFSET).select(
        F.col("doc_id").alias("aud_id")
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "aud_id": b["aud_id"],
                    "audio": [_synth_wav(int(i)) for i in b["aud_id"]],
                }
            )

    return ids.mapInPandas(gen, "aud_id bigint, audio binary")


_SF_OK: bool | None = None


def _soundfile_samples(payload: bytes) -> np.ndarray | None:
    """OPTIONAL-DEPENDENCY adapter tier (the multimodal pillow_decode_rgb
    contract): decode any soundfile-readable container to the SAME mono
    int64 sample stream _decode_pcm yields — dtype='int16' read (exact for
    16-bit PCM sources, so the same-samples contract test can pin the two
    tiers equal on shared WAVs; lossy codecs land on their decoder's
    nearest int16 grid), channels mixed by the same integer-mean DIV.
    Returns None when soundfile is ABSENT (caller falls back to the honest
    seam); a soundfile decode FAILURE raises the codec-contract ValueError
    the quarantine tiers catch. Availability is probed ONCE per interpreter
    (the multimodal._pillow_available note: failed imports are not cached,
    and this sits on the per-payload hot path)."""
    global _SF_OK
    if _SF_OK is None:
        try:
            import soundfile  # noqa: F401

            _SF_OK = True
        except Exception:  # noqa: BLE001 — soundfile raises OSError (not
            # ImportError) when the libsndfile shared library is missing, a
            # common slim-image state; anything non-importable means "tier
            # absent", and it MUST cache False or the failing import would
            # re-run per payload AND escape the quarantine catch (review)
            _SF_OK = False
    if not _SF_OK:
        return None
    import soundfile

    try:
        data = soundfile.read(io.BytesIO(payload), dtype="int16", always_2d=True)[0]
    except Exception as e:  # soundfile raises libsndfile-specific types
        raise ValueError(f"soundfile: unreadable payload ({e})") from e
    sig = data.astype(np.int64)
    if sig.shape[1] > 1:
        return sig.sum(axis=1) // sig.shape[1]
    return sig[:, 0]


def _decode_pcm(payload: bytes) -> np.ndarray:
    """Mono int64 sample stream from a 16-bit PCM WAV via the stdlib
    ``wave`` codec; multi-channel mixes by integer mean (order-stable DIV).
    Non-WAV / non-16-bit payloads go to the optional soundfile adapter
    tier when it is importable in the worker (mp3/flac/ogg/float-WAV
    auto-upgrade), else raise — the multimodal real-codec seam."""
    if not (payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"):
        sig = _soundfile_samples(payload)
        if sig is not None:
            return sig
        raise ValueError("afp64: payload is not a RIFF/WAVE container")
    try:
        with wave.open(io.BytesIO(payload)) as wf:
            if wf.getsampwidth() != 2:
                sig = _soundfile_samples(payload)
                if sig is not None:
                    return sig
                raise ValueError("afp64: only 16-bit PCM WAV in-process")
            nch = wf.getnchannels()
            raw = wf.readframes(wf.getnframes())
    except wave.Error as e:
        # RIFF/WAVE the stdlib can't read (IEEE-float, ADPCM, ...)
        sig = _soundfile_samples(payload)
        if sig is not None:
            return sig
        raise ValueError(f"afp64: unreadable WAV ({e})") from e
    sig = np.frombuffer(raw, np.int16).astype(np.int64)
    if nch > 1:
        sig = sig.reshape(-1, nch).sum(axis=1) // nch
    return sig


def afp64(payload: bytes) -> str:
    """64-bit energy-envelope fingerprint of a PCM WAV as a '0'/'1' string.
    Integer-only (the phash.ahash64 recipe in the time domain): frame
    value = sum(|sample|) DIV frame-length over 64 equal frames, mean =
    frame-sum DIV 64, bit = frame >= mean — every step replayable in ANSI
    SQL, so the oracle can value-check the kernel. Works for any clip
    length divisible by 64; raises otherwise."""
    sig = _decode_pcm(payload)
    n = len(sig)
    if n == 0 or n % AFP_FRAMES:
        raise ValueError(f"afp64: {n} samples not divisible by {AFP_FRAMES}")
    flen = n // AFP_FRAMES
    fvals = np.abs(sig).reshape(AFP_FRAMES, flen).sum(axis=1) // flen
    mean = int(fvals.sum()) // AFP_FRAMES
    return "".join("1" if fv >= mean else "0" for fv in fvals)


def afp_spectral64(payload: bytes) -> str:
    """64-bit SPECTRAL fingerprint: the decoded signal's magnitude spectrum
    (np.fft.rfft — the same transform multimodal's WAV feature kernel
    uses), DC dropped, split into 65 linear bands; bit b = energy(b) >=
    energy(b+1) (sign-quantized adjacent band deltas — robust to overall
    gain, the classic audio-fingerprint shape). Floating-point FFT is not
    ANSI-SQL-replayable, so queries over this kernel register rows-only
    and crafted-tone units pin the kernel (tests/test_audio_fp.py)."""
    sig = _decode_pcm(payload).astype(np.float64)
    if len(sig) < SPECTRAL_BANDS + 1:
        raise ValueError("afp_spectral64: clip too short for 65 bands")
    mag = np.abs(np.fft.rfft(sig))[1:]  # drop DC
    bands = np.array_split(mag, SPECTRAL_BANDS)
    e = np.array([b.sum() for b in bands])
    return "".join(
        "1" if e[b] >= e[b + 1] else "0" for b in range(SPECTRAL_BANDS - 1)
    )


def afp_frame(
    audio: DataFrame, spectral: bool = False, errors: str = "raise"
) -> DataFrame:
    """(aud_id, hash64) via the real decode+fingerprint kernel — Arrow-
    batched per-row map, no shuffle (the hot ingest path at 100 TB).

    ``errors``: ``"raise"`` (default) or ``"quarantine"`` — corrupt
    payloads yield hash64=NULL instead of killing the batch (the
    ahash_frame contract: callers route NULL rows to a quarantine sink)."""
    if errors not in ("raise", "quarantine"):
        raise ValueError(f"afp_frame: errors={errors!r}")
    kernel = afp_spectral64 if spectral else afp64

    def one(p: bytes) -> str | None:
        if errors == "raise":
            return kernel(p)
        try:
            return kernel(p)
        except (ValueError, NotImplementedError):
            return None

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame(
                {
                    "aud_id": b["aud_id"],
                    "hash64": [one(bytes(p)) for p in b["audio"]],
                }
            )

    return audio.mapInPandas(run, "aud_id bigint, hash64 string")


def afp_hamming_pairs(
    hashes: DataFrame, threshold: int = AFP_THRESHOLD
) -> DataFrame:
    """Near-dup audio pairs (aud_a < aud_b, hamming <= threshold) — the
    audio instantiation of phash.banded_hamming_pairs (shared banding +
    exact verify, never all-pairs)."""
    return banded_hamming_pairs(hashes, "aud_id", "aud", threshold)


# --- staged fingerprint table (one decode+fingerprint pass per session) ------

_STAGED_AFP: dict[tuple, str] = {}


def stage_afp(spark: SparkSession, sf_dir: str, force: bool = False) -> str:
    """Materialize the (aud_id, hash64) table once per application + corpus
    fingerprint (the stage_phash contract): synthesize the audio corpus,
    decode+fingerprint it, persist the slim frame. Consumers pay a parquet
    re-scan, never a re-decode."""
    from temporalvault_spark.operators.llm import _corpus_key
    from temporalvault_spark.staging import stage_dir

    key = _corpus_key(spark, sf_dir)
    path = _STAGED_AFP.get(key)
    if path is None or force or not os.path.isdir(path):
        if path is None or not os.path.isdir(path):
            path = os.path.join(stage_dir(spark, "afp_stage"), "fps")
        docs = load_catalog(spark, sf_dir).table("documents")
        afp_frame(synth_wav_audio(docs)).write.mode("overwrite").parquet(path)
        _STAGED_AFP[key] = path
    return path


# --- oracles: the full sample->fingerprint pipeline replayed in SQL ----------

# shared CTE pipeline: ids -> md5-derived int16 samples -> |s| -> 16-sample
# frame means (integer DIV) -> per-clip mean -> 64-bit string, exactly the
# kernel's arithmetic
_AFP_CTES = f"""aids AS (
        SELECT doc_id AS aud_id,
               doc_id // {AUD_EVERY * VARIANT_GROUP} AS seed,
               (doc_id // {AUD_EVERY}) % {VARIANT_GROUP} AS v
        FROM documents WHERE doc_id % {AUD_EVERY} = {AUD_OFFSET}),
    smp AS (
        SELECT aud_id, i.range AS i,
               md5('au:' || CAST(seed AS VARCHAR) || ':'
                   || CAST(i.range AS VARCHAR)) AS hb,
               CASE WHEN v > 0 THEN
                   md5('aupert:' || CAST(seed AS VARCHAR) || ':'
                       || CAST(v AS VARCHAR) || ':' || CAST(i.range AS VARCHAR))
               END AS hp
        FROM aids, range(0, {AFP_SAMPLES}) i),
    sval AS (
        SELECT aud_id, i,
               abs((('0x' || substr(
                   CASE WHEN hp IS NOT NULL AND substr(hp, 1, 2) = '00'
                        THEN substr(hp, 3, 30) ELSE hb END, 1, 4))::INT)
                   - 32768) AS a
        FROM smp),
    frames AS (
        SELECT aud_id, i // {AFP_FRAME_LEN} AS f,
               SUM(a) // {AFP_FRAME_LEN} AS fval
        FROM sval GROUP BY 1, 2),
    fmeans AS (
        SELECT aud_id, SUM(fval) // {AFP_FRAMES} AS m FROM frames GROUP BY 1),
    ahashes AS (
        SELECT fr.aud_id,
               string_agg(CASE WHEN fr.fval >= fm.m THEN '1' ELSE '0' END, ''
                          ORDER BY fr.f) AS hash64
        FROM frames fr JOIN fmeans fm ON fr.aud_id = fm.aud_id
        GROUP BY fr.aud_id)"""

_AFP_STAGE_ORACLE = f"""WITH {_AFP_CTES}
    SELECT aud_id, hash64 FROM ahashes"""


@query("audio_fp_stage", _AFP_STAGE_ORACLE)
def q_audio_fp_stage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decode+fingerprint staging pass, benched in isolation
    (force=True so its cost stays measured) — and the cross-engine KERNEL
    check: the oracle rebuilds every SAMPLE from the md5 formulas and
    replays the frame/mean/bit integer arithmetic in SQL, value-hashing
    the 64-bit strings the real stdlib-wave kernel produced from actual
    RIFF/WAVE payloads."""
    path = stage_afp(spark, sf_dir, force=True)
    return spark.read.parquet(path).select("aud_id", "hash64")


# samples -> fingerprints -> banding -> exact-verified pairs, as shareable
# CTEs (dedup_audio_fp selects the pairs; dedup_audio_apply closes them)
_AFP_PAIRS_CTES = f"""{_AFP_CTES},
    abands AS (
        SELECT aud_id, hash64, b.range AS band,
               substr(hash64, b.range * 16 + 1, 16) AS bv
        FROM ahashes, range(0, 4) b),
    acand AS (
        SELECT DISTINCT a.aud_id AS aud_a, b.aud_id AS aud_b,
               a.hash64 AS ha, b.hash64 AS hb
        FROM abands a JOIN abands b
          ON a.band = b.band AND a.bv = b.bv AND a.aud_id < b.aud_id),
    apairs AS (
        SELECT aud_a, aud_b, hamming FROM (
            SELECT aud_a, aud_b,
                   CAST(len(ha) - len(list_filter(range(1, 65),
                       i -> substr(ha, i, 1) = substr(hb, i, 1))) AS INTEGER)
                       AS hamming
            FROM acand)
        WHERE hamming <= {AFP_THRESHOLD})"""

_AFP_PAIRS_ORACLE = f"""WITH {_AFP_PAIRS_CTES}
    SELECT aud_a, aud_b, hamming FROM apairs"""


@query("dedup_audio_fp", _AFP_PAIRS_ORACLE)
def q_dedup_audio_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup over the staged fingerprint table: 4 x 16-bit
    Hamming bands propose, exact Hamming <= AFP_THRESHOLD (= 12) verifies.
    The oracle replays samples -> fingerprints -> banding -> verify
    end-to-end from the shared CTE pipeline — the audio twin of
    dedup_image_phash, completing the dedup matrix's fourth modality."""
    path = stage_afp(spark, sf_dir)
    return afp_hamming_pairs(spark.read.parquet(path))


@query(
    "dedup_audio_apply",
    f"""WITH RECURSIVE {_AFP_PAIRS_CTES},
    asym AS (SELECT aud_a AS src, aud_b AS dst FROM apairs
             UNION ALL SELECT aud_b, aud_a FROM apairs),
    awalk(node, lbl) AS (
        SELECT src, src FROM asym
        UNION
        SELECT s.dst, MIN(w.lbl) FROM awalk w JOIN asym s ON s.src = w.node
        GROUP BY s.dst
    ),
    acomp AS (SELECT node, MIN(lbl) AS keep FROM awalk GROUP BY node),
    adropd AS (SELECT node FROM acomp WHERE node <> keep)
    SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_clips_kept
    FROM documents d
    WHERE d.doc_id % {AUD_EVERY} = {AUD_OFFSET}
      AND NOT EXISTS (SELECT 1 FROM adropd WHERE adropd.node = d.doc_id)
    GROUP BY d.source""",
)
def q_dedup_audio_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY the audio near-dup clustering: close the Hamming pairs into
    connected components (the shared solver), keep each component's
    representative (min aud_id), and summarize the surviving audio corpus
    per source — the dedup_image_apply twin. The oracle replays samples ->
    fingerprints -> banding -> verify -> a recursive-CTE reachability
    closure -> the keeper rule."""
    hashes = spark.read.parquet(stage_afp(spark, sf_dir))
    pairs = afp_hamming_pairs(hashes)
    comps = connected_components(
        pairs.select(F.col("aud_a").alias("src"), F.col("aud_b").alias("dst"))
    )
    drop = (
        comps.filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("aud_id"))
    )
    kept = hashes.select("aud_id").join(drop, "aud_id", "left_anti")
    docs = load_catalog(spark, sf_dir).table("documents")
    return (
        kept.join(docs, kept["aud_id"] == docs["doc_id"])
        .groupBy("source")
        .agg(F.count("*").alias("n_clips_kept"))
    )


@query("dedup_audio_spectral")
def q_dedup_audio_spectral(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio near-dup via the SPECTRAL fingerprint (FFT band-energy
    deltas), same banding + exact verify. Rows-only: the floating-point
    FFT has no ANSI-SQL twin (the sim_topk pandas-twin precedent) — the
    kernel is pinned by crafted-tone units and the envelope tier carries
    the value-hash gate."""
    docs = load_catalog(spark, sf_dir).table("documents")
    hashes = afp_frame(synth_wav_audio(docs), spectral=True)
    return afp_hamming_pairs(hashes)
