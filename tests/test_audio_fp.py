"""Audio near-dup: the envelope fingerprint over real PCM WAV bytes, the
spectral (FFT) fingerprint, and the Hamming-banded pair query — the audio
column of the dedup matrix."""

import io
import struct
import wave

import numpy as np
import pytest

from temporalvault_spark.operators.audio_fp import (
    AFP_FRAMES,
    AFP_SAMPLES,
    AFP_THRESHOLD,
    _synth_wav,
    afp64,
    afp_frame,
    afp_hamming_pairs,
    afp_spectral64,
    synth_wav_audio,
)


def _wav(samples, nch=1, rate=16000, width=2):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(width)
        wf.setframerate(rate)
        if width == 2:
            wf.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        else:
            wf.writeframes(bytes((s + 128) & 0xFF for s in samples))
    return buf.getvalue()


def test_afp64_known_envelope_exact():
    """Quiet first half, loud second half -> '0'*32 + '1'*32 exactly."""
    quiet = [0] * (AFP_SAMPLES // 2)
    loud = [20000, -20000] * (AFP_SAMPLES // 4)
    assert afp64(_wav(quiet + loud)) == "0" * 32 + "1" * 32


def test_afp64_one_sample_tweak_is_tiny_hamming():
    samples = [(i * 137) % 20000 - 10000 for i in range(AFP_SAMPLES)]
    tweaked = list(samples)
    tweaked[7] = 10000
    h0, h1 = afp64(_wav(samples)), afp64(_wav(tweaked))
    assert sum(a != b for a, b in zip(h0, h1)) <= 1


def test_afp64_stereo_mixes_to_mono():
    """A stereo clip whose channels average to the mono clip fingerprints
    identically (integer mean mix)."""
    mono = [(i * 211) % 16000 - 8000 for i in range(AFP_SAMPLES)]
    stereo = []
    for s in mono:
        stereo += [s + 100, s - 100]  # mean = s
    assert afp64(_wav(stereo, nch=2)) == afp64(_wav(mono))


def test_afp64_rejects_non_wav_and_bad_shapes():
    with pytest.raises(ValueError, match="not a RIFF/WAVE"):
        afp64(b"OggS not a wave file")
    with pytest.raises(ValueError, match="16-bit"):
        afp64(_wav([0] * AFP_SAMPLES, width=1))
    with pytest.raises(ValueError, match="not divisible"):
        afp64(_wav([0] * (AFP_SAMPLES - 10)))


def test_synth_wav_is_real_riff_container():
    """The synthesized corpus goes through the actual stdlib wave codec:
    the container round-trips with the advertised shape."""
    payload = _synth_wav(5)
    with wave.open(io.BytesIO(payload)) as wf:
        assert wf.getnchannels() == 1
        assert wf.getsampwidth() == 2
        assert wf.getframerate() == 16000
        assert wf.getnframes() == AFP_SAMPLES


def test_spectral_tone_lands_in_its_band():
    """A pure tone concentrates spectral energy in one band: the delta
    bits flank it (rise into the band, fall out of it), and the
    fingerprint is gain-invariant."""
    i = np.arange(AFP_SAMPLES)
    tone = lambda a: (a * np.sin(2 * np.pi * 100 * i / AFP_SAMPLES)).astype(int)
    fp = afp_spectral64(_wav(list(tone(10000))))
    # bin 100 -> index 99 in the DC-dropped spectrum -> band 99 // 8 = 12
    assert fp[12] == "1" and fp[11] == "0"
    # the tone-local bits are gain-invariant (empty bands hold only
    # int-quantization noise, which does NOT scale with gain — whole-
    # fingerprint equality would overclaim)
    fp2 = afp_spectral64(_wav(list(tone(5000))))
    assert fp2[12] == "1" and fp2[11] == "0"


def test_spectral_variants_near_cross_seed_far():
    """The synthesized corpus's near-dup structure survives the spectral
    kernel too: variants sit close in Hamming, different seeds far."""
    base, var = afp_spectral64(_synth_wav(5)), afp_spectral64(_synth_wav(15))
    far = afp_spectral64(_synth_wav(45))
    d_near = sum(a != b for a, b in zip(base, var))
    d_far = sum(a != b for a, b in zip(base, far))
    assert d_near <= AFP_THRESHOLD < d_far


def test_pairs_found_and_rejected(spark):
    """Crafted corpus through the REAL kernel end-to-end: a variant pairs
    with its base (small Hamming), an unrelated seed does not."""
    docs = spark.createDataFrame(
        [(5,), (15,), (405,)], "doc_id bigint"
    )  # seed 0 v0, seed 0 v1, seed 10 v0
    hashes = afp_frame(synth_wav_audio(docs))
    pairs = {(r["aud_a"], r["aud_b"]) for r in afp_hamming_pairs(hashes).collect()}
    assert (5, 15) in pairs
    assert not any(405 in p for p in pairs)


def test_envelope_matches_oracle_arithmetic():
    """The kernel's integer arithmetic replayed in plain Python from the
    md5 formulas equals the real decode path — the same equality the
    DuckDB oracle checks at corpus scale."""
    import hashlib

    aud_id, seed, v = 15, 0, 1
    fvals = []
    acc = []
    for i in range(AFP_SAMPLES):
        h = hashlib.md5(f"au:{seed}:{i}".encode()).hexdigest()
        p = hashlib.md5(f"aupert:{seed}:{v}:{i}".encode()).hexdigest()
        if p[:2] == "00":
            h = p[2:]
        acc.append(abs(int(h[0:4], 16) - 32768))
        if len(acc) == AFP_SAMPLES // AFP_FRAMES:
            fvals.append(sum(acc) // len(acc))
            acc = []
    m = sum(fvals) // AFP_FRAMES
    expect = "".join("1" if fv >= m else "0" for fv in fvals)
    assert afp64(_synth_wav(aud_id)) == expect


def test_afp_frame_quarantine_mode(spark):
    """errors='quarantine': corrupt audio yields hash64=NULL; valid rows
    fingerprint normally (both kernels)."""
    df = spark.createDataFrame(
        [(1, _synth_wav(5)), (2, b"OggS definitely not wav")],
        "aud_id bigint, audio binary",
    )
    for spectral in (False, True):
        rows = {
            r["aud_id"]: r["hash64"]
            for r in afp_frame(df, spectral=spectral, errors="quarantine").collect()
        }
        assert rows[2] is None and rows[1] is not None and len(rows[1]) == 64
