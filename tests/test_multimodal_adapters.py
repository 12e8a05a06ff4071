"""Optional-dependency codec adapter tier (Pillow / soundfile): used ONLY
when importable in the worker, contract-tested to produce the same pixel
grid / sample stream the in-process codecs yield on shared formats, and
skipped cleanly — with the honest NotImplementedError seams UNCHANGED —
when absent. This sandbox has neither library, so the same-output contract
tests skip here and run wherever a deployment's worker image carries them;
the seam-preservation tests run everywhere."""

import importlib.util

import numpy as np
import pytest

from temporalvault_spark.operators.audio_fp import _decode_pcm, _soundfile_samples
from temporalvault_spark.operators.multimodal import (
    bmp_encode_rgb,
    decode_pixels_rgb,
    jpeg_encode_rgb,
    pillow_decode_rgb,
    png_encode_rgb,
)

HAVE_PIL = importlib.util.find_spec("PIL") is not None
HAVE_SF = importlib.util.find_spec("soundfile") is not None


def _rgb(h=24, w=32, seed=5):
    return np.random.RandomState(seed).randint(0, 256, (h, w, 3), np.uint8)


def _ppm(arr):
    h, w, _ = arr.shape
    return f"P6\n{w} {h}\n255\n".encode() + arr.tobytes()


def _ppm16(h=4, w=4):
    return f"P6\n{w} {h}\n65535\n".encode() + b"\x00\x01" * (h * w * 3)


# --- the seams hold when the libraries are absent -----------------------------


@pytest.mark.skipif(HAVE_PIL, reason="Pillow present: seam replaced by adapter")
def test_pixel_seams_unchanged_without_pillow():
    """Without Pillow the adapter returns None and every honest seam is
    byte-for-byte what it was: 16-bit PPM raises NotImplementedError,
    unknown containers dispatch to None, truncated PNG stays the
    quarantine-contract ValueError."""
    assert pillow_decode_rgb(_ppm16()) is None
    with pytest.raises(NotImplementedError, match="16-bit PPM"):
        decode_pixels_rgb(_ppm16())
    assert decode_pixels_rgb(b"\x00definitely-not-an-image" * 3) is None
    png = png_encode_rgb(_rgb())
    with pytest.raises(ValueError):
        decode_pixels_rgb(png[: len(png) // 2])


@pytest.mark.skipif(HAVE_SF, reason="soundfile present: seam replaced by adapter")
def test_audio_seams_unchanged_without_soundfile():
    assert _soundfile_samples(b"\x00not-audio" * 4) is None
    with pytest.raises(ValueError, match="not a RIFF/WAVE container"):
        _decode_pcm(b"\x00not-audio" * 4)


# --- same-output contracts when the libraries are present ---------------------


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not in this image")
def test_pillow_same_pixels_on_shared_formats():
    """Where the stdlib codecs are pixel-exact (PNG, BMP, PPM), the Pillow
    adapter must produce the IDENTICAL grid — the two tiers can never
    drift on formats both decode."""
    arr = _rgb()
    for payload in (png_encode_rgb(arr), bmp_encode_rgb(arr), _ppm(arr)):
        got = pillow_decode_rgb(payload)
        assert got is not None and np.array_equal(got, arr)


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not in this image")
def test_pillow_jpeg_within_consumer_tolerance():
    """JPEG is NOT pixel-exact across decoders (integer IDCT variants,
    fancy-vs-nearest chroma upsampling — see jpeg_decode_rgb's docstring);
    the consumer contract is Hamming-tolerant hashing, so the adapter's
    4:4:4 decode must stay within a few LSBs of the in-process kernel."""
    arr = _rgb(32, 32, seed=9)
    payload = jpeg_encode_rgb(arr, subsample=False)
    ours = decode_pixels_rgb(payload)
    theirs = pillow_decode_rgb(payload)
    assert theirs is not None and theirs.shape == ours.shape
    assert int(np.abs(ours.astype(int) - theirs.astype(int)).max()) <= 2


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not in this image")
def test_pillow_upgrades_the_16bit_ppm_seam():
    got = decode_pixels_rgb(_ppm16())
    assert got is not None and got.shape == (4, 4, 3)


@pytest.mark.skipif(not HAVE_SF, reason="soundfile not in this image")
def test_soundfile_same_samples_on_pcm16_wav():
    """A 16-bit PCM WAV read through soundfile (dtype='int16') must yield
    the SAME mono int64 stream as the stdlib wave path."""
    from temporalvault_spark.operators.audio_fp import _synth_wav

    payload = _synth_wav(7)
    ours = _decode_pcm(payload)
    theirs = _soundfile_samples(payload)
    assert theirs is not None and np.array_equal(ours, theirs)


@pytest.mark.skipif(HAVE_PIL, reason="Pillow present: seam replaced by adapter")
def test_frame_seams_unchanged_without_pillow():
    """Without Pillow the frame adapter returns None and vfp64_frames keeps
    its contract: garbage raises the quarantine ValueError; a valid GIF
    still decodes through the stdlib tier."""
    from temporalvault_spark.operators.multimodal import (
        gif_encode_frames,
        pillow_decode_frames,
    )
    from temporalvault_spark.operators.videohash import vfp64_frames

    assert pillow_decode_frames(b"\x00not-a-container" * 3) is None
    with pytest.raises(ValueError, match="not a GIF container"):
        vfp64_frames(b"\x00not-a-container" * 3)
    g = np.zeros((16, 16), np.uint8)
    g[:8] = 255
    frames = [np.stack([g, g, g], axis=2)] * 3
    assert len(vfp64_frames(gif_encode_frames(frames))) == 3


@pytest.mark.skipif(not HAVE_PIL, reason="Pillow not in this image")
def test_pillow_same_frames_on_plain_gif():
    """Where the stdlib GIF codec decodes (non-interlaced, opaque), the
    Pillow frame adapter must compose the IDENTICAL canvases."""
    from temporalvault_spark.operators.multimodal import (
        gif_decode_frames,
        gif_encode_frames,
        pillow_decode_frames,
    )

    rng = np.random.RandomState(3)
    frames = [
        np.repeat(
            np.repeat(rng.randint(0, 2, (8, 8), np.uint8) * 255, 2, 0), 2, 1
        )
        for _ in range(4)
    ]
    frames = [np.stack([f, f, f], axis=2) for f in frames]
    payload = gif_encode_frames(frames)
    ours = gif_decode_frames(payload)
    theirs = pillow_decode_frames(payload)
    assert theirs is not None and len(theirs) == len(ours)
    for a, b in zip(ours, theirs):
        assert np.array_equal(a, b)
