"""Hypothesis property suites for the in-process codecs — the randomized
differential tier (the substring-apply/merge_asof precedent) applied to
the round's two new byte-level kernels. Shrinking makes any width-rule or
composition counterexample minimal, which hand-picked round-trips can't."""

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from temporalvault_spark.operators.multimodal import (
    _lzw_decode_gif,
    _lzw_encode_gif,
    gif_decode_frames,
    gif_encode_frames,
    jpeg_decode_rgb,
    jpeg_encode_rgb,
)

_CODEC_SETTINGS = dict(
    max_examples=40,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


@settings(**_CODEC_SETTINGS)
@given(
    mcs=st.integers(min_value=2, max_value=8),
    data=st.data(),
)
def test_lzw_roundtrip_property(mcs, data):
    """Any index stream over any legal alphabet round-trips — including
    runs (KwKwK chains), width growth, and the early dictionary reset."""
    n = data.draw(st.integers(min_value=1, max_value=3000))
    idx = data.draw(
        st.lists(
            st.integers(min_value=0, max_value=(1 << mcs) - 1),
            min_size=n,
            max_size=n,
        )
    )
    assert _lzw_decode_gif(_lzw_encode_gif(idx, mcs), mcs, n) == idx


@settings(**_CODEC_SETTINGS)
@given(
    w=st.integers(min_value=1, max_value=24),
    h=st.integers(min_value=1, max_value=24),
    n_frames=st.integers(min_value=1, max_value=4),
    n_colors=st.integers(min_value=1, max_value=17),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_roundtrip_property(w, h, n_frames, n_colors, seed):
    """Any stack of same-shape frames over <= 256 colors round-trips
    exactly — palette build, LZW, and frame composition are lossless."""
    rng = np.random.RandomState(seed)
    colors = rng.randint(0, 256, (n_colors, 3)).astype(np.uint8)
    frames = [
        colors[rng.randint(0, n_colors, (h, w))] for _ in range(n_frames)
    ]
    dec = gif_decode_frames(gif_encode_frames(frames))
    assert len(dec) == n_frames
    for a, b in zip(frames, dec):
        assert (a == b).all()


@settings(**_CODEC_SETTINGS)
@given(
    bw=st.integers(min_value=1, max_value=5),
    bh=st.integers(min_value=1, max_value=5),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    subsample=st.booleans(),
    restart=st.sampled_from([0, 1, 3]),
)
def test_jpeg_blockwise_constant_property(bw, bh, seed, subsample, restart):
    """Gray images constant within every 16x16 tile survive q95 JPEG
    within +-1 per pixel for ANY dims/subsampling/restart combination —
    DC-only blocks quantize near-losslessly, and chroma stays exactly
    neutral. A pure-decoder geometry bug (MCU order, upsample, crop,
    restart alignment) shows up as a large error immediately."""
    rng = np.random.RandomState(seed)
    tiles = rng.randint(30, 226, (bh, bw)).astype(np.uint8)
    g = np.repeat(np.repeat(tiles, 16, axis=0), 16, axis=1)
    # odd crop exercises the padding/crop path without breaking tiles
    g = g[: g.shape[0] - (seed % 3), : g.shape[1] - (seed % 5)]
    if g.size == 0:
        return
    arr = np.stack([g, g, g], axis=2)
    enc = jpeg_encode_rgb(
        arr, quality=95, subsample=subsample, restart_interval=restart
    )
    dec = jpeg_decode_rgb(enc)
    assert dec.shape == arr.shape
    # interior of each tile is flat; edges can ring after the crop, so
    # bound the MEDIAN error tightly and the max loosely
    err = np.abs(dec.astype(int) - arr.astype(int))
    assert np.median(err) <= 1
    assert err.max() <= 40


@given(
    frac=st.sampled_from([0.1, 0.3, 0.5, 0.7, 0.9]),
    seed=st.integers(0, 5),
)
@settings(max_examples=30, deadline=None)
def test_truncated_payloads_keep_the_quarantine_error_contract(frac, seed):
    """EVERY decode kernel must fail truncated payloads with ValueError /
    NotImplementedError (what the gates' errors='quarantine' tier catches)
    or dispatch to None — never a raw zlib.error / struct.error /
    IndexError, which would escape the quarantine catch and wedge an
    ingest gate in an infinite batch-replay loop. Round-12 finding: a
    truncated PNG used to raise raw zlib.error from the IDAT inflate."""
    import numpy as np

    from temporalvault_spark.operators.audio_fp import _synth_wav, afp64
    from temporalvault_spark.operators.multimodal import (
        bmp_encode_rgb,
        decode_pixels_rgb,
        gif_encode_frames,
        jpeg_encode_rgb,
        png_encode_rgb,
    )
    from temporalvault_spark.operators.videohash import vfp64_frames

    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 256, (16, 16, 3), np.uint8)
    frames = [rng.randint(0, 2, (16, 16), np.uint8) * 255 for _ in range(3)]
    frames = [np.stack([f, f, f], axis=2) for f in frames]
    payloads = [
        (decode_pixels_rgb, png_encode_rgb(arr)),
        (decode_pixels_rgb, bmp_encode_rgb(arr)),
        (decode_pixels_rgb, jpeg_encode_rgb(arr)),
        (vfp64_frames, gif_encode_frames(frames)),
        (afp64, _synth_wav(seed)),
    ]
    for fn, payload in payloads:
        cut = payload[: max(2, int(len(payload) * frac))]
        try:
            fn(cut)  # a successful parse of a prefix is acceptable
        except (ValueError, NotImplementedError):
            pass  # the quarantine contract
