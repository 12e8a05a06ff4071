"""Baseline JPEG codec (stdlib+numpy, public spec ITU T.81 / JFIF).

Two independent evidence layers, so an encoder bug can't certify a
matching decoder bug:

1. SPEC PINS — tiny JPEG files hand-assembled byte-by-byte in this test
   from the T.81 segment layout (custom trivial huffman tables written
   into DHT), with expected pixels computed by a NAIVE double-loop IDCT
   written here from the textbook formula — zero shared code with the
   production einsum kernel.
2. ROUND TRIPS — jpeg_encode_rgb -> jpeg_decode_rgb across 4:4:4, 4:2:0
   (odd dims / crop), restart markers, every quality tier, grayscale
   exactness; plus format-parity: a JPEG and a PPM holding the same
   pixels hash identically through phash.ahash64.
"""

import struct

import numpy as np
import pytest

from temporalvault_spark.operators.multimodal import (
    _dct8_matrix,
    decode_pixels_rgb,
    jpeg_decode_rgb,
    jpeg_encode_rgb,
)


def _naive_idct(coef):
    """Textbook T.81 A.3.3 inverse DCT, double loop — deliberately NOT the
    production einsum path."""
    out = np.zeros((8, 8))
    for y in range(8):
        for x in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    cu = 1 / np.sqrt(2) if u == 0 else 1.0
                    cv = 1 / np.sqrt(2) if v == 0 else 1.0
                    s += (
                        cu * cv / 4 * coef[u, v]
                        * np.cos((2 * y + 1) * u * np.pi / 16)
                        * np.cos((2 * x + 1) * v * np.pi / 16)
                    )
            out[y, x] = s
    return out


def _seg(marker, body):
    return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body


def _tiny_gray_jpeg(dc_counts, dc_syms, ac_counts, ac_syms, entropy):
    """Hand-assembled 8x8 single-component baseline JPEG: quant table all
    16s, caller-supplied huffman tables and entropy bytes."""
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([16] * 64))
    out += _seg(0xC0, struct.pack(">BHHB", 8, 8, 8, 1) + bytes((1, 0x11, 0)))
    out += _seg(0xC4, bytes([0x00]) + bytes(dc_counts) + bytes(dc_syms))
    out += _seg(0xC4, bytes([0x10]) + bytes(ac_counts) + bytes(ac_syms))
    out += _seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    out += entropy
    out += b"\xff\xd9"
    return bytes(out)


def test_dct8_matrix_orthonormal():
    t = _dct8_matrix()
    assert np.allclose(t @ t.T, np.eye(8), atol=1e-12)


def test_spec_pin_dc_only_block():
    """DC huffman table = single symbol 4 (code '0'); stream encodes DC
    magnitude 8, then EOB. Dequantized DC = 8*16 = 128; a DC-only block
    is the constant coef/8 = 16 plane; +128 level shift -> every pixel
    144, replicated to RGB."""
    dc_counts = [1] + [0] * 15  # one 1-bit code -> symbol 4 (category 4)
    ac_counts = [1] + [0] * 15  # one 1-bit code -> symbol 0x00 (EOB)
    # bits: DC code '0', magnitude '1000' (8), EOB '0' -> 010000 + pad '11'
    jpg = _tiny_gray_jpeg(dc_counts, [4], ac_counts, [0x00], bytes([0b01000011]))
    arr = jpeg_decode_rgb(jpg)
    assert arr.shape == (8, 8, 3)
    assert (arr == 144).all()


def test_spec_pin_single_ac_coefficient():
    """DC table: codes '00'->cat 0, '01'->cat 4; AC table: '00'->EOB,
    '01'->(run 0, size 1). Stream: DC cat 0 (diff 0), AC +1 at zigzag
    position 1 (natural [0,1]), EOB. Expected plane from the naive
    double-loop IDCT with coef[0,1] = 1*16."""
    dc_counts = [0, 2] + [0] * 14
    ac_counts = [0, 2] + [0] * 14
    # bits: '00' (DC cat 0) '01' (AC rs=0x01) '1' (+1) '00' (EOB) + pad '1'
    jpg = _tiny_gray_jpeg(
        dc_counts, [0, 4], ac_counts, [0x00, 0x01], bytes([0b00011001])
    )
    arr = jpeg_decode_rgb(jpg)
    coef = np.zeros((8, 8))
    coef[0, 1] = 16.0
    want = np.clip(np.round(_naive_idct(coef)) + 128, 0, 255)
    assert (arr[:, :, 0] == want).all()
    assert (arr[:, :, 0] == arr[:, :, 1]).all() and (
        arr[:, :, 1] == arr[:, :, 2]
    ).all()


def _smooth_rgb(h=24, w=32):
    yy, xx = np.mgrid[0:h, 0:w]
    return np.stack([40 + yy * 2, 60 + xx * 2, 80 + yy + xx], axis=2).astype(
        np.uint8
    )


def test_roundtrip_smooth_gradient_quality_tiers():
    arr = _smooth_rgb()
    for quality, tol in ((95, 4), (75, 6), (50, 10)):
        dec = jpeg_decode_rgb(jpeg_encode_rgb(arr, quality=quality))
        assert dec.shape == arr.shape
        err = np.abs(dec.astype(int) - arr.astype(int)).max()
        assert err <= tol, (quality, err)


def test_roundtrip_gray_gradient_exact():
    """A pure-gray gradient quantizes losslessly at q95 (first-order
    coefficients, small quant steps) — the chroma channels are exactly
    128 so color conversion is the identity."""
    yy, xx = np.mgrid[0:16, 0:16]
    g = (40 + yy * 2 + xx).astype(np.uint8)
    arr = np.stack([g, g, g], axis=2)
    dec = jpeg_decode_rgb(jpeg_encode_rgb(arr, quality=95))
    assert (dec == arr).all()


def test_roundtrip_420_subsampling_odd_dims():
    """4:2:0 with 23x31 dims: MCU padding is cropped back to the exact
    frame dims and chroma upsampling stays within tolerance."""
    arr = _smooth_rgb()[:23, :31]
    dec = jpeg_decode_rgb(jpeg_encode_rgb(arr, quality=95, subsample=True))
    assert dec.shape == (23, 31, 3)
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 6


def test_roundtrip_restart_markers():
    arr = _smooth_rgb()
    enc = jpeg_encode_rgb(arr, quality=95, restart_interval=1)
    assert b"\xff\xd0" in enc and b"\xff\xdd" in enc  # RST0 fired, DRI set
    dec = jpeg_decode_rgb(enc)
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 4


def test_byte_stuffing_roundtrip():
    """An image tuned to emit 0xFF entropy bytes still round-trips (the
    0xFF00 stuffing path); verified by presence of a stuffed pair."""
    rng = np.random.RandomState(7)
    arr = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)
    enc = jpeg_encode_rgb(arr, quality=99)
    sos = enc.index(b"\xff\xda")
    assert b"\xff\x00" in enc[sos:]  # noise at q99 makes stuffing certain
    dec = jpeg_decode_rgb(enc)
    assert dec.shape == arr.shape  # lossy on noise; shape + no crash is the pin


def test_progressive_jpeg_raises_not_implemented():
    enc = bytearray(jpeg_encode_rgb(_smooth_rgb(), quality=90))
    i = bytes(enc).index(b"\xff\xc0")
    enc[i + 1] = 0xC2  # flip SOF0 -> SOF2 (progressive)
    with pytest.raises(NotImplementedError, match="progressive"):
        jpeg_decode_rgb(bytes(enc))


def test_non_jpeg_returns_none_and_truncated_raises():
    assert jpeg_decode_rgb(b"not a jpeg") is None
    enc = jpeg_encode_rgb(_smooth_rgb(), quality=90)
    with pytest.raises(ValueError, match="truncated entropy stream"):
        jpeg_decode_rgb(enc[:-20])  # cut inside the entropy segment
    with pytest.raises(ValueError, match="no SOS marker"):
        jpeg_decode_rgb(b"\xff\xd8\xff\xe0 jpeg-ish garbage")


def test_decode_pixels_rgb_dispatch_covers_all_four_codecs():
    from temporalvault_spark.operators.multimodal import (
        bmp_encode_rgb,
        png_encode_rgb,
    )

    arr = _smooth_rgb(16, 16)
    ppm = b"P6\n16 16\n255\n" + arr.tobytes()
    assert (decode_pixels_rgb(ppm) == arr).all()
    assert (decode_pixels_rgb(png_encode_rgb(arr)) == arr).all()
    assert (decode_pixels_rgb(bmp_encode_rgb(arr)) == arr).all()
    jd = decode_pixels_rgb(jpeg_encode_rgb(arr, quality=95))
    assert np.abs(jd.astype(int) - arr.astype(int)).max() <= 4
    assert decode_pixels_rgb(b"no known magic") is None
    with pytest.raises(NotImplementedError, match="16-bit PPM"):
        decode_pixels_rgb(b"P6\n2 2\n65535\n" + bytes(24))


def test_jpeg_and_ppm_hash_identically_when_lossless():
    """Format parity through the phash tier: a high-contrast block image
    whose gray gradient survives q95 quantization EXACTLY (verified)
    hashes identically from JPEG and PPM bytes — real-world compressed
    images dedup against uncompressed ones."""
    from temporalvault_spark.operators.phash import IMG_SIDE, ahash64

    half = np.zeros((IMG_SIDE, IMG_SIDE, 3), np.uint8)
    half[:, IMG_SIDE // 2 :] = 255
    ppm = b"P6\n%d %d\n255\n" % (IMG_SIDE, IMG_SIDE) + half.tobytes()
    jpg = jpeg_encode_rgb(half, quality=95)
    dec = jpeg_decode_rgb(jpg)
    # the hard-edge image is NOT pixel-exact under DCT (ringing) but every
    # block mean stays far from the global mean, so the aHash is identical
    assert ahash64(jpg) == ahash64(ppm) == "00001111" * 8
    assert np.abs(dec.astype(int) - half.astype(int)).max() <= 40  # ringing


def test_mixed_format_corpus_through_ahash_frame(spark):
    """One corpus, four container formats, one hash table — plus a
    truncated JPEG routed to quarantine instead of wedging the batch."""
    from temporalvault_spark.operators.multimodal import (
        bmp_encode_rgb,
        png_encode_rgb,
    )
    from temporalvault_spark.operators.phash import IMG_SIDE, ahash_frame

    half = np.zeros((IMG_SIDE, IMG_SIDE, 3), np.uint8)
    half[:, IMG_SIDE // 2 :] = 255
    ppm = b"P6\n%d %d\n255\n" % (IMG_SIDE, IMG_SIDE) + half.tobytes()
    jpg = jpeg_encode_rgb(half, quality=95)
    df = spark.createDataFrame(
        [
            (1, ppm),
            (2, png_encode_rgb(half)),
            (3, bmp_encode_rgb(half)),
            (4, jpg),
            (5, jpg[:-25]),  # truncated mid-entropy
        ],
        "img_id bigint, image binary",
    )
    rows = {
        r["img_id"]: r["hash64"]
        for r in ahash_frame(df, errors="quarantine").collect()
    }
    want = "00001111" * 8
    assert rows[1] == rows[2] == rows[3] == rows[4] == want
    assert rows[5] is None


def test_image_histogram_feature_format_parity(spark):
    """extract_features' real tier rides the shared pixel dispatch: the
    same pixels featurize identically from PPM and PNG bytes, and within
    float tolerance from JPEG bytes."""
    from temporalvault_spark.operators.multimodal import (
        extract_features,
        png_encode_rgb,
    )

    arr = _smooth_rgb(16, 16)
    ppm = b"P6\n16 16\n255\n" + arr.tobytes()
    df = spark.createDataFrame(
        [
            (1, "image", ppm),
            (2, "image", png_encode_rgb(arr)),
            (3, "image", jpeg_encode_rgb(arr, quality=95)),
        ],
        "media_id bigint, kind string, payload binary",
    )
    feats = {
        r["media_id"]: np.array(r["feature"])
        for r in extract_features(df, dim=8).collect()
    }
    assert np.array_equal(feats[1], feats[2])
    assert np.abs(feats[1] - feats[3]).max() < 0.05  # q95 luma drift


def test_corrupt_jpeg_raises_clean_valueerror_not_indexerror():
    """The quarantine contract: corrupt JPEG streams surface as ValueError
    (what ahash_frame/vfp_frame quarantine catches), never raw
    IndexError/KeyError/struct.error — the review-pass finding."""
    for payload in (
        b"\xff\xd8\xff\xc0\x00\x02",  # empty SOF segment
        b"\xff\xd8\xff\xc4\x00\x05\x00\x01",  # truncated DHT counts
        b"\xff\xd8\xff\xdb\x00\x03\x00",  # truncated DQT
    ):
        with pytest.raises(ValueError):
            jpeg_decode_rgb(payload)


def test_scan_component_mismatch_is_honest_seam():
    """A SOS naming components the SOF didn't declare (the multi-scan /
    non-interleaved shape) raises NotImplementedError, not KeyError."""
    enc = bytearray(jpeg_encode_rgb(_smooth_rgb(), quality=90))
    i = bytes(enc).index(b"\xff\xda")
    enc[i + 5] = 9  # first scan component id 1 -> 9 (absent from SOF)
    with pytest.raises(NotImplementedError, match="multi-scan"):
        jpeg_decode_rgb(bytes(enc))


def test_grayscale_declared_subsampling_decodes_non_interleaved():
    """A single-component frame is non-interleaved regardless of declared
    sampling factors (T.81 A.2.2): hv=0x22 must decode identically to
    hv=0x11, not with 4-blocks-per-MCU interleaved geometry."""
    dc_counts = [1] + [0] * 15
    ac_counts = [1] + [0] * 15
    jpg = bytearray(
        _tiny_gray_jpeg(dc_counts, [4], ac_counts, [0x00], bytes([0b01000011]))
    )
    i = bytes(jpg).index(b"\xff\xc0")
    assert jpg[i + 11] == 0x11  # component sampling byte
    jpg[i + 11] = 0x22
    arr = jpeg_decode_rgb(bytes(jpg))
    assert arr.shape == (8, 8, 3) and (arr == 144).all()


def test_restart_marker_with_fill_bytes():
    """Spec-legal 0xFF fill padding before an RSTn marker decodes (T.81
    B.1.1.2) — the entropy-segment restart path skips fill bytes like the
    marker walk does."""
    arr = _smooth_rgb()
    enc = jpeg_encode_rgb(arr, quality=95, restart_interval=1)
    sos = enc.index(b"\xff\xda")
    rst = enc.index(b"\xff\xd0", sos)
    padded = enc[:rst] + b"\xff" + enc[rst:]  # FF D0 -> FF FF D0
    dec = jpeg_decode_rgb(padded)
    assert np.abs(dec.astype(int) - arr.astype(int)).max() <= 4


def test_corrupt_sampling_and_dims_raise_cleanly():
    """Second-review findings: a zero sampling factor must not escape as
    ZeroDivisionError, and header-declared giant dims must raise before
    any allocation — both as the clean ValueError quarantine catches."""
    enc = bytearray(jpeg_encode_rgb(_smooth_rgb(), quality=90))
    i = bytes(enc).index(b"\xff\xc0")
    samp = bytearray(enc)
    samp[i + 11] = 0x01  # component 1 sampling 1x1 -> 0x01 keeps v=1, h=0
    with pytest.raises(ValueError, match="sampling factor"):
        jpeg_decode_rgb(bytes(samp))
    bomb = bytearray(enc)
    bomb[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)
    with pytest.raises(ValueError, match="cap"):
        jpeg_decode_rgb(bytes(bomb))
