"""GIF codec (stdlib, public GIF87a/89a spec) + the video near-dup tier.

The same two evidence layers as the JPEG suite: SPEC PINS hand-assemble
GIF bytes (and one hand-traced LZW stream derived independently from the
spec's width rules) so an encoder bug can't certify a matching decoder
bug, then ROUND TRIPS cover palettes, multi-frame, sub-rectangle
composition, and disposal; the video tier gets crafted-corpus units for
the per-frame kernel, the quarantine contract, and the position-matched
voting rule.
"""

import struct

import numpy as np
import pytest

from temporalvault_spark.operators.multimodal import (
    _lzw_decode_gif,
    _lzw_encode_gif,
    gif_decode_frames,
    gif_encode_frames,
)
from temporalvault_spark.operators.videohash import (
    VID_FRAMES,
    VID_MATCH_MIN,
    VID_SIDE,
    vfp64_frames,
    vfp_frame,
    video_fp_pairs,
)

# hand-traced from the GIF89a LZW width rules (mcs=2, indices = [0]*16):
# codes CLEAR,0,6,7,8,9,0,EOI at widths 3,3,3,3,4,4,4,4, LSB-first packed
_HAND_LZW = bytes.fromhex("848f0905")


def test_lzw_hand_traced_spec_pin():
    assert _lzw_encode_gif([0] * 16, 2) == _HAND_LZW
    assert _lzw_decode_gif(_HAND_LZW, 2, 16) == [0] * 16


def test_lzw_roundtrips_cross_width_growth_and_reset():
    rng = np.random.RandomState(0)
    for mcs, nsym, ln in (
        (2, 4, 50),
        (2, 4, 5000),  # crosses several width growths + the early clear
        (8, 256, 300),
        (8, 256, 20000),
        (4, 16, 8000),
    ):
        idx = rng.randint(0, nsym, ln).tolist()
        assert _lzw_decode_gif(_lzw_encode_gif(idx, mcs), mcs, ln) == idx


def _gct(colors):
    """Pad a color list to a power-of-two GIF color table blob."""
    n = 2
    while n < len(colors):
        n <<= 1
    pal = list(colors) + [(0, 0, 0)] * (n - len(colors))
    return n, b"".join(bytes(c) for c in pal)


def _hand_gif(frames_meta, w, h, colors, bg=0):
    """Assemble a GIF89a byte-by-byte from the spec: frames_meta is a list
    of (left, top, fw, fh, mcs, lzw_bytes, disposal)."""
    n, gct = _gct(colors)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes((0x80 | (n.bit_length() - 2), bg, 0))
    out += gct
    for left, top, fw, fh, mcs, lzw, disp in frames_meta:
        out += b"\x21\xf9\x04" + bytes(((disp << 2),)) + b"\x00\x00\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", left, top, fw, fh) + b"\x00"
        out.append(mcs)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out.append(0x3B)
    return bytes(out)


def test_gif_hand_assembled_spec_pin():
    """A 4x4 single-frame GIF built entirely by hand (container AND the
    hand-traced LZW stream) decodes to a constant frame of palette[1]."""
    # indices all 0 -> the hand-traced stream; palette[0] = (10, 20, 30)
    gif = _hand_gif(
        [(0, 0, 4, 4, 2, _HAND_LZW, 0)], 4, 4,
        [(10, 20, 30), (1, 2, 3), (4, 5, 6), (7, 8, 9)],
    )
    frames = gif_decode_frames(gif)
    assert len(frames) == 1
    assert frames[0].shape == (4, 4, 3)
    assert (frames[0] == np.array([10, 20, 30], np.uint8)).all()


def test_gif_subrect_composition_and_disposal_background():
    """Frame 2 is a 2x2 patch at (1,1) composed onto frame 1's canvas;
    with disposal 2 on frame 2, a third frame sees the patch area restored
    to the background color."""
    full = _lzw_encode_gif([0] * 16, 2)
    patch = _lzw_encode_gif([1] * 4, 2)
    colors = [(100, 100, 100), (200, 0, 0), (0, 0, 0), (0, 0, 0)]
    gif = _hand_gif(
        [
            (0, 0, 4, 4, 2, full, 0),
            (1, 1, 2, 2, 2, patch, 2),  # disposal 2: restore background
            (0, 0, 4, 4, 2, full, 0),
        ],
        4, 4, colors, bg=0,
    )
    f1, f2, f3 = gif_decode_frames(gif)
    assert (f1 == 100).all()
    want2 = np.full((4, 4, 3), 100, np.uint8)
    want2[1:3, 1:3] = (200, 0, 0)
    assert (f2 == want2).all()
    assert (f3 == 100).all()  # full overwrite after background restore


def test_gif_roundtrip_multiframe_random_palette():
    rng = np.random.RandomState(3)
    frames = [
        (rng.randint(0, 7, (13, 9, 1)).repeat(3, axis=2) * 36).astype(np.uint8)
        for _ in range(4)
    ]
    dec = gif_decode_frames(gif_encode_frames(frames))
    assert len(dec) == 4
    for a, b in zip(frames, dec):
        assert (a == b).all()


def test_gif_roundtrip_gray_256_palette():
    rng = np.random.RandomState(5)
    g = rng.randint(0, 256, (16, 16)).astype(np.uint8)
    fr = np.stack([g, g, g], axis=2)
    dec = gif_decode_frames(gif_encode_frames([fr]))
    assert (dec[0] == fr).all()


def test_gif_honest_seams_and_dispatch():
    assert gif_decode_frames(b"not a gif") is None
    base = gif_encode_frames(
        [np.zeros((4, 4, 3), np.uint8)], loop=False
    )
    # flip the image descriptor's interlace flag
    b = bytearray(base)
    i = bytes(b).index(b"\x2c")
    b[i + 9] |= 0x40
    with pytest.raises(NotImplementedError, match="interlaced"):
        gif_decode_frames(bytes(b))
    # flip the GCE transparency flag
    b = bytearray(base)
    i = bytes(b).index(b"\x21\xf9")
    b[i + 3] |= 0x01
    with pytest.raises(NotImplementedError, match="transparency"):
        gif_decode_frames(bytes(b))
    # disposal 3 (restore previous)
    b = bytearray(base)
    b[i + 3] = 3 << 2
    with pytest.raises(NotImplementedError, match="restore previous"):
        gif_decode_frames(bytes(b))
    with pytest.raises(ValueError, match="256"):
        rng = np.random.RandomState(0)
        gif_encode_frames([rng.randint(0, 256, (32, 32, 3)).astype(np.uint8)])


def _gray_frames(grids):
    return [np.stack([g, g, g], axis=2).astype(np.uint8) for g in grids]


def _half_split_grid():
    g = np.zeros((VID_SIDE, VID_SIDE), np.uint8)
    g[:, VID_SIDE // 2 :] = 255
    return g


def test_vfp64_frames_known_pattern():
    """Every half-split frame hashes to the image tier's known pattern —
    the per-frame kernel IS phash's grid math."""
    gif = gif_encode_frames(_gray_frames([_half_split_grid()] * 3))
    assert vfp64_frames(gif) == ["00001111" * 8] * 3


def test_vfp_frame_quarantine_contract(spark):
    gif = gif_encode_frames(_gray_frames([_half_split_grid()] * 2))
    df = spark.createDataFrame(
        [(1, gif), (2, b"truncated garbage"), (3, gif[:-10])],
        "vid_id bigint, video binary",
    )
    rows = vfp_frame(df, errors="quarantine").collect()
    got = {(r["vid_id"], r["frame_idx"]): r["hash64"] for r in rows}
    assert got[(1, 0)] == got[(1, 1)] == "00001111" * 8
    assert got[(2, -1)] is None and got[(3, -1)] is None
    with pytest.raises(Exception, match="not a GIF|truncated"):
        vfp_frame(df).collect()
    with pytest.raises(ValueError, match="errors="):
        vfp_frame(df, errors="ignore")


def test_video_fp_pairs_voting_and_position_matching(spark):
    """A/B share all frames (pair), C shares too few positions (no pair),
    D holds A's frames SHIFTED by one position (no pair — the
    same-position rule is load-bearing)."""
    rng = np.random.RandomState(9)
    base = [
        (rng.randint(0, 2, (VID_SIDE, VID_SIDE)) * 255).astype(np.uint8)
        for _ in range(VID_FRAMES)
    ]
    distinct = [
        (rng.randint(0, 2, (VID_SIDE, VID_SIDE)) * 255).astype(np.uint8)
        for _ in range(VID_FRAMES)
    ]
    vids = [
        (0, gif_encode_frames(_gray_frames(base))),
        (1, gif_encode_frames(_gray_frames(base))),  # dup of 0
        (2, gif_encode_frames(_gray_frames(
            base[: VID_MATCH_MIN - 1] + distinct[VID_MATCH_MIN - 1 :]
        ))),  # one position short of the vote
        (3, gif_encode_frames(_gray_frames(base[1:] + base[:1]))),  # shifted
    ]
    df = spark.createDataFrame(vids, "vid_id bigint, video binary")
    pairs = {
        (r["vid_a"], r["vid_b"]): r["n_frames_matched"]
        for r in video_fp_pairs(vfp_frame(df)).collect()
    }
    assert pairs.get((0, 1)) == VID_FRAMES
    assert not any(2 in p or 3 in p for p in pairs)


def test_gif_header_truncation_is_clean_valueerror():
    """A GIF truncated before byte 13 (magic present, header incomplete)
    raises ValueError, not struct.error/IndexError — so vfp_frame's
    quarantine catches it (the review-pass finding)."""
    for payload in (b"GIF89a", b"GIF89a\x10\x00\x10\x00\x80"):
        with pytest.raises(ValueError, match="truncated"):
            gif_decode_frames(payload)


def test_gif_disposal2_background_uses_global_palette():
    """Disposal-2 restore pulls the background color from the GLOBAL color
    table even when the frame carries a LOCAL one (GIF89a: the
    logical-screen background index refers to the global table)."""
    full = _lzw_encode_gif([0] * 16, 2)
    patch = _lzw_encode_gif([1] * 4, 2)
    global_colors = [(100, 100, 100), (1, 1, 1), (0, 0, 0), (0, 0, 0)]
    local_colors = [(9, 9, 9), (200, 0, 0), (0, 0, 0), (0, 0, 0)]
    n, lct = _gct(local_colors)
    gif = bytearray(
        _hand_gif([(0, 0, 4, 4, 2, full, 0)], 4, 4, global_colors, bg=0)
    )
    gif.pop()  # drop the trailer; append frame 2 with a local table
    gif += b"\x21\xf9\x04" + bytes(((2 << 2),)) + b"\x00\x00\x00\x00"
    gif += b"\x2c" + struct.pack("<HHHH", 1, 1, 2, 2)
    gif += bytes((0x80 | (n.bit_length() - 2),)) + lct
    gif.append(2)
    for i in range(0, len(patch), 255):
        chunk = patch[i : i + 255]
        gif.append(len(chunk))
        gif += chunk
    gif.append(0)
    gif += b"\x2c" + struct.pack("<HHHH", 0, 0, 4, 4) + b"\x00"
    gif.append(2)
    for i in range(0, len(full), 255):
        chunk = full[i : i + 255]
        gif.append(len(chunk))
        gif += chunk
    gif.append(0)
    gif.append(0x3B)
    f1, f2, f3 = gif_decode_frames(bytes(gif))
    assert (f1 == 100).all()
    assert (f2[1:3, 1:3] == (200, 0, 0)).all()  # local palette paints the patch
    assert (f3 == 100).all()  # but the GLOBAL bg restored underneath


def test_gif_corrupt_mcs_and_alloc_bombs_raise_cleanly():
    """Second-review findings: a corrupt LZW minimum-code-size byte must
    raise (not hang building a 2^221-entry dictionary), header-declared
    giant dims must raise before allocating, and a frame rect outside the
    screen must raise — all as the clean ValueError quarantine catches."""
    base = gif_encode_frames([np.zeros((4, 4, 3), np.uint8)], loop=False)
    b = bytearray(base)
    i = bytes(b).index(b"\x2c")
    b[i + 10] = 221  # min code size byte
    with pytest.raises(ValueError, match="minimum code size"):
        gif_decode_frames(bytes(b))
    with pytest.raises(ValueError, match="invalid LZW minimum code size"):
        _lzw_decode_gif(b"\x00", 221, 4)
    # 65535x65535 logical screen from a tiny payload
    bomb = bytearray(base)
    bomb[6:10] = struct.pack("<HH", 65535, 65535)
    with pytest.raises(ValueError, match="cap"):
        gif_decode_frames(bytes(bomb))
    # frame rect beyond the 4x4 screen
    rect = bytearray(base)
    rect[i + 5 : i + 9] = struct.pack("<HH", 10, 10)  # fw=10, fh=10
    with pytest.raises(ValueError, match="outside|cap"):
        gif_decode_frames(bytes(rect))


def test_zero_frame_gif_is_degenerate_payload(spark):
    """A spec-valid header-only GIF (no image blocks) raises in the kernel
    and quarantines in vfp_frame — it can no longer silently vanish from
    the gate's accepted corpus."""
    import struct as _s

    empty = b"GIF89a" + _s.pack("<HH", 4, 4) + bytes((0x00, 0, 0)) + b"\x3b"
    assert gif_decode_frames(empty) == []
    with pytest.raises(ValueError, match="no frames"):
        vfp64_frames(empty)
    df = spark.createDataFrame([(9, empty)], "vid_id bigint, video binary")
    rows = vfp_frame(df, errors="quarantine").collect()
    assert [(r["vid_id"], r["frame_idx"], r["hash64"]) for r in rows] == [
        (9, -1, None)
    ]


def test_long_gif_sampled_to_position_slots():
    """A 13-frame GIF lands on exactly VID_FRAMES slots, first and last
    frames always included — so the packed fid can never overflow into a
    neighboring video's id space and clips of any length stay
    position-comparable."""
    grids = []
    for k in range(13):
        g = np.zeros((VID_SIDE, VID_SIDE), np.uint8)
        g[:, : 2 * (1 + k % 7)] = 255  # distinct per-frame hash
        grids.append(g)
    gif = gif_encode_frames(_gray_frames(grids))
    hs = vfp64_frames(gif)
    assert len(hs) == VID_FRAMES
    full = [
        vfp64_frames(gif_encode_frames(_gray_frames([g])))[0] for g in grids
    ]
    assert hs[0] == full[0] and hs[-1] == full[-1]
    picks = [round(i * 12 / (VID_FRAMES - 1)) for i in range(VID_FRAMES)]
    assert hs == [full[p] for p in picks]


def test_sample_frames_real_tier_gif(spark):
    """sample_frames' REAL tier: a 5-frame GIF video row yields every-2nd
    frame as a PNG payload whose pixels equal the composed GIF frames;
    non-GIF video payloads raise toward the ffmpeg seam."""
    from temporalvault_spark.operators.multimodal import (
        png_decode_rgb,
        sample_frames,
    )

    grids = []
    for k in range(5):
        g = np.zeros((8, 8), np.uint8)
        g[:, : 2 * (k + 1)] = 255
        grids.append(g)
    gif = gif_encode_frames(_gray_frames(grids))
    df = spark.createDataFrame(
        [(1, "video", gif)], "media_id bigint, kind string, payload binary"
    )
    rows = sorted(
        (r["frame_idx"], bytes(r["frame_payload"]))
        for r in sample_frames(df, every_n=2).collect()
    )
    assert [i for i, _ in rows] == [0, 2, 4]
    for i, png in rows:
        want = np.stack([grids[i]] * 3, axis=2)
        assert (png_decode_rgb(png) == want).all()
    bad = spark.createDataFrame(
        [(2, "video", b"\x00\x00\x00\x18ftypmp42 not a gif")],
        "media_id bigint, kind string, payload binary",
    )
    with pytest.raises(Exception, match="ffmpeg"):
        sample_frames(bad, every_n=2).collect()


def test_resize_images_real_tier_all_codecs(spark):
    """resize_images' REAL tier now covers every in-process codec: the
    same pixels resized from PNG, BMP, and JPEG payloads land on the same
    dims, PNG/BMP exactly equal (JPEG within quantization tolerance) —
    re-encoded as PNG."""
    from temporalvault_spark.operators.multimodal import (
        bmp_encode_rgb,
        jpeg_encode_rgb,
        png_decode_rgb,
        png_encode_rgb,
        resize_images,
    )

    rng = np.random.RandomState(2)
    arr = (rng.randint(0, 8, (64, 48, 1)).repeat(3, axis=2) * 30).astype(np.uint8)
    df = spark.createDataFrame(
        [
            (1, "image", png_encode_rgb(arr)),
            (2, "image", bmp_encode_rgb(arr)),
            (3, "image", jpeg_encode_rgb(arr, quality=95)),
        ],
        "media_id bigint, kind string, payload binary",
    )
    got = {
        r["media_id"]: (r["width"], r["height"], bytes(r["payload"]))
        for r in resize_images(df, max_side=16).collect()
    }
    assert all(v[:2] == (12, 16) for v in got.values())
    p1 = png_decode_rgb(got[1][2])
    p2 = png_decode_rgb(got[2][2])
    p3 = png_decode_rgb(got[3][2])
    assert (p1 == p2).all()
    assert np.abs(p1.astype(int) - p3.astype(int)).max() <= 30  # jpeg loss
