"""Perceptual image near-dup: the aHash kernel over real PPM bytes and the
Hamming-banded pair query (the image column of the dedup matrix)."""

import pytest

from temporalvault_spark.operators.phash import (
    IMG_SIDE,
    PHASH_THRESHOLD,
    _synth_ppm,
    ahash64,
    ahash_frame,
    phash_hamming_pairs,
    synth_ppm_images,
)


def _ppm(pixels):
    """16x16 P6 from a [(r,g,b)]*256 row-major list."""
    body = bytes(c for px in pixels for c in px)
    return b"P6\n%d %d\n255\n" % (IMG_SIDE, IMG_SIDE) + body


def _half_split():
    """Left half black, right half white -> hash is 00001111 per grid row."""
    return [
        (0, 0, 0) if x < IMG_SIDE // 2 else (255, 255, 255)
        for _y in range(IMG_SIDE)
        for x in range(IMG_SIDE)
    ]


def test_ahash64_known_pattern_exact():
    assert ahash64(_ppm(_half_split())) == "00001111" * 8


def test_ahash64_one_pixel_flip_is_tiny_hamming():
    """A single flipped pixel moves at most one block across the mean —
    Hamming distance <= 1 from the base hash."""
    base = _half_split()
    tweaked = list(base)
    tweaked[0] = (255, 255, 255)  # one black pixel -> white
    h0, h1 = ahash64(_ppm(base)), ahash64(_ppm(tweaked))
    d = sum(a != b for a, b in zip(h0, h1))
    assert d <= 1


def test_ahash64_rejects_non_ppm_and_bad_dims():
    # JPEG magic bytes now dispatch to the real baseline decoder, which
    # rejects the garbage marker stream on its own terms
    with pytest.raises(ValueError, match="no SOS marker"):
        ahash64(b"\xff\xd8\xff\xe0 jpeg-ish garbage")
    with pytest.raises(ValueError, match="not a binary PPM"):
        ahash64(b"no known image magic at all")
    with pytest.raises(ValueError, match="IHDR"):
        ahash64(b"\x89PNG\r\n\x1a\nxxxx")  # PNG signature, truncated body
    bad = b"P6\n15 16\n255\n" + bytes(15 * 16 * 3)
    with pytest.raises(ValueError, match="not divisible"):
        ahash64(bad)


# --- PNG tier (round 11): stdlib zlib codec feeding the same integer hash ---


def _pixels_array(pixels):
    import numpy as np

    return np.array(pixels, dtype=np.uint8).reshape(IMG_SIDE, IMG_SIDE, 3)


@pytest.mark.parametrize("filter_type", [0, 1, 2, 3, 4])
def test_png_roundtrip_every_filter(filter_type):
    """Encode with each scanline filter, decode, get the exact pixel grid
    back — every unfilter branch (None/Sub/Up/Average/Paeth) exercised."""
    import numpy as np

    from temporalvault_spark.operators.multimodal import (
        png_decode_rgb,
        png_encode_rgb,
    )

    arr = _pixels_array([(x * 16 % 256, y * 16 % 256, (x * y) % 256)
                         for y in range(IMG_SIDE) for x in range(IMG_SIDE)])
    out = png_decode_rgb(png_encode_rgb(arr, filter_type=filter_type))
    assert out is not None and np.array_equal(out, arr)


def test_png_and_ppm_same_pixels_hash_identically():
    """The verdict-#3 contract: PNG(img) and PPM(same pixels) produce the
    SAME ahash64 — format-independent dedup, through the real zlib
    inflate+unfilter path."""
    from temporalvault_spark.operators.multimodal import png_encode_rgb

    px = _half_split()
    for ft in (0, 2, 4):
        assert ahash64(png_encode_rgb(_pixels_array(px), filter_type=ft)) == \
            ahash64(_ppm(px)) == "00001111" * 8


def test_png_gray_and_rgba_tiers():
    """Color type 0 (grayscale, replicated to RGB) and 6 (RGBA, alpha
    dropped) decode to the RGB grid ahash64 expects; 16-bit depth raises
    the honest-seam NotImplementedError."""
    import struct
    import zlib

    import numpy as np

    from temporalvault_spark.operators.multimodal import _PNG_SIG, png_decode_rgb

    def chunk(typ, data):
        return struct.pack(">I", len(data)) + typ + data + struct.pack(
            ">I", zlib.crc32(typ + data)
        )

    def make_png(ctype, depth, rows):
        ihdr = struct.pack(">IIBBBBB", IMG_SIDE, IMG_SIDE, depth, ctype, 0, 0, 0)
        raw = b"".join(b"\x00" + r for r in rows)
        return (_PNG_SIG + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    g = [bytes((x * 17) % 256 for x in range(IMG_SIDE)) for _ in range(IMG_SIDE)]
    gray = png_decode_rgb(make_png(0, 8, g))
    assert gray.shape == (IMG_SIDE, IMG_SIDE, 3)
    assert np.array_equal(gray[:, :, 0], gray[:, :, 2])
    assert gray[0, 1, 0] == 17

    rgba_rows = [
        bytes(c for x in range(IMG_SIDE) for c in (x, 2 * x, 3 * x % 256, 128))
        for _ in range(IMG_SIDE)
    ]
    rgba = png_decode_rgb(make_png(6, 8, rgba_rows))
    assert rgba.shape == (IMG_SIDE, IMG_SIDE, 3)
    assert tuple(rgba[5, 3]) == (3, 6, 9)  # alpha stripped

    with pytest.raises(NotImplementedError, match="stdlib tier"):
        png_decode_rgb(make_png(2, 16, [bytes(IMG_SIDE * 6)] * IMG_SIDE))


def test_mixed_format_corpus_dedups_cross_format(spark):
    """A PNG re-encode of a PPM image is found by the banded pair query at
    Hamming 0 — the phash stage accepts mixed formats in one frame."""
    from temporalvault_spark.operators.multimodal import png_decode_rgb, png_encode_rgb

    ppm = _synth_ppm(0)
    from temporalvault_spark.operators.phash import _decode_pixels

    png = png_encode_rgb(_decode_pixels(ppm), filter_type=4)
    far = _ppm([(255 * ((x + y) % 2),) * 3
                for y in range(IMG_SIDE) for x in range(IMG_SIDE)])
    df = spark.createDataFrame(
        [(1, ppm), (2, png), (3, far)], "img_id bigint, image binary"
    )
    pairs = {(r["img_a"], r["img_b"], r["hamming"])
             for r in phash_hamming_pairs(ahash_frame(df)).collect()}
    assert (1, 2, 0) in pairs
    assert not any(3 in (a, b) for a, b, _ in pairs)


def test_pairs_found_and_rejected(spark):
    """Crafted corpus through the REAL kernel end-to-end: a one-pixel
    variant pairs with its base (small Hamming), the inverted image does
    not (Hamming ~64); pigeonhole holds for a 3-bit-spread fake pair."""
    base = _half_split()
    variant = list(base)
    variant[17] = (255, 255, 255)
    inverted = [
        (255, 255, 255) if x < IMG_SIDE // 2 else (0, 0, 0)
        for _y in range(IMG_SIDE)
        for x in range(IMG_SIDE)
    ]
    images = spark.createDataFrame(
        [(1, _ppm(base)), (2, _ppm(variant)), (3, _ppm(inverted))],
        "img_id bigint, image binary",
    )
    hashes = ahash_frame(images)
    got = {(r["img_a"], r["img_b"]): r["hamming"] for r in phash_hamming_pairs(hashes).collect()}
    assert set(got) == {(1, 2)}
    assert got[(1, 2)] <= PHASH_THRESHOLD

    # pigeonhole: 3 differing bits spread across 3 bands still collide on
    # the 4th band, so the pair is ALWAYS proposed and verified
    h = "0" * 64
    h3 = "1" + h[1:16] + "1" + h[17:32] + "1" + h[33:]
    assert len(h3) == 64
    fake = spark.createDataFrame(
        [(10, h), (11, h3)], "img_id bigint, hash64 string"
    )
    got2 = {(r["img_a"], r["img_b"]): r["hamming"] for r in phash_hamming_pairs(fake).collect()}
    assert got2 == {(10, 11): 3}


def test_synth_pipeline_matches_driver_side_kernel(spark):
    """The Arrow-batched synth+decode+hash pipeline must equal the plain
    Python kernel on the same ids (pins the mapInPandas plumbing: binary
    round-trip, batch shapes, schema)."""
    docs = spark.createDataFrame(
        [(i, "t", "en", "s", 1) for i in range(0, 130, 10)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    got = {
        r["img_id"]: r["hash64"]
        for r in ahash_frame(synth_ppm_images(docs)).collect()
    }
    want = {i: ahash64(_synth_ppm(i)) for i in range(0, 130, 10)}
    assert got == want and len(got) == 13


def test_dedup_image_apply_keeper_rule(spark):
    """Components over crafted hash pairs: {1,2,3} chain (1-2 and 2-3 near,
    1-3 transitively grouped) keeps only 1; isolated 9 survives."""
    from pyspark.sql import functions as F

    from temporalvault_spark.operators.dedup_cluster import connected_components
    from temporalvault_spark.operators.phash import phash_hamming_pairs

    h = "0" * 64
    # 2 is 3 bits from 1; 3 is 3 bits from 2 (6 from 1 — still banded via 2)
    h2 = "111" + h[3:]
    h3 = "111" + h[3:16] + "111" + h[19:]
    h9 = ("10" * 32)
    hashes = spark.createDataFrame(
        [(1, h), (2, h2), (3, h3), (9, h9)], "img_id bigint, hash64 string"
    )
    pairs = phash_hamming_pairs(hashes)
    comps = connected_components(
        pairs.select(F.col("img_a").alias("src"), F.col("img_b").alias("dst"))
    )
    drop = {
        r["node"]
        for r in comps.filter(F.col("node") != F.col("component")).collect()
    }
    assert drop == {2, 3}
    kept = {r["img_id"] for r in hashes.join(
        comps.filter(F.col("node") != F.col("component"))
        .select(F.col("node").alias("img_id")),
        "img_id", "left_anti").collect()}
    assert kept == {1, 9}


def test_bmp_roundtrip_and_hash_identity():
    """24-bit BMP: bottom-up and top-down encodings round-trip to the exact
    pixel grid (including a padded-stride width), and a BMP of the same
    pixels hashes identically to the PPM/PNG forms — the third real
    in-process image format."""
    import numpy as np

    from temporalvault_spark.operators.multimodal import (
        bmp_decode_rgb,
        bmp_encode_rgb,
    )

    # padded stride: w=10 -> 30 bytes/row, padded to 32
    arr = np.array(
        [[(x * 20 % 256, y * 30 % 256, (x + y) % 256) for x in range(10)]
         for y in range(6)],
        dtype=np.uint8,
    )
    for td in (False, True):
        out = bmp_decode_rgb(bmp_encode_rgb(arr, top_down=td))
        assert out is not None and np.array_equal(out, arr), td

    px = _half_split()
    bmp = bmp_encode_rgb(_pixels_array(px))
    assert ahash64(bmp) == ahash64(_ppm(px)) == "00001111" * 8


def test_bmp_unsupported_tiers_raise():
    import struct

    import pytest as _pytest

    from temporalvault_spark.operators.multimodal import (
        bmp_decode_rgb,
        bmp_encode_rgb,
    )
    import numpy as np

    good = bmp_encode_rgb(np.zeros((8, 8, 3), np.uint8))
    # flip bpp to 8 (palette) in the info header
    bad = good[:28] + struct.pack("<H", 8) + good[30:]
    with _pytest.raises(NotImplementedError, match="stdlib tier"):
        bmp_decode_rgb(bad)
    assert bmp_decode_rgb(b"not a bmp at all") is None


def test_ahash_frame_quarantine_mode(spark):
    """errors='quarantine': one corrupt payload in a batch yields
    hash64=NULL instead of killing the task; valid rows hash normally;
    the default mode still raises."""
    from pyspark.errors.exceptions.captured import PythonException

    df = spark.createDataFrame(
        [(1, _ppm(_half_split())), (2, b"truncated garbage"), (3, _synth_ppm(0))],
        "img_id bigint, image binary",
    )
    rows = {r["img_id"]: r["hash64"] for r in ahash_frame(df, errors="quarantine").collect()}
    assert rows[2] is None
    assert rows[1] == "00001111" * 8 and rows[3] == ahash64(_synth_ppm(0))
    with pytest.raises(PythonException, match="not a binary PPM"):
        ahash_frame(df).collect()  # default: corrupt payload fails the task
    with pytest.raises(ValueError, match="errors="):
        ahash_frame(df, errors="ignore")
