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
    with pytest.raises(ValueError, match="not a binary PPM"):
        ahash64(b"\x89PNG\r\n\x1a\nxxxx")
    bad = b"P6\n15 16\n255\n" + bytes(15 * 16 * 3)
    with pytest.raises(ValueError, match="not divisible"):
        ahash64(bad)


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
