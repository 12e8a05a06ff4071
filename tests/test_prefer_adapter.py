"""Round-13 verdict task 6: the throughput-tier decode dispatch.

``decode_pixels_rgb(payload, prefer_adapter=True)`` routes PNG/BMP to the
C-backed Pillow decoder FIRST (stdlib fallback) on workers that have it —
the formats where the adapter contract tests prove byte-equal pixels.
JPEG stays stdlib either way (chroma LSBs differ), PPM stays stdlib (a
zero-copy frombuffer already beats a Pillow round-trip). The flag is
plumbed through ahash_frame into the image and joint-multimodal gates,
captured in the kernel closure (so it ships with the task, not via module
state). These tests pin the contract: identical pixels and identical gate
VERDICTS under both dispatch orders — on a Pillow-less worker the flag is
a no-op by construction, so the equality holds in every environment."""

import numpy as np

from temporalvault_spark.operators import multimodal as mm
from temporalvault_spark.operators.multimodal import (
    bmp_encode_rgb,
    decode_pixels_rgb,
    png_encode_rgb,
)


def _arr(seed, side=16):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, (side, side, 3), dtype=np.uint8)


def test_dispatch_orders_pixel_equal_png_bmp():
    for enc in (png_encode_rgb, bmp_encode_rgb):
        for seed in (1, 2, 3):
            p = enc(_arr(seed))
            a = decode_pixels_rgb(p)
            b = decode_pixels_rgb(p, prefer_adapter=True)
            assert (a == b).all() and a.dtype == b.dtype == np.uint8


def test_prefer_adapter_engages_pillow_on_png(monkeypatch):
    """When Pillow is importable, prefer_adapter=True must actually route
    the PNG through the adapter (and the default order must NOT); when it
    is absent, both orders run stdlib — either way the pixels match."""
    calls = {"n": 0}
    real = mm.pillow_decode_rgb

    def counting(payload, strict=True):
        calls["n"] += 1
        return real(payload, strict)

    monkeypatch.setattr(mm, "pillow_decode_rgb", counting)
    p = png_encode_rgb(_arr(7))
    mm.decode_pixels_rgb(p)
    assert calls["n"] == 0  # default order: stdlib decoded it, no adapter
    mm.decode_pixels_rgb(p, prefer_adapter=True)
    assert calls["n"] == 1  # preferred order consulted the adapter first


def test_image_gate_verdicts_identical_under_both_orders(
    spark, tmp_path_factory
):
    """The gate-level contract the verdict asked for: the SAME two-batch
    PNG ingest (cross-batch near-dup, within-batch pair, novel image) run
    through the image gate under both dispatch orders lands the identical
    accepted set and index rows."""
    from temporalvault_spark.operators.phash import IMG_SIDE
    from temporalvault_spark.streaming import image_dedup_ingest_stream

    def grid(pattern):
        # 64-cell pattern -> IMG_SIDE x IMG_SIDE black/white blocks
        cell = IMG_SIDE // 8
        arr = np.zeros((IMG_SIDE, IMG_SIDE, 3), np.uint8)
        for i, bit in enumerate(pattern):
            if bit == "1":
                y, x = divmod(i, 8)
                arr[y * cell : (y + 1) * cell, x * cell : (x + 1) * cell] = 255
        return arr

    rng = np.random.RandomState(3)
    base = "".join(rng.choice(["0", "1"], 64))
    far = "".join("1" if c == "0" else "0" for c in base)

    def flip(pat, *idxs):
        s = list(pat)
        for i in idxs:
            s[i] = "1" if s[i] == "0" else "0"
        return "".join(s)

    b1 = [(0, png_encode_rgb(grid(base))), (1, png_encode_rgb(grid(far)))]
    b2 = [
        (100, png_encode_rgb(grid(flip(base, 5)))),  # cross-batch dup of 0
        (101, png_encode_rgb(grid(flip(base, *range(0, 64, 2))))),  # novel
    ]
    results = []
    for prefer in (False, True):
        root = tmp_path_factory.mktemp(f"pa_{prefer}")
        src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
        df1 = spark.createDataFrame(b1, "img_id bigint, image binary")
        df1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
        stream = spark.readStream.schema(df1.schema).parquet(f"{src}/*.parquet")
        image_dedup_ingest_stream(
            stream, idx, acc, str(root / "ck1"), prefer_adapter=prefer
        )
        spark.createDataFrame(b2, "img_id bigint, image binary").write.mode(
            "overwrite"
        ).parquet(f"{src}/b2.parquet")
        image_dedup_ingest_stream(
            stream, idx, acc, str(root / "ck1"), prefer_adapter=prefer
        )
        accepted = sorted(
            r["img_id"] for r in spark.read.parquet(acc).collect()
        )
        index_rows = sorted(
            (r["img_id"], r["hash64"])
            for r in spark.read.parquet(idx).select("img_id", "hash64").collect()
        )
        results.append((accepted, index_rows))
    assert results[0] == results[1]
    assert results[0][0] == [0, 1, 101]  # 100 cross-rejected both ways


# --- round-14: the mixed-fleet fail-fast (round-13 ADVICE #2) -----------------


def test_fleet_verdict_mixed_raises():
    """A mixed probe result must fail loudly — quarantine verdicts for
    damaged payloads would otherwise ride task placement across replays."""
    import pytest

    with pytest.raises(ValueError, match="MIXED fleet"):
        mm._fleet_verdict([True, False, True])


def test_fleet_verdict_uniform():
    assert mm._fleet_verdict([True] * 4) is True
    assert mm._fleet_verdict([False] * 4) is False
    assert mm._fleet_verdict([]) is False  # no probes -> treat as adapter-less


def test_fleet_probe_matches_driver_availability(spark):
    """In local mode every probe task shares this interpreter, so the
    cluster probe must agree with the driver-side availability check —
    and the guard must not throw on a (necessarily uniform) local fleet."""
    assert mm.assert_homogeneous_pillow_fleet(spark, n_probes=8) is bool(
        mm._pillow_available()
    )
