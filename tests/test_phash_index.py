"""Persisted phash band index + streaming image gate: the image cell of
the incremental-index family (build-once / probe-batch, directory-level
pruning, growth contract, exactly-once ingest)."""

import os
import re
import shutil

import pytest

from temporalvault_spark.operators.phash import IMG_SIDE, ahash_frame
from temporalvault_spark.operators.phash_index import (
    build_phash_index,
    phash_index_occupancy,
    query_phash_index,
    rebuild_phash_index_if_grown,
)
from temporalvault_spark.plans import executed_plan
from tests.test_phash import _half_split, _ppm


def _img(base, *flips):
    px = list(base)
    for i in flips:
        px[i] = (255, 255, 255) if px[i] == (0, 0, 0) else (0, 0, 0)
    return px


def _images(spark, rows):
    return spark.createDataFrame(rows, "img_id bigint, image binary")


def _hashes(spark, rows):
    return ahash_frame(_images(spark, rows)).localCheckpoint(eager=True)


@pytest.fixture(scope="module")
def corpus(spark):
    base = _half_split()
    inverted = [
        (255, 255, 255) if x < IMG_SIDE // 2 else (0, 0, 0)
        for _y in range(IMG_SIDE)
        for x in range(IMG_SIDE)
    ]
    return {"base": base, "inverted": inverted}


@pytest.fixture(scope="module")
def index_path(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ph_index") / "idx")
    build_phash_index(
        _hashes(
            spark,
            [
                (1, _ppm(corpus["base"])),
                (2, _ppm(_img(corpus["base"], 3))),  # 1-pixel variant of 1
                (3, _ppm(corpus["inverted"])),
            ],
        ),
        path,
    )
    return path


def test_probe_finds_near_dup_with_exact_hamming(spark, corpus, index_path):
    """A near-copy probes to its indexed originals with the exact Hamming
    the kernel computes; the inverted probe pairs with nothing near."""
    probe = _hashes(spark, [(100, _ppm(_img(corpus["base"], 200)))])
    got = {
        (r["query_img"], r["index_img"]): r["hamming"]
        for r in query_phash_index(spark, index_path, probe).collect()
    }
    assert set(got) == {(100, 1), (100, 2)}
    assert all(v <= 2 for v in got.values())


def test_probe_scan_is_partition_pruned(spark, corpus, index_path):
    probe = _hashes(spark, [(100, _ppm(corpus["base"]))])
    df = query_phash_index(spark, index_path, probe)
    df.collect()
    plan = executed_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "band" in m.group(1) and "bkt" in m.group(1), plan[:1500]


def test_self_pairs_excluded(spark, corpus, index_path):
    probe = _hashes(spark, [(1, _ppm(corpus["base"]))])
    got = {
        (r["query_img"], r["index_img"])
        for r in query_phash_index(spark, index_path, probe).collect()
    }
    assert (1, 1) not in got and (1, 2) in got


def test_append_equals_fresh_build(spark, corpus, tmp_path_factory):
    """build(A) + append(B) probes identically to build(A ∪ B); the append
    must not touch _meta."""
    root = tmp_path_factory.mktemp("ph_append")
    a = [(i, _ppm(_img(corpus["base"], i))) for i in range(1, 4)]
    b = [(11, _ppm(corpus["inverted"]))]
    probe = _hashes(
        spark,
        [(100, _ppm(corpus["base"])), (101, _ppm(_img(corpus["inverted"], 7)))],
    )
    p_incr, p_fresh = str(root / "incr"), str(root / "fresh")
    build_phash_index(_hashes(spark, a), p_incr)
    mtime = os.stat(f"{p_incr}/_meta").st_mtime_ns
    build_phash_index(_hashes(spark, b), p_incr, append=True)
    assert os.stat(f"{p_incr}/_meta").st_mtime_ns == mtime
    build_phash_index(_hashes(spark, a + b), p_fresh)
    got = {
        (r["query_img"], r["index_img"]): r["hamming"]
        for r in query_phash_index(spark, p_incr, probe).collect()
    }
    want = {
        (r["query_img"], r["index_img"]): r["hamming"]
        for r in query_phash_index(spark, p_fresh, probe).collect()
    }
    assert got == want
    assert any(q == 100 for q, _ in got) and any(q == 101 for q, _ in got)


def test_torn_write_and_corrupted_meta_raise(spark, corpus, tmp_path_factory):
    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("ph_torn") / "idx")
    build_phash_index(_hashes(spark, [(1, _ppm(corpus["base"]))]), path)
    probe = _hashes(spark, [(2, _ppm(corpus["base"]))])
    spark.range(0, 1, 1, 1).select(
        F.lit(99).cast("int").alias("bkt_chars"),  # > BAND_BITS: invalid
        F.lit(1).cast("bigint").alias("n_built"),
    ).write.mode("overwrite").parquet(f"{path}/_meta")
    with pytest.raises(ValueError, match="invalid _meta"):
        query_phash_index(spark, path, probe)
    shutil.rmtree(f"{path}/_meta")
    with pytest.raises(ValueError, match="torn"):
        query_phash_index(spark, path, probe)


def test_growth_contract_occupancy_and_rebuild(spark, corpus, tmp_path_factory):
    """Grow a 2-char index past a lowered widening threshold: the
    occupancy probe flags it, the rebuild re-derives bands from the
    index's own rows at 4-char keys via atomic swap, probes are
    value-identical across the swap, post-rebuild appends use the new
    persisted width."""
    path = str(tmp_path_factory.mktemp("ph_grow") / "idx")
    imgs = [(i, _ppm(_img(corpus["base"], i, i + 16, i + 40))) for i in range(1, 9)]
    build_phash_index(_hashes(spark, imgs[:2]), path)  # n=2 -> 2 chars
    build_phash_index(_hashes(spark, imgs[2:]), path, append=True)

    rep = phash_index_occupancy(spark, path, wide_threshold=4)
    assert rep["bkt_chars"] == 2 and rep["n_built"] == 2 and rep["n_imgs"] == 8
    assert rep["target_bkt_chars"] == 4 and rep["grown"]

    probe = _hashes(spark, [(100, _ppm(corpus["base"]))])
    before = {
        (r["query_img"], r["index_img"]): r["hamming"]
        for r in query_phash_index(spark, path, probe).collect()
    }
    assert before

    res = rebuild_phash_index_if_grown(spark, path, wide_threshold=4)
    assert res["rebuilt"]
    rep2 = phash_index_occupancy(spark, path, wide_threshold=4)
    assert rep2["bkt_chars"] == 4 and rep2["n_built"] == 8 and not rep2["grown"]
    after = {
        (r["query_img"], r["index_img"]): r["hamming"]
        for r in query_phash_index(spark, path, probe).collect()
    }
    assert after == before
    assert not rebuild_phash_index_if_grown(spark, path, wide_threshold=4)["rebuilt"]

    build_phash_index(
        _hashes(spark, [(50, _ppm(corpus["base"]))]), path, append=True
    )
    got = {
        (r["query_img"], r["index_img"])
        for r in query_phash_index(spark, path, probe).collect()
    }
    assert (100, 50) in got


def test_image_dedup_ingest_stream_end_to_end(spark, corpus, tmp_path_factory):
    """Two micro-batches through the image gate: cross-batch near-dup
    rejected, within-batch dup group keeps the lowest id, novel image
    accepted and indexed (a later probe finds it); marker idempotency on
    replay with a fresh checkpoint."""
    from temporalvault_spark.streaming import image_dedup_ingest_stream

    root = tmp_path_factory.mktemp("img_ingest")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")

    # horizontal split: top half black, bottom white — Hamming 32 from both
    # the vertical base and its inverse, so 102/103 pair only with each other
    horiz = [
        (0, 0, 0) if y < IMG_SIDE // 2 else (255, 255, 255)
        for y in range(IMG_SIDE)
        for _x in range(IMG_SIDE)
    ]
    b1 = _images(spark, [(0, _ppm(corpus["base"])), (1, _ppm(corpus["inverted"]))])
    b2 = _images(
        spark,
        [
            (100, _ppm(_img(corpus["base"], 5))),   # cross-batch dup of 0
            (101, _ppm(_img(corpus["inverted"], *range(0, 256, 2)))),  # novel
            (102, _ppm(_img(horiz, 9))),            # local pair with 103,
            (103, _ppm(_img(horiz, 9, 30))),        # keep 102
        ],
    )
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    image_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    assert {r["img_id"] for r in spark.read.parquet(acc).collect()} == {0, 1}

    b2.write.mode("overwrite").parquet(f"{src}/b2.parquet")
    image_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    got = {r["img_id"] for r in spark.read.parquet(acc).collect()}
    assert got == {0, 1, 101, 102}  # 100 cross-rejected; 103 within-batch

    # later batches dedup against batch-2 survivors: 102 is indexed now
    probe = _hashes(spark, [(300, _ppm(_img(horiz, 9, 77)))])
    hits = query_phash_index(spark, idx, probe).collect()
    assert (300, 102) in {(r["query_img"], r["index_img"]) for r in hits}

    image_dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))  # replay
    assert {r["img_id"] for r in spark.read.parquet(acc).collect()} == got


def test_image_ingest_crash_replay_does_not_grow_index(
    spark, corpus, tmp_path_factory
):
    """Marker-lost crash replay rewrites its own ingest partitions: index
    and accepted-corpus row counts unchanged; a pre-built base index
    (bulk namespace ingest=-1) survives a batch-0 replay untouched."""
    from temporalvault_spark.streaming import image_dedup_ingest_stream

    root = tmp_path_factory.mktemp("img_crash")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
    build_phash_index(_hashes(spark, [(1, _ppm(corpus["base"]))]), idx)  # pre-built

    b1 = _images(
        spark,
        [(100, _ppm(_img(corpus["base"], 8))), (101, _ppm(corpus["inverted"]))],
    )
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    image_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    assert {r["img_id"] for r in spark.read.parquet(acc).collect()} == {101}
    n_idx = spark.read.parquet(idx).count()

    os.remove(f"{acc}/_ingest_batches/0")  # appends landed, marker lost
    image_dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))
    assert {r["img_id"] for r in spark.read.parquet(acc).collect()} == {101}
    assert spark.read.parquet(idx).count() == n_idx
    from temporalvault_spark.operators.phash_index import _index_frame

    assert _index_frame(spark, idx).filter("ingest = -1").count() > 0
    # the base near-dup is still rejected by a later probe
    probe = _hashes(spark, [(500, _ppm(_img(corpus["base"], 44)))])
    hits = query_phash_index(spark, idx, probe).collect()
    assert (500, 1) in {(r["query_img"], r["index_img"]) for r in hits}


def test_layout_guard_scans_every_band_dir(spark, corpus, tmp_path_factory):
    """The legacy-layout guard must not be fooled by an empty first band
    directory: any legacy leaf anywhere refuses the append."""
    from temporalvault_spark.operators.index_common import assert_ingest_layout

    path = str(tmp_path_factory.mktemp("ph_mixed") / "idx")
    build_phash_index(_hashes(spark, [(1, _ppm(corpus["base"]))]), path)
    # strip the ingest layer everywhere (legacy), then empty one band dir
    for root, dirs, _files in list(os.walk(path)):
        for d in list(dirs):
            if d.startswith("ingest="):
                full = os.path.join(root, d)
                for f in os.listdir(full):
                    os.rename(os.path.join(full, f), os.path.join(root, f))
                os.rmdir(full)
    bands = sorted(e for e in os.listdir(path) if e.startswith("band="))
    assert len(bands) >= 2
    first = os.path.join(path, bands[0])
    shutil.rmtree(first)
    os.makedirs(os.path.join(first, "bkt=00"))  # indeterminate branch
    with pytest.raises(ValueError, match="pre-ingest-layer"):
        assert_ingest_layout(path, "phash")
