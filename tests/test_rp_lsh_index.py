"""Persisted RP-LSH band index: build-once / probe-batch cosine near-dup
with directory-level pruning (the incremental twin of rp_lsh_pairs)."""

import re

import pytest

from temporalvault_spark.operators.rp_lsh_index import (
    build_rp_index,
    query_rp_index,
)
from temporalvault_spark.plans import executed_plan

BASE_VEC = [0.9, -0.3, 0.5, 0.1, -0.7, 0.2, 0.4, -0.6]


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )


def _scaled(s):
    return [s * x for x in BASE_VEC]


@pytest.fixture(scope="module")
def index_path(spark, tmp_path_factory):
    # base corpus: two copies of the BASE direction + one far direction
    corpus = _emb(
        spark,
        [
            (1, BASE_VEC, 0),
            (2, _scaled(2.0), 0),
            (3, [-x for x in BASE_VEC], 0),
        ],
    )
    path = str(tmp_path_factory.mktemp("rp_index") / "idx")
    build_rp_index(corpus, path)
    return path


def test_probe_finds_near_dup_with_exact_cosine(spark, index_path):
    """A scaled copy of the indexed direction collides in every band and
    verifies at cosine 1.0; an orthogonal-ish probe pairs with nothing."""
    batch = _emb(spark, [(100, _scaled(0.5), 0)])
    got = {
        (r["query_vec"], r["index_vec"]): r["cosine"]
        for r in query_rp_index(spark, index_path, batch).collect()
    }
    assert set(got) == {(100, 1), (100, 2)}
    for v in got.values():
        assert v == pytest.approx(1.0, abs=1e-6)


def test_probe_scan_is_partition_pruned(spark, index_path):
    """The index scan must carry PartitionFilters on (band, bkt) — the
    proof that a batch probe reads only its own band-bucket directories."""
    batch = _emb(spark, [(100, _scaled(0.5), 0)])
    df = query_rp_index(spark, index_path, batch)
    df.collect()
    plan = executed_plan(df)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "band" in m.group(1) and "bkt" in m.group(1), plan[:1500]


def test_empty_batch_returns_empty(spark, index_path):
    batch = _emb(spark, [(200, None, 0)])  # strict filter drops the row
    assert query_rp_index(spark, index_path, batch).count() == 0


def test_self_pairs_excluded(spark, index_path):
    """Probing with a vector already indexed under the SAME id must not
    report the trivial (v, v) pair, but still finds its true near-dups."""
    batch = _emb(spark, [(1, BASE_VEC, 0)])
    got = {
        (r["query_vec"], r["index_vec"])
        for r in query_rp_index(spark, index_path, batch).collect()
    }
    assert (1, 1) not in got
    assert (1, 2) in got


def test_append_equals_fresh_build(spark, tmp_path_factory):
    """build(A) + append(B) must probe identically to build(A ∪ B) with the
    same pinned width — the persisted-planes/width consistency contract —
    and the append must not touch _meta."""
    import os

    a = [(i, _scaled(1.0 + 0.1 * i), 0) for i in range(1, 5)]
    b = [(i, [-x for x in _scaled(1.0)], 0) for i in range(11, 14)]
    batch = _emb(spark, [(100, _scaled(3.0), 0), (101, [-x for x in BASE_VEC], 0)])
    root = tmp_path_factory.mktemp("rp_append")

    p_incr, p_fresh = str(root / "incr"), str(root / "fresh")
    build_rp_index(_emb(spark, a), p_incr, bits=8)
    meta_mtime = os.stat(f"{p_incr}/_meta").st_mtime_ns
    build_rp_index(_emb(spark, b), p_incr, append=True)
    assert os.stat(f"{p_incr}/_meta").st_mtime_ns == meta_mtime
    build_rp_index(_emb(spark, a + b), p_fresh, bits=8)

    got_incr = {
        (r["query_vec"], r["index_vec"]): r["cosine"]
        for r in query_rp_index(spark, p_incr, batch).collect()
    }
    got_fresh = {
        (r["query_vec"], r["index_vec"]): r["cosine"]
        for r in query_rp_index(spark, p_fresh, batch).collect()
    }
    assert got_incr == got_fresh
    assert any(q == 100 for q, _ in got_incr)  # the aligned probe hits A
    assert any(q == 101 for q, _ in got_incr)  # the flipped probe hits B


def test_append_rejects_explicit_bits(spark, index_path):
    with pytest.raises(ValueError, match="persisted width"):
        build_rp_index(_emb(spark, [(50, BASE_VEC, 0)]), index_path, bits=8, append=True)


def test_missing_meta_raises(spark, tmp_path_factory):
    """A torn write (no _meta) must raise, not silently probe nothing."""
    import shutil

    path = str(tmp_path_factory.mktemp("rp_torn") / "idx")
    build_rp_index(_emb(spark, [(1, BASE_VEC, 0)]), path)
    shutil.rmtree(f"{path}/_meta")
    with pytest.raises(ValueError, match="torn"):
        query_rp_index(spark, path, _emb(spark, [(2, BASE_VEC, 0)]))


def test_probe_matches_in_memory_pairs_cross_batch(spark, sf_dir):
    """On the real embeddings table: probing the base-corpus index with the
    held-out batch must produce exactly the cross-batch subset of what the
    in-memory operator finds over the union, when both use the same width
    (the in-memory form derives bits from the UNION count, the index from
    the BASE count — pin bits=8, the sf0.001 adaptive floor, for both)."""
    from pyspark.sql import functions as F

    from temporalvault_spark.operators.rp_lsh import rp_signatures

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    base = emb.filter(F.col("vec_id") % 10 != 0)
    batch = emb.filter(F.col("vec_id") % 10 == 0)

    import tempfile

    from temporalvault_spark.operators.rp_lsh_index import RP_PROBE_THRESHOLD

    path = tempfile.mkdtemp(prefix="tv_rp_idx_test_") + "/idx"
    build_rp_index(base, path, bits=8)
    got = {
        (r["query_vec"], r["index_vec"]): r["cosine"]
        for r in query_rp_index(spark, path, batch, RP_PROBE_THRESHOLD).collect()
    }

    # in-memory twin: cross-batch (band, bucket) collisions at bits=8
    sigs = rp_signatures(emb, bits=8)
    a = sigs.alias("a")
    b = sigs.alias("b")
    from temporalvault_spark.operators.rp_lsh import _dot

    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.vec_id") % 10 == 0)
            & (F.col("b.vec_id") % 10 != 0),
        )
        .select(
            F.col("a.vec_id").alias("query_vec"),
            F.col("b.vec_id").alias("index_vec"),
            F.col("a.e").alias("ea"),
            F.col("b.e").alias("eb"),
            F.col("a.nrm").alias("na"),
            F.col("b.nrm").alias("nb"),
        )
        .dropDuplicates(["query_vec", "index_vec"])
    )
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    want = {
        (r["query_vec"], r["index_vec"]): r["cosine"]
        for r in cand.select(
            "query_vec", "index_vec", F.round(cos, 6).alias("cosine")
        )
        .filter(cos >= RP_PROBE_THRESHOLD)
        .collect()
    }
    assert got == want
    assert got, "threshold chosen so the twin check is non-trivial"  


def test_embedding_dedup_ingest_stream_end_to_end(spark, tmp_path_factory):
    """Streaming cosine-dedup gate over two micro-batches: batch 1 seeds the
    corpus+index; batch 2's cross-batch near-dup is rejected, its
    within-batch dup group keeps only the lowest id, its novel vector is
    accepted and indexed (a later probe finds it). A replay with a fresh
    checkpoint (same batch ids) must be a no-op (marker idempotency)."""
    from temporalvault_spark.streaming import embedding_dedup_ingest_stream

    root = tmp_path_factory.mktemp("emb_ingest")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
    schema = "vec_id bigint, embedding array<float>, label int"

    far = [-x for x in BASE_VEC]
    novel = [0.1, 0.9, -0.2, 0.4, 0.3, -0.8, 0.2, 0.5]
    batch1 = _emb(spark, [(0, BASE_VEC, 0), (1, far, 0)])
    batch2 = _emb(
        spark,
        [
            (100, _scaled(2.0), 0),              # cross-batch dup of 0
            (101, novel, 0),                     # novel -> accepted
            (102, [0.5, -0.5, 0.5, -0.5, 0.1, 0.1, 0.1, 0.1], 0),  # local pair,
            (103, [1.0, -1.0, 1.0, -1.0, 0.2, 0.2, 0.2, 0.2], 0),  # keep 102
        ],
    )

    batch1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(batch1.schema).parquet(f"{src}/*.parquet")
    embedding_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    assert {r["vec_id"] for r in spark.read.parquet(acc).collect()} == {0, 1}

    batch2.write.mode("overwrite").parquet(f"{src}/b2.parquet")
    embedding_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    got = {r["vec_id"] for r in spark.read.parquet(acc).collect()}
    assert got == {0, 1, 101, 102}  # 100 rejected cross-batch, 103 within-batch

    # later batches dedup against batch-2 survivors too: 102 is indexed now
    probe = _emb(spark, [(300, [2.0 * x for x in [0.5, -0.5, 0.5, -0.5, 0.1, 0.1, 0.1, 0.1]], 0)])
    hits = query_rp_index(spark, idx, probe).collect()
    assert {(r["query_vec"], r["index_vec"]) for r in hits} == {(300, 102)}

    # replay idempotency: fresh checkpoint -> same batch ids -> markers skip
    embedding_dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))
    assert {r["vec_id"] for r in spark.read.parquet(acc).collect()} == got


def test_embedding_ingest_crash_window_replay_is_idempotent(spark, tmp_path_factory):
    """Crash BETWEEN the appends and the marker write: the replay must not
    double rows — the accepted corpus AND the index appends heal via
    dynamic partition overwrite of their own ingest partitions (see
    test_crash_replay_does_not_grow_index for the row-count pin), and the
    probe path stays duplicate-free (DISTINCT candidates + vec_id dedup on
    the _vectors sidecar) as defense in depth."""
    import os

    from temporalvault_spark.streaming import embedding_dedup_ingest_stream

    root = tmp_path_factory.mktemp("emb_crash")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
    batch1 = _emb(spark, [(0, BASE_VEC, 0), (1, [-x for x in BASE_VEC], 0)])
    batch1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(batch1.schema).parquet(f"{src}/*.parquet")

    embedding_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    marker = f"{acc}/_ingest_batches/0"
    assert os.path.exists(marker)
    os.remove(marker)  # simulate: appends landed, marker write lost

    embedding_dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))  # replay
    rows = spark.read.parquet(acc).collect()
    assert sorted(r["vec_id"] for r in rows) == [0, 1]  # no duplicate rows
    assert os.path.exists(marker)  # marker restored by the replay

    # probe path: exactly one pair for a near-dup probe, never duplicates
    probe = _emb(spark, [(500, _scaled(0.5), 0)])
    hits = query_rp_index(spark, idx, probe).collect()
    assert [(r["query_vec"], r["index_vec"]) for r in hits] == [(500, 0)]


def test_explicit_schema_pins_bkt_as_string_with_leading_zeros(spark, index_path):
    """The index read must pin bkt as STRING (r9 advice: partition-type
    inference reads the all-digit '0'/'1' prefixes back as INT, so bkt=0010
    becomes 10 and the probe's isin() prune works only via implicit
    coercion). With the explicit schema, every bkt value equals the
    leading substring of its bucket — including leading-zero values."""
    from pyspark.sql import functions as F

    from temporalvault_spark.operators.rp_lsh_index import _index_frame

    idx = _index_frame(spark, index_path)
    assert dict(idx.dtypes)["bkt"] == "string"
    rows = idx.select("bucket", "bkt").collect()
    assert rows and all(r["bkt"] == r["bucket"][: len(r["bkt"])] for r in rows)
    assert any(r["bkt"].startswith("0") for r in rows), (
        "fixture should include a leading-zero bkt for the coercion trap"
    )


def test_corrupted_meta_raises(spark, tmp_path_factory):
    """A persisted bkt_chars > bits (hand-edited / future-format index)
    would silently prune every probe to zero partitions — must raise."""
    from pyspark.sql import functions as F

    path = str(tmp_path_factory.mktemp("rp_badmeta") / "idx")
    build_rp_index(_emb(spark, [(1, BASE_VEC, 0)]), path)
    spark.range(0, 1, 1, 1).select(
        F.lit(8).cast("int").alias("bits"),
        F.lit(9).cast("int").alias("bkt_chars"),  # > bits: invalid
        F.lit(1).cast("bigint").alias("n_built"),
        F.lit(8).cast("int").alias("occ"),
    ).write.mode("overwrite").parquet(f"{path}/_meta")
    with pytest.raises(ValueError, match="invalid _meta"):
        query_rp_index(spark, path, _emb(spark, [(2, BASE_VEC, 0)]))


def _pseudo_vecs(n, dim=8, id0=0):
    """Deterministic pseudo-random vectors (no RNG: reproducible tickets)."""
    return [
        (id0 + i, [((i * 31 + j * 17 + i * j) % 97) / 97.0 - 0.5 for j in range(dim)], 0)
        for i in range(n)
    ]


def test_growth_contract_occupancy_and_rebuild(spark, tmp_path_factory):
    """The r9-verdict growth contract as machinery: build at the default
    occupancy dial, grow the corpus past the tighter occ_target=1 width,
    and (a) the occupancy probe reports grown with a rising fan-out,
    (b) rebuild_rp_index_if_grown re-signs at the wider adaptive width and
    the per-bucket occupancy drops, (c) crafted near-dup pairs survive the
    rebuild bit-identically, (d) a post-rebuild append signs with the NEW
    persisted width (meta cache invalidated by the _meta mtime bump)."""
    from temporalvault_spark.operators.rp_lsh import adaptive_rp_bits
    from temporalvault_spark.operators.rp_lsh_index import (
        _read_meta_full,
        rebuild_rp_index_if_grown,
        rp_index_occupancy,
    )

    path = str(tmp_path_factory.mktemp("rp_grow") / "idx")
    base = _pseudo_vecs(60)
    build_rp_index(_emb(spark, base), path)  # adaptive(60, occ=8) = 8 bits
    build_rp_index(_emb(spark, _pseudo_vecs(240, id0=1000)), path, append=True)

    rep = rp_index_occupancy(spark, path, occ_target=1)
    assert rep["bits"] == 8 and rep["n_built"] == 60 and rep["n_vecs"] == 300
    assert rep["target_bits"] == adaptive_rp_bits(300, 1) == 9
    assert rep["grown"]
    occ_before = rep["occupancy"]

    probe = _emb(spark, [(9001, _scaled(0.5), 0)])
    pairs_before = {
        (r["query_vec"], r["index_vec"]): r["cosine"]
        for r in query_rp_index(
            spark, path, _emb(spark, [(9001, [2.0 * x for x in base[7][1]], 0)])
        ).collect()
    }
    assert (9001, 7) in pairs_before  # exact-direction dup of an indexed vec

    res = rebuild_rp_index_if_grown(spark, path, occ_target=1)
    assert res["rebuilt"]
    bits, bkt_chars, n_built, occ = _read_meta_full(spark, path)
    assert bits == 9 and n_built == 300 and occ == 1
    after = rp_index_occupancy(spark, path)
    assert not after["grown"] and after["n_vecs"] == 300
    assert after["occupancy"] < occ_before  # fan-out restored

    pairs_after = {
        (r["query_vec"], r["index_vec"]): r["cosine"]
        for r in query_rp_index(
            spark, path, _emb(spark, [(9001, [2.0 * x for x in base[7][1]], 0)])
        ).collect()
    }
    assert pairs_after[(9001, 7)] == pairs_before[(9001, 7)]

    # a second call is a no-op (already at the adaptive width)
    assert not rebuild_rp_index_if_grown(spark, path, occ_target=1)["rebuilt"]

    # post-rebuild append signs with the NEW width: a fresh exact dup of an
    # appended vector is still found (width consistency across the swap)
    build_rp_index(_emb(spark, [(5000, base[3][1], 0)]), path, append=True)
    got = {
        (r["query_vec"], r["index_vec"])
        for r in query_rp_index(
            spark, path, _emb(spark, [(9002, [0.5 * x for x in base[3][1]], 0)])
        ).collect()
    }
    assert (9002, 5000) in got and (9002, 3) in got


def test_crash_replay_does_not_grow_index(spark, tmp_path_factory):
    """The ingest partition layer's whole point (r9 advice): a marker-lost
    crash replay must leave the index at the SAME row count — the replayed
    append dynamically overwrites its own ingest partitions instead of
    appending duplicate signature/vector rows."""
    import os

    from temporalvault_spark.streaming import embedding_dedup_ingest_stream

    root = tmp_path_factory.mktemp("emb_crash_rows")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
    batch1 = _emb(spark, [(0, BASE_VEC, 0), (1, [-x for x in BASE_VEC], 0)])
    batch1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(batch1.schema).parquet(f"{src}/*.parquet")

    embedding_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    n_idx = spark.read.parquet(idx).count()
    n_vec = spark.read.parquet(f"{idx}/_vectors").count()
    os.remove(f"{acc}/_ingest_batches/0")  # appends landed, marker lost

    embedding_dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))  # replay
    assert spark.read.parquet(idx).count() == n_idx
    assert spark.read.parquet(f"{idx}/_vectors").count() == n_vec


def test_gate_on_prebuilt_index_replay_preserves_base_rows(spark, tmp_path_factory):
    """A gate started on a PRE-BUILT index: base rows live in the bulk
    namespace (ingest=-1), so a batch-0 crash replay's dynamic overwrite of
    ingest=0 can never clobber them — the base near-dup is still rejected
    after the replay and the index never grows."""
    import os

    from temporalvault_spark.streaming import embedding_dedup_ingest_stream

    root = tmp_path_factory.mktemp("emb_prebuilt")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
    build_rp_index(_emb(spark, [(1, BASE_VEC, 0)]), idx)  # pre-built base

    novel = [0.1, 0.9, -0.2, 0.4, 0.3, -0.8, 0.2, 0.5]
    b1 = _emb(spark, [(100, _scaled(0.5), 0), (101, novel, 0)])
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")

    embedding_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))
    acc1 = {r["vec_id"] for r in spark.read.parquet(acc).collect()}
    assert acc1 == {101}  # 100 rejected against the pre-built base
    n_idx = spark.read.parquet(idx).count()

    os.remove(f"{acc}/_ingest_batches/0")  # crash window
    embedding_dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))
    assert {r["vec_id"] for r in spark.read.parquet(acc).collect()} == {101}
    assert spark.read.parquet(idx).count() == n_idx
    # base rows intact under the bulk namespace
    from temporalvault_spark.operators.rp_lsh_index import _index_frame

    assert _index_frame(spark, idx).filter("ingest = -1").count() > 0
    # and the base near-dup is STILL rejected by a later probe
    hits = query_rp_index(spark, idx, _emb(spark, [(500, _scaled(3.0), 0)])).collect()
    assert (500, 1) in {(r["query_vec"], r["index_vec"]) for r in hits}


def _strip_ingest_layer(path):
    """Simulate a pre-round-10 index: hoist files out of the ingest=*
    leaf directories (band=X/bkt=Y/ingest=-1/f.parquet -> band=X/bkt=Y/f)."""
    import os

    for root, dirs, _files in list(os.walk(path)):
        for d in list(dirs):
            if d.startswith("ingest="):
                full = os.path.join(root, d)
                for f in os.listdir(full):
                    os.rename(os.path.join(full, f), os.path.join(root, f))
                os.rmdir(full)


def test_legacy_layout_probe_works_append_refused(spark, tmp_path_factory):
    """A pre-ingest-layer index stays READABLE (explicit schema null-fills
    the missing ingest column; occupancy probe included), but an append
    must be REFUSED — mixed partition depths would break every subsequent
    read — with the rebuild remedy named."""
    from temporalvault_spark.operators.rp_lsh_index import rp_index_occupancy

    path = str(tmp_path_factory.mktemp("rp_legacy") / "idx")
    build_rp_index(
        _emb(spark, [(1, BASE_VEC, 0), (2, _scaled(2.0), 0)]), path
    )
    _strip_ingest_layer(path)
    _strip_ingest_layer(f"{path}/_vectors")

    got = {
        (r["query_vec"], r["index_vec"])
        for r in query_rp_index(spark, path, _emb(spark, [(100, _scaled(0.5), 0)])).collect()
    }
    assert got == {(100, 1), (100, 2)}  # legacy probe intact
    assert rp_index_occupancy(spark, path)["n_vecs"] == 2

    with pytest.raises(ValueError, match="pre-ingest-layer"):
        build_rp_index(_emb(spark, [(50, BASE_VEC, 0)]), path, append=True)


def test_half_written_meta_is_torn_and_gate_self_repairs(spark, tmp_path_factory):
    """A crash DURING the _meta write leaves a half-existing directory
    (only _temporary inside): probes must raise the torn-write error — not
    an undiagnostic AnalysisException — and the streaming gate's replay
    must self-repair with a full rebuild instead of wedging."""
    import os
    import shutil

    from temporalvault_spark.operators.index_common import index_ready
    from temporalvault_spark.streaming import embedding_dedup_ingest_stream

    root = tmp_path_factory.mktemp("rp_halfmeta")
    src, idx, acc = str(root / "src"), str(root / "idx"), str(root / "acc")
    b1 = _emb(spark, [(0, BASE_VEC, 0), (1, [-x for x in BASE_VEC], 0)])
    b1.write.mode("overwrite").parquet(f"{src}/b1.parquet")
    stream = spark.readStream.schema(b1.schema).parquet(f"{src}/*.parquet")
    embedding_dedup_ingest_stream(stream, idx, acc, str(root / "ck1"))

    # simulate the crash window: _meta exists but holds no readable rows
    shutil.rmtree(f"{idx}/_meta")
    os.makedirs(f"{idx}/_meta/_temporary")
    os.remove(f"{acc}/_ingest_batches/0")

    assert not index_ready(spark, idx)
    with pytest.raises(ValueError, match="torn"):
        query_rp_index(spark, idx, _emb(spark, [(9, BASE_VEC, 0)]))

    embedding_dedup_ingest_stream(stream, idx, acc, str(root / "ck2"))  # replay
    assert sorted(
        r["vec_id"] for r in spark.read.parquet(acc).collect()
    ) == [0, 1]
    assert index_ready(spark, idx)  # rebuilt
    hits = query_rp_index(spark, idx, _emb(spark, [(9, _scaled(0.5), 0)])).collect()
    assert [(r["query_vec"], r["index_vec"]) for r in hits] == [(9, 0)]
