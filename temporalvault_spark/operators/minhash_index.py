"""Persisted MinHash band index: incremental near-dup detection against an
existing corpus WITHOUT rescanning it.

The in-memory form (llm.ngram_jaccard_pairs) is a self-join — right for a
one-shot dedup of a whole corpus. But a training-data pipeline mostly asks
the incremental question: "is this NEW batch a near-dup of anything already
ingested?" At 100 TB you cannot re-shingle the corpus per batch, so the
band sketch becomes a TABLE: (doc_id, n_sh, band, min_h) written partitioned
by (band, bkt) where bkt is the first two hex chars of the band minimum —
up to 4 x 256 directories, each holding one band-bucket slice. A query
batch's sketch touches only its own (band, bkt) partitions (directory-level
pruning, PartitionFilters in the plan is the proof), so probe cost scales
with the BATCH, not the corpus. Signatures live in an underscore-prefixed
sidecar (ignored by index scans) for the exact-Jaccard verify, read only
for candidate docs.

Same one-permutation md5 scheme as the oracle-checked dedup_ngram_jaccard
(llm.shingle_signatures / band_sketch — shared code, cannot drift), so an
index build is deterministic and reproducible across runs and engines.

The third ``ingest`` partition level exists for exactly-once streaming
appends (dedup_ingest_stream): an ingest batch writes its sketch and
signature rows under its own batch id with dynamic partition overwrite, so
a crash-replayed append REWRITES its own partitions instead of duplicating
rows. Growth contract: ``minhash_index_occupancy`` measures bucket
occupancy vs the persisted build-time key width, and
``rebuild_minhash_index_if_grown`` re-derives the sketch from the
``_signatures`` sidecar at the fresh width and atomically swaps it in —
the identical machinery as rp_lsh_index's (see its module docstring).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog
from temporalvault_spark.concurrency import run_concurrent
from temporalvault_spark.constants import quant6
from temporalvault_spark.operators.index_common import (
    assert_ingest_layout,
    atomic_swap_rebuild,
    bucket_skew,
    collect_prune,
    meta_row,
    meta_sidecar_exists,
    resolve_write_mode,
    skew_oracle_sql,
    with_bucket_skew,
)
from temporalvault_spark.operators.llm import (
    NGRAM_BANDS,
    NGRAM_SKETCH_CTES,
    band_sketch,
    shingle_signatures,
)
from temporalvault_spark.registry import query


MIN_H_CHARS = 8  # a band minimum is an 8-hex-char digest slice

# Explicit read schemas (the rp_lsh_index RP_INDEX_SCHEMA note): partition-
# type inference can read an all-digit bkt value back as INT; pinning the
# types keeps the probe's isin() prune a plain string comparison.
MH_INDEX_SCHEMA = (
    "doc_id BIGINT, n_sh INT, min_h STRING, band INT, bkt STRING, ingest INT"
)
MH_SIGNATURES_SCHEMA = "doc_id BIGINT, hs ARRAY<STRING>, n_sh INT, ingest INT"


def _index_frame(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(MH_INDEX_SCHEMA).parquet(path)


def _signatures_frame(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.schema(MH_SIGNATURES_SCHEMA).parquet(f"{path}/_signatures")


# the ONE statement of the minhash width rule (narrow/wide hex-char key
# widths + the production widening dial); _bkt_chars_for (builds),
# _bkt_chars_case_sql (oracles), and _bkt_chars_col (the registered probe)
# all derive from these names — the same single-sourcing the Band64Index
# families use, so a dial change cannot leave a query and its oracle
# agreeing with each other while both diverge from what builds persist.
MH_NARROW, MH_WIDE = 1, 2
MH_WIDE_DEFAULT = 1_000_000


def _bkt_chars_for(n_docs: int, wide_threshold: int = MH_WIDE_DEFAULT) -> int:
    """Bucket-key width, chosen at build time from corpus size: 2 hex chars
    (256 buckets/band) once the corpus is big enough that each directory
    still holds substantial data; 1 hex char (16 buckets/band) below that —
    a fixed 4x256 fan-out on a small corpus is pure small-file overhead
    (measured: the partitioned write alone cost 5.6s on a 4.5k-doc corpus
    at 332 directories). Persisted in the ``_meta`` sidecar so probes and
    appends always derive the SAME keys the build used. ``wide_threshold``
    is the widening dial (tests drop it to exercise the growth contract at
    unit scale)."""
    return MH_WIDE if n_docs > wide_threshold else MH_NARROW


def _bkt_chars_case_sql(n_expr: str, wide_threshold: int = MH_WIDE_DEFAULT) -> str:
    """DuckDB CASE replaying _bkt_chars_for, generated from the same
    constants."""
    return (
        f"CASE WHEN {n_expr} > {wide_threshold} "
        f"THEN {MH_WIDE} ELSE {MH_NARROW} END"
    )


def _bkt_chars_col(n_col: str, wide_threshold: int = MH_WIDE_DEFAULT):
    """Spark Column replaying _bkt_chars_for — the probe-side twin."""
    return (
        F.when(F.col(n_col) > wide_threshold, MH_WIDE)
        .otherwise(MH_NARROW)
        .cast("int")
    )


def _read_meta_full(spark: SparkSession, path: str) -> tuple[int, int]:
    """(bkt_chars, n_built) from the index's ``_meta`` sidecar. Indexes
    persisted by pre-sidecar builds (fixed 2-char buckets, no ``_meta``
    directory) fall back to ``bkt_chars=2`` — but ONLY when the on-disk
    layout actually looks like that legacy format (its ``bkt=XX`` directory
    names are 2 chars wide). A missing _meta over 1-char bucket directories
    means a torn write (crash between the sketch overwrite and the _meta
    rewrite), and a silent 2-char fallback there would make every probe
    compute keys matching zero partitions — dedup silently finding
    nothing — so that case raises instead. Invalid persisted widths (a
    hand-edited or future-format index) would silently mis-prune the same
    way, so the invariant 1 <= bkt_chars <= MIN_H_CHARS is validated on
    read."""
    d = meta_row(spark, path, missing_ok=True)
    if d is None:
        if meta_sidecar_exists(path):
            # a _meta entry is physically present but unreadable: a crash
            # DURING the sidecar write. The legacy-width fallback must not
            # apply here even over 2-char bucket dirs — a torn new-format
            # sidecar silently classified as legacy would probe with a
            # possibly-wrong width and report n_built=0 to the growth
            # contract. Absent and torn have different remedies.
            raise ValueError(
                f"minhash index at {path} has a _meta sidecar that cannot "
                "be read — torn/partial sidecar write; rebuild the index"
            )
        widths = {
            len(n.split("=", 1)[1])
            for band_dir in os.listdir(path)
            if band_dir.startswith("band=")
            for n in os.listdir(os.path.join(path, band_dir))
            if n.startswith("bkt=")
        } if os.path.isdir(path) else set()
        if widths == {2}:
            return 2, 0  # pre-_meta index format: fixed 2-hex-char buckets
        raise ValueError(
            f"minhash index at {path} has no _meta sidecar and its bucket "
            f"directories are not the legacy 2-char layout (widths seen: "
            f"{sorted(widths) or 'none'}) — torn/partial index write; "
            "rebuild the index"
        )
    got = (d["bkt_chars"], d.get("n_built", 0) or 0)
    if not (1 <= got[0] <= MIN_H_CHARS):
        raise ValueError(
            f"minhash index at {path} has invalid _meta "
            f"(bkt_chars={got[0]}): requires 1 <= bkt_chars <= "
            f"{MIN_H_CHARS} — corrupted or future-format index"
        )
    return got


def _read_bkt_chars(spark: SparkSession, path: str) -> int:
    return _read_meta_full(spark, path)[0]


def build_minhash_index(
    docs: DataFrame,
    path: str,
    n_bands: int = NGRAM_BANDS,
    append: bool = False,
    signatures: DataFrame | None = None,
    ingest_id: int | None = None,
    wide_threshold: int = 1_000_000,
) -> None:
    """Index build: shingle+hash the corpus once, write the slim band sketch
    partitioned by (band, bkt) and the signature sets as the `_signatures`
    sidecar. The sketch rows are 16-ish bytes of payload — the index is a
    small fraction of the corpus, and the expensive md5 pass is paid once
    here instead of once per query batch.

    ``append=True`` adds a new batch's sketch+signatures to an existing
    index (new parquet files inside the same (band, bkt) directories — an
    append-only ingest, no rewrite of existing data; the bucket width comes
    from the existing ``_meta``, never recomputed); doc_ids are the
    caller's contract to keep unique across appends.

    ``signatures`` short-circuits the md5 pass with a pre-staged signature
    frame (llm.staged_shingle_signatures' artifact, filtered to this
    corpus's docs) — the session then pays ONE md5 pass across the whole
    minhash family instead of one per build.

    ``ingest_id`` names the write's ingest partition layer: pass the
    streaming batch id for EXACTLY-ONCE appends (the write runs as a
    dynamic partition overwrite of that ingest's own partitions, so a
    crash-replayed batch rewrites its rows instead of duplicating them);
    ``None`` plain-appends into the bulk namespace ingest=-1, the
    non-idempotent form (base builds live there too, so a stream's
    batch-id overwrites can NEVER clobber base or bulk rows; one
    gate per index is the caller's contract for batch-id uniqueness).
    ``wide_threshold`` is the bucket-widening dial (_bkt_chars_for)."""
    spark = docs.sparkSession
    if signatures is not None:
        sh = signatures  # parquet-backed artifact: already materialized
    else:
        sh = shingle_signatures(docs).localCheckpoint(eager=True)  # one md5 pass
    mode, dyn, ingest = resolve_write_mode(append, ingest_id)
    if append:
        assert_ingest_layout(path, "minhash")
        bkt_chars = _read_bkt_chars(spark, path)
        n_docs = 0
    else:
        n_docs = sh.count()
        bkt_chars = _bkt_chars_for(n_docs, wide_threshold)
    banded = band_sketch(sh, n_bands).select(
        "doc_id",
        "n_sh",
        "band",
        "min_h",
        F.substring("min_h", 1, bkt_chars).alias("bkt"),
        F.lit(ingest).cast("int").alias("ingest"),
    )
    def _write_banded() -> None:
        w = banded.repartition("band", "bkt").write.mode(mode)
        if dyn:
            w = w.option("partitionOverwriteMode", "dynamic")
        w.partitionBy("band", "bkt", "ingest").parquet(path)

    def _write_signatures() -> None:
        sw = (
            sh.select(
                "doc_id", "hs", "n_sh", F.lit(ingest).cast("int").alias("ingest")
            ).write.mode(mode)
        )
        if dyn:
            sw = sw.option("partitionOverwriteMode", "dynamic")
        sw.partitionBy("ingest").parquet(f"{path}/_signatures")

    # The two artifact writes are independent of each other, and in the
    # append modes (plain append / per-ingest dynamic overwrite) neither
    # touches the other's directories — so they run as concurrent jobs
    # (both read the checkpointed `sh`, no recompute). A fresh BUILD's
    # static overwrite of `path` deletes the index ROOT first, and
    # `_signatures` lives under it, so build mode stays sequential
    # (root write, then sidecar into the fresh root).
    if mode != "overwrite" or dyn:
        run_concurrent([_write_banded, _write_signatures])
    else:
        _write_banded()
        _write_signatures()
    if not append:
        # JVM-native 1-row frame, NOT createDataFrame: a local-data frame
        # parallelizes into defaultParallelism Python partitions, and
        # coalesce(1) then runs all those Python-worker round-trips
        # serially inside one task — measured 4-6s for this one-row write;
        # range(...,numPartitions=1) + lit() stays entirely JVM-side (~0.1s)
        spark.range(0, 1, 1, 1).select(
            F.lit(bkt_chars).cast("int").alias("bkt_chars"),
            F.lit(n_docs).cast("bigint").alias("n_built"),
        ).write.mode("overwrite").parquet(f"{path}/_meta")


def query_minhash_index(
    spark: SparkSession,
    index_path: str,
    new_docs: DataFrame,
    threshold: float = 0.6,
    n_bands: int = NGRAM_BANDS,
    signatures: DataFrame | None = None,
) -> DataFrame:
    """Near-dup pairs (query_doc, index_doc, jaccard >= threshold) between a
    new batch and the indexed corpus.

    Probe shape: the batch's own sketch is computed fresh (batch-sized md5
    pass); its distinct (band, bkt) keys — at most n_bands x |batch| of
    them — collect to the driver and become an explicit partition-pruning
    predicate, so the index scan reads only those directories. Candidates
    equi-join on (band, min_h) with the same lossless size-ratio prefilter
    as the in-memory operator; the exact verify broadcasts the batch's
    signature sets (a query batch is small by contract) against the
    sidecar's signatures semi-reduced to candidate index docs.

    ``signatures`` short-circuits the batch's md5 pass with a pre-staged
    signature frame (filtered to the batch's docs)."""
    bkt_chars = _read_bkt_chars(spark, index_path)  # match the build's keys
    if signatures is not None:
        qsh = signatures  # parquet-backed artifact: already materialized
    else:
        qsh = shingle_signatures(new_docs).localCheckpoint(eager=True)
    qbanded = band_sketch(qsh, n_bands).withColumn(
        "bkt", F.substring("min_h", 1, bkt_chars)
    )

    prune = collect_prune(qbanded)
    if prune is None:
        schema = "query_doc bigint, index_doc bigint, jaccard double"
        return spark.createDataFrame([], schema)
    idx = _index_frame(spark, index_path).filter(prune)

    q = qbanded.select(
        F.col("doc_id").alias("q_doc"),
        F.col("n_sh").alias("q_n_sh"),
        "band",
        "min_h",
    )
    cand = (
        idx.join(F.broadcast(q), ["band", "min_h"])
        # self-pair exclusion (the rp/phash siblings' contract): a doc
        # already indexed under the SAME id must not reject itself — the
        # crash-replay determinism argument in dedup_ingest_stream's
        # docstring DEPENDS on this (a half-indexed batch's replay must
        # re-derive the same survivors, not reject them against their own
        # partial index rows)
        .filter(F.col("doc_id") != F.col("q_doc"))
        .filter(
            # lossless prefilter: jaccard >= 0.6 bounds the set-size ratio
            F.least("n_sh", "q_n_sh") * 5 >= F.greatest("n_sh", "q_n_sh") * 3
        )
        .select(F.col("q_doc"), F.col("doc_id").alias("index_doc"))
        .distinct()
    )
    # dropDuplicates: a crashed-then-replayed index append (streaming ingest,
    # marker lost after the write) can leave a doc's signature twice; the
    # sketch side is immune (candidates are .distinct()ed) and this guard
    # keeps the verify join exactly-once too
    sig = _signatures_frame(spark, index_path).dropDuplicates(["doc_id"])
    sig_red = sig.join(
        F.broadcast(cand.select(F.col("index_doc").alias("doc_id")).distinct()),
        "doc_id",
        "semi",
    ).select(F.col("doc_id").alias("i_id"), F.col("hs").alias("i_hs"))
    qsig = F.broadcast(qsh.select(F.col("doc_id").alias("q_id"), F.col("hs").alias("q_hs")))
    from temporalvault_spark.operators.llm import jaccard_sets

    jac = jaccard_sets("q_hs", "i_hs")
    return (
        cand.join(qsig, F.col("q_doc") == F.col("q_id"))
        .join(sig_red, F.col("index_doc") == F.col("i_id"))
        .select(
            F.col("q_doc").alias("query_doc"),
            "index_doc",
            F.round(jac, 6).alias("jaccard"),
        )
        .filter(jac >= threshold)
    )


# --- growth contract: occupancy probe + OPTIMIZE-style rebuild ---------------


def minhash_index_occupancy(
    spark: SparkSession, path: str, wide_threshold: int = 1_000_000
) -> dict:
    """Measure the growth contract: ONE aggregate over the slim sketch
    (doc_id/band/min_h — never the signature sets) against the persisted
    build-time key width. ``grown`` is True when the current corpus size
    calls for a wider bucket key than the persisted one — i.e. probe
    fan-out per (band, bkt) directory has drifted past the build-time
    design point. ``wide_threshold`` is _bkt_chars_for's widening dial
    (tests drop it to exercise the contract at unit scale)."""
    bkt_chars, n_built = _read_meta_full(spark, path)
    idx = _index_frame(spark, path)
    row = idx.agg(
        F.count("*").alias("rows"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.count_distinct("band", "min_h").alias("n_bkts"),
    ).first()
    # hot-bucket skew (the index_common.bucket_skew note): max bucket rows
    # vs the even-split mean — the LSH failure mode a boilerplate-heavy
    # corpus triggers, invisible in the mean occupancy column
    mx, skew = bucket_skew(idx, ("band", "min_h"), row["n_bkts"], row["rows"])
    n_docs = row["n_docs"]
    target = _bkt_chars_for(n_docs, wide_threshold)
    return {
        "bkt_chars": bkt_chars,
        "n_built": n_built,
        "n_docs": n_docs,
        "rows": row["rows"],
        # quant6, not Python round(): banker's at 3 decimals was the idiom
        # round-13/14 reviewed out of every other skew/occupancy surface
        "occupancy": quant6(row["rows"] / max(row["n_bkts"], 1)),
        "max_bucket": mx,
        "skew": skew,
        "target_bkt_chars": target,
        "grown": target > bkt_chars,
    }


def rebuild_minhash_index_if_grown(
    spark: SparkSession, path: str, wide_threshold: int = 1_000_000
) -> dict:
    """OPTIMIZE-style maintenance (the compact_small_files cadence): when
    ``minhash_index_occupancy`` says the index has outgrown its persisted
    bucket-key width, re-derive the band sketch from the ``_signatures``
    sidecar (deduplicated by doc_id — this also compacts rows a
    pre-ingest-partition crash replay may have duplicated; NO fresh md5
    pass, the signatures are the expensive artifact and they are already on
    disk) at the fresh width into a SIBLING directory and atomically swap
    it in, so probes never see a half-rebuilt index. Returns the occupancy
    report plus ``rebuilt``."""
    rep = minhash_index_occupancy(spark, path, wide_threshold)
    if not rep["grown"]:
        return {**rep, "rebuilt": False}
    sh = (
        _signatures_frame(spark, path)
        .dropDuplicates(["doc_id"])
        .select("doc_id", "hs", "n_sh")
        .localCheckpoint(eager=True)
    )
    atomic_swap_rebuild(
        path,
        lambda tmp: build_minhash_index(
            sh, tmp, signatures=sh, wide_threshold=wide_threshold
        ),
    )
    return {**rep, "rebuilt": True}


# --- incremental two-batch scenario (benchable) ------------------------------
# The end-to-end production shape the index exists for: a base corpus is
# indexed ONCE, then a new ingest batch probes it — "is anything in this
# batch a near-dup of what we already hold?". Registered as a query so the
# scorecard value-checks it and bench.py tracks its cost round-over-round
# (r4 verdict #6). The oracle replays both halves from the shared sketch
# CTEs: candidates are cross-batch (base x batch) band-min collisions, then
# exact-Jaccard verified — the md5 scheme is per-doc, so the split changes
# WHICH pairs qualify, never the per-doc sketches.

_INCR_ORACLE = f"""WITH {NGRAM_SKETCH_CTES},
    cand AS (
        SELECT DISTINCT b.doc_id AS query_doc, a.doc_id AS index_doc
        FROM banded a JOIN banded b
          ON a.band = b.band AND a.min_h = b.min_h
         AND a.doc_id % 10 <> 0 AND b.doc_id % 10 = 0
         AND LEAST(a.n_sh, b.n_sh) * 5 >= GREATEST(a.n_sh, b.n_sh) * 3)
    SELECT c.query_doc, c.index_doc,
           ROUND(CAST(len(list_intersect(sq.shingles, si.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(sq.shingles, si.shingles))), 6) AS jaccard
    FROM cand c
    JOIN sh sq ON sq.doc_id = c.query_doc
    JOIN sh si ON si.doc_id = c.index_doc
    WHERE CAST(len(list_intersect(sq.shingles, si.shingles)) AS DOUBLE)
          / len(list_distinct(list_concat(sq.shingles, si.shingles))) >= 0.6"""


@query("dedup_incremental_index", _INCR_ORACLE)
def q_dedup_incremental_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-batch incremental dedup: build the persisted band index on the
    base corpus (doc_id % 10 != 0), probe it with the held-out batch
    (doc_id % 10 == 0). Each call runs BOTH halves end-to-end from raw text
    (no staged signatures) — the self-contained correctness form that
    exercises the non-staged md5 path. The bench tracks the two halves
    separately instead (minhash_index_build / dedup_incremental_probe
    below): at 100 TB only the probe recurs per batch, so one combined
    number conflates a one-time cost with the recurring one."""
    from temporalvault_spark.staging import stage_dir

    docs = load_catalog(spark, sf_dir).table("documents")
    base = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    path = os.path.join(stage_dir(spark, "mh_incr"), "index")
    build_minhash_index(base, path)
    return query_minhash_index(spark, path, batch)


# --- build/probe split (the benchable halves) --------------------------------
# The index for the two-batch scenario is staged once per (application,
# corpus fingerprint) — same contract as llm's staged signature/pair frames —
# so the probe query benches ONLY the per-batch cost that actually recurs at
# 100 TB, while minhash_index_build (force=True) benches the one-time
# partitioned write explicitly.

_STAGED_INDEX: dict[tuple, str] = {}


def stage_incremental_index(spark: SparkSession, sf_dir: str, force: bool = False) -> str:
    """Build (once per application + corpus fingerprint) the persisted band
    index over the base corpus (doc_id % 10 != 0), deriving from the staged
    signature artifact — no fresh md5 pass. Returns the index path."""
    from temporalvault_spark.operators.llm import (
        _corpus_key,
        staged_shingle_signatures,
    )
    from temporalvault_spark.staging import stage_dir

    key = _corpus_key(spark, sf_dir)
    path = _STAGED_INDEX.get(key)
    if path is None or force or not os.path.isdir(path):
        if path is None or not os.path.isdir(path):
            path = os.path.join(stage_dir(spark, "mh_incr"), "index")
        docs = load_catalog(spark, sf_dir).table("documents")
        base = docs.filter(F.col("doc_id") % 10 != 0)
        sig = staged_shingle_signatures(spark, sf_dir).filter(
            F.col("doc_id") % 10 != 0
        )
        build_minhash_index(base, path, signatures=sig)
        _STAGED_INDEX[key] = path
    return path


_BUILD_ORACLE = f"""WITH {NGRAM_SKETCH_CTES}
    SELECT CAST(band AS INTEGER) AS band, COUNT(*) AS n_rows
    FROM banded WHERE doc_id % 10 <> 0 GROUP BY 1"""


@query("minhash_index_build", _BUILD_ORACLE)
def q_minhash_index_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-time index build, benched in isolation: force-rebuilds the
    staged incremental index (partitioned (band, bkt) write + signature
    sidecar) and returns per-band sketch-row counts read back FROM the
    persisted index — so the oracle value-checks what actually landed on
    disk, not an in-memory twin."""
    path = stage_incremental_index(spark, sf_dir, force=True)
    return (
        spark.read.parquet(path)
        .groupBy(F.col("band").cast("int").alias("band"))
        .agg(F.count("*").alias("n_rows"))
    )


# The rebuild scenario lowers the widening threshold to 300 docs so the
# growth contract actually FIRES at test scale (the production dial is 1M):
# build on the base corpus at the default dial (1-char keys), append the
# held-out batch (growth), rebuild-if-grown at wide_threshold=300. The
# oracle replays the width DECISION (n_union > 300 -> 2-char keys) and the
# full per-(band, bkt) row counts — the value-hash proves both that the
# rebuild landed at the fresh width and that its content equals a fresh
# build over the union (the rp_index_rebuild twin for this family).
MH_REBUILD_WT = 300

_MH_REBUILD_DIR: dict[tuple, str] = {}

_REBUILD_ORACLE = f"""WITH {NGRAM_SKETCH_CTES},
    w AS (SELECT {_bkt_chars_case_sql("COUNT(*)", MH_REBUILD_WT)} AS c
          FROM sh)
    SELECT CAST(band AS INTEGER) AS band,
           substr(min_h, 1, w.c) AS bkt,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM banded, w GROUP BY 1, 2, w.c"""


@query("minhash_index_rebuild", _REBUILD_ORACLE)
def q_minhash_index_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The minhash growth-contract maintenance cycle end-to-end: build a
    private index on the base corpus (doc_id % 10 != 0, staged signatures —
    no fresh md5 pass) at the default widening dial, append the held-out
    batch, then ``rebuild_minhash_index_if_grown(wide_threshold=300)``.
    Returns per-(band, bkt) row counts read back FROM the rebuilt on-disk
    index via the explicit schema (bkt stays STRING) — the oracle's
    replayed width decision + counts prove rebuild-after-growth is
    byte-identical to never having grown."""
    from temporalvault_spark.operators.llm import (
        _corpus_key,
        staged_shingle_signatures,
    )
    from temporalvault_spark.staging import stage_dir

    docs = load_catalog(spark, sf_dir).table("documents")
    sig = staged_shingle_signatures(spark, sf_dir)
    # ONE private directory per corpus, reused across invocations (the
    # q_rp_index_rebuild precedent: bench best-of-2 must not pile up
    # abandoned index copies)
    key = _corpus_key(spark, sf_dir)
    path = _MH_REBUILD_DIR.get(key)
    if path is None or not os.path.isdir(os.path.dirname(path)):
        path = os.path.join(stage_dir(spark, "mh_rebuild"), "index")
        _MH_REBUILD_DIR[key] = path
    base = docs.filter(F.col("doc_id") % 10 != 0)
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    build_minhash_index(
        base, path, signatures=sig.filter(F.col("doc_id") % 10 != 0)
    )
    build_minhash_index(
        batch,
        path,
        append=True,
        signatures=sig.filter(F.col("doc_id") % 10 == 0),
    )
    rebuild_minhash_index_if_grown(spark, path, wide_threshold=MH_REBUILD_WT)
    return (
        _index_frame(spark, path)
        .groupBy(F.col("band").cast("int").alias("band"), "bkt")
        .agg(F.count("*").alias("n_rows"))
    )


# The RECURRING maintenance cost, benched alone (r10 verdict: the bundled
# build+append+rebuild cycle queries are correctness gates — 15s of
# deliberately-forced small-file rewrites — and a regression in the cheap
# recurring probe could hide inside their noise). One slim aggregate over
# the sketch (never signatures) + the persisted _meta vs the replayed width
# decision: the oracle recomputes rows/docs/buckets from the shared sketch
# CTEs and replays _bkt_chars_for on BOTH the persisted build size and the
# current size, value-checking that what _meta recorded is what the build
# rule dictates and that `grown` is the comparison of the two.
_MH_SKEW_CTES, _MH_SKEW_SEL = skew_oracle_sql("base", "band, min_h")
_MH_OCC_ORACLE = f"""WITH {NGRAM_SKETCH_CTES},
    base AS (SELECT * FROM banded WHERE doc_id % 10 <> 0),
    m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                 CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
                 CAST(COUNT(DISTINCT (band, min_h)) AS BIGINT) AS n_bkts
          FROM base),
    {_MH_SKEW_CTES}
    SELECT n_rows, n_docs, n_bkts,
           {_MH_SKEW_SEL},
           CAST({_bkt_chars_case_sql("n_docs")} AS INTEGER)
               AS bkt_chars,
           CAST({_bkt_chars_case_sql("n_docs")} AS INTEGER)
               AS target_bkt_chars,
           FALSE AS grown
    FROM m CROSS JOIN mb"""


@query("minhash_index_occupancy", _MH_OCC_ORACLE)
def q_minhash_index_occupancy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The growth-contract occupancy PROBE over the staged incremental
    index — the cost a 100 TB pipeline pays per maintenance tick (the
    rebuild itself fires rarely and is value-checked separately by
    minhash_index_rebuild). Returns the slim aggregate plus the persisted
    vs recomputed width decision; at the production dial the staged base
    corpus is far below the widening threshold, so grown=false — the
    ORACLE's value-hash proves the persisted _meta equals the replayed
    build rule and that the probe's comparison arithmetic agrees
    cross-engine."""
    path = stage_incremental_index(spark, sf_dir)
    bkt_chars, _n_built = _read_meta_full(spark, path)
    idx = _index_frame(spark, path)
    stats = idx.agg(
        F.count("*").alias("n_rows"),
        F.count_distinct("doc_id").alias("n_docs"),
        F.count_distinct("band", "min_h").alias("n_bkts"),
    )
    return (
        with_bucket_skew(stats, idx, ("band", "min_h"))
        .withColumn("bkt_chars", F.lit(bkt_chars).cast("int"))
        .withColumn("target_bkt_chars", _bkt_chars_col("n_docs"))
        .withColumn("grown", F.col("target_bkt_chars") > F.col("bkt_chars"))
    )


@query("dedup_incremental_probe", _INCR_ORACLE)
def q_dedup_incremental_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The recurring half: probe the staged index with the held-out batch
    (doc_id % 10 == 0), batch signatures sliced from the staged signature
    artifact. This is the per-ingest-batch cost a 100 TB pipeline pays —
    partition-pruned index scan + broadcast batch — with the one-time build
    amortized away (benched separately as minhash_index_build)."""
    path = stage_incremental_index(spark, sf_dir)
    from temporalvault_spark.operators.llm import staged_shingle_signatures

    docs = load_catalog(spark, sf_dir).table("documents")
    batch = docs.filter(F.col("doc_id") % 10 == 0)
    qsig = staged_shingle_signatures(spark, sf_dir).filter(F.col("doc_id") % 10 == 0)
    return query_minhash_index(spark, path, batch, signatures=qsig)
