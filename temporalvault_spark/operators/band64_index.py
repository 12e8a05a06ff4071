"""Parametric persisted band index over 64-bit '0'/'1' fingerprints — the
shared implementation behind the image (phash_index) and audio (afp_index)
incremental near-dup indexes. Both modalities reduce to the same object: a
64-bit hash split into 4 x 16-bit Hamming bands (phash.band_explode — ONE
banding definition), persisted as

    (id, hash64, band, bv) partitioned by (band, bkt, ingest)

with bkt = the band value's leading chars, no sidecar at all (the 8-byte
hash IS the exact-verify object), the ingest layer for exactly-once
streaming appends, and the occupancy/rebuild growth contract from
index_common. Round 10's review found every drift bug in per-module
restatements of exactly these mechanics, so the image and audio families
instantiate THIS class instead of restating them (the index_common
philosophy, one level up).

What stays per-modality: the kernel (aHash pixels vs envelope frames), the
synthetic corpus, the staged scenario dials, and the oracles — those live
in phash_index.py / afp_index.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporalvault_spark.constants import quant6
from temporalvault_spark.operators.index_common import (
    assert_ingest_layout,
    atomic_swap_rebuild,
    collect_prune,
    meta_row,
    resolve_write_mode,
)
from temporalvault_spark.operators.phash import (
    BAND_BITS,
    band_explode,
    hamming_expr,
)


class Band64Index:
    """One instance per modality: ``family`` names the index in errors,
    ``id_col`` is the fingerprint frame's id column (img_id / aud_id),
    ``q_prefix`` shapes the probe output columns (query_img/index_img)."""

    def __init__(self, family: str, id_col: str, q_prefix: str):
        self.family = family
        self.id_col = id_col
        self.q_out = (f"query_{q_prefix}", f"index_{q_prefix}")
        self.n_key = f"n_{q_prefix}s"
        # Explicit read schema: bkt/bv are all-digit '0'/'1' strings that
        # partition type inference would coerce to INT (the rp_lsh lesson)
        self.schema = (
            f"{id_col} BIGINT, hash64 STRING, bv STRING, band INT, "
            "bkt STRING, ingest INT"
        )

    def frame(self, spark: SparkSession, path: str) -> DataFrame:
        return spark.read.schema(self.schema).parquet(path)

    # the ONE statement of the width rule: narrow/wide key widths and the
    # production widening dial. bkt_chars_for (builds), bkt_chars_case_sql
    # (oracles), and bkt_chars_col (registered probes) are all generated
    # from these three names, so a dial change cannot leave a query and its
    # oracle agreeing with each other while both diverge from what builds
    # actually persist (the per-module-restatement drift class).
    NARROW, WIDE = 2, 4
    WIDE_DEFAULT = 1_000_000

    @classmethod
    def bkt_chars_for(cls, n: int, wide_threshold: int = WIDE_DEFAULT) -> int:
        """Partition-key width (leading chars of the 16-bit band value): 4
        chars (16 dirs/band) once the corpus is big enough to fill them, 2
        chars (4 dirs/band) below — the minhash small-file rule. Always <=
        BAND_BITS."""
        return cls.WIDE if n > wide_threshold else cls.NARROW

    @classmethod
    def bkt_chars_case_sql(cls, n_expr: str, wide_threshold: int = WIDE_DEFAULT) -> str:
        """DuckDB CASE replaying bkt_chars_for, generated from the same
        constants — embed in oracle SQL wherever the width decision must be
        value-visible."""
        return (
            f"CASE WHEN {n_expr} > {wide_threshold} "
            f"THEN {cls.WIDE} ELSE {cls.NARROW} END"
        )

    @classmethod
    def bkt_chars_col(cls, n_col: str, wide_threshold: int = WIDE_DEFAULT):
        """Spark Column replaying bkt_chars_for — the probe-side twin of
        bkt_chars_case_sql."""
        return (
            F.when(F.col(n_col) > wide_threshold, cls.WIDE)
            .otherwise(cls.NARROW)
            .cast("int")
        )

    def read_meta_full(self, spark: SparkSession, path: str) -> tuple[int, int]:
        """(bkt_chars, n_built) via index_common.meta_row (mtime-cached;
        raises on a torn write); an invalid persisted width would silently
        prune every probe to zero partitions, so validate on read."""
        d = meta_row(spark, path)
        got = (d["bkt_chars"], d.get("n_built", 0) or 0)
        if not (1 <= got[0] <= BAND_BITS):
            raise ValueError(
                f"{self.family} index at {path} has invalid _meta "
                f"(bkt_chars={got[0]}): requires 1 <= bkt_chars <= "
                f"{BAND_BITS} — corrupted or future-format index"
            )
        return got

    def banded(self, hashes: DataFrame, bkt_chars: int, ingest: int) -> DataFrame:
        """phash.band_explode (the ONE banding definition — index-vs-
        operator parity is load-bearing for the gates) plus the index's
        partition columns."""
        return band_explode(hashes, self.id_col).select(
            self.id_col,
            "hash64",
            "bv",
            "band",
            F.substring("bv", 1, bkt_chars).alias("bkt"),
            F.lit(ingest).cast("int").alias("ingest"),
        )

    def build(
        self,
        hashes: DataFrame,
        path: str,
        append: bool = False,
        ingest_id: int | None = None,
        wide_threshold: int = 1_000_000,
    ) -> None:
        """Write (id, hash64, band, bv) partitioned by (band, bkt, ingest)
        plus the 1-row ``_meta`` (bkt_chars, n_built). ``append=True``
        derives the PERSISTED key width; ``ingest_id`` names the ingest
        partition for EXACTLY-ONCE streaming appends (dynamic partition
        overwrite — replays rewrite); ``None`` uses the bulk namespace
        ingest=-1 (base builds live there, so a stream's batch-id
        overwrites can never clobber them). Id uniqueness across appends
        is the caller's contract."""
        spark = hashes.sparkSession
        mode, dyn, ingest = resolve_write_mode(append, ingest_id)
        if append:
            assert_ingest_layout(path, self.family)
            bkt_chars = self.read_meta_full(spark, path)[0]
            n = 0
        else:
            n = hashes.count()
            bkt_chars = self.bkt_chars_for(n, wide_threshold)
        w = (
            self.banded(hashes, bkt_chars, ingest)
            .repartition("band", "bkt")
            .write.mode(mode)
        )
        if dyn:
            w = w.option("partitionOverwriteMode", "dynamic")
        w.partitionBy("band", "bkt", "ingest").parquet(path)
        if not append:
            spark.range(0, 1, 1, 1).select(
                F.lit(bkt_chars).cast("int").alias("bkt_chars"),
                F.lit(n).cast("bigint").alias("n_built"),
            ).write.mode("overwrite").parquet(f"{path}/_meta")

    def query(
        self,
        spark: SparkSession,
        index_path: str,
        new_hashes: DataFrame,
        threshold: int,
    ) -> DataFrame:
        """Near-dup pairs (query_id, index_id, hamming <= threshold)
        between a new batch's hashes and the indexed corpus. The batch's
        distinct (band, bkt) keys become an explicit partition-pruning
        predicate (at most bands x |batch| directories read); candidates
        equi-join on (band, bv); the exact 64-position verify reads hash64
        straight off the joined rows — no sidecar, no second scan.
        Self-pairs excluded."""
        q_col, i_col = self.q_out
        bkt_chars = self.read_meta_full(spark, index_path)[0]
        qb = self.banded(new_hashes, bkt_chars, 0).localCheckpoint(eager=True)

        prune = collect_prune(qb)
        if prune is None:
            return spark.createDataFrame(
                [], f"{q_col} bigint, {i_col} bigint, hamming int"
            )
        idx = self.frame(spark, index_path).filter(prune)
        q = qb.select(
            F.col(self.id_col).alias("q_id"),
            F.col("hash64").alias("qh"),
            "band",
            "bv",
        )
        cand = (
            idx.join(F.broadcast(q), ["band", "bv"])
            .filter(F.col(self.id_col) != F.col("q_id"))
            .select(
                "q_id",
                F.col(self.id_col).alias(i_col),
                "qh",
                F.col("hash64").alias("ih"),
            )
            .dropDuplicates(["q_id", i_col])
        )
        return (
            cand.select(
                F.col("q_id").alias(q_col),
                i_col,
                hamming_expr("qh", "ih").cast("int").alias("hamming"),
            )
            .filter(F.col("hamming") <= threshold)
        )

    def occupancy(
        self, spark: SparkSession, path: str, wide_threshold: int = 1_000_000
    ) -> dict:
        """Two slim aggregates over the index vs the persisted build-time
        key width; ``grown`` when the current corpus size calls for a wider
        bkt. ``max_bucket``/``skew`` (max bucket rows vs the even-split
        mean, the centroid family's skew semantic — round-12 verdict #5)
        expose the LSH hot-bucket failure mode: a boilerplate-heavy corpus
        concentrates one (band, bkt) directory, and probe fan-out then
        rides max_bucket, not the mean the occupancy column reports."""
        from temporalvault_spark.operators.index_common import bucket_skew

        bkt_chars, n_built = self.read_meta_full(spark, path)
        idx = self.frame(spark, path)
        row = idx.agg(
            F.count("*").alias("rows"),
            F.count_distinct(self.id_col).alias("n"),
            F.count_distinct("band", "bv").alias("n_bkts"),
        ).first()
        mx, skew = bucket_skew(idx, ("band", "bv"), row["n_bkts"], row["rows"])
        target = self.bkt_chars_for(row["n"], wide_threshold)
        return {
            "bkt_chars": bkt_chars,
            "n_built": n_built,
            self.n_key: row["n"],
            "rows": row["rows"],
            # quant6, not Python round(): banker's at 3 decimals was the idiom
            # round-13/14 reviewed out of every other skew/occupancy surface
            "occupancy": quant6(row["rows"] / max(row["n_bkts"], 1)),
            "max_bucket": mx,
            "skew": skew,
            "target_bkt_chars": target,
            "grown": target > bkt_chars,
        }

    def compact_ingest(self, spark: SparkSession, path: str) -> dict:
        """OPTIMIZE the ingest layers at the SAME key width: after N
        streaming batches every touched (band, bkt) directory holds one
        small file set per batch — file-count pressure that grows with
        stream lifetime even while the width is still right (the growth
        contract won't fire). Rewrites the index's deduplicated rows into
        the bulk namespace (ingest=-1) via the shared atomic sibling swap;
        no-op when the index already has <= 1 ingest layer. Run it with
        the gate QUIESCED (no in-flight batch): a marker-lost crash replay
        pending at compaction time would re-append its rows under its
        batch id after they were folded into -1 — between batches no such
        window exists, and committed markers make replays skip entirely.
        (rebuild_if_grown has the same quiesce contract for the same
        reason.)"""
        bkt_chars, _ = self.read_meta_full(spark, path)
        n_ing = self.frame(spark, path).select("ingest").distinct().count()
        if n_ing <= 1:
            return {"n_ingest_layers": n_ing, "bkt_chars": bkt_chars,
                    "compacted": False}
        if bkt_chars == self.WIDE:
            wt = 0  # any nonzero corpus re-derives WIDE
        elif bkt_chars == self.NARROW:
            wt = 1 << 62  # nothing re-derives past NARROW
        else:
            raise ValueError(
                f"{self.family} index at {path} has non-standard width "
                f"{bkt_chars}; run rebuild_if_grown instead"
            )
        hashes = (
            self.frame(spark, path)
            .select(self.id_col, "hash64")
            .dropDuplicates([self.id_col])
            .localCheckpoint(eager=True)
        )
        atomic_swap_rebuild(
            path, lambda tmp: self.build(hashes, tmp, wide_threshold=wt)
        )
        return {"n_ingest_layers": n_ing, "bkt_chars": bkt_chars,
                "compacted": True}

    def rebuild_if_grown(
        self, spark: SparkSession, path: str, wide_threshold: int = 1_000_000
    ) -> dict:
        """OPTIMIZE-style rebuild at the fresh key width from the index's
        OWN deduplicated (id, hash64) rows — no re-decode, no re-hash —
        into a sibling directory, atomically swapped (also compacts any
        pre-ingest-layer replay duplicates)."""
        rep = self.occupancy(spark, path, wide_threshold)
        if not rep["grown"]:
            return {**rep, "rebuilt": False}
        hashes = (
            self.frame(spark, path)
            .select(self.id_col, "hash64")
            .dropDuplicates([self.id_col])
            .localCheckpoint(eager=True)
        )
        atomic_swap_rebuild(
            path, lambda tmp: self.build(hashes, tmp, wide_threshold=wide_threshold)
        )
        return {**rep, "rebuilt": True}
