"""Persisted IVF index: embeddings written partitioned BY cluster id, so an
ANN probe is a partition-pruned scan of nprobe/C of the corpus — the
disk-layout form of sim_ivf_ann's claim (similarity.py), and how
embedding search actually deploys on a data lake: the index build is a
one-time job, every probe after it reads only its clusters' directories.

The assignment RULE (argmax dot-product against the index's persisted
``_centroids`` sidecar) is the same one the oracle-checked sim_ivf_ann
uses, so a build is reproducible across engines given the same centroid
set. The default centroid SET, however, is the adaptive-k first-k
(adaptive_n_centroids: k = max(16, ceil(N/400))) — identical to
sim_ivf_ann's fixed N_CENTROIDS=16 only up to 16·400 vectors; beyond
that the index intentionally diverges to keep per-partition size (and
per-probe read) constant as the corpus grows. Probes always rank against
the sidecar, never a recomputed set, so index self-consistency holds at
every size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporalvault_spark.operators.similarity import (
    _dot,
    _norm,
    assign_to_centroids_auto,
)


def append_to_ivf_index(emb: DataFrame, path: str) -> None:
    """Incremental index ingest: assign a NEW batch of vectors against the
    index's OWN persisted centroids (the `_centroids` sidecar — never
    recomputed, so assignment stays consistent with every earlier batch)
    and append into the same centroid_id partition directories. An
    append-only job touching only the batch; probes see the new vectors
    immediately through the unchanged partition layout. vec_id uniqueness
    across appends is the caller's contract."""
    spark = emb.sparkSession
    cents = spark.read.parquet(f"{path}/_centroids")
    e = emb.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("e"))
    (
        assign_to_centroids_auto(e, cents)
        .repartition("centroid_id")
        .write.mode("append")
        .partitionBy("centroid_id")
        .parquet(path)
    )


def build_ivf_index(emb: DataFrame, path: str, centroids: DataFrame | None = None) -> None:
    """One-time index build: assign every vector to its nearest centroid
    (the SAME shared assignment the oracle-checked queries use) and
    write partitioned by centroid_id, plus a tiny ``_centroids`` sidecar —
    underscore-prefixed so Spark's reader ignores it when scanning the index
    — holding the centroid vectors. Probes then never touch the main index
    outside their nprobe partitions. At corpus scale this is the single
    shuffle every subsequent probe amortizes.

    ``centroids`` defaults to the deterministic first-k set with ADAPTIVE k
    (adaptive_n_centroids: k = max(16, ceil(N/400)) — a fixed k would make
    partition size grow with the corpus and the per-probe read grow
    nprobe·N/k; adaptive k keeps both constant). Pass
    ``similarity.train_centroids(e, seed=...)`` for k-means-quality
    clusters — ivf_search works unchanged because probes rank whatever the
    sidecar holds."""
    from temporalvault_spark.operators.similarity import adaptive_n_centroids

    # NULL-filter BEFORE the count and the first-k selection (matching
    # build_ivfpq_index): a NULL embedding among vec_id < k would become a
    # centroid whose similarity is NULL against every vector
    e = emb.filter(F.col("embedding").isNotNull()).select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("e")
    )
    if centroids is None:
        k = adaptive_n_centroids(e.count())
        centroids = e.filter(F.col("vec_id") < k).select(
            F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce")
        )
    cents = centroids
    (
        assign_to_centroids_auto(e, cents)
        .repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )
    cents.coalesce(1).write.mode("overwrite").parquet(f"{path}/_centroids")


def ivf_search(
    spark: SparkSession,
    index_path: str,
    probe_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
) -> DataFrame:
    """Probe the persisted index: rank centroids against the probe on the
    driver (C dot products — microscopic), then scan ONLY the nprobe best
    cluster partitions (`centroid_id IN (...)` prunes at the directory
    level; the plan's PartitionFilters is the proof) and brute-force top-k
    inside them."""
    idx = spark.read.parquet(index_path)
    # centroid ranking reads the sidecar, not the index — a filter on vec_id
    # over the main index would scan EVERY cluster partition just to find 16
    # rows, defeating the pruning this layout exists for. Ranked by the
    # centroid's own id (centroid_id in the sidecar), which is tie-safe.
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

    p = F.array(*[F.lit(float(x)) for x in probe_vec])
    cos = _dot(F.col("e"), p) / (_norm(F.col("e")) * _norm(p))
    return (
        idx.filter(F.col("centroid_id").isin(probe_clusters))
        .withColumn("cosine", F.round(cos, 6))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", "centroid_id", "cosine")
    )
