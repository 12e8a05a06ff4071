"""Persisted IVF index: embeddings written partitioned BY cluster id, so an
ANN probe is a partition-pruned scan of nprobe/C of the corpus — the
disk-layout form of sim_ivf_ann's claim (similarity.py), and how
embedding search actually deploys on a data lake: the index build is a
one-time job, every probe after it reads only its clusters' directories.

Same deterministic fixed-centroid assignment as the oracle-checked
sim_ivf_ann, so build results are reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from temporalvault_spark.operators.similarity import N_CENTROIDS, _dot, _norm


def _assign(e: DataFrame) -> DataFrame:
    cent = (
        e.filter(F.col("vec_id") < N_CENTROIDS)
        .select(F.col("vec_id").alias("centroid_id"), F.col("e").alias("ce"))
    )
    csim = _dot(F.col("e"), F.col("ce")) / _norm(F.col("ce"))
    w = Window.partitionBy("vec_id").orderBy(F.desc("csim"), F.asc("centroid_id"))
    return (
        e.crossJoin(F.broadcast(cent))
        .withColumn("csim", csim)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("csim", "rn", "ce")
    )


def build_ivf_index(emb: DataFrame, path: str) -> None:
    """One-time index build: assign every vector to its nearest fixed
    centroid and write partitioned by centroid_id. At corpus scale this is
    the single shuffle that every subsequent probe amortizes."""
    e = emb.select("vec_id", "label", F.col("embedding").cast("array<double>").alias("e"))
    (
        _assign(e)
        .repartition("centroid_id")
        .write.mode("overwrite")
        .partitionBy("centroid_id")
        .parquet(path)
    )


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
    # rank by the centroid's OWN id (vec_id), not the centroid_id column it
    # was assigned to: under a similarity tie a centroid vector can be
    # assigned to a different centroid's cluster, which would put duplicates
    # in probe_clusters and silently probe fewer clusters
    cents = (
        idx.filter(F.col("vec_id") < N_CENTROIDS)
        .select("vec_id", "e")
        .collect()
    )

    def dot(a, b):
        return sum(x * y for x, y in zip(a, b))

    ranked = sorted(
        cents,
        key=lambda r: (-dot(r["e"], probe_vec) / (dot(r["e"], r["e"]) ** 0.5), r["vec_id"]),
    )
    probe_clusters = [r["vec_id"] for r in ranked[:nprobe]]

    p = F.array(*[F.lit(float(x)) for x in probe_vec])
    cos = _dot(F.col("e"), p) / (_norm(F.col("e")) * _norm(p))
    return (
        idx.filter(F.col("centroid_id").isin(probe_clusters))
        .withColumn("cosine", F.round(cos, 6))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
        .select("vec_id", "label", "centroid_id", "cosine")
    )
