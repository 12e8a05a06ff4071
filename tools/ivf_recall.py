#!/usr/bin/env python
"""Measure the IVF growth contract's recall/cost curve (SCALE.md evidence).

Scenario: a base corpus indexed at its adaptive k, then 1x growth appended
against the FROZEN centroid set (what the occupancy probe detects), then the
oracled retrain (what rebuild_ivf_index_if_grown does). For each state,
measure over held-out probe vectors at fixed nprobe:

  - recall@10 vs exact brute-force cosine over the SAME indexed corpus
  - rows scanned per probe (the partition-pruned read the layout exists for)

The point the curve proves: append growth at a frozen k keeps recall but
the per-probe read grows linearly with the corpus (occupancy drift); the
retrain at the union's adaptive k restores the constant per-probe read.

Run from the repo root:  python tools/ivf_recall.py [n_base] [dim]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from temporalvault_spark.session import get_spark


def brute_topk(corpus: dict[int, np.ndarray], probe: np.ndarray, k: int = 10):
    ids = np.array(sorted(corpus))
    mat = np.stack([corpus[i] for i in ids])
    cos = mat @ probe / (np.linalg.norm(mat, axis=1) * np.linalg.norm(probe))
    order = np.lexsort((ids, -cos))  # cosine desc, vec_id asc — ivf_search's order
    return set(ids[order[:k]].tolist())


def measure(spark, path, corpus, probes, nprobe=4, k=10):
    from pyspark.sql import functions as F

    from temporalvault_spark.operators.ivf_index import ivf_search

    idx = spark.read.parquet(path)
    sizes = {
        r["centroid_id"]: r["n"]
        for r in idx.groupBy("centroid_id").agg(F.count("*").alias("n")).collect()
    }
    cents = spark.read.parquet(f"{path}/_centroids").collect()
    recalls, scanned = [], []
    for p in probes:
        got = {
            r["vec_id"] for r in ivf_search(spark, path, list(p), k=k, nprobe=nprobe).collect()
        }
        want = brute_topk(corpus, p, k)
        recalls.append(len(got & want) / k)
        ranked = sorted(
            cents,
            key=lambda r: (
                -float(np.dot(r["ce"], p)) / float(np.linalg.norm(r["ce"])),
                r["centroid_id"],
            ),
        )
        scanned.append(sum(sizes.get(r["centroid_id"], 0) for r in ranked[:nprobe]))
    return float(np.mean(recalls)), float(np.mean(scanned))


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 6400
    dim = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rng = np.random.RandomState(42)

    spark = get_spark("ivf-recall", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    import tempfile

    from temporalvault_spark.operators.ivf_index import (
        append_to_ivf_index,
        build_ivf_index,
        ivf_index_occupancy,
        rebuild_ivf_index_if_grown,
    )

    def frame(vecs: dict[int, np.ndarray]):
        return spark.createDataFrame(
            [(i, [float(x) for x in v], int(i % 3)) for i, v in sorted(vecs.items())],
            "vec_id bigint, embedding array<double>, label int",
        )

    base = {i: rng.normal(size=dim) for i in range(n_base)}
    growth = {n_base + i: rng.normal(size=dim) for i in range(n_base)}
    union = {**base, **growth}
    probes = [rng.normal(size=dim) for _ in range(30)]

    path = os.path.join(tempfile.mkdtemp(prefix="ivf_recall_"), "index")
    build_ivf_index(frame(base), path)
    rep0 = ivf_index_occupancy(spark, path)
    r0, s0 = measure(spark, path, base, probes)
    print(f"base:    n={rep0['n_vecs']} k={rep0['k']} recall@10={r0:.3f} "
          f"rows_scanned/probe={s0:.0f} ({s0 / rep0['n_vecs']:.1%} of corpus)")

    append_to_ivf_index(frame(growth), path)
    rep1 = ivf_index_occupancy(spark, path)
    r1, s1 = measure(spark, path, union, probes)
    print(f"stale:   n={rep1['n_vecs']} k={rep1['k']} grown={rep1['grown']} "
          f"recall@10={r1:.3f} rows_scanned/probe={s1:.0f} "
          f"({s1 / rep1['n_vecs']:.1%} of corpus)")

    out = rebuild_ivf_index_if_grown(spark, path)
    rep2 = ivf_index_occupancy(spark, path)
    r2, s2 = measure(spark, path, union, probes)
    print(f"rebuilt: n={rep2['n_vecs']} k={rep2['k']} rebuilt={out['rebuilt']} "
          f"recall@10={r2:.3f} rows_scanned/probe={s2:.0f} "
          f"({s2 / rep2['n_vecs']:.1%} of corpus)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
