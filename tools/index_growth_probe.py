#!/usr/bin/env python
"""Growth-contract measurement for the persisted RP-LSH index (r9 verdict
#1 + #6): show that probe fan-out degrades as an append-only index outgrows
its build-time width, that rebuild_rp_index_if_grown restores it, and that
the streaming embedding gate's per-batch cost stays flat until the growth
contract bites.

Part A — batch probe vs index growth:
  build an index on N base vectors, append to 8N (stale width), probe the
  SAME fixed batch at 1x / 8x-stale / 8x-rebuilt. Reported: candidate-pair
  fan-out (the banded join's output before the exact verify), per-bucket
  occupancy, probe wall seconds.

Part B — streaming gate per-batch wall time:
  feed the gate K equal micro-batches (the index grows Kx across the run),
  record each batch's wall seconds and the index size it probed against.

Usage: python tools/index_growth_probe.py [N_base] [K_batches]
Prints a markdown block for SCALE.md and writes
/tmp/index_growth_probe.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DIM = 16


def _emb_df(spark, lo: int, hi: int):
    """Deterministic md5-derived pseudo-random vectors (the _plane_coef
    construction): component bits are i.i.d.-uniform, so band buckets fill
    ~uniformly and cross-vector cosines concentrate near 0 — a linear
    congruential generator measured here first and produced pathologically
    parallel vectors (95% rejected as near-dups, buckets 8x over-occupied),
    which voided the measurement."""
    from pyspark.sql import functions as F

    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("vec_id"))
        .selectExpr(
            "vec_id",
            f"transform(sequence(0, {DIM - 1}), j -> "
            "CAST(CAST(conv(substring(md5(concat('gv:', vec_id, ':', j)), 1, 8), 16, 10) "
            "AS DOUBLE) / 4294967296.0 - 0.5 AS FLOAT)) AS embedding",
            "0 AS label",
        )
    )


def _probe_stats(spark, path, batch):
    """(candidate fan-out, probe seconds): replicates query_rp_index's
    candidate stage to COUNT the banded join's output, then times the full
    probe."""
    from pyspark.sql import functions as F

    from temporalvault_spark.operators.rp_lsh import rp_signatures
    from temporalvault_spark.operators.rp_lsh_index import (
        _index_frame,
        _read_meta,
        query_rp_index,
    )

    bits, bkt_chars = _read_meta(spark, path)
    qs = rp_signatures(batch, bits=bits)
    keys = (
        qs.select("band", F.substring("bucket", 1, bkt_chars).alias("bkt"))
        .distinct()
        .collect()
    )
    from functools import reduce

    hit = {}
    for r in keys:
        hit.setdefault(r["band"], []).append(r["bkt"])
    prune = reduce(
        lambda a, b: a | b,
        [(F.col("band") == b) & F.col("bkt").isin(v) for b, v in hit.items()],
    )
    cand = (
        _index_frame(spark, path)
        .filter(prune)
        .join(
            F.broadcast(qs.select(F.col("vec_id").alias("q_vec"), "band", "bucket")),
            ["band", "bucket"],
        )
        .count()
    )
    t0 = time.perf_counter()
    query_rp_index(spark, path, batch, threshold=0.99).write.format("noop").mode(
        "overwrite"
    ).save()
    sec = time.perf_counter() - t0
    return cand, round(sec, 2)


def main() -> None:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    k_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from temporalvault_spark.session import get_spark

    spark = get_spark("index-growth-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from temporalvault_spark.operators.rp_lsh_index import (
        build_rp_index,
        rebuild_rp_index_if_grown,
        rp_index_occupancy,
    )

    out: dict = {"n_base": n_base, "k_batches": k_batches}

    # ---- Part A: probe fan-out at 1x / 8x-stale / 8x-rebuilt -------------
    root = tempfile.mkdtemp(prefix="tv_growth_probe_")
    path = os.path.join(root, "idx")
    batch = _emb_df(spark, 10_000_000, 10_000_200).localCheckpoint(eager=True)

    build_rp_index(_emb_df(spark, 0, n_base), path)
    occ1 = rp_index_occupancy(spark, path)
    cand1, sec1 = _probe_stats(spark, path, batch)

    build_rp_index(_emb_df(spark, n_base, 8 * n_base), path, append=True)
    occ8 = rp_index_occupancy(spark, path)
    cand8, sec8 = _probe_stats(spark, path, batch)

    reb = rebuild_rp_index_if_grown(spark, path)
    assert reb["rebuilt"], reb
    occr = rp_index_occupancy(spark, path)
    candr, secr = _probe_stats(spark, path, batch)
    shutil.rmtree(root, ignore_errors=True)

    out["part_a"] = {
        "stage": ["1x build", "8x stale width", "8x rebuilt"],
        "bits": [occ1["bits"], occ8["bits"], occr["bits"]],
        "occupancy": [occ1["occupancy"], occ8["occupancy"], occr["occupancy"]],
        "candidates": [cand1, cand8, candr],
        "probe_sec": [sec1, sec8, secr],
    }

    # ---- Part B: streaming gate per-batch wall time ----------------------
    from temporalvault_spark.streaming import embedding_dedup_ingest_stream

    root = tempfile.mkdtemp(prefix="tv_gate_probe_")
    src, idx, acc = f"{root}/src", f"{root}/idx", f"{root}/acc"
    per_batch = max(n_base // 10, 1000)
    times, sizes = [], []
    for b in range(k_batches):
        lo = 20_000_000 + b * per_batch
        _emb_df(spark, lo, lo + per_batch).write.mode("overwrite").parquet(
            f"{src}/b{b}.parquet"
        )
        stream = spark.readStream.schema(
            "vec_id bigint, embedding array<float>, label int"
        ).parquet(f"{src}/*.parquet")
        sizes.append(
            spark.read.parquet(f"{idx}/_vectors").count() if os.path.isdir(idx) else 0
        )
        t0 = time.perf_counter()
        # ONE checkpoint across the run: each drain picks up only the new
        # file as the next batch_id (the production tail-the-source shape).
        # threshold=0.99: random dim-16 cosines spread +-0.26, so the
        # operator default (0.45) rejects ~90% of a random batch — the
        # growth measurement wants the index to actually GROW, and only
        # exact-direction dups exist here by construction
        embedding_dedup_ingest_stream(stream, idx, acc, f"{root}/ck", threshold=0.99)
        times.append(round(time.perf_counter() - t0, 2))
    occ_end = rp_index_occupancy(spark, idx)
    reb_end = rebuild_rp_index_if_grown(spark, idx)
    shutil.rmtree(root, ignore_errors=True)
    out["part_b"] = {
        "per_batch": per_batch,
        "index_rows_before_batch": sizes,
        "batch_sec": times,
        "end_occupancy": occ_end["occupancy"],
        "end_grown": occ_end["grown"],
        "end_rebuilt": reb_end["rebuilt"],
        "end_bits": (occ_end["bits"], reb_end.get("target_bits")),
    }

    json.dump(out, open("/tmp/index_growth_probe.json", "w"), indent=1)

    a = out["part_a"]
    print("\n### Part A — fixed 200-vector probe vs index growth\n")
    print("| stage | bits | rows/bucket | candidate pairs | probe sec |")
    print("|---|---|---|---|---|")
    for i, st in enumerate(a["stage"]):
        print(
            f"| {st} | {a['bits'][i]} | {a['occupancy'][i]} "
            f"| {a['candidates'][i]} | {a['probe_sec'][i]} |"
        )
    b = out["part_b"]
    print("\n### Part B — streaming gate per-batch wall time\n")
    print("| batch | index vectors before | sec |")
    print("|---|---|---|")
    for i, (s, t) in enumerate(zip(b["index_rows_before_batch"], b["batch_sec"])):
        print(f"| {i} | {s} | {t} |")
    print(
        f"\nend: occupancy {b['end_occupancy']}, grown={b['end_grown']}, "
        f"rebuild fired={b['end_rebuilt']}, bits {b['end_bits'][0]} -> "
        f"{b['end_bits'][1]}"
    )


if __name__ == "__main__":
    main()
