#!/usr/bin/env python
"""Per-batch cost curves for the text / image / audio streaming dedup gates
(r10 verdict #7): the RP/embedding gate's growth curve was measured in
round 10 (tools/index_growth_probe.py, SCALE.md); this tool runs the SAME
Part-B experiment for the other three gates so every modality's
maintenance cadence is measured, not inferred from a sibling.

For each gate: feed K equal micro-batches of synthetic novel items through
ONE long-lived checkpoint (the production tail-the-source shape), record
each batch's wall seconds and the index size it probed against, then ask
the growth contract (occupancy at a lowered widening dial) whether a
rebuild fires and run it.

Usage: python tools/gate_growth_probe.py [per_batch] [K_batches]
Prints a markdown block for SCALE.md and writes /tmp/gate_growth_probe.json.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _doc_df(spark, lo: int, hi: int):
    """Synthetic novel documents: 24 md5-derived words each — distinct ids
    share no shingles, so the corpus grows ~per_batch docs per batch."""
    from pyspark.sql import functions as F

    return (
        spark.range(lo, hi)
        .select(F.col("id").alias("doc_id"))
        .selectExpr(
            "doc_id",
            "array_join(transform(sequence(0, 23), j -> "
            "substring(md5(concat('gw:', doc_id, ':', j)), 1, 7)), ' ') AS text",
            "'en' AS lang",
            "'probe' AS source",
            "CAST(200 AS BIGINT) AS n_chars",
        )
    )


def _img_df(spark, lo: int, hi: int):
    """Synthetic novel images: every id gets its own seed group (ids are
    multiplied out to v=0 slots), so cross-batch hashes sit ~32 bits apart."""
    from temporalvault_spark.operators.phash import synth_ppm_images

    ids = spark.range(lo, hi).selectExpr("id * 40 AS doc_id")
    return synth_ppm_images(ids)


def _aud_df(spark, lo: int, hi: int):
    from temporalvault_spark.operators.audio_fp import synth_wav_audio

    ids = spark.range(lo, hi).selectExpr("id * 40 + 5 AS doc_id")
    return synth_wav_audio(ids)


def _vid_df(spark, lo: int, hi: int):
    from temporalvault_spark.operators.videohash import synth_gif_videos

    ids = spark.range(lo, hi).selectExpr("id * 40 + 2 AS doc_id")
    return synth_gif_videos(ids)


def _mm_df(spark, lo: int, hi: int):
    """Full multimodal rows: novel word-soup text plus one synthetic
    image/audio/video payload each, all keyed off the id so cross-batch
    hashes never collide — feeds the joint gate."""
    from pyspark.sql import functions as F

    from temporalvault_spark.operators.audio_fp import _synth_wav
    from temporalvault_spark.operators.phash import _synth_ppm
    from temporalvault_spark.operators.videohash import _synth_gif

    base = _doc_df(spark, lo, hi).repartition(
        spark.sparkContext.defaultParallelism
    )

    def gen(batches):
        import pandas as pd

        for b in batches:
            yield pd.DataFrame(
                {
                    "doc_id": b["doc_id"],
                    "text": b["text"],
                    "image": [_synth_ppm(int(i) * 40) for i in b["doc_id"]],
                    "audio": [_synth_wav(int(i) * 40 + 5) for i in b["doc_id"]],
                    "video": [_synth_gif(int(i) * 40 + 2) for i in b["doc_id"]],
                }
            )

    return base.mapInPandas(
        gen,
        "doc_id bigint, text string, image binary, audio binary, video binary",
    )


def _run_gate(spark, name, make_batch, gate, id_schema, index_rows, occupancy,
              rebuild, per_batch, k):
    root = tempfile.mkdtemp(prefix=f"tv_gate_{name}_")
    src, idx, acc = f"{root}/src", f"{root}/idx", f"{root}/acc"
    times, sizes = [], []
    for b in range(k):
        lo = 50_000_000 + b * per_batch
        make_batch(spark, lo, lo + per_batch).write.mode("overwrite").parquet(
            f"{src}/b{b}.parquet"
        )
        stream = spark.readStream.schema(id_schema).parquet(f"{src}/*.parquet")
        sizes.append(index_rows(spark, idx) if os.path.isdir(idx) else 0)
        t0 = time.perf_counter()
        gate(stream, idx, acc, f"{root}/ck")
        times.append(round(time.perf_counter() - t0, 2))
    # lowered widening dial so the contract actually fires at probe scale
    occ = occupancy(spark, idx, per_batch * max(k // 2, 1))
    reb = rebuild(spark, idx, per_batch * max(k // 2, 1))
    shutil.rmtree(root, ignore_errors=True)
    return {
        "per_batch": per_batch,
        "index_rows_before_batch": sizes,
        "batch_sec": times,
        "end_occupancy": occ["occupancy"],
        "end_grown": occ["grown"],
        "end_rebuilt": reb["rebuilt"],
        "end_width": (occ["bkt_chars"], reb.get("target_bkt_chars")),
    }


def main() -> None:
    per_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 8

    from temporalvault_spark.session import get_spark

    spark = get_spark("gate-growth-probe")
    spark.sparkContext.setLogLevel("ERROR")

    from temporalvault_spark.operators import (
        afp_index,
        minhash_index,
        phash_index,
        vfp_index,
    )
    from temporalvault_spark.streaming import (
        audio_dedup_ingest_stream,
        dedup_ingest_stream,
        image_dedup_ingest_stream,
        video_dedup_ingest_stream,
    )

    out: dict = {"per_batch": per_batch, "k_batches": k}

    out["text"] = _run_gate(
        spark, "text", _doc_df, dedup_ingest_stream,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
        lambda s, p: s.read.parquet(p).count(),
        minhash_index.minhash_index_occupancy,
        minhash_index.rebuild_minhash_index_if_grown,
        per_batch, k,
    )
    out["image"] = _run_gate(
        spark, "image", _img_df, image_dedup_ingest_stream,
        "img_id bigint, image binary",
        lambda s, p: s.read.parquet(p).count(),
        phash_index.phash_index_occupancy,
        phash_index.rebuild_phash_index_if_grown,
        per_batch, k,
    )
    out["audio"] = _run_gate(
        spark, "audio", _aud_df, audio_dedup_ingest_stream,
        "aud_id bigint, audio binary",
        lambda s, p: s.read.parquet(p).count(),
        afp_index.afp_index_occupancy,
        afp_index.rebuild_afp_index_if_grown,
        per_batch, k,
    )

    out["video"] = _run_gate(
        spark, "video", _vid_df, video_dedup_ingest_stream,
        "vid_id bigint, video binary",
        lambda s, p: s.read.parquet(p).count(),
        vfp_index.vfp_index_occupancy,
        # the indexed unit is the FRAME (6 per video), so the lowered
        # widening dial scales accordingly inside _run_gate's formula
        vfp_index.rebuild_vfp_index_if_grown,
        per_batch, k,
    )

    # the JOINT multimodal gate: all four probes + four index appends per
    # batch through one marker; contract checks run on the text index
    mm_root = tempfile.mkdtemp(prefix="tv_gate_multimodal_")
    mm_paths = {k: f"{mm_root}/idx_{k}" for k in ("text", "image", "audio", "video")}
    from temporalvault_spark.streaming import multimodal_dedup_ingest_stream

    def _mm_gate(stream, _idx, acc, ck):
        os.makedirs(_idx, exist_ok=True)  # sentinel for _run_gate's isdir
        return multimodal_dedup_ingest_stream(stream, mm_paths, acc, ck)

    out["multimodal"] = _run_gate(
        spark, "multimodal", _mm_df, _mm_gate,
        "doc_id bigint, text string, image binary, audio binary, video binary",
        lambda s, p: sum(
            s.read.parquet(q).count()
            for q in mm_paths.values()
            if os.path.isdir(q)
        ),
        lambda s, p, wt: minhash_index.minhash_index_occupancy(
            s, mm_paths["text"], wt
        ),
        lambda s, p, wt: minhash_index.rebuild_minhash_index_if_grown(
            s, mm_paths["text"], wt
        ),
        per_batch, k,
    )
    shutil.rmtree(mm_root, ignore_errors=True)

    json.dump(out, open("/tmp/gate_growth_probe.json", "w"), indent=1)

    for name in ("text", "image", "audio", "video", "multimodal"):
        r = out[name]
        print(f"\n### {name} gate — per-batch wall time ({per_batch} items/batch)\n")
        print("| batch | index rows before | sec |")
        print("|---|---|---|")
        for i, (s, t) in enumerate(zip(r["index_rows_before_batch"], r["batch_sec"])):
            print(f"| {i} | {s} | {t} |")
        print(
            f"\nend: occupancy {r['end_occupancy']}, grown={r['end_grown']}, "
            f"rebuild fired={r['end_rebuilt']}, width {r['end_width'][0]} -> "
            f"{r['end_width'][1]}"
        )


if __name__ == "__main__":
    main()
