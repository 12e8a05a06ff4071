#!/usr/bin/env python
"""Regenerate PLANS.md: formatted physical plans of representative queries
with the scale-relevant operators annotated. Run from the repo root:

    python tools/explain_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from temporalvault_spark.session import get_spark
from temporalvault_spark.plans import plan_counts

AUDITED = [
    ("asof_latest_per_key", "one window shuffle on record_id; filter pushed to scan"),
    ("join_asof", "broadcast probe list; single (record_id, probe_ts) window shuffle"),
    ("join_broadcast", "3x BroadcastHashJoin — the fact table never shuffles"),
    ("scan_project", "PushedFilters + 4-column ReadSchema"),
    ("history_topn", "TakeOrderedAndProject: top-k without total sort"),
    ("win_rownum_latest", "WindowGroupLimit: per-partition top-k before shuffle"),
    ("tpch_q6_forecast_revenue", "all predicates at the scan; 1-row final agg"),
    ("dedup_ngram_jaccard", "equi-join on LSH block key; no all-pairs product"),
    ("sim_topk_cosine", "broadcast probe; TakeOrderedAndProject top-k"),
    ("sim_ivf_ann", "shuffle-free centroid argmax (broadcast struct array)"),
    ("text_tfidf_topk", "two partial aggs + broadcast 1-row corpus size; WindowGroupLimit top-3"),
    ("text_chunking", "pure generate/explode: ZERO exchanges, scan-speed fan-out"),
    ("knn_join", "broadcast probe batch; WindowGroupLimit bounds shuffle to k rows/probe/partition"),
    ("pack_sequences", "window + groupBy share the doc_id partitioning: one exchange total"),
    ("temperature_sample_by_lang", "5-row rate table broadcasts; corpus pass is scan+filter only"),
    ("win_gapfill_locf", "events aggregate once; grid generated from 1-row broadcast bounds; LOCF window partitions by series"),
    ("agg_first_last_by_time", "single partial+final hash aggregate (min_by/max_by) — no window, no join"),
    ("dedup_substring_spans", "rolling-window md5 projection; aggregate shuffle carries 16-byte digests only"),
    ("semdedup", "cluster-blocked pair join; verdict frames slim (vec_id only)"),
    ("knn_join_ivf", "probe-cluster candidates broadcast; corpus touched only in probed clusters; WindowGroupLimit bounds top-k"),
    ("doc_unigram_logprob", "two map-side-combined aggregates; token-keyed join of aggregated frames; 1-row corpus total broadcasts"),
    ("udtf_chunk_spans", "Python UDTF as lateral generate: zero exchanges — chunking stays embarrassingly parallel through the Arrow boundary"),
    ("zorder_scan", "layout-transparent read: id-slice predicate pushed into the z-clustered parquet scan (stats pruning consumes it)"),
    ("pii_scrub", "pure regexp projection: ZERO exchanges, redaction at scan speed"),
    ("dedup_minhash", "banded signature equi-join; size-gated broadcast of candidate-reduced signatures"),
    ("token_count_bpe2", "trainer bounded to top-vocab; per-DISTINCT-word apply rejoined by word; top-k merges via TakeOrderedAndProject"),
    ("win_rank_family", "ONE Window node evaluates all five rank functions — a single sort per partition"),
    ("html_strip", "pure regexp/replace projection: ZERO exchanges, markup removal at scan speed"),
    ("pq_encode", "~8 KB codebook broadcast + codegen'd argmin projection; corpus never exchanges"),
    ("pq_topk_adc", "broadcast 128-double distance table; fixed-order fold per row; TakeOrderedAndProject top-k"),
    ("asof_via_snapshot", "snapshot read + PartitionFilters-pruned tail scan; one merge window"),
    ("minhash_sig_stage", "returned plan = bare artifact scan; the staged md5-pass WRITE runs eagerly inside the call (numbered repartition spreads the CPU) — see dedup_ngram_jaccard's notes for the pipeline plan"),
    ("ngram_pairs_stage", "returned plan = bare artifact scan; the staged band-join + exact-verify WRITE runs eagerly inside the call, reading the signature artifact — no second text scan"),
    ("dedup_incremental_probe", "PartitionFilters on (band, bkt) from the batch's own keys; broadcast batch signatures; index corpus never reshuffles"),
    ("sessions_overlap_binned", "binned range join: equi-join on hour-bin, one-bin-per-pair guard inside the join condition — zero BNLJ/cartesian"),
    ("unpivot_measures", "native melt: ONE FileScan + Expand fan-out in place; the UNION-ALL formulation would scan 4x"),
    ("agg_distinct_bitmap", "exact distinct via mergeable bitmap partials: fixed-width bitmaps ride the shuffle, not raw distinct values"),
    ("agg_stats_moments", "five moment families in ONE partial+final hash aggregate; shuffle carries one moment tuple per group"),
    ("bm25_topk", "consumes the session-staged (doc_id, dl, query-filtered tokens) checkpoint — ONE corpus pass per session instead of four; 1-row corpus stats + per-term df broadcast; TakeOrderedAndProject top-k"),
    ("win_ewma", "ONE window shuffle on user_id; bounded 8-element frame folded by a JVM higher-order function — no UDF"),
    ("join_skew_salted", "forced ShuffledHashJoin on (key, salt): dim replicated 8x, hot key spread over 8 reducers (the hint reproduces the big-dim plan Catalyst would pick at scale); post-join agg map-side combines"),
    ("merge_upsert", "the MERGE itself is BroadcastHashJoin-only (no vault shuffle; full-outer would SMJ) — the exchanges present belong to deriving latest-state from the version log; inserts from a tiny anti-join"),
    ("trade_edges_stage", "one-time graph build, force-re-run so its cost stays measured: DISTINCT on the raw int pair (16-byte rows through the only edge-sized exchange), node labels built after, node-sized degree frame broadcast; the pair frame is checkpointed ONCE (r14 — by-lineage reuse re-expanded the orders-lineitem join+distinct 4x into the union/degree consumers: 16 FileScans/22 Exchanges -> 2/6, plans/r14/); the artifact write takes the join output's AQE-coalesced partitioning (the former numbered dst repartition served only the disproven partitioning-reuse claim and is gone, r14)"),
    ("pagerank_trade_network", "returned plan = top-k over the (lazily) checkpointed final rank state; the 5 iteration rounds (edges JOIN broadcast(ranks)) run inside the call — the edge frame itself never re-shuffles (broadcast join over the checkpointed artifact read), and each round's contribution aggregate pays ONE slim (node, c) integer-pair exchange: a localCheckpoint read-back does NOT carry hash-partitioning metadata, so the earlier 'aggregate reuses the dst partitioning' claim was stale (r14 audit, OPTIMIZATION_r14.md); above PR_BROADCAST_MAX_BYTES (byte-estimated rank relation) the loop auto-switches to a co-partitioned shuffle-hash join (both plans pinned in tests/test_graph.py)"),
    ("dedup_rp_lsh", "adaptive-width signature projection with constant-folded literal plane arrays (no per-row md5); candidates from a (band, bucket) equi-join — never corpus²; exact cosine only on DISTINCT candidates"),
    ("retrieval_rrf_topk", "each retriever cut to top-DEPTH via TakeOrderedAndProject BEFORE its rank window, so the single-partition row_number touches ≤ DEPTH rows by construction; fusion is a DEPTH-row full-outer join; the BM25 side reads the session-staged corpus pass"),
    ("ml_quantile_bin_approx", "NO Window (the exact form's per-type total order is gone): percentile_approx boundaries via one mergeable hash aggregate, bin by range lookup against the broadcast boundary frame"),
    ("agg_skew_salted", "two-stage skewed aggregate: partial agg on (key, salt) fans the hot key over 16 reducers; merge agg sees salt rows per group"),
    ("dedup_soft_weights", "soft dedup: duplicate-bounded (doc_id, group_size) map broadcasts onto the corpus (left join, no corpus shuffle); weights are exact 1/size projections"),
    ("sample_weighted_k", "weighted reservoir: ROW-LOCAL min-of-w-tickets key (transform + array_min, no explode); TakeOrderedAndProject top-k — no global sort, no data-sized shuffle"),
    ("sample_weighted_k_per_group", "same ticket key ranked per source: WindowGroupLimit keeps k rows/source/partition before the exchange"),
    ("rp_index_build", "one-time RP index build, force-re-run so its cost stays measured: one signature pass, (band, bkt)-partitioned write + vectors/meta sidecars; returned plan reads per-band counts back FROM the persisted index"),
    ("dedup_rp_incremental_probe", "PartitionFilters on (band, bkt) from the batch's own signatures (persisted width); broadcast batch vectors; index corpus never reshuffles — the RP twin of dedup_incremental_probe"),
    ("win_rolling_median_1h", "explicit sorted-frame midpoint over a RANGE window: one user_id shuffle, sliding frame — no self-join; (lo+hi)*0.5 is engine-exact"),
    ("rp_index_rebuild", "growth-contract maintenance cycle (build + append + rebuild-if-grown, all inside the call); returned plan reads per-band counts back FROM the rebuilt on-disk index — the occupancy probe is one slim aggregate, the rebuild re-signs the _vectors sidecar and atomically swaps"),
    ("image_phash_stage", "staged decode+hash pass: Arrow-batched mapInPandas over binary PPM payloads (per-row map, zero shuffles before the parquet write); the returned plan is the slim hash-table read-back"),
    ("dedup_image_phash", "Hamming-banded image pairs off the staged hash table: 4x16-bit band equi-join (never all-pairs), exact 64-position verify only on DISTINCT band collisions"),
    ("phash_index_build", "one-time image-index build (force-re-run): (band, bkt, ingest)-partitioned hash-band write, no sidecar; returned plan reads per-band counts back FROM the persisted index"),
    ("dedup_phash_incremental_probe", "PartitionFilters on (band, bkt) from the batch's own bands; broadcast batch; exact Hamming verify reads hash64 off the joined rows — the image twin of the minhash/RP probes"),
    ("dedup_image_apply", "pairs closed by the shared components solver (slim id edges only); drop set anti-joined onto the hash table; one map-side-combined per-source summary"),
    ("minhash_index_rebuild", "growth-contract cycle for the text index (build from staged signatures + append + rebuild-if-grown at a lowered widening dial); returned plan reads per-(band, bkt) counts back FROM the rebuilt index — the width decision is value-visible in the bkt partition values"),
    ("phash_index_rebuild", "growth-contract cycle for the image index (base build + v=0 append + rebuild-if-grown at wide_threshold=40 so the width switch fires at every test SF); the oracle replays pixels -> hashes -> bands at the replayed width"),
    ("minhash_index_occupancy", "the RECURRING maintenance tick benched alone: ONE slim aggregate over the sketch (never signatures) + persisted _meta vs replayed width decision — no forced-dial rewrite in the timing"),
    ("rp_index_occupancy", "same recurring probe for the RP family: slim (vec_id, band, bucket) aggregate; bits + bkt_chars decisions replayed in both engines"),
    ("phash_index_occupancy", "same recurring probe for the image family: slim (img_id, band, bv) aggregate vs persisted width"),
    ("audio_fp_stage", "staged decode+fingerprint pass for the AUDIO modality: Arrow-batched mapInPandas over real RIFF/WAVE payloads through the stdlib wave codec (per-row map, zero shuffles before the parquet write); the oracle replays every SAMPLE from the md5 formulas"),
    ("dedup_audio_fp", "Hamming-banded audio pairs off the staged fingerprint table: the SAME 4x16-bit band equi-join the image tier uses (banded_hamming_pairs — one definition), exact 64-position verify on DISTINCT collisions only"),
    ("afp_index_build", "one-time audio-index build (force-re-run): (band, bkt, ingest)-partitioned fingerprint-band write via the shared Band64Index class; returned plan reads per-band counts back FROM the persisted index"),
    ("dedup_afp_incremental_probe", "PartitionFilters on (band, bkt) from the batch's own bands; broadcast batch; exact Hamming verify reads hash64 off the joined rows — the audio twin of the minhash/RP/phash probes"),
    ("dedup_audio_apply", "audio pairs closed by the shared components solver (slim id edges); drop set anti-joined onto the fingerprint table; one map-side-combined per-source summary"),
    ("pii_scan_dense", "pii_scan with deterministically injected md5-derived spans so the hash gate runs on NONZERO rows: still a pure regexp projection at scan speed — the injection is one concat of constant-folded md5 slices"),
    ("win_ntile_ranks_scalable", "the 100 TB form of the global ranked report: range repartition on the total order, <= 16-row per-partition counts -> broadcast rank offsets, row_number partitioned by range-partition id — ZERO partition-less Window nodes, value-hash-identical to the single-window twin"),
    ("video_fp_stage", "staged decode+hash pass for the VIDEO modality: Arrow-batched mapInPandas GIF-decodes (stdlib LZW) each clip ONCE and emits per-frame aHashes; id frame repartitioned to defaultParallelism first so the per-clip Python codec work spreads across cores (measured 4.6s -> 1.3s at sf0.1)"),
    ("dedup_video_fp", "position-matched banded frame pairs off the staged table: (frame_idx, band, 16-bit value) equi-join — never all-pairs — exact Hamming verify on DISTINCT collisions, then a map-side-combined per-(vid_a, vid_b) vote count filtered at >= 4 positions"),
    ("dedup_vfp_incremental_probe", "PartitionFilters on (band, bkt) from the batch's own frame bands (fid-packed Band64Index probe); broadcast batch; the video verdict (same-position filter + vote) runs on the already-slim frame-pair output"),
    ("vfp_index_build", "one-time video-index build (force-re-run): frame-packed (band, bkt, ingest)-partitioned write via the shared Band64Index class; returned plan reads per-band counts back FROM the persisted index"),
    ("vfp_index_occupancy", "same recurring probe for the video family: slim (fid, band, bv) aggregate vs persisted width — the indexed unit is the FRAME"),
    ("dedup_multimodal_apply", "FOUR slim staged edge frames (text/image/audio/video pairs) unioned and closed by the shared components solver; the corpus-side exclusion is ONE anti-join on doc_id; per-source summary map-side combines — no pair pipeline re-runs inside the apply"),
    ("cluster_kmeans_lloyd", "per Lloyd round: shuffle-free broadcast-struct argmax assignment (the sim_ivf_ann expression) + ONE map-side-combining k x dim aggregate; only the k x dim centroid matrix reaches the driver; final summary joins a broadcast k-row norm frame"),
    ("embed_pca_power", "per power round: codegen'd centered-projection column + ONE map-side-combining dim-cell aggregate; vectors never shuffle, never reach the driver — only dim-sized aggregates do; returned frame is the dim-row loading table"),
    ("ivf_index_build", "one-time centroid-index build (force-re-run): shuffle-free broadcast argmax assignment + ONE centroid_id-partitioned write with _centroids/_meta sidecars; returned plan reads the per-centroid membership summary back FROM the persisted index"),
    ("ivf_index_occupancy", "the centroid family's recurring maintenance tick: ONE slim (vec_id, centroid_id) two-level aggregate (vectors never folded) + persisted _meta as literals + the replayed adaptive-k target — grown compares the two"),
    ("ivf_index_probe", "recurring ANN probe: centroid ranking + literal probe array on the driver from the tiny sidecars; PartitionFilters prunes to nprobe centroid directories; TakeOrderedAndProject top-k inside them"),
    ("ivfpq_index_probe", "compressed-domain probe: ADC distance table computed on the driver from the sidecars and embedded as a LITERAL array; partition-pruned scan of 8-byte codes + fixed-order table fold — zero joins"),
    ("corpus_mix_resample_dsir", "DoReMi mixing loop: one token-fold affinity pass + a 20-row collect; exact-integer quota apportionment driver-side; the draw's E-S ticket key is ROW-LOCAL and the per-source rank filters against a LITERAL max-quota bound first (WindowGroupLimit) then the exact per-source quota"),
    ("corpus_curate_end_to_end", "four chained stages exchanging only slim id frames: gopher keep set (two map-side-combined token aggregates), the staged 4-modality edge union semi-joined to quality survivors + the shared components closure, the broadcast decontamination gram join, and select_to_token_budget's bounded prefix-cut — no raw-corpus pass beyond what the stages already paid"),
    ("quality_classifier_score", "learned quality stage: training is one map-side-combined per-bucket aggregate (labels joined at DOC level before the gram explode; <= 128-row collect, cached per corpus); scoring is ONE codegen'd fold projection against the literal weight array — the corpus never shuffles to score"),
    ("decontaminate_semantic", "semantic decontamination: corpus side is the shuffle-free broadcast-argmax assignment projection; the benchmark suite's nprobe clusters broadcast; candidates equi-join on centroid_id (~nprobe/C of the corpus per bench item), then one slim per-vec aggregate + the all-rows left join"),
    ("decontaminate_semantic_indexed", "the production shape: benchmark suite + centroid sidecar collect driver-side (bounded); PartitionFilters prunes the persisted IVF index to the union of probed cluster directories — per-suite cost is |probed|/k of the corpus, never a full pass"),
    ("embed_curate_end_to_end", "embedding-side capstone: SemDeDup verdict and contamination frames materialize as concurrent jobs (slim vec_id frames), survivor cut is two anti-joins, and the per-cluster ticket sample plans a WindowGroupLimit — vectors cross an exchange only inside the two blocked stage pipelines"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    import temporalvault_spark.operators  # noqa: F401
    from temporalvault_spark.registry import QUERIES

    lines = [
        "# PLANS — physical-plan audit (generated by tools/explain_audit.py)",
        "",
        f"Source data: `{sf_dir}`. Each section: the operator-count summary",
        "(what matters for scale) and the formatted plan.",
        "",
    ]
    for name, note in AUDITED:
        df = QUERIES[name](spark, sf_dir)
        counts = {k: v for k, v in plan_counts(df).items() if v}
        formatted = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        lines += [
            f"## {name}",
            "",
            f"*{note}*",
            "",
            f"Operator counts: `{counts}`",
            "",
            "```",
            formatted.strip(),
            "```",
            "",
        ]
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}")
    spark.stop()


if __name__ == "__main__":
    main()
