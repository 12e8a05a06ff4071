"""Product quantization (PQ) — the compressed-domain ANN tier.

IVF (similarity.py) prunes WHICH vectors a probe scans; PQ shrinks WHAT is
scanned: each d-dim vector becomes M sub-codes (here 8 codes into 16-entry
codebooks = 8 bytes/vector vs 256 bytes of float32 — 32x), and a probe
ranks candidates from a per-query distance TABLE without touching the raw
floats. IVF-PQ is how billion-vector search actually deploys (FAISS/ScaNN);
this module is the PQ half, built on the same deterministic-codebook seam
as the IVF tier so every step replays bit-for-bit in the DuckDB oracle.

Scale shape: encode is one broadcast (M*K codewords, ~8 KB) + one codegen'd
projection over the corpus — no shuffle; the ADC probe is another broadcast
(the 128-double distance table folded per row in fixed order) + a
TakeOrderedAndProject top-k — the corpus never exchanges in either step.

Codebooks: the oracle-checked queries use the first-K vectors' subvectors
(the same reproducible stand-in centroid_frame uses, so DuckDB can replay
them); pq_train_codebooks is the production tier — per-subspace seeded
k-means, folded into the same broadcast row, consumed by the same
encode/probe algebra (reconstruction strictly improves; pinned in
tests/test_pq.py).

Reference parity: no counterpart — LLM-pipeline extension (build brief:
similarity-search scale path).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog
from temporalvault_spark.constants import SIM_PROBE_VEC_ID, SIM_TOP_K
from temporalvault_spark.operators.similarity import (
    N_CENTROIDS,
    N_PROBE_CLUSTERS,
    _dot,
    _emb,
    _norm,
    assign_to_centroids,
    centroid_frame,
)
from temporalvault_spark.registry import query

PQ_DIM = 64  # testdata embedding dim; PQ requires fixed-width vectors
PQ_M = 8  # subspaces
PQ_SUB = PQ_DIM // PQ_M  # dims per subspace
PQ_K = 16  # codewords per subspace (4-bit codes)

# identical row filter on both engines: PQ is defined only for non-NULL
# vectors of exactly PQ_DIM dims (a short vector would make the slice
# arithmetic read out of bounds — ANSI element_at errors, DuckDB yields
# NULL: different failure modes, so both engines exclude such rows)
_PQ_WHERE_DUCK = f"WHERE embedding IS NOT NULL AND len(embedding) = {PQ_DIM}"


def _pq_emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_catalog(spark, sf_dir).table("embeddings")
    return e.filter(
        F.col("embedding").isNotNull() & (F.size("embedding") == PQ_DIM)
    ).select("vec_id", "label", F.col("embedding").cast("array<double>").alias("e"))


def first_k_codebook(e: DataFrame) -> DataFrame:
    """The deterministic stand-in codebook as a flat (sub, code, cw) frame:
    the first-PQ_K vectors' subvector slices (replayable in the DuckDB
    oracles). Fold it with fold_codebook_row before handing to consumers."""
    return (
        e.filter(F.col("vec_id") < PQ_K)
        .select(
            F.col("vec_id").alias("code"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, {PQ_M - 1}), "
                    f"j -> struct(j AS sub, slice(e, j*{PQ_SUB}+1, {PQ_SUB}) AS cw))"
                )
            ).alias("s"),
        )
        .select(F.col("s.sub").alias("sub"), "code", F.col("s.cw").alias("cw"))
    )


def fold_codebook_row(cb: DataFrame) -> DataFrame:
    """THE one fold+validate path from a (sub, code, cw) codebook frame to
    the broadcastable row every consumer indexes POSITIONALLY (sorted by
    (sub, code), codeword (j, c) at index j*K + c): both the first-K
    stand-in and pq_train_codebooks route through here, so the layout
    cannot drift between tiers. The validation collects the <=M*K cells
    once and checks the EXACT sorted key sequence — duplicates, gaps,
    out-of-range subs/codes, and wrong-width codewords all raise instead
    of producing silently wrong codes/ADC distances."""
    row = cb.agg(
        F.array_sort(F.collect_list(F.struct("sub", "code", "cw"))).alias("cb")
    )
    cells = row.first()["cb"]
    want = [(j, c) for j in range(PQ_M) for c in range(PQ_K)]
    got = [(s["sub"], s["code"]) for s in cells]
    if got != want:
        raise ValueError(
            f"PQ codebook must hold exactly the {PQ_M}x{PQ_K} cells "
            f"(sub 0..{PQ_M - 1}) x (code 0..{PQ_K - 1}) — got "
            f"{len(cells)} cells (want {len(want)}); first mismatch at "
            # default guards the diagnostic itself: if `want` is a prefix of
            # `got` and the surplus duplicates the last cell, zip finds no
            # differing pair and a bare next() would raise StopIteration
            f"{next(((a, b) for a, b in zip(got + [None] * len(want), want) if a != b), ('surplus/duplicate cells', None))}"
        )
    bad = [i for i, s in enumerate(cells) if len(s["cw"]) != PQ_SUB]
    if bad:
        raise ValueError(
            f"PQ codewords must be {PQ_SUB}-dim; cell {bad[0]} has "
            f"{len(cells[bad[0]]['cw'])} dims"
        )
    return row


def _validated_codebook_row(e: DataFrame) -> DataFrame:
    """First-K stand-in codebook, folded and validated — raises if any of
    vec_id 0..PQ_K-1 is missing or mis-dimensioned (the dim filter in
    _pq_emb can silently drop one)."""
    return fold_codebook_row(first_k_codebook(e))


# the per-vector code assignment: for each subspace j, argmin over the K
# codewords of squared L2 between the vector's j-th slice and the codeword;
# ties break toward the LOWER code via the (dist, code) struct min
_CODES_EXPR = (
    f"transform(sequence(0, {PQ_M - 1}), j -> "
    f"array_min(transform(slice(cb, j*{PQ_K}+1, {PQ_K}), s -> "
    f"struct(aggregate(zip_with(slice(e, j*{PQ_SUB}+1, {PQ_SUB}), s.cw, "
    f"(x, y) -> (x - y) * (x - y)), cast(0.0 as double), "
    f"(acc, v) -> acc + v) AS dist, s.code AS code))).code)"
)


def pq_encode(e: DataFrame, cb_row: DataFrame | None = None) -> DataFrame:
    """(vec_id, codes array<bigint>[M]) for every vector: one broadcast of
    the folded codebook row, one projection — the corpus side never
    shuffles. 8 bytes of payload per vector replaces 256. Pass ``cb_row``
    (a fold_codebook_row over the FULL corpus) when encoding a subset, so
    candidate frames are coded against the same codebook as everything
    else — the same threading pattern as assign_to_centroids' ``centroids``
    argument."""
    if cb_row is None:
        cb_row = _validated_codebook_row(e)
    # withColumn+drop instead of a fixed select: extra input columns (e.g.
    # ivfpq's centroid_id) pass through, so callers never re-join for them
    return (
        e.crossJoin(F.broadcast(cb_row))
        .withColumn("codes", F.expr(_CODES_EXPR))
        .drop("e", "cb")
    )


# DuckDB twin of the encode step, rendered ONCE and interpolated into every
# oracle below (the repo's shared-fragment rule: one rendering, no drift).
# Expects a CTE ``e(vec_id, e DOUBLE[])`` in scope; yields ``codes``.
_PQ_CODES_DUCK = f"""cw AS (SELECT s.j AS sub, c.vec_id AS code,
                  list_slice(c.e, s.j*{PQ_SUB}+1, s.j*{PQ_SUB}+{PQ_SUB}) AS cw
           FROM e c CROSS JOIN (SELECT unnest(range({PQ_M})) AS j) s
           WHERE c.vec_id < {PQ_K}),
    dd AS (SELECT v.vec_id, w.sub, w.code,
                  list_transform(range(1, {PQ_SUB} + 1),
                      i -> v.e[CAST(w.sub*{PQ_SUB}+i AS INT)] - w.cw[CAST(i AS INT)]) AS df
           FROM e v CROSS JOIN cw w),
    d AS (SELECT vec_id, sub, code, list_dot_product(df, df) AS dist FROM dd),
    md AS (SELECT vec_id, sub, MIN(dist) AS mdist FROM d GROUP BY 1, 2),
    codes AS (SELECT d.vec_id, d.sub, MIN(d.code) AS code
              FROM d JOIN md ON d.vec_id = md.vec_id AND d.sub = md.sub
                            AND d.dist = md.mdist
              GROUP BY d.vec_id, d.sub)"""

# DuckDB twin of the probe distance table; expects CTEs ``cw`` and
# ``p(e DOUBLE[])`` in scope; yields ``pd(sub, code, dist)``
_PQ_PROBE_DT_DUCK = f"""pd AS (SELECT sub, code, list_dot_product(df, df) AS dist FROM (
           SELECT w.sub AS sub, w.code AS code,
                  list_transform(range(1, {PQ_SUB} + 1),
                      i -> p.e[CAST(w.sub*{PQ_SUB}+i AS INT)] - w.cw[CAST(i AS INT)]) AS df
           FROM cw w CROSS JOIN p) x)"""


@query(
    "pq_encode",
    f"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
           {_PQ_WHERE_DUCK}),
    {_PQ_CODES_DUCK}
    SELECT vec_id, CAST(sub AS BIGINT) AS sub, CAST(code AS BIGINT) AS code
    FROM codes""",
)
def q_pq_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ encoding of the corpus, exploded to (vec_id, sub, code) rows so
    the value hash covers every code. The oracle replays the argmin as
    min-dist-then-min-code (bit-parity: both engines fold the same doubles
    in the same order via dot-product-of-difference)."""
    codes = pq_encode(_pq_emb(spark, sf_dir))
    return codes.select(
        "vec_id", F.posexplode("codes").alias("sub", "code")
    ).select("vec_id", F.col("sub").cast("long").alias("sub"), "code")


def _adc_table_row(probe: DataFrame, cb_row: DataFrame) -> DataFrame:
    """The probe's squared-L2 distance to every codeword, folded into ONE
    128-double row in the codebook's (sub, code) order — the per-query
    table ADC ranks from."""
    return (
        probe.select(F.col("e").alias("p"))
        .crossJoin(F.broadcast(cb_row))
        .select(
            F.expr(
                f"transform(cb, s -> aggregate(zip_with("
                f"slice(p, s.sub*{PQ_SUB}+1, {PQ_SUB}), s.cw, "
                f"(x, y) -> (x - y) * (x - y)), cast(0.0 as double), "
                f"(acc, v) -> acc + v))"
            ).alias("dt")
        )
    )


# approximate distance = M-term table-lookup sum in FIXED subspace order
# (deterministic — the oracle folds the same 8 doubles in the same order)
_ADIST_EXPR = (
    f"aggregate(sequence(0, {PQ_M - 1}), cast(0.0 as double), "
    f"(acc, j) -> acc + element_at(dt, CAST(j*{PQ_K} + element_at(codes, j+1) + 1 AS INT)))"
)


def pq_adc_topk(e: DataFrame, probe: DataFrame, k: int = SIM_TOP_K) -> DataFrame:
    """Asymmetric-distance top-k: one codebook build shared by encode and
    the distance table, then an M-term lookup fold per vector — no shuffle,
    and the raw floats are never read after encode. The limit plans as
    TakeOrderedAndProject."""
    cb_row = _validated_codebook_row(e)
    codes = pq_encode(e, cb_row)
    dt_row = _adc_table_row(probe, cb_row)
    return (
        codes.crossJoin(F.broadcast(dt_row))
        .select("vec_id", "label", F.expr(_ADIST_EXPR).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(k)
    )


@query(
    "pq_topk_adc",
    f"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
           {_PQ_WHERE_DUCK}),
    {_PQ_CODES_DUCK},
    p AS (SELECT e FROM e WHERE vec_id = {SIM_PROBE_VEC_ID}),
    {_PQ_PROBE_DT_DUCK},
    av AS (SELECT vec_id,
                  list_reduce(list(dist ORDER BY sub), (a, b) -> a + b) AS adc_dist
           FROM (SELECT c.vec_id, c.sub, pd.dist
                 FROM codes c JOIN pd ON c.sub = pd.sub AND c.code = pd.code) t
           GROUP BY vec_id)
    SELECT av.vec_id, e.label, ROUND(av.adc_dist, 6) AS adc_dist
    FROM av JOIN e ON av.vec_id = e.vec_id
    ORDER BY av.adc_dist, av.vec_id LIMIT {SIM_TOP_K}""",
)
def q_pq_topk_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ADC top-k for the fixed probe vector over the PQ-encoded corpus.
    The oracle reconstructs the same distance table relationally, then
    folds each vector's 8 table entries in subspace order
    (list(dist ORDER BY sub) + list_reduce) — the SAME summation order as
    Spark's fixed-order fold, so the unrounded sort keys agree bit-for-bit,
    not merely to round(6)."""
    e = _pq_emb(spark, sf_dir)
    probe = e.filter(F.col("vec_id") == SIM_PROBE_VEC_ID)
    top = pq_adc_topk(e, probe)
    return top.select(
        "vec_id", "label", F.round("adc_dist", 6).alias("adc_dist")
    )


# --- IVF-PQ: cluster pruning + compressed-domain ranking -------------------


@query(
    "ivfpq_topk",
    f"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
           WHERE embedding IS NOT NULL
             AND list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]) > 0
             AND len(embedding) = {PQ_DIM}),
    c AS (SELECT vec_id AS centroid_id, e FROM e WHERE vec_id < {N_CENTROIDS}),
    assign AS (
        SELECT vec_id, centroid_id FROM (
            SELECT a.vec_id, c.centroid_id,
                   ROW_NUMBER() OVER (PARTITION BY a.vec_id
                                      ORDER BY list_dot_product(a.e, c.e)
                                               / sqrt(list_dot_product(c.e, c.e)) DESC,
                                               c.centroid_id) AS rn
            FROM e a CROSS JOIN c) x
        WHERE rn = 1),
    p AS (SELECT e FROM e WHERE vec_id = {SIM_PROBE_VEC_ID}),
    probe_clusters AS (
        SELECT centroid_id FROM (
            SELECT c.centroid_id,
                   ROW_NUMBER() OVER (ORDER BY list_dot_product(p.e, c.e)
                                               / sqrt(list_dot_product(c.e, c.e)) DESC,
                                      c.centroid_id) AS rn
            FROM c CROSS JOIN p) x
        WHERE rn <= {N_PROBE_CLUSTERS}),
    {_PQ_CODES_DUCK},
    {_PQ_PROBE_DT_DUCK},
    av AS (SELECT vec_id,
                  list_reduce(list(dist ORDER BY sub), (a, b) -> a + b) AS adc_dist
           FROM (SELECT cd.vec_id, cd.sub, pd.dist
                 FROM codes cd
                 JOIN assign a ON cd.vec_id = a.vec_id
                 JOIN probe_clusters pc ON a.centroid_id = pc.centroid_id
                 JOIN pd ON cd.sub = pd.sub AND cd.code = pd.code) t
           GROUP BY vec_id)
    SELECT av.vec_id, e.label, a.centroid_id, ROUND(av.adc_dist, 6) AS adc_dist
    FROM av JOIN e ON av.vec_id = e.vec_id
            JOIN assign a ON av.vec_id = a.vec_id
    ORDER BY av.adc_dist, av.vec_id LIMIT {SIM_TOP_K}""",
)
def q_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ, the billion-vector deployment standard, end to end: prune
    to the probe's {N_PROBE_CLUSTERS} best clusters with the SAME
    oracle-checked centroid assignment the persisted index partitions by
    (similarity.py — cosine argmax, broadcast centroid struct), then rank
    ONLY those candidates in the compressed domain via the ADC table —
    candidates are pruned BEFORE the encode projection, so the interpreted
    argmin fold runs on nprobe/C of the corpus, and at 100 TB the probe
    reads nprobe/C of the index partitions touching 8-byte codes, not
    256-byte floats. The oracle interpolates the same
    N_CENTROIDS/N_PROBE_CLUSTERS constants as the Spark side, so tuning
    nprobe cannot desynchronize the twins.

    Rows are restricted to non-NULL, nonzero-norm (cosine assignment),
    PQ_DIM-width (PQ slicing) vectors — the WHERE is identical on both
    engines."""
    e = (
        _emb(spark, sf_dir)
        .filter(F.size("embedding") == PQ_DIM)
        .select("vec_id", "label", F.col("embedding").cast("array<double>").alias("e"))
    )
    assign = assign_to_centroids(e).select("vec_id", "centroid_id")
    probe = e.filter(F.col("vec_id") == SIM_PROBE_VEC_ID)
    probe_clusters = (
        centroid_frame(e)
        .crossJoin(F.broadcast(probe.select(F.col("e").alias("pe"))))
        .withColumn("psim", _dot(F.col("pe"), F.col("ce")) / _norm(F.col("ce")))
        .orderBy(F.desc("psim"), F.asc("centroid_id"))
        .limit(N_PROBE_CLUSTERS)
        .select("centroid_id")
    )
    cand_assign = assign.join(F.broadcast(probe_clusters), "centroid_id")
    cb_row = _validated_codebook_row(e)
    # prune FIRST: only vectors in probed clusters pay the encode argmin;
    # the codebook still comes from the full corpus via cb_row, and the
    # joined centroid_id passes straight through the encode projection
    codes = pq_encode(
        e.join(F.broadcast(cand_assign), "vec_id"), cb_row
    )
    dt_row = _adc_table_row(probe, cb_row)
    return (
        codes.crossJoin(F.broadcast(dt_row))
        .select("vec_id", "label", "centroid_id", F.expr(_ADIST_EXPR).alias("adc_dist"))
        .orderBy(F.asc("adc_dist"), F.asc("vec_id"))
        .limit(SIM_TOP_K)
        .select(
            "vec_id", "label", "centroid_id", F.round("adc_dist", 6).alias("adc_dist")
        )
    )


def pq_train_codebooks(
    e: DataFrame, seed: int = 42, max_iter: int = 20
) -> DataFrame:
    """Production-quality codebooks: per-subspace k-means (k = PQ_K) over
    the corpus's subvector slices — the training FAISS runs before encode,
    expressed as M seeded pyspark.ml KMeans fits (M is a small constant;
    each fit is itself a distributed job, so training a 100 TB corpus's
    codebooks is the same loop). Returns the folded broadcast row for
    pq_encode/_adc_table_row; reconstruction error strictly improves over
    the first-K stand-in (pinned in tests/test_pq.py)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    spark = e.sparkSession
    rows = []
    for j in range(PQ_M):
        sub = e.select(
            F.expr(f"slice(e, {j * PQ_SUB} + 1, {PQ_SUB})").alias("sv")
        ).select(array_to_vector(F.col("sv").cast("array<double>")).alias("features"))
        model = KMeans(
            k=PQ_K, seed=seed + j, maxIter=max_iter, initMode="k-means||"
        ).fit(sub)
        # cluster index order is seed-deterministic; it IS the code
        rows += [
            (j, c, [float(x) for x in center])
            for c, center in enumerate(model.clusterCenters())
        ]
    cb = spark.createDataFrame(rows, "sub int, code bigint, cw array<double>")
    return fold_codebook_row(cb)
