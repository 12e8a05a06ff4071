"""Corpus-preparation operators for LLM training-data pipelines:
document chunking and Gopher-style repetition/quality rules.

These extend the reference surface (which has none of this — it is a
temporal KV API, /root/reference/app/main.py) with the operations a
large-scale pretraining pipeline runs over a document corpus before
tokenization: split documents into overlapping token windows, and score/
filter them with the repetition heuristics of Gopher (Rae et al. 2021,
arXiv:2112.11446 §A1.1) / C4 (Raffel et al. 2020).

Scale notes (the design constraint, per BASELINE.json's 100 TB north star):
  * Chunking is embarrassingly parallel — a generate+explode per row, no
    shuffle at all; output partitioning inherits the scan.
  * The repetition scores need per-(doc, token) counts. That is expressed as
    explode → two-level aggregation, NOT as a per-doc UDF: the first
    aggregation (doc_id, token) map-side combines inside each scan
    partition, so the shuffle carries counts, never token lists; the
    second (doc_id) reduces ≤ |vocab-per-doc| rows per doc. Both stages are
    whole-stage-codegen'd JVM builtins; Python never touches the tokens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog
from temporalvault_spark.registry import query

CHUNK_TOKENS = 32
CHUNK_STRIDE = 16

# Gopher-style keep thresholds, tuned so the synthetic corpus splits
# (each rule individually rejects a nontrivial slice at sf0.01).
MIN_TOKENS = 30
MAX_TOKENS = 100_000
MEAN_LEN_LO = 3.0
MEAN_LEN_HI = 10.0
TOP_TOKEN_FRAC_MAX = 0.12
TOP_BIGRAM_FRAC_MAX = 0.10


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_catalog(spark, sf_dir).table("documents")


def _tokens():
    return F.split(F.lower(F.trim(F.col("text"))), " ")


# --- chunking --------------------------------------------------------------


def chunk_documents(
    docs: DataFrame, window: int = CHUNK_TOKENS, stride: int = CHUNK_STRIDE
) -> DataFrame:
    """Split each document into overlapping ``window``-token chunks every
    ``stride`` tokens (the standard pretraining-window slicer). Start offsets
    are 0, stride, 2*stride, … < n_tokens; the last chunk may be short.

    Pure generate/explode: zero shuffles, zero Python. At 100 TB this runs
    at scan speed and the ~window/stride× row fan-out streams straight into
    the next stage (tokenizer) without materializing.
    """
    t = docs.select("doc_id", _tokens().alias("t"))
    starts = F.sequence(F.lit(0), F.greatest(F.size("t") - 1, F.lit(0)), F.lit(stride))
    chunk = F.slice(F.col("t"), F.col("start") + 1, window)
    return (
        t.select("doc_id", "t", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / stride).cast("long").alias("chunk_id"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.array_join(chunk, " ").alias("chunk_text"),
        )
    )


@query(
    "text_chunking",
    f"""WITH toks AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents),
    st AS (
        SELECT doc_id, t, unnest(range(0, len(t), {CHUNK_STRIDE})) AS start
        FROM toks)
    SELECT doc_id,
           CAST(start // {CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           len(t[start + 1 : start + {CHUNK_TOKENS}]) AS n_chunk_tokens,
           array_to_string(t[start + 1 : start + {CHUNK_TOKENS}], ' ') AS chunk_text
    FROM st""",
)
def q_text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    return chunk_documents(_docs(spark, sf_dir))


# --- Gopher repetition / quality rules -------------------------------------


def gopher_quality(docs: DataFrame) -> DataFrame:
    """Per-document repetition metrics + keep flag (Gopher §A1.1 family):
    token count, mean token length, duplicate-token fraction, most-frequent
    token fraction, most-frequent bigram fraction.

    Two aggregations, both map-side combined (see module docstring); the
    per-doc scalars (n_tokens, mean length, distinct fraction) ride along
    from a single array projection so the corpus is scanned once.
    """
    t = docs.select("doc_id", _tokens().alias("t"))
    base = t.select(
        "doc_id",
        "t",
        F.size("t").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
        (
            F.aggregate(
                F.transform("t", lambda x: F.length(x).cast("long")),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            )
            / F.size("t")
        ).alias("mean_tok_len"),
    )

    top_tok = (
        base.select("doc_id", F.explode("t").alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_tok_cnt"))
    )
    # guard: Spark's sequence(1, 0) DESCENDS instead of being empty, so a
    # 1-token doc must short-circuit to an empty bigram list
    bigrams = F.expr(
        "CASE WHEN size(t) < 2 THEN array() "
        "ELSE transform(sequence(1, size(t) - 1), i -> concat(t[i-1], ' ', t[i])) END"
    )
    top_bg = (
        base.select("doc_id", F.explode(bigrams).alias("bg"))
        .groupBy("doc_id", "bg")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_bg_cnt"))
    )

    m = (
        base.drop("t")
        .join(top_tok, "doc_id")
        .join(top_bg, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round("mean_tok_len", 6).alias("mean_tok_len"),
            F.round(1 - F.col("n_distinct") / F.col("n_tokens"), 6).alias("dup_tok_frac"),
            F.round(F.col("top_tok_cnt") / F.col("n_tokens"), 6).alias("top_tok_frac"),
            F.round(F.col("top_bg_cnt") / (F.col("n_tokens") - 1), 6).alias("top_bg_frac"),
        )
    )
    keep = (
        F.col("n_tokens").between(MIN_TOKENS, MAX_TOKENS)
        & F.col("mean_tok_len").between(MEAN_LEN_LO, MEAN_LEN_HI)
        & (F.col("top_tok_frac") < TOP_TOKEN_FRAC_MAX)
        & (F.col("top_bg_frac") < TOP_BIGRAM_FRAC_MAX)
    )
    return m.withColumn("keep", keep)


@query(
    "gopher_quality_rules",
    f"""WITH toks AS (
        SELECT doc_id, string_split(lower(trim(text)), ' ') AS t FROM documents),
    base AS (
        SELECT doc_id, t, len(t) AS n_tokens,
               len(list_distinct(t)) AS n_distinct,
               CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum') AS DOUBLE)
                   / len(t) AS mean_tok_len
        FROM toks),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS c
        FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY 1, 2),
    top_tok AS (SELECT doc_id, MAX(c) AS top_tok_cnt FROM tf GROUP BY 1),
    bf AS (
        SELECT doc_id, bg, COUNT(*) AS c
        FROM (SELECT doc_id,
                     unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
              FROM toks) GROUP BY 1, 2),
    top_bg AS (SELECT doc_id, MAX(c) AS top_bg_cnt FROM bf GROUP BY 1)
    SELECT b.doc_id, b.n_tokens,
           ROUND(b.mean_tok_len, 6) AS mean_tok_len,
           ROUND(1 - CAST(b.n_distinct AS DOUBLE) / b.n_tokens, 6) AS dup_tok_frac,
           ROUND(CAST(tt.top_tok_cnt AS DOUBLE) / b.n_tokens, 6) AS top_tok_frac,
           ROUND(CAST(tb.top_bg_cnt AS DOUBLE) / (b.n_tokens - 1), 6) AS top_bg_frac,
           (b.n_tokens BETWEEN {MIN_TOKENS} AND {MAX_TOKENS}
            AND ROUND(b.mean_tok_len, 6) BETWEEN {MEAN_LEN_LO} AND {MEAN_LEN_HI}
            AND ROUND(CAST(tt.top_tok_cnt AS DOUBLE) / b.n_tokens, 6) < {TOP_TOKEN_FRAC_MAX}
            AND ROUND(CAST(tb.top_bg_cnt AS DOUBLE) / (b.n_tokens - 1), 6) < {TOP_BIGRAM_FRAC_MAX}
           ) AS keep
    FROM base b
    JOIN top_tok tt ON tt.doc_id = b.doc_id
    JOIN top_bg tb ON tb.doc_id = b.doc_id""",
)
def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gopher_quality(_docs(spark, sf_dir))
