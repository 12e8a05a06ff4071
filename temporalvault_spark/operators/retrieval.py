"""Retrieval scoring over the documents corpus: Okapi BM25 top-k.

The reference exposes no search endpoint, but a training-data engine needs
ranked retrieval for decontamination triage and eval-set mining (the same
role TF-IDF plays in llm.py:1560 — BM25 adds document-length normalization
and saturating term frequency, the standard lexical-ranking baseline).

Scale shape (100 TB corpus, |Q| query terms):
  - the exploded token stream is filtered to the |Q| query terms BEFORE any
    aggregation, so every shuffle downstream carries at most |Q| rows per
    document, never per token;
  - corpus statistics (N, avgdl) are a one-row frame cross-joined as a
    broadcast — no ``.collect()`` round trip, the plan stays declarative;
  - per-term document frequencies (≤ |Q| rows) broadcast-join onto the
    term-frequency frame;
  - the final top-k plans as TakeOrderedAndProject (no total sort).

Oracle parity: per-term contributions are scaled to integer micro-units
(ROUND(x * 1e6) AS BIGINT) before the per-document sum, so the sum is exact
and ASSOCIATIVE — Spark's and DuckDB's different aggregation orders cannot
produce last-ulp drift. Ranking ties break on doc_id in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog
from temporalvault_spark.registry import query

# Fixed query — part of the operator contract (the registered query must be
# deterministic; callers use bm25_topk() below with their own terms).
BM25_QUERY_TERMS = ("hash", "join", "spark", "window", "scan")
BM25_K1 = 1.2
BM25_B = 0.75
BM25_TOPK = 20


def bm25_topk(
    docs: DataFrame,
    terms: tuple[str, ...] = BM25_QUERY_TERMS,
    k: int = BM25_TOPK,
    k1: float = BM25_K1,
    b: float = BM25_B,
) -> DataFrame:
    """Top-k documents by Okapi BM25 for a bag-of-terms query.

    idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))  (Robertson-Sparck Jones,
    guarded positive), tf saturation k1, length normalization b. Documents
    containing none of the query terms are absent from the ranking.
    """
    toks = F.split(F.lower(F.trim(F.col("text"))), " ")
    # Per-doc length; NULL text yields NULL (size() would give -1) so the
    # corpus-average skips it, matching SQL semantics.
    dl = docs.select(
        "doc_id",
        F.when(F.col("text").isNull(), F.lit(None)).otherwise(F.size(toks)).alias("dl"),
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )  # one row, broadcast below
    hits = (
        docs.select("doc_id", F.explode(toks).alias("term"))
        .filter(F.col("term").isin(*terms))
    )
    tf = hits.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df_ = hits.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    idf = F.log(
        1.0
        + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    tf_norm = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
    )
    contrib = (
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(idf * tf_norm * 1e6).cast("bigint").alias("contrib_u"),
        )
    )
    scored = contrib.groupBy("doc_id").agg(
        F.round(F.sum("contrib_u") / 1e6, 6).alias("bm25"),
        F.count("*").alias("n_terms_hit"),
    )
    return scored.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(k)


@query(
    "bm25_topk",
    f"""WITH dl AS (
        SELECT doc_id, len(string_split(lower(trim(text)), ' ')) AS dl
        FROM documents),
    stats AS (SELECT COUNT(*) AS n_docs, AVG(dl) AS avgdl FROM dl),
    hits AS (
        SELECT doc_id, term
        FROM (SELECT doc_id,
                     unnest(string_split(lower(trim(text)), ' ')) AS term
              FROM documents)
        WHERE term IN ('hash', 'join', 'spark', 'window', 'scan')),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM hits GROUP BY 1, 2),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM hits GROUP BY 1),
    contrib AS (
        SELECT tf.doc_id,
               CAST(ROUND(
                   ln(1.0 + (stats.n_docs - df.df + 0.5) / (df.df + 0.5))
                   * (tf.tf * ({BM25_K1} + 1.0))
                   / (tf.tf + {BM25_K1} * (1.0 - {BM25_B}
                      + {BM25_B} * dl.dl / stats.avgdl))
                   * 1e6) AS BIGINT) AS contrib_u
        FROM tf
        JOIN df USING (term)
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats)
    SELECT doc_id,
           ROUND(SUM(contrib_u) / 1e6, 6) AS bm25,
           COUNT(*) AS n_terms_hit
    FROM contrib GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id LIMIT {BM25_TOPK}""",
)
def q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered BM25 ranking with the fixed 5-term query (module constant)."""
    return bm25_topk(load_catalog(spark, sf_dir).table("documents"))
