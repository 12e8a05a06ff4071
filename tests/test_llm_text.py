

def test_heavy_hitters_sketch_superset(spark, sf_dir):
    """freqItems is lossy but one-sided: every true >support-frequency term
    must appear in the sketch output (supersets allowed, misses not)."""
    from pyspark.sql import functions as F

    from temporalvault_spark.operators.llm import heavy_hitters_sketch

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    terms = docs.select(F.explode(F.split(F.lower(F.trim("text")), " ")).alias("term"))
    total = terms.count()
    support = 0.02
    exact = {
        r["term"]
        for r in terms.groupBy("term").count().filter(F.col("count") > support * total).collect()
    }
    sketch = set(heavy_hitters_sketch(docs, support))
    assert exact <= sketch, exact - sketch


def test_doc_unigram_logprob_crafted(spark):
    """2-doc corpus where every token has p=0.5: both docs score exactly
    ln 2 per token, regardless of length."""
    import math

    from temporalvault_spark.operators.llm import unigram_logprob

    docs = spark.createDataFrame(
        [(1, "a a b"), (2, "b")], "doc_id bigint, text string"
    )
    out = unigram_logprob(docs)
    got = {r["doc_id"]: (r["n_tokens"], r["avg_neg_logprob"]) for r in out.collect()}
    ln2 = round(math.log(2), 6)
    assert got == {1: (3, ln2), 2: (1, ln2)}
