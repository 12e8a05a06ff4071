

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
