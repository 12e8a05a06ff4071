#!/usr/bin/env python
"""Dump physical plans for named queries to plans/<tag>/<name>_<suffix>.txt.

Two capture modes per query:
  static — .explain("formatted") of the query's returned frame (pre-execution;
           AQE shows isFinalPlan=false). This is what the r14 dumps used.
  final  — execute the frame (collect; every audited query returns a small
           result) and then dump the SAME DataFrame's executedPlan, which AQE
           has by then re-optimized: isFinalPlan=true, AQEShuffleRead nodes
           and runtime join-strategy rewrites (SMJ->SHJ) are visible. A
           static explain can NEVER show these (r14 verdict item 3).

Stage queries (ngram_pairs_stage, trade_edges_stage) return a bare artifact
scan — for those the interesting plan is the staged PIPELINE frame, so this
tool substitutes it (same frames the r14 dumps captured).

Usage: python tools/plan_dump.py TAG SUFFIX [--final] name [name ...]
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_SHUFFLE_PARTITIONS
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from temporalvault_spark.session import get_spark  # noqa: E402


def pipeline_frame(spark, sf_dir, name):
    """The frame whose plan is worth auditing for query ``name``."""
    import temporalvault_spark.operators  # noqa: F401
    from temporalvault_spark.registry import QUERIES

    if name == "trade_edges_stage":
        from pyspark.sql import functions as F
        from temporalvault_spark.operators.graph import _edge_parts, trade_edges

        edges = trade_edges(spark, sf_dir)
        deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
        return edges.join(F.broadcast(deg), "src").repartition(_edge_parts(edges))
    if name == "ngram_pairs_stage":
        from temporalvault_spark.operators.llm import (
            ngram_jaccard_pairs,
            staged_shingle_signatures,
            _docs,
        )

        return ngram_jaccard_pairs(
            _docs(spark, sf_dir),
            signatures=staged_shingle_signatures(spark, sf_dir),
        )
    return QUERIES[name](spark, sf_dir)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--final"]
    final = "--final" in sys.argv[1:]
    tag, suffix, names = args[0], args[1], args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    from temporalvault_spark.catalog import load_catalog

    load_catalog(spark, sf_dir)
    for name in names:
        df = pipeline_frame(spark, sf_dir, name)
        if final:
            df.collect()  # executes the frame's own plan -> AQE finalizes it
            text = "== AQE Final Plan (post-execution) ==\n" + (
                df._jdf.queryExecution().executedPlan().toString()
            )
        else:
            text = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path} ({len(text)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
