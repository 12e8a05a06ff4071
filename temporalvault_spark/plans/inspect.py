"""Physical-plan introspection: the engine's substitute for 'trust me, it's
fast'. Tests assert on these (tests/test_plan_hygiene.py) so regressions that
keep answers right but wreck the plan — a broadcast that silently becomes a
sort-merge join, a filter that stops reaching the scan — fail CI instead of
surfacing as a 100x slowdown at cluster scale.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The executed (post-AQE-planning) physical plan as text."""
    return df._jdf.queryExecution().executedPlan().toString()


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan (per-node Input/Output column lists —
    toString() shows only partition keys for an Exchange, not what rides
    it). Reflects AQE's final choices if the df has been executed."""
    qe = df._jdf.queryExecution()
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return qe.explainString(mode)


def shuffle_inputs(df: DataFrame) -> list[str]:
    """The Input column-list of every SHUFFLE exchange (hash/range/round-robin
    — broadcasts excluded) in the FINAL plan: what actually rides each
    shuffle. An executed AQE query's formatted explain also prints the
    initial plan's node details, so node ids are filtered to the final tree."""
    plan = formatted_plan(df)
    tree = plan.split("== Initial Plan ==")[0]
    final_ids = set(re.findall(r"\((\d+)\)", tree))
    out = []
    for m in re.finditer(
        r"\((\d+)\) Exchange[^\n]*\nInput \[\d+\]: \[([^\]]*)\]",
        plan,
    ):
        if m.group(1) in final_ids:
            out.append(m.group(2))
    return out


def plan_counts(df: DataFrame) -> dict[str, int]:
    """Occurrences of the physical operators that matter for scale."""
    plan = executed_plan(df)
    keys = (
        "BroadcastHashJoin",
        "SortMergeJoin",
        "ShuffledHashJoin",
        "BroadcastNestedLoopJoin",
        "CartesianProduct",
        "Exchange hashpartitioning",
        "Exchange rangepartitioning",
        "Exchange SinglePartition",
        "HashAggregate",
        "SortAggregate",
        "TakeOrderedAndProject",
        "WindowGroupLimit",
        "FileScan",
        "WholeStageCodegen",
    )
    return {k: plan.count(k) for k in keys}


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries of every scan (empty list = nothing pushed)."""
    plan = executed_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        if m.group(1).strip():
            out.extend(s.strip() for s in m.group(1).split(","))
    return out


def read_schema_cols(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan — the column-pruning audit."""
    plan = executed_plan(df)
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", plan):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out
