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
