from temporalvault_spark.plans.inspect import (
    executed_plan,
    formatted_plan,
    plan_counts,
    pushed_filters,
    read_schema_cols,
    shuffle_inputs,
)

__all__ = [
    "executed_plan",
    "formatted_plan",
    "plan_counts",
    "pushed_filters",
    "read_schema_cols",
    "shuffle_inputs",
]
