from temporalvault_spark.plans.inspect import (
    executed_plan,
    plan_counts,
    pushed_filters,
    read_schema_cols,
)

__all__ = ["executed_plan", "plan_counts", "pushed_filters", "read_schema_cols"]
