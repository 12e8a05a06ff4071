from temporalvault_spark.functions.approx import (
    approx_distinct_by,
    approx_quantiles_by,
    sample_fraction,
)

__all__ = ["approx_distinct_by", "approx_quantiles_by", "sample_fraction"]
