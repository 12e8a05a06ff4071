"""Operator modules. Importing this package populates the registry."""

from temporalvault_spark.operators import (  # noqa: F401
    analytics,
    dedup_cluster,
    llm,
    relational,
    similarity,
    temporal,
    temporal_analytics,
    timewindow,
)
from temporalvault_spark.registry import ORACLES, QUERIES  # noqa: F401
