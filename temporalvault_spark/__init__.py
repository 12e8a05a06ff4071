"""temporalvault_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of the Vinnu124/TemporalVault reference
(temporal versioned records, as-of reads, rollback, field-level diff), plus a
full relational-analytics operator surface and LLM-data-pipeline operators
(dedup, similarity search, text analysis), designed for 100 TB scale.

Architecture: declarative DataFrame/SQL plans, Catalyst/Tungsten execution,
Pandas UDFs only where builtins cannot express the semantics.
"""

from temporalvault_spark.session import get_spark, tune
from temporalvault_spark.catalog import Catalog, load_catalog

__all__ = ["get_spark", "tune", "Catalog", "load_catalog"]
