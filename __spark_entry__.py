"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``temporalvault_spark``; this module only re-exports
the registry (temporalvault_spark/registry.py) populated by importing the
operator modules.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_REPO_ROOT = os.path.dirname(os.path.abspath(__file__))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import temporalvault_spark.operators  # noqa: E402  (populates the registry)
from temporalvault_spark.operators import ORACLES, QUERIES  # noqa: E402
from temporalvault_spark.catalog import load_catalog  # noqa: E402
from temporalvault_spark.constants import PROBE_TS  # noqa: E402
from temporalvault_spark.operators.temporal import asof_latest_per_key  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: state of every key as of a
    fixed timestamp (the reference's raison d'être, README.md:7)."""
    cat = load_catalog(spark, "/root/testdata/sf0.001")
    return asof_latest_per_key(cat.temporal_records, PROBE_TS)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each SQL-expressible query."""
    return dict(ORACLES)
