"""Catalog: load the testdata star schema + event log, register temp views,
and derive the ``temporal_records`` view — the engine's stand-in for the
reference's append-only version log (reference: app/models.py:7-24).

Spark mapping (SURVEY.md §1.4): columnar Parquet + explicit schema; the
version chain (reference app/models.py:19, main.py:87) is *computed* with
window functions rather than stored; timestamps are second-truncated at ingest
(reference app/models.py:16, app/main.py:112).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from temporalvault_spark.session import tune

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def build_temporal_records(events: DataFrame) -> DataFrame:
    """Derive the append-only version log from the raw event stream.

    Mirrors the reference's write path semantics set-at-once instead of
    row-at-a-time:
      - ``record_id`` is the logical key (reference app/models.py:11)
      - ``version`` = 'v{N}' assigned in per-key arrival order (app/main.py:82);
        ordering uses (raw ts, event_id), never the lexical version string
        ("v10" < "v2" pitfall — reference orders by ts, app/main.py:79)
      - ``ts`` second-truncated by design (app/models.py:16)
      - ``previous_version`` backward chain (app/models.py:19) via lag()
    One window partitioned by key — a single shuffle on record_id; at 100 TB
    this is the same shuffle any per-key operator needs, and downstream
    window ops over record_id reuse the partitioning.
    """
    w = Window.partitionBy("record_id").orderBy("raw_ts", "id")
    wv = Window.partitionBy("record_id").orderBy("version_num")
    return (
        events.select(
            F.col("event_id").alias("id"),
            F.col("user_id").cast("string").alias("record_id"),
            F.col("props").alias("data"),
            F.date_trunc("second", F.col("ts")).alias("ts"),
            F.col("ts").alias("raw_ts"),
        )
        .withColumn("version_num", F.row_number().over(w))
        .withColumn("version", F.concat(F.lit("v"), F.col("version_num").cast("string")))
        .withColumn("previous_version", F.lag("version").over(wv))
        .select("id", "record_id", "version", "data", "ts", "version_num", "previous_version")
    )


# The same derivation as ANSI SQL, runnable verbatim by DuckDB — used as the
# CTE prefix of every temporal oracle query so Spark and the oracle see an
# identical version log.
TEMPORAL_CTES = """
ev AS (
  SELECT event_id AS id,
         CAST(user_id AS STRING) AS record_id,
         props AS data,
         DATE_TRUNC('second', ts) AS ts,
         ts AS raw_ts
  FROM events
),
numbered AS (
  SELECT id, record_id, data, ts,
         ROW_NUMBER() OVER (PARTITION BY record_id ORDER BY raw_ts, id) AS version_num
  FROM ev
),
temporal_records AS (
  SELECT id, record_id,
         CONCAT('v', CAST(version_num AS STRING)) AS version,
         data, ts, version_num,
         LAG(CONCAT('v', CAST(version_num AS STRING))) OVER (
             PARTITION BY record_id ORDER BY version_num) AS previous_version
  FROM numbered
)
"""


def temporal_oracle(select_sql: str) -> str:
    """Wrap an oracle SELECT with the temporal_records CTEs."""
    return f"WITH {TEMPORAL_CTES} {select_sql}"


def _dir_bytes(sf_dir: str) -> int:
    """Total bytes under ``sf_dir`` (the catalog's raw input size). Local
    filesystem walk — cheap metadata; any failure degrades to 0 (the dial
    then uses its parallelism floor)."""
    total = 0
    try:
        for root, _dirs, files in os.walk(sf_dir):
            for fn in files:
                try:
                    total += os.path.getsize(os.path.join(root, fn))
                except OSError:
                    pass
    except Exception:
        return 0
    return total


class Catalog:
    """Loads the ten parquet tables of one sf_dir and registers temp views.

    Views registered: each base table under its own name, plus
    ``temporal_records``. Registration is idempotent and lazy (metadata only);
    scans happen at action time with predicate pushdown / column pruning.
    """

    def __init__(self, spark: SparkSession, sf_dir: str):
        # The catalog is the one place that knows the input directory, so it
        # feeds the input-size-derived shuffle-partition dial (session.
        # _shuffle_partitions): one os.walk of sf_dir, metadata only.
        tune(spark, input_bytes=_dir_bytes(sf_dir))
        self.spark = spark
        self.sf_dir = sf_dir.rstrip("/")
        self._register()

    # Parquet TIMESTAMP(NANOS) columns (pandas writer default) are read as
    # int64 nanos (spark.sql.legacy.parquet.nanosAsLong) and converted here.
    _TS_COLS = {
        "events": ("ts",),
        "orders": ("o_orderdate",),
        "lineitem": ("l_shipdate",),
    }

    def _register(self) -> None:
        # NOTE on scan parallelism: each testdata table is one parquet file
        # with one row group (unsplittable → 1-task scans). A blanket
        # repartition behind the views was measured (bench at sf0.1) to LOSE
        # ~25% overall — the added exchange costs more than parallel decode
        # saves at these sizes — so fan-out stays targeted inside the
        # CPU-heavy operators (dedup shingling, pair joins) only. A real
        # 100 TB table arrives as many files and never hits this.
        from temporalvault_spark.session import normalize_ts_cols

        for name in TABLES:
            df = self.spark.read.parquet(f"{self.sf_dir}/{name}.parquet")
            df = normalize_ts_cols(df, self._TS_COLS.get(name, ()))
            df.createOrReplaceTempView(name)
        try:
            self.spark.catalog.uncacheTable("temporal_records")
        except Exception:
            pass
        build_temporal_records(self.table("events")).createOrReplaceTempView(
            "temporal_records"
        )
        # Lazy cache: the derived version log is read by every temporal
        # operator; materializing the window output once (columnar, in
        # memory-and-disk) replaces per-query recomputation. The reference
        # caches as-of results for the same reason (app/main.py:115-147).
        try:
            self.spark.catalog.cacheTable("temporal_records")
        except Exception:
            pass

    def table(self, name: str) -> DataFrame:
        return self.spark.table(name)

    @property
    def temporal_records(self) -> DataFrame:
        return self.spark.table("temporal_records")


_CURRENT: dict[int, Catalog] = {}


def load_catalog(spark: SparkSession, sf_dir: str) -> Catalog:
    """Cached per session; re-registers views whenever sf_dir changes (temp
    view names are shared per session, so only one sf_dir is live at a time).

    The cache key is id(spark), which Python can REUSE after a stopped
    session is garbage-collected — so a hit also verifies the cached catalog
    holds the very same live object (``cat.spark is spark``); anything else
    re-registers. (A WeakKeyDictionary would be cleaner but SparkSession
    doesn't reliably support weak references across PySpark versions.)"""
    cat = _CURRENT.get(id(spark))
    if cat is None or cat.spark is not spark or cat.sf_dir != sf_dir.rstrip("/"):
        cat = Catalog(spark, sf_dir)
        _CURRENT[id(spark)] = cat
    return cat
