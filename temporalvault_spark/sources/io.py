"""Sources & sinks: format-agnostic table IO with the engine's timestamp
handling centralized.

The reference's only 'source' is PostgreSQL-via-ORM (database.py:18-36) and
its only 'sink' JSON-over-HTTP; the engine reads/writes columnar files. All
formats (parquet/orc/csv/json — anything Spark's DataSource API names) route
through one reader so the TIMESTAMP(NANOS)→timestamp normalization (see
session.RUNTIME_CONFS) happens in exactly one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from temporalvault_spark.session import normalize_ts_cols, tune


def read_table(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | str | None = None,
    ts_cols: tuple[str, ...] = (),
    **options,
) -> DataFrame:
    """Read parquet/orc/csv/json with explicit schema (never inferred at scale —
    inference is a full extra pass over text formats) and nanos-as-long
    timestamp normalization for the named ``ts_cols``."""
    tune(spark)
    reader = spark.read.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv":
        options.setdefault("header", "true")
    df = reader.options(**options).load(path)
    return normalize_ts_cols(df, ts_cols)


def write_partitioned(
    df: DataFrame,
    path: str,
    fmt: str = "parquet",
    partition_by: tuple[str, ...] = (),
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Partitioned columnar write. ``partition_by`` should be low-cardinality
    (dates, categories): each distinct tuple becomes a directory that
    downstream predicate pushdown prunes for free — the engine's substitute
    for the reference's B-tree indexes (models.py:21-24).
    ``max_records_per_file`` caps file sizes so a 100 TB write neither
    produces giant unsplittable files nor a small-files explosion."""
    if partition_by:
        # co-locate each partition's rows before the write — but SALTED:
        # repartitioning on the partition columns alone maps every distinct
        # partition value to ONE task, so a hot partition (one date holding
        # TBs) serializes through a single core. The bounded salt spreads a
        # hot partition over up to _WRITE_SALT tasks while still keeping
        # files-per-partition ≈ salt (capped further by maxRecordsPerFile).
        salt_n = min(32, df.sparkSession.sparkContext.defaultParallelism)
        df = (
            df.withColumn("_wsalt", (F.rand(seed=7) * salt_n).cast("int"))
            .repartition(*[F.col(c) for c in partition_by], F.col("_wsalt"))
            .drop("_wsalt")
        )
    w = df.write.format(fmt).mode(mode)
    if fmt == "csv":
        w = w.option("header", "true")
    if partition_by:
        w = w.partitionBy(*partition_by)
    if max_records_per_file:
        w = w.option("maxRecordsPerFile", str(max_records_per_file))
    w.save(path)
