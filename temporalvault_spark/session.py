"""SparkSession construction and runtime tuning.

The driver owns the session in verify runs (``entry(spark)``), so everything
that matters for correctness/performance must be settable at *runtime* —
``tune()`` applies those confs to any session it is handed. ``get_spark()`` is
for our own tests/bench, where we also control builder-time confs.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs, applied to driver-owned sessions too.
RUNTIME_CONFS = {
    # Deterministic timestamp semantics: testdata parquet carries naive
    # timestamps; with a UTC session they round-trip bit-exact vs DuckDB.
    "spark.sql.session.timeZone": "UTC",
    # NOTE: spark.sql.shuffle.partitions is set DYNAMICALLY in tune() —
    # 8 x the session's core count (see _shuffle_partitions) — not a
    # constant here.
    # AQE: runtime re-plan, skew-join splitting, partition coalescing.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Dimension tables (region=5, nation=25, supplier=1e3 rows at sf0.1)
    # must broadcast; 64 MB threshold keeps that true at larger SFs too.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Let AQE rewrite sort-merge joins to shuffled-hash at runtime when
    # every post-shuffle build partition is under 128 MiB (guide §3.1:
    # default 0 = off; SHJ skips both sorts and spills only past the
    # per-partition threshold, which AQE checks against ACTUAL sizes, the
    # safe direction). r14 A/B over the 6 SMJ-bearing headliners at sf0.1:
    # subset total 10.55s -> 10.2s; the real payoff is at scale where the
    # avoided sorts are data-sized. 128 MiB per-partition build side is
    # well inside default executor memory at 8x-cores partition counts.
    "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold": str(128 * 1024 * 1024),
    # Arrow for any pandas_udf path (vectorized Python boundary).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # The testdata parquet carries TIMESTAMP(NANOS) (pandas writer default),
    # which Spark rejects; read as int64 nanos and convert in the catalog.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Testdata timestamps are tz-naive parquet (isAdjustedToUTC=false); Spark
    # 4 would infer TIMESTAMP_NTZ, which breaks watermarks
    # (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE) and NTZ→BIGINT casts. Read them
    # as session-tz (UTC) TIMESTAMP — the reference's own semantic is
    # tz-aware timestamps (app/models.py:14-18), and DuckDB oracle
    # comparisons are bit-exact under a UTC session either way.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
}


def _shuffle_partitions(spark: SparkSession) -> int:
    """Scale-adaptive initial shuffle-partition count: 8 x the session's
    core count (floor 64). The INITIAL number is the pre-AQE ceiling —
    AQE's partition coalescing (enabled in RUNTIME_CONFS) then sizes the REAL
    post-shuffle partitions by bytes, so oversizing is cheap and
    undersizing caps parallelism. A constant (the old 32) was tuned to one
    local core count: it throttled CPU-heavy post-shuffle stages (the LSH
    pair verifies) on wider sessions and would be a hard ceiling on a real
    cluster. r14 A/B at sf0.1/local[32] over the 8 heaviest shuffle
    queries: 32 -> 256 cut the subset total 14.7s -> 13.0s (semdedup
    1.69->1.43, dedup_multimodal_apply 2.85->2.19); 256 vs 512 vs 1024 is
    flat, so 8x cores sits on the plateau's low edge at every tested core
    count."""
    return max(64, 8 * spark.sparkContext.defaultParallelism)


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an existing session (driver-owned or ours)."""
    confs = dict(RUNTIME_CONFS)
    confs["spark.sql.shuffle.partitions"] = str(_shuffle_partitions(spark))
    for k, v in confs.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # Some confs can be locked by the host; never fail the query path.
            pass
    _ship_package(spark)
    return spark


def _ship_package(spark: SparkSession) -> None:
    """Make ``temporalvault_spark`` importable on Python workers regardless of
    the driver process's cwd/PYTHONPATH: Pandas-UDF/mapInPandas closures
    reference module-level functions, which cloudpickle serializes by
    reference — the worker must import the module. addPyFile with a zip of
    the package is the runtime-settable way to guarantee that."""
    sc = spark.sparkContext
    if getattr(sc, "_temporalvault_shipped", False):
        return
    import tempfile
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zip_path = os.path.join(tempfile.gettempdir(), "temporalvault_spark_pkg.zip")
    try:
        with zipfile.ZipFile(zip_path, "w") as zf:
            for base, _dirs, files in os.walk(pkg_dir):
                for fn in files:
                    if fn.endswith(".py"):
                        full = os.path.join(base, fn)
                        rel = os.path.join(
                            "temporalvault_spark", os.path.relpath(full, pkg_dir)
                        )
                        zf.write(full, rel)
        sc.addPyFile(zip_path)
        sc._temporalvault_shipped = True
    except Exception:
        # best effort — local runs launched from the repo root work without it
        pass


def normalize_ts_cols(df, cols):
    """Normalize timestamp columns to session-tz TIMESTAMP (LTZ), whatever
    physical form the parquet handed us:

      - int64 nanos (TIMESTAMP(NANOS) read under nanosAsLong) → integer DIV
        keeps full int64 precision (a double cast loses sub-ms precision at
        epoch-nanos magnitude);
      - TIMESTAMP_NTZ (tz-naive parquet read before inferTimestampNTZ was
        disabled, or on a driver-owned session whose conf is locked) →
        plain cast; under a UTC session the wall-clock values are unchanged.

    THE one shared implementation — catalog, sources.io and streaming all
    route through it so the conversion can never drift between batch and
    stream paths. Backquotes keep non-identifier column names parseable.
    Watermarks and ts arithmetic both require LTZ (models.py:14-18 semantic).
    """
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)
    for c in cols:
        if dtypes.get(c) in ("bigint", "long"):
            df = df.withColumn(c, F.expr(f"timestamp_micros(`{c}` DIV 1000)"))
        elif dtypes.get(c) == "timestamp_ntz":
            df = df.withColumn(c, F.col(c).cast("timestamp"))
    return df


def get_spark(app_name: str = "temporalvault-spark", cpus: int | None = None) -> SparkSession:
    """Build a local session shaped like the target cluster (many cores,
    AQE on, generous broadcast). Used by tests and bench.py."""
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Per-process warehouse dir: managed tables (bucketing tests) land in a
    # fresh tmpdir, so an orphaned spark-warehouse/ from a previous crashed
    # run can never poison saveAsTable with LOCATION_ALREADY_EXISTS.
    # (warehouse.dir is a static conf — builder-time only.)
    import tempfile

    warehouse = tempfile.mkdtemp(prefix="tv_spark_warehouse_")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.extraJavaOptions", "-Duser.timezone=UTC")
        .config("spark.sql.warehouse.dir", warehouse)
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    return tune(builder.getOrCreate())
