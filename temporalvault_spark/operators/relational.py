"""Relational operator breadth over the star schema (SURVEY.md §2.2-2.9).

The reference does no SQL joins (its rollback loop is a hand-rolled N+1 as-of
join, app/main.py:191-224) and delegates scans/filters/sorts to PostgreSQL.
Here each operator is one declarative plan; scale notes per operator explain
why the physical strategy survives 1000 executors / 100 TB.

Float determinism: every float aggregate is ROUNDed in BOTH engines so
addition-order differences (Spark partial aggs vs DuckDB) cannot flip the
driver's value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog, temporal_oracle
from temporalvault_spark.constants import PROBE_TS, PROBE_TS_EARLY, PROBE_TS_LATE
from temporalvault_spark.registry import query


def _cat(spark: SparkSession, sf_dir: str):
    return load_catalog(spark, sf_dir)


# --- scans / filters / projections ----------------------------------------


@query(
    "scan_project",
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1996-01-01 00:00:00'""",
)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scan + column prune + pushed filter: ReadSchema carries only the four
    referenced columns and PushedFilters shows the shipdate bound — at 100 TB
    this is the difference between reading 4 columns of a row-group subset
    and reading everything."""
    li = _cat(spark, sf_dir).table("lineitem")
    return li.filter(F.col("l_shipdate") < F.lit("1996-01-01 00:00:00").cast("timestamp")).select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"
    )


@query(
    "filter_range",
    f"""SELECT event_id, user_id, event_type, value FROM events
    WHERE event_type = 'click'
      AND ts >= TIMESTAMP '{PROBE_TS_EARLY}' AND ts < TIMESTAMP '{PROBE_TS_LATE}'""",
)
def q_filter_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive equality + range predicate (main.py:193-195 shape), fully
    pushed down; no shuffle at all."""
    ev = _cat(spark, sf_dir).table("events")
    return ev.filter(
        (F.col("event_type") == "click")
        & (F.col("ts") >= F.lit(PROBE_TS_EARLY).cast("timestamp"))
        & (F.col("ts") < F.lit(PROBE_TS_LATE).cast("timestamp"))
    ).select("event_id", "user_id", "event_type", "value")


@query(
    "project_rename",
    """SELECT event_id,
           strftime(ts, '%Y-%m-%dT%H:%M:%S') AS ts_iso,
           upper(event_type) AS event_type_uc
    FROM events""",
)
def q_project_rename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection + ISO-8601 formatting (main.py:135-144's response shape)."""
    ev = _cat(spark, sf_dir).table("events")
    return ev.select(
        "event_id",
        F.date_format(F.date_trunc("second", "ts"), "yyyy-MM-dd'T'HH:mm:ss").alias("ts_iso"),
        F.upper("event_type").alias("event_type_uc"),
    )


# --- joins -----------------------------------------------------------------


@query(
    "join_inner_hash",
    """SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           ROUND(SUM(o.o_totalprice), 2) AS sum_totalprice
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment""",
)
def q_join_inner_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi inner join; Catalyst picks broadcast-hash under the 64 MB
    threshold (customer is the build side), else sort-merge with AQE skew
    splitting — correct at both sf0.01 and 100 TB."""
    c = _cat(spark, sf_dir)
    return (
        c.table("orders")
        .join(c.table("customer"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_totalprice"),
        )
    )


@query(
    "join_broadcast",
    """SELECT r.r_name,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name""",
)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join through three explicit broadcast dims (supplier→nation→
    region): the fact table never shuffles for the joins — only the final
    5-group aggregate moves data, and partial aggregation makes that a
    per-partition handful of rows."""
    c = _cat(spark, sf_dir)
    return (
        c.table("lineitem")
        .join(F.broadcast(c.table("supplier")), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c.table("nation")), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(c.table("region")), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@query(
    "join_left",
    """SELECT c.c_custkey,
           COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS sum_totalprice
    FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey""",
)
def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _cat(spark, sf_dir)
    return (
        c.table("customer")
        .join(c.table("orders"), F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("sum_totalprice"),
        )
    )


@query(
    "join_semi",
    """SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)""",
)
def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence join — left_semi never duplicates or widens rows, so the
    probe side streams through a hash lookup of the (small, filtered) build
    side."""
    c = _cat(spark, sf_dir)
    big = c.table("orders").filter(F.col("o_totalprice") > 450000)
    return (
        c.table("customer")
        .join(big, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .select("c_custkey", "c_name")
    )


@query(
    "join_anti",
    """SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 450000)""",
)
def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti join — literally the rollback 'keys born after T' elimination
    (main.py:217-224) applied to the star schema."""
    c = _cat(spark, sf_dir)
    big = c.table("orders").filter(F.col("o_totalprice") > 450000)
    return (
        c.table("customer")
        .join(big, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    )


@query(
    "join_full_outer",
    """SELECT COALESCE(s.s_nationkey, c.c_nationkey) AS nationkey,
           CAST(COUNT(DISTINCT s.s_suppkey) AS BIGINT) AS n_suppliers,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS n_customers
    FROM (SELECT s_suppkey, s_nationkey FROM supplier WHERE s_acctbal > 9000) s
    FULL OUTER JOIN (SELECT c_custkey, c_nationkey FROM customer
                     WHERE c_acctbal > 9000) c
      ON s.s_nationkey = c.c_nationkey
    GROUP BY 1""",
)
def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer join: nations having high-balance suppliers, customers, or
    both — unmatched sides survive with NULLs (which the COALESCE key folds
    back). Full-outer cannot broadcast (both sides must surface unmatched
    rows), so Spark plans a shuffle join on the key — the correct and only
    scale shape for this operator."""
    c = _cat(spark, sf_dir)
    s = (
        c.table("supplier")
        .filter(F.col("s_acctbal") > 9000)
        .select("s_suppkey", "s_nationkey")
    )
    cu = (
        c.table("customer")
        .filter(F.col("c_acctbal") > 9000)
        .select("c_custkey", "c_nationkey")
    )
    return (
        s.join(cu, F.col("s_nationkey") == F.col("c_nationkey"), "full_outer")
        .groupBy(F.coalesce("s_nationkey", "c_nationkey").alias("nationkey"))
        .agg(
            F.count_distinct("s_suppkey").cast("bigint").alias("n_suppliers"),
            F.count_distinct("c_custkey").cast("bigint").alias("n_customers"),
        )
    )


@query(
    "win_ntile_ranks",
    """SELECT o_orderkey, o_custkey, o_totalprice,
           ntile(4) OVER w AS price_quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
           dense_rank() OVER w AS drank
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice NULLS FIRST, o_orderkey)""",
)
def q_win_ntile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-rank window suite: ntile quartiles, percent_rank,
    cume_dist, dense_rank over one shared ordering (the orderBy includes the
    unique key so ranks are total and engine-portable). A single global
    window is inherently one-partition — fine for a ranked report (the
    output IS the sorted table); per-key variants partition and parallelize,
    as win_rownum_latest shows."""
    c = _cat(spark, sf_dir)
    # explicit NULLS FIRST: Spark's ASC default, but DuckDB defaults to
    # NULLS LAST — a NULL o_totalprice silently shifts every rank otherwise
    w = Window.orderBy(F.asc_nulls_first("o_totalprice"), "o_orderkey")
    return c.table("orders").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        F.ntile(4).over(w).cast("bigint").alias("price_quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.dense_rank().over(w).cast("bigint").alias("drank"),
    )


@query(
    "win_ntile_ranks_scalable",
    """SELECT o_orderkey, o_custkey, o_totalprice,
           ntile(4) OVER w AS price_quartile,
           ROUND(percent_rank() OVER w, 6) AS pct_rank,
           ROUND(cume_dist() OVER w, 6) AS cume,
           dense_rank() OVER w AS drank
    FROM orders
    WINDOW w AS (ORDER BY o_totalprice NULLS FIRST, o_orderkey)""",
)
def q_win_ntile_ranks_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """win_ntile_ranks WITHOUT the global window — the 100 TB form of a
    whole-table ranked report, value-hash-identical to the single-window
    twin (same oracle). A partition-less Window moves the entire table to
    ONE task; this plan keeps every stage parallel:

      1. ``repartitionByRange`` on the total order (range partitioner
         boundaries from a sample — partition p holds ranks strictly
         before partition p+1);
      2. a ~n_partitions-row per-partition count -> cumulative rank
         offsets, collected and re-broadcast (the zipWithIndex recipe in
         DataFrame form);
      3. ``row_number`` partitioned BY the range partition id (parallel),
         global rank = offset + local row_number;
      4. every distribution rank derives from (rank, N) in a projection:
         the order includes the unique o_orderkey, so ties are impossible
         and dense_rank == rank, percent_rank == (rank-1)/(N-1), cume ==
         rank/N, and ntile(4) is the exact SQL bucket formula (first
         N mod 4 buckets take one extra row).

    The eager checkpoint freezes the range partitioning so the count pass
    and the rank pass see identical placement."""
    c = _cat(spark, sf_dir)
    order_cols = [F.asc_nulls_first("o_totalprice"), F.asc("o_orderkey")]
    df = (
        c.table("orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .repartitionByRange(16, *order_cols)
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["pid"]: r["n"]
        for r in df.groupBy("pid").agg(F.count("*").alias("n")).collect()
    }  # <= 16 rows — bounded by the partition count, never the data
    n_total = sum(counts.values())
    acc, offsets = 0, []
    for pid in sorted(counts):
        offsets.append((pid, acc))
        acc += counts[pid]
    off_df = spark.createDataFrame(offsets, "pid int, off bigint")
    w = Window.partitionBy("pid").orderBy(*order_cols)
    rank = (F.col("off") + F.row_number().over(w)).cast("bigint")
    # exact ntile(4): the first (N mod 4) buckets hold ceil(N/4) rows
    big, r_big = n_total // 4 + (1 if n_total % 4 else 0), n_total % 4
    small = n_total // 4
    in_big = rank <= r_big * big
    quartile = F.when(in_big, ((rank - 1) / big).cast("bigint") + 1).otherwise(
        (((rank - r_big * big - 1) / small).cast("bigint") + r_big + 1)
        if small
        else F.lit(r_big)  # n_total < 4: every row sits in a big bucket
    )
    return df.join(F.broadcast(off_df), "pid").select(
        "o_orderkey",
        "o_custkey",
        "o_totalprice",
        quartile.alias("price_quartile"),
        F.round((rank - 1) / F.lit(max(n_total - 1, 1)), 6).alias("pct_rank"),
        F.round(rank / F.lit(n_total), 6).alias("cume"),
        rank.alias("drank"),
    )


@query(
    "join_asof",
    temporal_oracle(
        f"""SELECT record_id, probe_ts, version, ts FROM (
          SELECT t.record_id, p.probe_ts, t.version, t.ts,
                 ROW_NUMBER() OVER (PARTITION BY t.record_id, p.probe_ts
                                    ORDER BY t.version_num DESC) AS rn
          FROM (SELECT DISTINCT record_id FROM temporal_records) k
          CROSS JOIN (SELECT unnest([TIMESTAMP '{PROBE_TS_EARLY}',
                                     TIMESTAMP '{PROBE_TS}',
                                     TIMESTAMP '{PROBE_TS_LATE}']) AS probe_ts) p
          JOIN temporal_records t
            ON t.record_id = k.record_id AND t.ts <= p.probe_ts
        ) x WHERE rn = 1"""
    ),
)
def q_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN: each (key, probe_ts) pair matched to the latest version at
    or before the probe — the set-based replacement for the reference's N+1
    loop (main.py:191-224). Formulation: broadcast the probe list against the
    log with the temporal inequality, then one window per (key, probe) group.
    Keys lacking any version <= probe emit nothing from the window, so no
    key-grid materialization (and no extra shuffle) is needed; the only
    data-sized shuffle is the window's (record_id, probe_ts) partitioning.
    The general two-table form (per-key probe timestamps) is
    temporalvault_spark.operators.joins.asof_join — union-tag, sort within
    key partitions, zero joins."""
    c = _cat(spark, sf_dir)
    tr = c.temporal_records
    probes = spark.createDataFrame(
        [(t,) for t in (PROBE_TS_EARLY, PROBE_TS, PROBE_TS_LATE)], "probe_ts_s string"
    ).select(F.col("probe_ts_s").cast("timestamp").alias("probe_ts"))
    w = Window.partitionBy("record_id", "probe_ts").orderBy(F.desc("version_num"))
    return (
        tr.crossJoin(F.broadcast(probes))
        .filter(F.col("ts") <= F.col("probe_ts"))
        .select("record_id", "probe_ts", "version", "ts", "version_num")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("record_id", "probe_ts", "version", "ts")
    )


@query(
    "join_asof_forward",
    temporal_oracle(
        f"""SELECT record_id, probe_ts, version, ts FROM (
          SELECT t.record_id, p.probe_ts, t.version, t.ts,
                 ROW_NUMBER() OVER (PARTITION BY t.record_id, p.probe_ts
                                    ORDER BY t.version_num ASC) AS rn
          FROM (SELECT DISTINCT record_id FROM temporal_records) k
          CROSS JOIN (SELECT unnest([TIMESTAMP '{PROBE_TS_EARLY}',
                                     TIMESTAMP '{PROBE_TS}',
                                     TIMESTAMP '{PROBE_TS_LATE}']) AS probe_ts) p
          JOIN temporal_records t
            ON t.record_id = k.record_id AND t.ts >= p.probe_ts
        ) x WHERE rn = 1"""
    ),
)
def q_join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (pandas merge_asof direction='forward' parity):
    each (key, probe_ts) matched to the EARLIEST version at or after the
    probe — "what's the next state change after T", the event-to-next-
    observation join of feature pipelines. Identical plan shape to the
    backward form (broadcast probe grid, one (record_id, probe_ts) window);
    only the inequality and the window direction flip, so every scale
    property of join_asof carries over. Keys with no version >= probe emit
    nothing — forward semantics, matching merge_asof."""
    c = _cat(spark, sf_dir)
    tr = c.temporal_records
    probes = spark.createDataFrame(
        [(t,) for t in (PROBE_TS_EARLY, PROBE_TS, PROBE_TS_LATE)], "probe_ts_s string"
    ).select(F.col("probe_ts_s").cast("timestamp").alias("probe_ts"))
    w = Window.partitionBy("record_id", "probe_ts").orderBy(F.asc("version_num"))
    return (
        tr.crossJoin(F.broadcast(probes))
        .filter(F.col("ts") >= F.col("probe_ts"))
        .select("record_id", "probe_ts", "version", "ts", "version_num")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("record_id", "probe_ts", "version", "ts")
    )


@query(
    "join_range_theta",
    """WITH buckets(bucket, lo, hi) AS (
        VALUES ('low', 0.0, 25.0), ('mid', 25.0, 50.0),
               ('high', 50.0, 100.0), ('extreme', 100.0, 1000000.0))
    SELECT b.bucket, COUNT(*) AS n_events, ROUND(SUM(e.value), 2) AS sum_value
    FROM events e JOIN buckets b ON e.value >= b.lo AND e.value < b.hi
    GROUP BY b.bucket""",
)
def q_join_range_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure non-equi (theta) join against a tiny ranges table: planned as
    BroadcastNestedLoopJoin — the only sane physical strategy, and exactly
    what you want when one side is O(10) rows."""
    c = _cat(spark, sf_dir)
    buckets = spark.createDataFrame(
        [("low", 0.0, 25.0), ("mid", 25.0, 50.0), ("high", 50.0, 100.0), ("extreme", 100.0, 1e6)],
        "bucket string, lo double, hi double",
    )
    ev = c.table("events")
    return (
        ev.join(F.broadcast(buckets), (ev["value"] >= buckets["lo"]) & (ev["value"] < buckets["hi"]))
        .groupBy("bucket")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


@query(
    "join_skew_salted",
    """SELECT c.c_mktsegment AS segment,
           COUNT(*) AS n_events,
           ROUND(SUM(e.value), 2) AS sum_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment""",
)
def q_join_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient equi-join: the events fact salts its user_id, the
    customer dim replicates ``salt``-fold, and the join key becomes
    (key, salt) — a hot user's rows spread over ``salt`` reducers instead
    of one straggler (functions/skew.py; the explicit tool for when the
    dim is too big to broadcast and AQE's runtime skew split isn't
    available, e.g. a non-shuffle-join stage). The oracle is the PLAIN
    join — salting is a physical rewrite with identical semantics, and
    this entry pins that identity under the driver's value-hash.

    The shuffle_hash hint is load-bearing: at testdata scale Catalyst
    would broadcast the dim and never build the salted shuffle this entry
    exists to exercise; the hint reproduces the big-dim plan (two
    hash-partition exchanges on (key, salt), one ShuffledHashJoin).

    Scale: replication factor is a constant (8) on the dim only; the
    post-join aggregate is map-side-combined on the segment key, so the
    second shuffle carries one row per (segment, partition)."""
    from temporalvault_spark.functions.skew import salted_join_skewed_left

    c = _cat(spark, sf_dir)
    ev = c.table("events").select(F.col("user_id").alias("c_custkey"), "value")
    dim = c.table("customer").select("c_custkey", "c_mktsegment")
    joined = salted_join_skewed_left(ev, dim, "c_custkey", salt=8, join_hint="shuffle_hash")
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "agg_skew_salted",
    """SELECT l_returnflag,
           CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
           COUNT(l_quantity) AS n,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price
    FROM lineitem GROUP BY l_returnflag""",
)
def q_agg_skew_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resilient two-stage aggregate (functions/skew.py salted_agg):
    rows salt into 16 sub-keys, aggregate partially per (key, salt), then
    merge — the explicit fix for a hot GROUP BY key, which AQE cannot split
    (its skew handling only applies to join partitions). The oracle is the
    PLAIN aggregate: salting is a physical rewrite with identical
    semantics, and this entry pins that identity under the value-hash —
    same contract as join_skew_salted above.

    Parity across the DIFFERENT aggregation orders the two stages induce:
    every measure is order-free — l_quantity is integer-valued (exact
    double sums, associative), count merges by sum, min/max are
    idempotent-commutative. A non-integer SUM would need the integer
    micro-unit treatment instead.

    Scale: the second aggregate sees ``salt`` rows per group — constant
    work; the first stage fans the hot key over 16 reducers."""
    from temporalvault_spark.functions.skew import salted_agg

    li = _cat(spark, sf_dir).table("lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return salted_agg(
        li,
        ["l_returnflag"],
        {
            "sum_qty": ("sum", "l_quantity"),
            "n": ("count", "l_quantity"),
            "min_price": ("min", "l_extendedprice"),
            "max_price": ("max", "l_extendedprice"),
        },
    )


# --- aggregations ----------------------------------------------------------


@query(
    "agg_minmax_per_key",
    temporal_oracle(
        """SELECT record_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
               COUNT(*) AS n_versions
        FROM temporal_records GROUP BY record_id"""
    ),
)
def q_agg_minmax_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-based form of /compare's per-key first/last lookups
    (main.py:281-294): one partial+final hash aggregate instead of two
    ORDER-BY round trips per key."""
    return (
        _cat(spark, sf_dir)
        .temporal_records.groupBy("record_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count("*").alias("n_versions"),
        )
    )


@query(
    "agg_groupby_multi",
    f"""SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 6) AS avg_qty,
           ROUND(AVG(l_extendedprice), 6) AS avg_price,
           ROUND(AVG(l_discount), 6) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus""",
)
def q_agg_groupby_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: the canonical wide aggregate. Whole-stage-codegen'd
    hash aggregate with map-side partials; only 6 groups ever cross the
    shuffle."""
    li = _cat(spark, sf_dir).table("lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@query(
    "agg_distinct",
    """SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY event_type""",
)
def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate: Spark plans expand + two-phase agg. (The scale
    path for cardinality-only questions is approx_count_distinct — HLL,
    no expand — exposed in functions.approx; exact form here because the
    oracle must match bit-for-bit.)"""
    return (
        _cat(spark, sf_dir)
        .table("events")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


@query(
    "agg_rollup",
    """SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2) AS sum_qty,
           COUNT(*) AS n_items
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",
)
def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (absent from the reference; Spark builtin via
    Expand — each input row fans out to its grouping sets before the partial
    agg, so the shuffle still carries only group rows)."""
    return (
        _cat(spark, sf_dir)
        .table("lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count("*").alias("n_items"))
    )


# --- window functions ------------------------------------------------------


@query(
    "win_rownum_latest",
    """SELECT user_id, event_id, ts, rn FROM (
        SELECT user_id, event_id, ts,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) t
    WHERE rn <= 3""",
)
def q_win_rownum_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 latest events per key — the reference's latest-version lookup
    generalized. Spark 3.5+/4.x inserts WindowGroupLimit: per-partition top-k
    BEFORE the shuffle, so skewed keys don't flood a reducer."""
    ev = _cat(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= 3)
        .select("user_id", "event_id", "ts", "rn")
    )


@query(
    "win_lag_chain",
    """SELECT event_id, user_id, value,
           LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 6) AS delta
    FROM events""",
)
def q_win_lag_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() chain — the computed form of previous_version (models.py:19)
    applied to measures."""
    ev = _cat(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("value").over(w)
    return ev.select(
        "event_id",
        "user_id",
        "value",
        prev.alias("prev_value"),
        F.round(F.col("value") - prev, 6).alias("delta"),
    )


@query(
    "win_running_agg",
    """SELECT event_id, user_id, ts,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4)
               AS running_value,
           COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
    FROM events""",
)
def q_win_running_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running aggregate over each key's history (the 'how did this record
    evolve' read, README.md:8, as a measure)."""
    ev = _cat(spark, sf_dir).table("events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.sum("value").over(w), 4).alias("running_value"),
        F.count("*").over(w).alias("running_n"),
    )


@query(
    "win_rank_family",
    """SELECT event_id, event_type, value,
           RANK() OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
           ROUND(CUME_DIST() OVER w, 6) AS cume,
           CAST(NTILE(4) OVER w AS BIGINT) AS quartile
    FROM events
    WINDOW w AS (PARTITION BY event_type
                 ORDER BY value DESC NULLS LAST, event_id)""",
)
def q_win_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The rank-family windows in one pass: rank/dense_rank (leaderboards),
    percent_rank/cume_dist (within-group percentile scoring — the relative
    form of quality_score's absolute thresholds), ntile (quartile bucketing
    for stratified sampling). All five share ONE window definition, so
    Spark evaluates them in a single sort per partition — the plan has one
    Window node, not five. Tie-break on event_id makes every rank
    deterministic; NULLS LAST is explicit because Spark and DuckDB disagree
    on default NULL placement for DESC orderings."""
    ev = _cat(spark, sf_dir).table("events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc_nulls_last(), F.col("event_id").asc()
    )
    return ev.select(
        "event_id",
        "event_type",
        "value",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


# --- set operations --------------------------------------------------------


@query(
    "setop_union_except",
    """SELECT c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 480000
    ) u
    EXCEPT
    SELECT c_custkey FROM customer WHERE c_nationkey < 5""",
)
def q_setop_union_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) then EXCEPT — the set algebra under /compare's
    key-union diff (main.py:324), lifted to whole tables."""
    c = _cat(spark, sf_dir)
    building = c.table("customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    big = (
        c.table("orders")
        .filter(F.col("o_totalprice") > 480000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    southern = c.table("customer").filter(F.col("c_nationkey") < 5).select("c_custkey")
    return building.union(big).distinct().exceptAll(southern.distinct())


@query(
    "setop_intersect",
    """SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000""",
)
def q_setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — the remaining §2.8 set operation: BUILDING-segment
    customers who also placed a large order. Plans as a left-semi join
    over distinct inputs (same hash-join machinery as any existence
    query); at scale the smaller distinct side broadcasts."""
    c = _cat(spark, sf_dir)
    building = (
        c.table("customer").filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    )
    big = (
        c.table("orders")
        .filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return building.intersect(big)


# --- scalar function coverage ---------------------------------------------


@query(
    "scalar_funcs",
    """SELECT event_id,
           upper(substr(event_type, 1, 3)) AS type_code,
           concat_ws(':', event_type, CAST(user_id AS STRING)) AS tag,
           CASE WHEN json_valid(props)
                THEN CAST(floor(TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS INT)
                END AS k_val,
           CASE WHEN value >= 100 THEN 'big' WHEN value >= 20 THEN 'mid' ELSE 'small' END AS size_class,
           ROUND(sqrt(value) + ln(value + 1), 6) AS score,
           year(ts) AS y, month(ts) AS m, day(ts) AS d, hour(ts) AS h,
           coalesce(NULLIF(event_type, 'error'), 'ERR') AS type_or_err
    FROM events""",
)
def q_scalar_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-function sweep (SURVEY.md §2.9): string, JSON extraction,
    conditional, math, datetime parts — all JVM builtins inside one
    whole-stage-codegen projection; zero Python on the hot path."""
    ev = _cat(spark, sf_dir).table("events")
    return ev.select(
        "event_id",
        F.upper(F.substring("event_type", 1, 3)).alias("type_code"),
        F.concat_ws(":", "event_type", F.col("user_id").cast("string")).alias("tag"),
        # floor-of-double on BOTH sides: a non-numeric "$.k" (or junk props)
        # must yield NULL, not an ANSI abort, and a fractional "$.k" must
        # agree — Spark truncates double->int where DuckDB rounds, so both
        # floor first
        F.floor(F.get_json_object("props", "$.k").try_cast("double"))
        .try_cast("int")
        .alias("k_val"),
        F.when(F.col("value") >= 100, "big")
        .when(F.col("value") >= 20, "mid")
        .otherwise("small")
        .alias("size_class"),
        F.round(F.sqrt("value") + F.log(F.col("value") + 1), 6).alias("score"),
        F.year("ts").cast("long").alias("y"),
        F.month("ts").cast("long").alias("m"),
        F.dayofmonth("ts").cast("long").alias("d"),
        F.hour("ts").cast("long").alias("h"),
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("ERR")).alias("type_or_err"),
    )


ASOF_TOLERANCE_MIN = 60 * 24  # 1 day


@query(
    "join_asof_tolerance",
    temporal_oracle(
        f"""SELECT record_id, probe_ts, version, ts FROM (
          SELECT t.record_id, p.probe_ts, t.version, t.ts,
                 ROW_NUMBER() OVER (PARTITION BY t.record_id, p.probe_ts
                                    ORDER BY t.version_num DESC) AS rn
          FROM (SELECT DISTINCT record_id FROM temporal_records) k
          CROSS JOIN (SELECT unnest([TIMESTAMP '{{PROBE_TS_EARLY}}',
                                     TIMESTAMP '{{PROBE_TS}}',
                                     TIMESTAMP '{{PROBE_TS_LATE}}']) AS probe_ts) p
          JOIN temporal_records t
            ON t.record_id = k.record_id AND t.ts <= p.probe_ts
           AND t.ts > p.probe_ts - INTERVAL {ASOF_TOLERANCE_MIN} MINUTE
        ) x WHERE rn = 1""".format(
            PROBE_TS_EARLY=PROBE_TS_EARLY, PROBE_TS=PROBE_TS, PROBE_TS_LATE=PROBE_TS_LATE
        )
    ),
)
def q_join_asof_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AS-OF JOIN with a staleness tolerance (pandas merge_asof's
    ``tolerance``, Timescale's locf max-gap): a probe matches the latest
    version at or before it ONLY if that version is younger than
    {ASOF_TOLERANCE_MIN} minutes — stale state is treated as no state,
    which is what feature-store and sensor reads actually want. Identical
    plan shape to join_asof (broadcast probe list, one (record_id,
    probe_ts) window); the tolerance is one more scan-level predicate, so
    it PRUNES work rather than adding any."""
    c = _cat(spark, sf_dir)
    tr = c.temporal_records
    probes = spark.createDataFrame(
        [(t,) for t in (PROBE_TS_EARLY, PROBE_TS, PROBE_TS_LATE)], "probe_ts_s string"
    ).select(F.col("probe_ts_s").cast("timestamp").alias("probe_ts"))
    w = Window.partitionBy("record_id", "probe_ts").orderBy(F.desc("version_num"))
    return (
        tr.crossJoin(F.broadcast(probes))
        .filter(
            (F.col("ts") <= F.col("probe_ts"))
            & (F.col("ts") > F.col("probe_ts") - F.expr(f"INTERVAL {ASOF_TOLERANCE_MIN} MINUTES"))
        )
        .select("record_id", "probe_ts", "version", "ts", "version_num")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("record_id", "probe_ts", "version", "ts")
    )


@query(
    "win_rolling_1h_by_time",
    """SELECT event_id, user_id, ts,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_events_1h,
           ROUND(SUM(value) OVER w, 2) AS sum_value_1h
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""",
)
def q_win_rolling_1h_by_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE rolling aggregate: each event's trailing-1-hour count and
    sum for its user — a RANGE frame over event time, which rows-based
    frames (win_running_agg) cannot express when events are irregularly
    spaced. The frame orders by INTEGER epoch microseconds (unix_micros ≡
    DuckDB epoch_us), never truncated seconds or float epochs: second
    truncation pulls events just past the boundary back into the frame
    (observed at sf0.1 — an event 3600.4s back counted under
    unix_timestamp), and float epochs risk last-ulp disagreement at the
    edge. Integer microseconds are exact in both engines. One window over
    the user_id partitioning — the same shuffle every per-user operator
    shares."""
    c = _cat(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, Window.currentRow)
    )
    return c.table("events").select(
        "event_id",
        "user_id",
        "ts",
        F.count("*").over(w).cast("bigint").alias("n_events_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_value_1h"),
    )


@query(
    "agg_stats_moments",
    """SELECT l_returnflag,
           COUNT(*) AS n,
           ROUND(AVG(l_extendedprice), 2) AS avg_price,
           ROUND(STDDEV_SAMP(l_extendedprice), 2) AS std_price,
           ROUND(CORR(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           ROUND(COVAR_SAMP(l_quantity, l_extendedprice), 2) AS covar_qty_price,
           ROUND(skewness(l_quantity) * (COUNT(*) - 2)
                 / sqrt(COUNT(*) * (COUNT(*) - 1.0)), 6) AS skew_qty,
           ROUND(kurtosis_pop(l_quantity), 6) AS kurt_qty
    FROM lineitem GROUP BY l_returnflag""",
)
def q_agg_stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical-moment aggregate family in ONE hash aggregate: stddev,
    Pearson correlation, sample covariance, skewness, excess kurtosis per
    group — all JVM builtins (declarative moment accumulators with
    map-side partial merge; the shuffle carries one fixed-width moment
    tuple per group, never rows). Cross-engine definition parity is part
    of the contract and non-trivial: Spark's skewness/kurtosis are the
    POPULATION moments (g1, g2 = m3/m2^1.5, m4/m2^2 - 3) while DuckDB's
    skewness is the sample-adjusted G1 — the oracle converts via
    g1 = G1 * (n-2)/sqrt(n(n-1)) and uses kurtosis_pop (verified equal to
    Spark's definition). Rounding (2dp on price-scale, 6dp on
    dimensionless) absorbs summation-order float noise between engines."""
    li = load_catalog(spark, sf_dir).table("lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.round(F.avg("l_extendedprice"), 2).alias("avg_price"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
            "covar_qty_price"
        ),
        F.round(F.skewness("l_quantity"), 6).alias("skew_qty"),
        F.round(F.kurtosis("l_quantity"), 6).alias("kurt_qty"),
    )


@query(
    "unpivot_measures",
    """SELECT measure, COUNT(*) AS n, ROUND(SUM(val), 2) AS sum_val
    FROM (
        SELECT 'l_quantity' AS measure, l_quantity AS val FROM lineitem
        UNION ALL SELECT 'l_extendedprice', l_extendedprice FROM lineitem
        UNION ALL SELECT 'l_discount', l_discount FROM lineitem
        UNION ALL SELECT 'l_tax', l_tax FROM lineitem)
    GROUP BY measure""",
)
def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt): wide measure columns to long (measure, value) rows —
    the reshape every metrics/monitoring pipeline needs before a generic
    per-measure aggregate. Spark's native unpivot plans as a single Expand
    node (each input row fans to 4 output rows IN PLACE, no join, no
    shuffle before the aggregate), so the only exchange is the final
    4-group aggregate — the oracle's UNION ALL of 4 scans shows exactly
    why the operator exists: one scan instead of four."""
    li = load_catalog(spark, sf_dir).table("lineitem")
    long = li.unpivot(
        ids=[],
        values=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="measure",
        valueColumnName="val",
    )
    return long.groupBy("measure").agg(
        F.count("*").alias("n"), F.round(F.sum("val"), 2).alias("sum_val")
    )


@query(
    "agg_distinct_bitmap",
    """SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct_users
    FROM events WHERE user_id IS NOT NULL GROUP BY event_type""",
)
def q_agg_distinct_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct count via bitmap aggregation (Spark 3.5 bitmap_*
    builtins): user_ids map to (bucket, bit-position), per-(group, bucket)
    partial aggregates OR the 4096-bit bitmaps together, and the final pass
    sums popcounts. Same answer as COUNT(DISTINCT) — the oracle IS
    COUNT(DISTINCT) — but the shuffle carries fixed-width bitmaps that
    merge associatively (map-side combine works; a COUNT(DISTINCT) shuffle
    carries every distinct raw value and cannot partial-aggregate). This is
    the exact-count counterpart of the HLL tier (functions/approx.py): HLL
    when ~2% error is fine, bitmaps when the id space is dense integers and
    the answer must be exact."""
    ev = _cat(spark, sf_dir).table("events").filter(F.col("user_id").isNotNull())
    per_bucket = (
        ev.groupBy(
            "event_type", F.expr("bitmap_bucket_number(user_id)").alias("bkt")
        )
        .agg(
            F.expr("bitmap_count(bitmap_construct_agg(bitmap_bit_position(user_id)))")
            .alias("cnt")
        )
    )
    return per_bucket.groupBy("event_type").agg(
        F.sum("cnt").alias("n_distinct_users")
    )


@query(
    "agg_listagg_sources",
    """SELECT lang,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           string_agg(DISTINCT source, ',' ORDER BY source) AS sources_csv
    FROM documents WHERE source IS NOT NULL GROUP BY lang""",
)
def q_agg_listagg_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LISTAGG / string_agg with DETERMINISTIC order: per language, the
    distinct sources as one sorted CSV. Cross-engine string aggregation is
    only hash-comparable when the order inside the string is total —
    collect_set's arrival order is partition-scheduling-dependent, so the
    engine sorts the SET before joining (array_sort then array_join; the
    oracle's ORDER BY inside string_agg is the same statement). The
    aggregate is still one hash aggregate with map-side partials: sets
    union associatively; only the final sorted render is per-group."""
    docs = load_catalog(spark, sf_dir).table("documents").filter(
        F.col("source").isNotNull()
    )
    return docs.groupBy("lang").agg(
        F.countDistinct("source").alias("n_sources"),
        F.array_join(F.array_sort(F.collect_set("source")), ",").alias(
            "sources_csv"
        ),
    )
