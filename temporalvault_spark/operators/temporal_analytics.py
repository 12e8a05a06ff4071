"""Temporal analytics beyond the reference's API: interval (SCD2) views of
the version log, event funnels, cohort retention — the queries a user of a
time-traveling store actually runs once they have one.

Reference tie-in: the version log IS a slowly-changing dimension; /compare
(main.py:270-343) diffs two points, these operators expose the whole
trajectory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog, temporal_oracle
from temporalvault_spark.registry import query


def _cat(spark: SparkSession, sf_dir: str):
    return load_catalog(spark, sf_dir)


@query(
    "version_intervals",
    temporal_oracle(
        """SELECT record_id, version, data,
               ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY record_id ORDER BY version_num) AS valid_to,
               CASE WHEN LEAD(ts) OVER (PARTITION BY record_id ORDER BY version_num)
                    IS NULL THEN 1 ELSE 0 END AS is_current
        FROM temporal_records"""
    ),
)
def q_version_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 interval view: each version becomes [valid_from, valid_to) with
    an is_current flag — the join-friendly form of the append-only log (an
    as-of read becomes a plain BETWEEN predicate against this view). One
    lead() window, same record_id shuffle every temporal op shares."""
    tr = _cat(spark, sf_dir).temporal_records
    w = Window.partitionBy("record_id").orderBy("version_num")
    valid_to = F.lead("ts").over(w)
    return tr.select(
        "record_id",
        "version",
        "data",
        F.col("ts").alias("valid_from"),
        valid_to.alias("valid_to"),
        F.when(valid_to.isNull(), 1).otherwise(0).alias("is_current"),
    )


@query(
    "funnel_signup_click_purchase",
    """WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
               MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        FROM events GROUP BY user_id)
    SELECT
        COUNT(*) AS n_users,
        CAST(SUM(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS stage_signup,
        CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                      THEN 1 ELSE 0 END) AS BIGINT) AS stage_click_after_signup,
        CAST(SUM(CASE WHEN t_signup IS NOT NULL AND t_click > t_signup
                       AND t_purchase > t_click
                      THEN 1 ELSE 0 END) AS BIGINT) AS stage_full_funnel
    FROM firsts""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (signup → click → purchase): first-occurrence per stage
    per user, then ordering predicates. One groupBy(user_id) with conditional
    MINs — no self-joins, no window over the full event stream; the classic
    funnel formulation that scales as a single aggregate."""
    ev = _cat(spark, sf_dir).table("events")
    first_of = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    firsts = ev.groupBy("user_id").agg(
        first_of("signup").alias("t_signup"),
        first_of("click").alias("t_click"),
        first_of("purchase").alias("t_purchase"),
    )
    signed = F.col("t_signup").isNotNull()
    clicked = signed & (F.col("t_click") > F.col("t_signup"))
    purchased = clicked & (F.col("t_purchase") > F.col("t_click"))
    return firsts.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(signed, 1).otherwise(0)).cast("bigint").alias("stage_signup"),
        F.sum(F.when(clicked, 1).otherwise(0)).cast("bigint").alias("stage_click_after_signup"),
        F.sum(F.when(purchased, 1).otherwise(0)).cast("bigint").alias("stage_full_funnel"),
    )


@query(
    "cohort_retention_weekly",
    """WITH cohorts AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id),
    activity AS (
        SELECT DISTINCT e.user_id, CAST(date_trunc('week', e.ts) AS TIMESTAMP) AS active_week
        FROM events e)
    SELECT c.cohort_week,
           CAST(floor(date_diff('day', c.cohort_week, a.active_week) / 7.0) AS BIGINT)
               AS weeks_since,
           COUNT(DISTINCT a.user_id) AS active_users
    FROM cohorts c JOIN activity a ON c.user_id = a.user_id
    WHERE a.active_week >= c.cohort_week
    GROUP BY 1, 2""",
)
def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen week, counted in
    each later activity week. Two aggregates + an equi-join on user_id; the
    join co-partitions with both aggregates, so at scale this is one logical
    shuffle of the event stream by user."""
    ev = _cat(spark, sf_dir).table("events")
    cohorts = ev.groupBy("user_id").agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    activity = ev.select("user_id", F.date_trunc("week", "ts").alias("active_week")).distinct()
    return (
        cohorts.join(activity, "user_id")
        .filter(F.col("active_week") >= F.col("cohort_week"))
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("active_week", "cohort_week") / 7.0)
            .cast("bigint")
            .alias("weeks_since"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@query(
    "session_paths_top",
    """WITH seq AS (
        SELECT user_id, event_id, ts, event_type,
               CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                    OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_sess
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
        SELECT user_id, event_id, ts, event_type,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS sess_id
        FROM seq),
    paths AS (
        SELECT user_id, sess_id,
               array_to_string(list(event_type ORDER BY ts, event_id)[1:5], '>') AS path
        FROM sess GROUP BY user_id, sess_id)
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths GROUP BY path
    ORDER BY n_sessions DESC, path LIMIT 10""",
)
def q_session_paths_top(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Clickstream path mining: sessionize (30-min inactivity gap), express
    each session as its first-5 event-type sequence, count the top-10 paths
    — the behavioral-analytics twin of the session window.

    Scale shape: ONE user_id exchange covers the lag() boundary flag, the
    running-sum session id, and (being a prefix of the grouping key) the
    per-session path aggregate; the path itself is built by sorting each
    session's collected (ts, event_id, type) structs INSIDE the aggregate —
    no second data-wide shuffle — and only (path, count) rows reach the
    final few-group exchange, with the top-10 as TakeOrderedAndProject.
    Ties order deterministically via (ts, event_id) in both engines."""
    ev = _cat(spark, sf_dir).table("events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Interval comparison, not cast("long") arithmetic: NTZ→BIGINT casts are
    # illegal, while timestamp difference vs INTERVAL works for both LTZ and
    # NTZ inputs (same form win_session's oracle uses, timewindow.py).
    prev_ts = F.lag("ts").over(w)
    sess = (
        ev.select("user_id", "event_id", "ts", "event_type")
        .withColumn(
            "new_sess",
            F.when(
                prev_ts.isNull()
                | (F.col("ts") - prev_ts > F.expr("INTERVAL 30 MINUTES")),
                1,
            ).otherwise(0),
        )
        .withColumn("sess_id", F.sum("new_sess").over(w))
    )
    paths = (
        sess.groupBy("user_id", "sess_id")
        .agg(
            F.array_join(
                F.slice(
                    F.transform(
                        F.array_sort(
                            F.collect_list(F.struct("ts", "event_id", "event_type"))
                        ),
                        lambda x: x["event_type"],
                    ),
                    1,
                    5,
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
    )


@query(
    "events_zscore_outliers",
    """WITH s AS (
        SELECT event_type, AVG(value) AS m, STDDEV_SAMP(value) AS sd
        FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type, e.value,
           ROUND((e.value - s.m) / s.sd, 6) AS z
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE (e.value - s.m) / s.sd > 3""",
)
def q_events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type z-score outlier scan (the monitoring query behind every
    'alert on anomalous event values' dashboard). Scale shape: the per-type
    moments aggregate to ~|event_types| rows and BROADCAST back onto the
    stream — never a window over event_type, whose 5 giant hash partitions
    would serialize a 100 TB scan through 5 tasks. The outlier predicate is
    then a scan-speed projection."""
    ev = _cat(spark, sf_dir).table("events")
    s = ev.groupBy("event_type").agg(
        F.avg("value").alias("m"), F.stddev_samp("value").alias("sd")
    )
    z = (F.col("value") - F.col("m")) / F.col("sd")
    return (
        ev.join(F.broadcast(s), "event_type")
        .filter(z > 3)
        .select("event_id", "event_type", "value", F.round(z, 6).alias("z"))
    )


PATH_HEAD_EVENTS = 8  # head-path cap: bounds the levenshtein operand
PATH_MAX_EDITS = 2  # similarity threshold (edit distance on head paths)
_NSEG = PATH_MAX_EDITS + 1  # PassJoin segment count

# shared segment arithmetic (1-based segment i of a length-lb string, split
# as evenly as possible: the first lb%NSEG segments get the extra char):
#   seg_len(i, lb) = lb//NSEG + (i <= lb%NSEG)
#   start(i, lb)   = 1 + (i-1)*(lb//NSEG) + least(i-1, lb%NSEG)


def _seg_start(i: str, lb: str, div: str) -> str:
    return f"1 + ({i}-1)*({lb} {div} {_NSEG}) + least({i}-1, {lb} % {_NSEG})"


def _seg_len(i: str, lb: str, div: str) -> str:
    return f"({lb} {div} {_NSEG}) + (CASE WHEN {i} <= {lb} % {_NSEG} THEN 1 ELSE 0 END)"


@query(
    "user_path_similarity",
    f"""WITH seq AS (
        SELECT user_id, ts, event_id, substring(event_type, 1, 1) AS c,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn
        FROM events WHERE ts IS NOT NULL AND event_type IS NOT NULL),
    l AS (
        SELECT user_id, string_agg(c, '' ORDER BY rn) AS path,
               CAST(COUNT(*) AS BIGINT) AS path_len
        FROM seq WHERE rn <= {PATH_HEAD_EVENTS} GROUP BY user_id),
    akeys AS (
        SELECT user_id, unnest(flatten(list_transform(range(1, {_NSEG + 1}), i ->
            flatten(list_transform(range(greatest(path_len - {PATH_MAX_EDITS}, 1),
                                         least(path_len + {PATH_MAX_EDITS}, {PATH_HEAD_EVENTS}) + 1), lb ->
                list_filter(list_transform(range(-{PATH_MAX_EDITS}, {PATH_MAX_EDITS + 1}), s ->
                    CASE WHEN {_seg_start('i', 'lb', '//')} + s >= 1
                         THEN {{'i': i, 'lb': lb,
                               'seg': substring(path, CAST({_seg_start('i', 'lb', '//')} + s AS INT),
                                                CAST({_seg_len('i', 'lb', '//')} AS INT))}}
                         ELSE NULL END),
                x -> x IS NOT NULL)))))) AS k
        FROM l),
    bkeys AS (
        SELECT user_id, unnest(list_transform(range(1, {_NSEG + 1}), i ->
            {{'i': i, 'lb': path_len,
              'seg': substring(path, CAST({_seg_start('i', 'path_len', '//')} AS INT),
                               CAST({_seg_len('i', 'path_len', '//')} AS INT))}})) AS k
        FROM l),
    cand AS (
        SELECT DISTINCT a.user_id AS ua, b.user_id AS ub
        FROM akeys a JOIN bkeys b
          ON a.k.i = b.k.i AND a.k.lb = b.k.lb AND a.k.seg = b.k.seg
         AND a.user_id < b.user_id)
    SELECT c.ua AS user_a, c.ub AS user_b,
           CAST(levenshtein(x.path, y.path) AS BIGINT) AS dist,
           x.path_len AS len_a, y.path_len AS len_b
    FROM cand c JOIN l x ON c.ua = x.user_id JOIN l y ON c.ub = y.user_id
    WHERE levenshtein(x.path, y.path) <= {PATH_MAX_EDITS}""",
)
def q_user_path_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Behavioral trajectory similarity (REPOSE/trajectory-search shape on
    an event log): users whose HEAD event-type sequences are within edit
    distance {PATH_MAX_EDITS} — the cohorting signal behind lookalike
    audiences and bot-ring detection. Each user's trajectory is the
    first-letter string of their first {PATH_HEAD_EVENTS} events (the cap
    bounds the quadratic levenshtein operand), built inside ONE user_id
    exchange.

    Candidate generation is PassJoin-style SEGMENT blocking (Li et al.'s
    partition scheme; the compressed-string-join literature's standard):
    each candidate string is split into k+1 segments; if ed(a, b) <= k,
    some segment of b receives NO edits, and its image in a is the same
    substring starting within +/-k of its home position (net indel drift
    before it), at b's own length's segmentation. So b emits its k+1
    (i, len, segment) keys and a emits (i, lb, substring) probes for every
    lb within +/-k of its length and every shift in [-k, k] — a LOSSLESS
    equi-join on segment CONTENT (proven by the brute-force differential
    in tests/test_path_similarity.py). Unlike length-only bucketing —
    which degenerates to all-pairs when every head path hits the cap
    length — selectivity comes from the segment text itself, so candidate
    counts track true near-pairs at any corpus size. Levenshtein (shared
    builtin) verifies candidates only; NULL-ts/NULL-type events are
    excluded identically on both engines (they disagree on NULL
    ordering)."""
    return user_path_pairs(_cat(spark, sf_dir).table("events"))


def user_path_pairs(ev: DataFrame) -> DataFrame:
    """Core of ``user_path_similarity`` on an arbitrary events frame —
    crafted/differential testable (tests/test_path_similarity.py pins a
    brute-force twin on random event sets, proving the segment blocking
    lossless)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        ev.filter(F.col("ts").isNotNull() & F.col("event_type").isNotNull())
        .select(
            "user_id",
            F.substring("event_type", 1, 1).alias("c"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= PATH_HEAD_EVENTS)
    )
    l = seq.groupBy("user_id").agg(
        F.concat_ws(
            "",
            F.expr("transform(array_sort(collect_list(struct(rn, c))), s -> s.c)"),
        ).alias("path"),
        F.count("*").cast("bigint").alias("path_len"),
    )
    akeys = l.select(
        "user_id",
        F.explode(
            F.expr(
                f"""flatten(transform(sequence(1, {_NSEG}), i ->
            flatten(transform(sequence(greatest(path_len - {PATH_MAX_EDITS}, 1),
                                       least(path_len + {PATH_MAX_EDITS}, {PATH_HEAD_EVENTS})), lb ->
                filter(transform(sequence(-{PATH_MAX_EDITS}, {PATH_MAX_EDITS}), s ->
                    CASE WHEN {_seg_start('i', 'lb', 'div')} + s >= 1
                         THEN struct(i AS i, lb AS lb,
                              substring(path, CAST({_seg_start('i', 'lb', 'div')} + s AS INT),
                                        CAST({_seg_len('i', 'lb', 'div')} AS INT)) AS seg)
                         ELSE NULL END),
                x -> x IS NOT NULL)))))"""
            )
        ).alias("k"),
    )
    bkeys = l.select(
        "user_id",
        F.explode(
            F.expr(
                f"""transform(sequence(1, {_NSEG}), i ->
            struct(i AS i, path_len AS lb,
                   substring(path, CAST({_seg_start('i', 'path_len', 'div')} AS INT),
                             CAST({_seg_len('i', 'path_len', 'div')} AS INT)) AS seg))"""
            )
        ).alias("k"),
    )
    a, b = akeys.alias("a"), bkeys.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.k.i") == F.col("b.k.i"))
            & (F.col("a.k.lb") == F.col("b.k.lb"))
            & (F.col("a.k.seg") == F.col("b.k.seg"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(F.col("a.user_id").alias("ua"), F.col("b.user_id").alias("ub"))
        .distinct()
    )
    x = l.select(F.col("user_id").alias("ua"), F.col("path").alias("pa"), F.col("path_len").alias("len_a"))
    y = l.select(F.col("user_id").alias("ub"), F.col("path").alias("pb"), F.col("path_len").alias("len_b"))
    dist = F.levenshtein(F.col("pa"), F.col("pb"))
    return (
        cand.join(x, "ua")
        .join(y, "ub")
        .filter(dist <= PATH_MAX_EDITS)
        .select(
            F.col("ua").alias("user_a"),
            F.col("ub").alias("user_b"),
            dist.cast("bigint").alias("dist"),
            "len_a",
            "len_b",
        )
    )


# --- interval-overlap join (binned range join) -------------------------------

INTERVAL_BIN_SECS = 3600  # ~median session length; see docstring trade note


def interval_overlap_pairs_binned(
    iv: DataFrame,
    key: str,
    start: str,
    end: str,
    bin_secs: int = INTERVAL_BIN_SECS,
) -> DataFrame:
    """All overlapping interval pairs (key_a < key_b) from one interval
    frame, WITHOUT a nested-loop join — the binned range-join strategy.

    Spark plans a pure inequality (theta) join as BroadcastNestedLoopJoin:
    O(|A| x |B|) comparisons, fine against an O(10)-row bucket table
    (q_join_range_theta) and catastrophic for a large x large interval
    overlap. The bin trick restores an EQUI join: every interval explodes
    to the epoch bins it covers, candidates are pairs sharing a bin, and
    the exact predicate verifies. Cost scales with temporal DENSITY
    (intervals alive per bin), not |A| x |B|.

    Two load-bearing details:
      1. NO dedup pass: a pair sharing k bins would surface k times, so the
         join keeps a pair only in the bin of GREATEST(start_a, start_b) —
         for genuinely overlapping intervals both sides cover that bin and
         it is unique, so each pair emerges exactly once (near-miss pairs
         in the same bin emerge once too and are dropped by the exact
         predicate). This replaces a corpus-scale distinct (a full extra
         shuffle) with a filter evaluated inside the join.
      2. bin width trades explode fan-out against candidate density: width
         ~ the median interval length keeps both ~O(1) per interval. A
         flash-crowd bin (thousands of intervals alive at once) is the
         skew case — AQE's skew-join split handles it at runtime since
         this is a plain shuffle equi-join.

    The shuffle carries only (key, start_ep, end_ep, bin) — intervals, not
    payloads; rejoin payloads to the surviving pairs if needed.
    """
    # microsecond epochs, not unix_timestamp: second-truncated endpoints
    # shift sub-second overlaps by one vs an oracle computing on full
    # precision (observed as off-by-one overlap_sec at sf0.01)
    bin_us = bin_secs * 1_000_000
    b = (
        iv.select(
            F.col(key),
            F.unix_micros(start).alias("s_ep"),
            F.unix_micros(end).alias("e_ep"),
            F.col(start).alias("s_ts"),
            F.col(end).alias("e_ts"),
        )
        .withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.floor(F.col("s_ep") / bin_us).cast("bigint"),
                    F.floor(F.col("e_ep") / bin_us).cast("bigint"),
                )
            ),
        )
    )
    a, c = b.alias("a"), b.alias("b")
    overlap_start = F.greatest(F.col("a.s_ep"), F.col("b.s_ep"))
    return (
        a.join(
            c,
            (F.col("a.bin") == F.col("b.bin"))
            & (F.col(f"a.{key}") < F.col(f"b.{key}"))
            # the one-bin-per-pair guard (detail 1 above)
            & (F.col("a.bin") == F.floor(overlap_start / bin_us).cast("bigint"))
            # exact overlap predicate, strict (positive-length overlap)
            & (F.col("a.s_ep") < F.col("b.e_ep"))
            & (F.col("b.s_ep") < F.col("a.e_ep")),
        )
        .select(
            F.col(f"a.{key}").alias(f"{key}_a"),
            F.col(f"b.{key}").alias(f"{key}_b"),
            F.col("a.s_ts").alias("a_start"),
            F.col("b.s_ts").alias("b_start"),
            F.floor(
                (F.least(F.col("a.e_ep"), F.col("b.e_ep")) - overlap_start)
                / 1_000_000
            )
            .cast("bigint")
            .alias("overlap_sec"),
        )
    )


# Session intervals derive from the SAME gaps-and-islands ground truth as
# win_session (timewindow.SESSION_ORACLE_SQL) — one rendering of the rule.
_SESS_IV_CTES = """d AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_sess
        FROM events WHERE ts IS NOT NULL AND user_id IS NOT NULL
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts,
               SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
        FROM d
    ), sess AS (
        SELECT user_id, MIN(ts) AS s_start, MAX(ts) AS s_end
        FROM s GROUP BY user_id, sess_id)"""


@query(
    "sessions_overlap_binned",
    f"""WITH {_SESS_IV_CTES}
    SELECT a.user_id AS user_id_a, b.user_id AS user_id_b,
           a.s_start AS a_start, b.s_start AS b_start,
           CAST(floor((epoch_us(LEAST(a.s_end, b.s_end))
                - epoch_us(GREATEST(a.s_start, b.s_start))) / 1000000.0)
                AS BIGINT) AS overlap_sec
    FROM sess a JOIN sess b
      ON a.user_id < b.user_id
     AND a.s_start < b.s_end AND b.s_start < a.s_end
    ORDER BY overlap_sec DESC, user_id_a, user_id_b, a_start, b_start
    LIMIT 100""",
)
def q_sessions_overlap_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-presence: the top-100 longest overlaps between DIFFERENT users'
    activity sessions — a large x large interval-overlap join (every user's
    sessions against every other user's), the query shape Spark would
    otherwise plan as an O(n^2) BroadcastNestedLoopJoin. Runs as the binned
    equi-join (interval_overlap_pairs_binned): candidates scale with
    sessions-alive-per-hour, not sessions^2; the oracle replays the naive
    inequality join, which DuckDB can afford at sf0.01. Deterministic
    top-100 via a total order (overlap desc, users, starts). Plan pinned by
    tests/test_plan_hygiene.py: zero BroadcastNestedLoopJoin, candidates
    flow through a hash equi-join."""
    ev = _cat(spark, sf_dir).table("events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
    )
    # native session_window — ONE aggregate, the same 30-min/>= boundary
    # islands as q_win_session (timewindow.py) and the oracle CTE, with
    # full microsecond precision built in (an earlier hand-rolled
    # lag+cumsum rendering here truncated the gap test to seconds and split
    # a 1799.9s-gap session the oracle kept together — reusing the
    # engine's established session operator removes that whole class)
    sess = (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
        .select("user_id", "s_start", "s_end")
    )
    pairs = interval_overlap_pairs_binned(sess, "user_id", "s_start", "s_end")
    return (
        pairs.select(
            F.col("user_id_a"),
            F.col("user_id_b"),
            "a_start",
            "b_start",
            "overlap_sec",
        )
        .orderBy(
            F.desc("overlap_sec"), "user_id_a", "user_id_b", "a_start", "b_start"
        )
        .limit(100)
    )
