"""Entity resolution: blocked fuzzy matching over identifier strings.

The reference's record_id is an exact string key (app/models.py:11); real
pipelines also need the APPROXIMATE form — "are these two records the same
entity, modulo a typo?" — for customer/vendor dedupe and record linkage.
The non-negotiable scale rule is the same as text near-dup: never compare
all pairs. Candidate generation must be an equi-join on a BLOCK key, with
the expensive string distance computed only on candidates.

Blocking scheme here: the two-piece pigeonhole split over POSITION
PARITY. For equal-length strings, a pair within substitution distance 1
(Hamming <= 1) differs in at most ONE position; that position is either
odd or even, so the pair agrees EXACTLY on the characters at the other
parity. Two equi-joins (one per parity mask) therefore find every such
pair: the blocking is provably lossless for the distance it targets, not
a heuristic. The verify stage then computes the true distance on
candidates only (Hamming in general; at k=1 it coincides with
Levenshtein on equal-length strings, which is what the DuckDB oracle
replays bit-for-bit). General edit distance (insertions /
deletions) generalizes the same shape to q-gram blocks; the join
geometry is unchanged.

Why parity masks and not two CONTIGUOUS slices (prefix/suffix): block
sizes. Identifier-like strings concentrate their entropy in the
low-order tail — on sequential 'Customer#00001234' names, a prefix slice
puts tens of thousands of records in ONE block (measured: ~62M candidate
pairs at sf0.1), the all-pairs blow-up blocking exists to prevent.
Interleaving by parity routes some high-entropy positions into EACH
mask, so both block families stay small (~1.7M candidates on the same
data, 35x less) with the identical losslessness proof — any partition of
positions into two sets satisfies the pigeonhole argument.

Scale: each record emits exactly 2 slim (kind, mask-key) rows; the
self-join key bounds the comparison fan-out to records sharing a mask;
nothing is ever all-pairs, and the distance function never sees
non-candidates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog
from temporalvault_spark.registry import query

MAX_EDIT = 1

# chars at 1-indexed positions congruent to `keep` mod `groups` — the
# pigeonhole masks: a pair with <= k substituted positions leaves at least
# one of the k+1 position groups untouched, and the pair agrees exactly
# on THAT group's mask. (The mask must be a single group, not the
# complement of one: k >= 2 edits can land in k different groups, so no
# drop-one-group mask avoids them all, but some keep-one-group mask does.)
_MASK_SPARK = (
    "concat_ws('', transform(sequence(1, length(name)), "
    "i -> CASE WHEN i % {groups} = {keep} THEN substring(name, i, 1) ELSE '' END))"
)
_MASK_DUCK = (
    "list_aggregate(list_transform(range(1, len(name) + 1), "
    "i -> CASE WHEN i % {groups} = {keep} THEN name[i] ELSE '' END), 'string_agg', '')"
)


def fuzzy_name_pairs(
    df: DataFrame, id_col: str, name_col: str, max_edit: int = MAX_EDIT
) -> DataFrame:
    """(id_a, id_b, edit_dist): pairs whose names are within ``max_edit``
    SUBSTITUTIONS (Hamming distance, equal lengths), found via pigeonhole
    mask blocking. Keys carry the name length so different-length names
    never share a block; insert/delete tolerance needs q-gram blocking
    instead.

    General in k: ``max_edit=k`` uses k+1 position groups (i mod k+1) and
    one mask per KEPT group — <= k edited positions touch <= k groups, so
    some group is untouched and the pair agrees on that group's mask.
    Candidate volume grows as masks shrink (each keeps 1/(k+1) of the
    string), the usual recall/cost dial of blocking.

    The verify stage filters on HAMMING distance (position-wise, equal
    lengths guaranteed by the key), not Levenshtein: for k >= 2 a
    Levenshtein filter would admit a position-DEPENDENT subset of
    ham>k/lev<=k pairs (only those whose edits happen to spare a mask) —
    a nondeterministic contract. Hamming makes the output exactly the
    guaranteed class for every k; at k=1 the two coincide on equal-length
    pairs, which is why the registered oracle's levenshtein replay is
    bit-identical."""
    if max_edit < 1:
        raise ValueError(f"max_edit must be >= 1, got {max_edit}")
    groups = max_edit + 1
    base = df.select(F.col(id_col).alias("id"), F.col(name_col).alias("name"))
    blocks = base.select(
        "id",
        "name",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("kind"),
                        F.concat_ws(
                            "#",
                            F.length("name"),
                            F.expr(_MASK_SPARK.format(groups=groups, keep=d)),
                        ).alias("bkey"),
                    )
                    for d in range(groups)
                ]
            )
        ).alias("b"),
    ).select("id", "name", F.col("b.kind").alias("kind"), F.col("b.bkey").alias("bkey"))
    a, b = blocks.alias("a"), blocks.alias("b")
    cand = a.join(
        b,
        (F.col("a.kind") == F.col("b.kind"))
        & (F.col("a.bkey") == F.col("b.bkey"))
        & (F.col("a.id") < F.col("b.id")),
    ).select(
        F.col("a.id").alias("id_a"),
        F.col("a.name").alias("name_a"),
        F.col("b.id").alias("id_b"),
        F.col("b.name").alias("name_b"),
    )
    # a pair may collide in up to k+1 masks: verify FIRST (the distance on
    # the few duplicate occurrences is cheap), then dedupe on the slim
    # (ids, dist) projection — names never ride the distinct's exchange
    ham = F.expr(
        "aggregate(sequence(1, length(name_a)), 0, (acc, i) -> "
        "acc + IF(substring(name_a, i, 1) != substring(name_b, i, 1), 1, 0))"
    )
    # LOSSLESS prefilter before the expensive distance: levenshtein is a
    # LOWER bound on Hamming (every substitution is one edit), so
    # ham <= k implies lev <= k and no true pair is dropped. The builtin is
    # codegen'd JVM and the THRESHOLD form aborts the DP early (returns -1
    # above max_edit); the Hamming fold is an INTERPRETED higher-order
    # aggregate, so it must only ever see the lev-survivors (~output-sized),
    # never the full candidate set (~1.9M on the sf0.1 sequential names —
    # running the fold there dominated the operator, 18.5s; prefiltered:
    # ~7s, join + codegen'd lev + slim distinct).
    lv = F.levenshtein("name_a", "name_b", max_edit)
    pre = cand.withColumn("lv", lv).filter(F.col("lv") >= 0)
    if max_edit == 1:
        # at k=1 Hamming == Levenshtein on equal-length strings (one
        # substitution), so the interpreted fold is skipped entirely
        verified = pre.withColumn("edit_dist", F.col("lv").cast("bigint"))
    else:
        verified = pre.withColumn("edit_dist", ham.cast("bigint")).filter(
            F.col("edit_dist") <= max_edit
        )
    return verified.select("id_a", "id_b", "edit_dist").distinct()


# DuckDB replay of fuzzy_name_pairs over customer (shared by the pairs
# oracle and the resolve oracle's recursive closure)
_FUZZY_PAIRS_SQL = f"""WITH c AS (SELECT c_custkey AS id, c_name AS name FROM customer),
    b AS (
        SELECT id, name, kind,
               len(name) || '#' ||
               COALESCE(CASE kind WHEN 0 THEN {_MASK_DUCK.format(groups=2, keep=0)}
                                  ELSE {_MASK_DUCK.format(groups=2, keep=1)} END, '') AS bkey
        FROM c CROSS JOIN (SELECT unnest([0, 1]) AS kind) k),
    cand AS (
        SELECT DISTINCT a.id AS id_a, a.name AS name_a,
                        b2.id AS id_b, b2.name AS name_b
        FROM b a JOIN b b2
          ON a.kind = b2.kind AND a.bkey = b2.bkey AND a.id < b2.id)
    SELECT id_a, id_b, CAST(levenshtein(name_a, name_b) AS BIGINT) AS edit_dist
    FROM cand WHERE levenshtein(name_a, name_b) <= {MAX_EDIT}"""


@query("er_fuzzy_name_pairs", _FUZZY_PAIRS_SQL)
def q_er_fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-identical customer names (one-character difference) via
    lossless two-slice blocking + Levenshtein verify on candidates only."""
    cust = load_catalog(spark, sf_dir).table("customer")
    return fuzzy_name_pairs(cust, "c_custkey", "c_name")


MAX_CLUSTER_SIZE = 100


def resolve_entities(
    df: DataFrame,
    id_col: str,
    name_col: str,
    max_edit: int = MAX_EDIT,
    max_cluster_size: int | None = MAX_CLUSTER_SIZE,
) -> DataFrame:
    """The APPLY step of entity resolution: fuzzy matches are pairwise, but
    identity is transitive (a~b, b~c => one entity even when lev(a,c) = 2),
    so pairs become clusters via connected components and every record maps
    to a canonical id (the cluster's minimum — same survivor rule as
    dedup_apply). Records with no fuzzy neighbor are their own canonical.

    Over-merge guard (DEFAULTED ON): threshold-transitive ER has a classic
    degenerate mode — on near-sequential identifiers every record chains
    into one giant component (observed on the synthetic customer names:
    the whole table collapsed to a single entity in round 3). A component
    larger than ``max_cluster_size`` is overwhelming evidence the
    threshold, not the data, created the merge, so the guard REJECTS it:
    its members stay their own canonical and are flagged
    ``cluster_rejected`` for operator review. This is also the scale
    guard — one giant component concentrates the label-propagation hub
    and the apply-join on a single key. ``max_cluster_size=None``
    disables (round-3 behavior).

    Scale: the pair graph is tiny relative to the table (bounded by the
    blocking), components run on ids only (operators/dedup_cluster — the
    O(log d) label-propagation loop with its small-graph fast path), and
    the final mapping is one left join of slim (id, canonical, size)
    labels back onto the record ids."""
    from temporalvault_spark.operators.dedup_cluster import connected_components

    # components' small-graph fast path labels NUMERIC node ids; fail
    # loudly on string keys instead of mislabeling numeric-looking ones
    id_type = dict(df.dtypes)[id_col]
    if id_type not in ("bigint", "int", "smallint", "tinyint"):
        raise ValueError(
            f"resolve_entities requires an integral id column, got "
            f"{id_type!r} — map ids to dense integers first"
        )
    pairs = fuzzy_name_pairs(df, id_col, name_col, max_edit=max_edit)
    edges = pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    comps = connected_components(edges)
    sizes = comps.groupBy("component").agg(F.count("*").alias("cluster_n"))
    labels = comps.join(sizes, "component").select(
        F.col("node").alias("id"),
        F.col("component").alias("comp_id"),
        "cluster_n",
    )
    base = df.select(F.col(id_col).alias("id"))
    rejected = (
        F.lit(False)
        if max_cluster_size is None
        else F.coalesce(F.col("cluster_n") > max_cluster_size, F.lit(False))
    )
    return (
        base.join(labels, "id", "left")
        .withColumn("cluster_rejected", rejected)
        .select(
            "id",
            F.when(F.col("cluster_rejected"), F.col("id"))
            .otherwise(F.coalesce("comp_id", F.col("id")))
            .alias("canonical_id"),
            "cluster_rejected",
        )
        .withColumn("is_canonical", F.col("id") == F.col("canonical_id"))
    )


# Oracled since round 4 (was rows-only): the iterative components step is
# replayed as recursive-CTE MIN-LABEL PROPAGATION (same twin shape as
# dedup_components) — each round emits at most one improved (node, label)
# row per node (the GROUP BY in the recursive term), so total work is
# O(nodes · diameter), not the O(nodes²) of a full reachability closure
# (measured 15x cheaper on the near-complete sequential-name component).
# The size guard is one CASE over the per-component counts.
_RESOLVE_ORACLE = f"""WITH RECURSIVE pairs AS ({_FUZZY_PAIRS_SQL}),
sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
        UNION ALL SELECT id_b, id_a FROM pairs),
walk(node, lbl) AS (
    SELECT src, src FROM sym
    UNION
    SELECT s.dst, MIN(w.lbl) FROM walk w JOIN sym s ON s.src = w.node
    GROUP BY s.dst
),
comp AS (SELECT node, MIN(lbl) AS comp_id FROM walk GROUP BY node),
sizes AS (SELECT comp_id, COUNT(*) AS cluster_n FROM comp GROUP BY comp_id),
lab AS (SELECT node, comp.comp_id, cluster_n FROM comp JOIN sizes USING (comp_id))
SELECT c.c_custkey AS id,
       CAST(CASE WHEN lab.node IS NULL OR lab.cluster_n > {MAX_CLUSTER_SIZE}
                 THEN c.c_custkey ELSE lab.comp_id END AS BIGINT) AS canonical_id,
       COALESCE(lab.cluster_n > {MAX_CLUSTER_SIZE}, FALSE) AS cluster_rejected,
       (CASE WHEN lab.node IS NULL OR lab.cluster_n > {MAX_CLUSTER_SIZE}
             THEN c.c_custkey ELSE lab.comp_id END) = c.c_custkey AS is_canonical
FROM customer c LEFT JOIN lab ON lab.node = c.c_custkey"""


@query("er_resolve_entities", _RESOLVE_ORACLE)
def q_er_resolve_entities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On the synthetic SEQUENTIAL names the raw transitive closure chains
    the whole table into ONE component (every name is Hamming-1 from a
    digit-neighbor) — the classic over-merge failure of
    threshold-transitive ER. The max_cluster_size guard (default 100)
    rejects that degenerate merge, so the shipped output keeps every
    record its own canonical with cluster_rejected=true; crafted
    unit tests pin the sparse-graph behavior where real merges survive."""
    cust = load_catalog(spark, sf_dir).table("customer")
    return resolve_entities(cust, "c_custkey", "c_name")
