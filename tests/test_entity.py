"""Entity resolution (operators/entity.py): the two-slice blocking must be
LOSSLESS for its target class (equal-length, substitution distance <= 1)
and the verify stage exact — proven by a brute-force differential."""

from __future__ import annotations

import itertools

from temporalvault_spark.operators.entity import fuzzy_name_pairs


def _lev(a, b):
    # textbook DP, the independent reference implementation
    m, n = len(a), len(b)
    d = list(range(n + 1))
    for i in range(1, m + 1):
        prev, d[0] = d[0], i
        for j in range(1, n + 1):
            prev, d[j] = d[j], min(
                d[j] + 1, d[j - 1] + 1, prev + (a[i - 1] != b[j - 1])
            )
    return d[n]


def test_blocking_lossless_and_verify_exact(spark):
    names = [
        "Customer#000000001",
        "Customer#000000002",   # differs from #1 in slice B -> pair
        "Customer#000010001",   # differs from #1 in slice A -> pair
        "Customer#000010002",   # 2 edits vs #1 at even positions 14,18: shares the odd mask, verify rejects
        "Customer#000000099",   # 2 edits vs #1 at positions 17,18 (odd+even): shares no mask
        "Customer#00000000",    # shorter name: length rides the key, never a candidate
    ]
    rows = [(i, n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "id bigint, name string")
    got = {
        (r["id_a"], r["id_b"]): r["edit_dist"]
        for r in fuzzy_name_pairs(df, "id", "name").collect()
    }
    # brute-force ground truth for the GUARANTEED class: equal length,
    # Hamming <= 1 — every such pair must be present
    for (i, a), (j, b) in itertools.combinations(enumerate(names), 2):
        if len(a) == len(b):
            ham = sum(x != y for x, y in zip(a, b))
            if ham <= 1:
                assert (i, j) in got, (a, b)
    # precision: nothing with true distance > 1 survives
    for (i, j), dist in got.items():
        true = _lev(names[i], names[j])
        assert true <= 1 and dist == true, (names[i], names[j])
    # double edits: positions 14,18 (both even) share the odd mask — a
    # candidate that verify rejects; positions 17,18 (odd+even) share no
    # mask — never even a candidate
    assert (0, 3) not in got
    assert (0, 4) not in got
    # different-length names never share a block (length rides the key)
    assert (0, 5) not in got


def test_fuzzy_pairs_on_catalog(spark, sf_dir):
    from temporalvault_spark.operators.entity import q_er_fuzzy_name_pairs

    out = q_er_fuzzy_name_pairs(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert all(r["edit_dist"] <= 1 for r in rows)
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_randomized_differential_vs_bruteforce(spark):
    """Random names over a tiny alphabet: the blocked operator must equal
    the O(n^2) brute force exactly on the equal-length Hamming<=k class,
    for k = 1 and k = 2 (k+1 pigeonhole masks)."""
    import random

    rng = random.Random(11)
    names = sorted({"".join(rng.choice("ab") for _ in range(6)) for _ in range(40)})
    rows = [(i, n) for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "id bigint, name string")
    for k in (1, 2):
        got = {
            (r["id_a"], r["id_b"]): r["edit_dist"]
            for r in fuzzy_name_pairs(df, "id", "name", max_edit=k).collect()
        }
        expected = {}
        for (i, a), (j, b) in itertools.combinations(enumerate(rows), 2):
            na, nb = a[1], b[1]
            if len(na) == len(nb):
                ham = sum(x != y for x, y in zip(na, nb))
                if ham <= k:
                    expected[(i, j)] = _lev(na, nb)
        # losslessness: every Hamming<=k pair found with its true distance
        for key, dist in expected.items():
            assert got.get(key) == dist, (key, k)
        # precision: nothing beyond max_edit survives
        for (i, j), dist in got.items():
            assert _lev(names[i], names[j]) == dist <= k, (names[i], names[j], k)


def test_resolve_entities_transitive_chain(spark):
    """a~b and b~c (each lev 1) but lev(a,c) = 2: transitivity must put all
    three under one canonical id; an unrelated record stays its own."""
    from temporalvault_spark.operators.entity import resolve_entities

    rows = [
        (10, "Customer#000000001"),
        (11, "Customer#000000002"),  # lev 1 vs 10
        (12, "Customer#000000022"),  # lev 1 vs 11, lev 2 vs 10
        (13, "Customer#000099999"),  # no neighbors
    ]
    df = spark.createDataFrame(rows, "id bigint, name string")
    got = {r["id"]: (r["canonical_id"], r["is_canonical"]) for r in resolve_entities(df, "id", "name").collect()}
    assert got[10] == (10, True)
    assert got[11] == (10, False)
    assert got[12] == (10, False)
    assert got[13] == (13, True)
    # the guard never fires on a legitimate sparse graph
    flags = {r["id"]: r["cluster_rejected"] for r in resolve_entities(df, "id", "name").collect()}
    assert flags == {10: False, 11: False, 12: False, 13: False}


def test_resolve_entities_overmerge_guard(spark):
    """Sequential identifiers chain the WHOLE table into one component —
    the classic threshold-transitive over-merge. With the guard defaulted
    on (max_cluster_size), the degenerate merge is rejected: every record
    stays its own canonical, flagged cluster_rejected; with the guard
    disabled (None) the round-3 collapse is reproduced."""
    from temporalvault_spark.operators.entity import resolve_entities

    rows = [(i, f"Customer#{i:09d}") for i in range(1, 31)]
    df = spark.createDataFrame(rows, "id bigint, name string")

    guarded = resolve_entities(df, "id", "name", max_cluster_size=10).collect()
    assert all(r["canonical_id"] == r["id"] and r["is_canonical"] for r in guarded)
    assert all(r["cluster_rejected"] for r in guarded)

    raw = resolve_entities(df, "id", "name", max_cluster_size=None).collect()
    n_clusters = len({r["canonical_id"] for r in raw})
    assert n_clusters == 1  # the collapse the guard exists to stop
    assert not any(r["cluster_rejected"] for r in raw)
