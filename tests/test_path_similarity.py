"""Behavioral trajectory similarity: crafted trajectories with known edit
distances, plus a brute-force differential on random event sets proving
the length-bucket blocking lossless (the sf testdata exercises only the
sparse tail of the match space)."""

from __future__ import annotations

import datetime as dt
import functools
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from temporalvault_spark.operators.temporal_analytics import (
    PATH_HEAD_EVENTS,
    PATH_MAX_EDITS,
    user_path_pairs,
)

T0 = dt.datetime(2024, 1, 1)


def _lev(a: str, b: str) -> int:
    @functools.lru_cache(maxsize=None)
    def d(i, j):
        if i == 0:
            return j
        if j == 0:
            return i
        return min(d(i - 1, j) + 1, d(i, j - 1) + 1, d(i - 1, j - 1) + (a[i - 1] != b[j - 1]))

    out = d(len(a), len(b))
    d.cache_clear()
    return out


def _events_df(spark, seqs: dict[int, list[str]]):
    rows = []
    eid = 0
    for uid, types in seqs.items():
        for i, t in enumerate(types):
            rows.append((eid, T0 + dt.timedelta(minutes=i), uid, t, 1.0, "{}"))
            eid += 1
    return spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, "
        "value double, props string",
    )


def _brute(seqs: dict[int, list[str]]):
    paths = {
        u: "".join(t[0] for t in types[:PATH_HEAD_EVENTS])
        for u, types in seqs.items()
        if types
    }
    out = {}
    for a, b in itertools.combinations(sorted(paths), 2):
        if abs(len(paths[a]) - len(paths[b])) <= PATH_MAX_EDITS:
            dv = _lev(paths[a], paths[b])
            if dv <= PATH_MAX_EDITS:
                out[(a, b)] = dv
    return out


def test_crafted_trajectories(spark):
    seqs = {
        1: ["view", "click", "purchase", "view"],  # vcpv
        2: ["view", "click", "purchase", "view"],  # identical -> dist 0
        3: ["view", "click", "error", "view"],  # one substitution -> dist 1
        4: ["signup", "error", "signup", "error"],  # sese: dist 4 from vcpv -> out
        5: ["view"],  # len 1 vs 4: length gap > k -> excluded before verify
    }
    got = {
        (r["user_a"], r["user_b"]): r["dist"]
        for r in user_path_pairs(_events_df(spark, seqs)).collect()
    }
    assert got == {(1, 2): 0, (1, 3): 1, (2, 3): 1}


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
@given(
    seqs=st.dictionaries(
        st.integers(1, 6),
        st.lists(
            st.sampled_from(["view", "click", "purchase", "signup", "error"]),
            min_size=1,
            max_size=10,
        ),
        min_size=2,
        max_size=6,
    )
)
def test_matches_brute_force(spark, seqs):
    """The blocked pipeline must equal all-pairs brute force exactly —
    pair set AND distances — on random trajectories, including lengths
    spanning bucket boundaries (the losslessness claim, tested)."""
    got = {
        (r["user_a"], r["user_b"]): r["dist"]
        for r in user_path_pairs(_events_df(spark, seqs)).collect()
    }
    assert got == _brute(seqs)
