#!/usr/bin/env python
"""Audit global (partition-less) Window nodes across the whole registry.

Spark logs "No Partition Defined for Window operation! Moving all data to a
single partition" for every WindowExec with an empty partitionSpec. Most of
this repo's occurrences are known-bounded (the window runs on a frame that
is small BY CONSTRUCTION — a top-k slice, a 1-row aggregate, a sub-bucket
recursion leaf), but nothing used to enumerate which registered queries
trigger the warning and why each is safe. This tool does: it plans every
registered query at the given sf_dir, finds Window/WindowInPandas nodes
whose partition spec is empty, checks each triggering query against the
BOUNDED ledger below, regenerates WINDOWS.md, and exits non-zero if an
UNDOCUMENTED global window appears — so a new operator that sneaks in an
unbounded single-partition sort fails the round's audit instead of
becoming a 100 TB cliff.

Run from the repo root (after any registry change):

    python tools/window_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from temporalvault_spark.session import get_spark

# query name -> why its global window is bounded (reviewed, not guessed).
# A query listed here is ASSERTED to keep its partition-less window frame
# O(k) or O(grid), never O(corpus) — except where the note says the global
# order IS the query's semantics and names the scalable twin.
BOUNDED: dict[str, str] = {
    "corpus_select_token_budget": (
        "the exact prefix-sum window runs ONLY on the boundary bucket after "
        "_edge_select's recursive prefix-cut (corpus.py) — <= edge_rows rows "
        "by construction at ANY corpus size; the recursion unit forces a "
        "tiny bucket and pins it (tests/test_corpus.py)"
    ),
    "keys_alive_daily": (
        "the running sum rides the DAY GRID, not the record log: one "
        "min-per-key aggregate is the only data-sized pass, then the window "
        "sees one row per calendar day in the log's range — grows with the "
        "calendar, not the data"
    ),
    "retrieval_rrf_topk": (
        "both rank windows run AFTER TakeOrderedAndProject cut each "
        "retriever to top-DEPTH rows — <= DEPTH rows per window by "
        "construction (explain_audit note; fusion joins DEPTH-row frames)"
    ),
    "win_ntile_ranks": (
        "semantically a GLOBAL ranked report — the output is the sorted "
        "table, so one ordered pass is the query's meaning at any engine; "
        "for the 100 TB form use win_ntile_ranks_scalable, the value-hash-"
        "identical twin with range partitioning + broadcast rank offsets "
        "and ZERO global windows"
    ),
}


def top_bracket_groups(s: str) -> list[str]:
    """Top-level [...] groups of a plan node line (brackets nest inside
    window specs and array literals, so track depth)."""
    groups: list[str] = []
    depth, cur = 0, []
    for ch in s:
        if ch == "[":
            depth += 1
            if depth == 1:
                cur = []
                continue
        elif ch == "]":
            depth -= 1
            if depth == 0:
                groups.append("".join(cur))
                continue
        if depth >= 1:
            cur.append(ch)
    return groups


def global_window_lines(plan: str) -> list[str]:
    """Plan lines holding a Window/WindowInPandas node with NO partition
    spec. A fully-specified Window prints three top-level bracket groups
    ([functions], [partition], [order]); two groups mean either
    partition-only (an unordered per-group aggregate — fine, it does NOT
    move data to one partition) or order-only (the global window this
    audit hunts) — told apart by the second group's content: an order spec
    carries ASC/DESC sort directions, a partition spec is a bare column
    list. ONE group means no partition AND no order (e.g. a global
    unbounded-frame total, sum(x).over(Window.partitionBy())) — also a
    single-partition funnel, also flagged (a review pass found the
    two-group-only heuristic blind to exactly that shape)."""
    out = []
    for line in plan.splitlines():
        t = line.strip().lstrip("+-: *")
        if t.startswith(("Window ", "WindowInPandas ")):
            groups = top_bracket_groups(t)
            if len(groups) == 1 or (
                len(groups) == 2 and (" ASC" in groups[1] or " DESC" in groups[1])
            ):
                out.append(t[:160])
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("window-audit", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")

    import temporalvault_spark.operators  # noqa: F401
    from temporalvault_spark.registry import QUERIES

    hits: dict[str, list[str]] = {}
    errors: dict[str, str] = {}
    for i, (name, fn) in enumerate(QUERIES.items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
            lines = global_window_lines(plan)
            if lines:
                hits[name] = lines
        except Exception as e:  # noqa: BLE001 — record, keep auditing
            errors[name] = f"{type(e).__name__}: {e}"[:200]
        print(f"[{i:3d}/{len(QUERIES)}] {name}: "
              f"{len(hits.get(name, []))} global window(s)", flush=True)

    undocumented = sorted(set(hits) - set(BOUNDED))
    stale = sorted(set(BOUNDED) - set(hits))

    lines = [
        "# WINDOWS — global-window audit (generated by tools/window_audit.py)",
        "",
        f"Source data: `{sf_dir}`. Every registered query whose physical plan",
        "contains a Window node with NO partition spec (the \"No Partition",
        "Defined for Window operation\" warning), with the reviewed argument",
        "for why that frame is bounded by construction. The audit FAILS on",
        "an undocumented entry, so additions to this list are deliberate.",
        "",
        f"Queries audited: {len(QUERIES)}; triggering: {len(hits)}; "
        f"undocumented: {len(undocumented)}.",
        "",
        "| query | bounded because | node |",
        "|---|---|---|",
    ]
    for name in sorted(hits):
        why = BOUNDED.get(name, "**UNDOCUMENTED — review required**")
        node = hits[name][0].replace("|", "\\|")
        lines.append(f"| {name} | {why} | `{node[:90]}` |")
    if stale:
        lines += ["", f"Stale BOUNDED entries (no longer triggering): {stale}"]
    if errors:
        lines += ["", f"Queries that failed to plan: {errors}"]

    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "WINDOWS.md"
    )
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    if undocumented:
        print(f"UNDOCUMENTED global windows in: {undocumented}")
    spark.stop()
    return 1 if undocumented or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
