#!/bin/bash
# End-of-round snapshot: refresh the local ledgers and stage every round
# artifact so `git status` is clean when the driver takes over (r5 verdict
# #1 — artifact tracking is mechanical now, not willpower).
#
# Usage: bash tools/snapshot_round.sh [--skip-bench] [--skip-oracle]
#            [--skip-sf01] [--skip-windows] [--commit]
set -euo pipefail
cd "$(dirname "$0")/.."

SKIP_BENCH=0
SKIP_ORACLE=0
SKIP_SF01=0
SKIP_WINDOWS=0
DO_COMMIT=0
for a in "$@"; do
    case "$a" in
        --skip-bench) SKIP_BENCH=1 ;;
        --skip-oracle) SKIP_ORACLE=1 ;;
        --skip-sf01) SKIP_SF01=1 ;;
        --skip-windows) SKIP_WINDOWS=1 ;;
        --commit) DO_COMMIT=1 ;;
    esac
done

if [ "$SKIP_WINDOWS" -eq 0 ]; then
    # The global-window audit regenerates WINDOWS.md with EVERY snapshot
    # (r11 verdict #2: the committed audit sat one query behind the
    # registry) and FAILS the snapshot on an undocumented partition-less
    # Window node — a new single-partition sort cannot slide through.
    echo "== window audit (regenerates WINDOWS.md; fails on undocumented) =="
    python tools/window_audit.py /root/testdata/sf0.01 > /tmp/window_audit.log \
        || { tail -5 /tmp/window_audit.log; echo "WINDOW AUDIT FAILED"; exit 1; }
    grep -E "^Queries audited|^wrote" WINDOWS.md /tmp/window_audit.log 2>/dev/null | tail -2 || true
fi

if [ "$SKIP_ORACLE" -eq 0 ]; then
    echo "== driver_sim (full registry oracle check, sf0.01) =="
    python tools/driver_sim.py /root/testdata/sf0.01 CORRECTNESS_LOCAL.json
fi

if [ "$SKIP_SF01" -eq 0 ]; then
    # The sf0.1 sweep runs in the SNAPSHOT, not on demand (r10 verdict #1:
    # the committed SF01 ledger went a whole round stale while COVERAGE.md
    # cited it — mechanical refresh, not willpower). It has caught real
    # bugs the smaller scales never exercised (the round-6 session-gap
    # precision bug).
    echo "== driver_sim (full registry oracle check, sf0.1) =="
    python tools/driver_sim.py /root/testdata/sf0.1 CORRECTNESS_LOCAL_SF01.json
fi

if [ "$SKIP_BENCH" -eq 0 ]; then
    echo "== bench (sf0.1) =="
    # bench to a temp file first: piping straight into `grep | head -1`
    # under pipefail can kill the whole script with SIGPIPE (head exits
    # after line 1, grep's write of line 2 gets EPIPE -> exit 141) and
    # discard the run's bookkeeping. First metric line = the FULL
    # per-query dump (the last is the driver-facing trimmed summary);
    # keep the full one locally for scale_stress + bench_compare.
    BENCH_OUT=$(mktemp)
    python bench.py > "$BENCH_OUT"
    # BENCH_LOCAL.json: per-query best-of ledger RE-ANCHORED to the fresh
    # run (r8 advice — the old forever-minima form could never show a
    # regression, kept removed/renamed queries forever, and let an errored
    # query keep its stale passing time). Now: "queries" = min(old best,
    # fresh) over queries GREEN IN THE FRESH RUN only; "latest" = the fresh
    # run unmerged (so best-vs-latest makes regressions visible);
    # vanished/errored names are listed under "pruned"/"errors_latest".
    grep '^{"metric"' "$BENCH_OUT" | head -1 > /tmp/bench_snapshot_run.json
    rm -f "$BENCH_OUT"
    python - <<'PYEOF'
import json, os
new = json.load(open("/tmp/bench_snapshot_run.json"))
old_best = {}
if os.path.exists("BENCH_LOCAL.json"):
    old_best = dict(json.load(open("BENCH_LOCAL.json")).get("queries", {}))
q = {k: min(v, old_best[k]) if k in old_best else v
     for k, v in new["queries"].items()}
out = {
    "metric": new["metric"], "unit": new.get("unit", "sec"),
    "sf": new.get("sf"),
    "value": round(sum(q.values()), 3),
    "value_latest": round(sum(new["queries"].values()), 3),
    "queries": q,
    "latest": new["queries"],
}
if new.get("index_skew"):
    # the skew drift signal rides the fresh run verbatim (round-13 verdict
    # task 6) — a value, not a timing, so no best-of merging applies
    out["index_skew"] = new["index_skew"]
if new.get("errors"):
    out["errors_latest"] = new["errors"]
pruned = sorted(set(old_best) - set(q))
if pruned:
    out["pruned"] = pruned
json.dump(out, open("BENCH_LOCAL.json", "w"), indent=1)
print(out["value"], "s (best-of) /", out["value_latest"], "s (latest),",
      len(q), "queries,", len(new.get("errors", {})), "errors,",
      len(pruned), "pruned")
PYEOF
    echo "== vs previous round =="
    # sort -V: lexicographic sort would pick r9 over r10 once rounds hit
    # two digits and silently re-baseline away a whole round's regressions
    PREV=$(ls BENCH_r*.json 2>/dev/null | sort -V | tail -1)
    [ -n "$PREV" ] && python tools/bench_compare.py "$PREV" BENCH_LOCAL.json || true
fi

echo "== staging round artifacts =="
git add -- BENCH_r*.json CORRECTNESS_r*.json BENCH_LOCAL.json \
    CORRECTNESS_LOCAL.json CORRECTNESS_LOCAL_SF01.json 2>/dev/null || true
git add -- SURVEY.md COVERAGE.md SCALE.md PLANS.md FIXTURES.md \
    WINDOWS.md 2>/dev/null || true
git status --short

# Staged-but-uncommitted ledgers were the r11 verdict's #1 finding: the
# round's claims cited evidence newer than HEAD. Close the loop HERE —
# either commit now (--commit) or fail loudly so the caller cannot forget.
# The check diffs ONLY the artifact pathspecs: a user's unrelated staged
# files must neither trigger the failure nor break the constrained commit.
ARTIFACTS=(BENCH_r*.json CORRECTNESS_r*.json BENCH_LOCAL.json \
    CORRECTNESS_LOCAL.json CORRECTNESS_LOCAL_SF01.json \
    SURVEY.md COVERAGE.md SCALE.md PLANS.md FIXTURES.md WINDOWS.md)
if ! git diff --cached --quiet -- "${ARTIFACTS[@]}"; then
    if [ "$DO_COMMIT" -eq 1 ]; then
        # pathspec-constrained: commit ONLY the artifacts this script
        # staged — a bare `git commit` would sweep any unrelated changes
        # the user had staged into the ledger-refresh commit
        git commit -m "Refresh round ledgers (oracle sweeps, bench, window audit)" \
            -- "${ARTIFACTS[@]}"
        echo "== ledgers committed =="
    else
        echo ""
        echo "!!! LEDGERS ARE STAGED BUT NOT COMMITTED — the round's evidence"
        echo "!!! chain is open. Commit them (or re-run with --commit):"
        echo "!!!     git commit -m 'round N: refresh ledgers'"
        exit 2
    fi
fi
