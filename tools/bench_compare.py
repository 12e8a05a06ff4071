#!/usr/bin/env python
"""Compare two bench JSONs query-by-query and flag real movement.

Round-over-round perf watching was ad hoc (r5 flagged two +20-30% entries
that a quiet-machine re-run proved to be ambient noise); this makes the
comparison mechanical. Queries present in both files are classified:

  REGRESSED  slower by > threshold (default 20%) and > 0.15s absolute
             (sub-noise-floor deltas on sub-second queries are jitter)
  IMPROVED   faster by the same margins
  ~          within margins

Usage: python tools/bench_compare.py OLD.json NEW.json [threshold_pct]
Accepts either the full bench dump or a driver artifact with a "parsed"
wrapper. Exits 1 if anything REGRESSED (so it can gate a round snapshot).
"""

from __future__ import annotations

import json
import sys

ABS_FLOOR_SEC = 0.15


def load_queries(path: str) -> dict[str, float]:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    return d.get("queries", {})


def main() -> int:
    old_path, new_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) / 100 if len(sys.argv) > 3 else 0.20
    old, new = load_queries(old_path), load_queries(new_path)

    shared = sorted(set(old) & set(new))
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))

    regressed, improved = [], []
    for q in shared:
        a, b = old[q], new[q]
        delta = b - a
        if abs(delta) < ABS_FLOOR_SEC or a <= 0:
            continue
        if delta / a > thresh:
            regressed.append((q, a, b, delta / a))
        elif -delta / a > thresh:
            improved.append((q, a, b, delta / a))

    tot_old = sum(old[q] for q in shared)
    tot_new = sum(new[q] for q in shared)
    print(
        f"shared {len(shared)} queries: {tot_old:.1f}s -> {tot_new:.1f}s "
        f"({tot_new / tot_old:.2f}x)" if shared else "no shared queries"
    )
    for tag, rows in (("REGRESSED", regressed), ("IMPROVED", improved)):
        for q, a, b, pct in sorted(rows, key=lambda r: -abs(r[3])):
            print(f"{tag:9s} {q}: {a:.2f}s -> {b:.2f}s ({pct:+.0%})")
    if added:
        print(f"added ({len(added)}): " + ", ".join(f"{q}={new[q]:.2f}s" for q in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))
    if regressed:
        print(
            f"\n{len(regressed)} regression(s) over {thresh:.0%}+{ABS_FLOOR_SEC}s — "
            "re-measure on a quiet machine before accepting (ambient-load "
            "false positives are the documented failure mode)."
        )
    return 1 if regressed else 0


if __name__ == "__main__":
    raise SystemExit(main())
