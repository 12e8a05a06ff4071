"""Spot-check a subset of registered queries against their DuckDB oracles —
the fast inner loop while iterating on one operator. Thin front-end over
tools/driver_sim.run (ONE implementation of the grading-driver loop; a
drifting copy lived here briefly in round 14 and was reviewed out).

Usage: python tools/check_subset.py sf_dir name [name ...]
       python tools/check_subset.py sf_dir "prefix*"      (fnmatch globs)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from driver_sim import run  # noqa: E402


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__.strip())
        return 2
    return run(sys.argv[1], out=None, patterns=sys.argv[2:])


if __name__ == "__main__":
    raise SystemExit(main())
