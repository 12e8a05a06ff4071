"""Spot-check a subset of registered queries against their DuckDB oracles
(the driver_sim compare, restricted to named queries) — the fast inner loop
while iterating on one operator.

Usage: python tools/check_subset.py sf_dir name [name ...]
       python tools/check_subset.py sf_dir prefix*        (glob on names)
"""

from __future__ import annotations

import fnmatch
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__.strip())
        return 2
    sf_dir = sys.argv[1]
    pats = sys.argv[2:]

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    import __spark_entry__ as m
    from tests.oracle_check import compare, duckdb_conn

    queries = m.queries()
    oracles = m.oracle_sql()
    names = [n for n in queries if any(fnmatch.fnmatch(n, p) for p in pats)]
    if not names:
        print(f"no queries match {pats}")
        return 1
    con = duckdb_conn(sf_dir)
    n_fail = 0
    for name in names:
        t0 = time.time()
        try:
            df = queries[name](spark, sf_dir)
            if name in oracles:
                ok, msg = compare(df, con, oracles[name])
            else:
                ok, msg = True, f"rows_only:{df.count()}"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXC {type(e).__name__}: {e}"
        n_fail += 0 if ok else 1
        print(f"{'ok  ' if ok else 'FAIL'} {name} ({time.time() - t0:.1f}s) "
              f"{msg if not ok else msg[:60]}", flush=True)
    print(f"{len(names) - n_fail}/{len(names)} green")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
