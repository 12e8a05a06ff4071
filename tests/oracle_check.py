"""Local mimic of the driver's DuckDB-oracle differential check:
row-count + schema(column names) + order-insensitive value comparison.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from temporalvault_spark.catalog import TABLES


def duckdb_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon(v):
    if v is None:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _canon(x)) for k, x in v.items()))
    try:
        import numpy as np

        if isinstance(v, np.generic):
            return _canon(v.item())
    except ImportError:
        pass
    return v


def rows_canon(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon(r[i]) for i in order) for r in rows]
    return sorted(out, key=lambda t: tuple((x is None, str(x)) for x in t))


# dtype normalization: spark name -> duckdb name (width-exact, so an int32
# vs int64 difference FAILS — the driver may hash types)
_SPARK_TO_DUCK = {
    "long": "bigint",
    "bigint": "bigint",
    "int": "integer",
    "integer": "integer",
    "smallint": "smallint",
    "string": "varchar",
    "double": "double",
    "float": "float",
    "boolean": "boolean",
    "timestamp": "timestamp",
    "timestamp_ntz": "timestamp",
    "date": "date",
}


def _types_match(s_dtypes: dict, d_cols, d_types) -> list[str]:
    problems = []
    duck = {c: str(t).lower() for c, t in zip(d_cols, d_types)}
    for c, st in s_dtypes.items():
        if st.startswith("array") or duck.get(c, "").endswith("[]"):
            continue  # element-level list typing varies; values still compared
        want = _SPARK_TO_DUCK.get(st)
        if want is not None and duck.get(c) != want:
            problems.append(f"{c}: spark={st} duckdb={duck.get(c)}")
    return problems


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = rel.columns
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    type_problems = _types_match(dict(spark_df.dtypes), d_cols, rel.types)
    if type_problems:
        return False, f"dtype mismatch: {type_problems}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    a = rows_canon(s_cols, s_rows)
    b = rows_canon(d_cols, d_rows)
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    # row count in the success message: driver_sim's 0-row-oracle trap reads
    # it from here instead of re-executing the oracle SQL a second time
    return True, f"ok rows={len(d_rows)}"
