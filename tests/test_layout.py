"""Z-order layout (sources/layout.py): bit-interleave correctness, content
round-trip, and a QUANTITATIVE data-skipping proof from parquet footers —
a ts-sorted layout cannot prune a user_id slice (every file spans the full
id range), a z-ordered layout must.
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from pyspark.sql import functions as F

from temporalvault_spark.catalog import load_catalog
from temporalvault_spark.sources.layout import (
    file_stats,
    q_zorder_scan,
    with_z_value,
    write_zordered,
)


def test_z_value_interleave_exact(spark):
    """bits=2, bounds (0,3): scaling is the identity, so z is the textbook
    Morton interleave — x bits at even positions, y bits at odd."""
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x bigint, y bigint")
    got = {
        (r["x"], r["y"]): r["z_value"]
        for r in with_z_value(df, ("x", "y"), bits=2, bounds={"x": (0, 3), "y": (0, 3)}).collect()
    }

    def morton(x, y):
        z = 0
        for i in range(2):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_zorder_write_roundtrip(spark, sf_dir):
    events = load_catalog(spark, sf_dir).table("events")
    path = tempfile.mkdtemp(prefix="tv_zorder_rt_")
    try:
        write_zordered(events, path, ("ts", "user_id"), n_files=8)
        back = spark.read.parquet(path)
        assert "z_value" not in back.columns
        a = sorted(tuple(r) for r in events.select("event_id", "user_id").collect())
        b = sorted(tuple(r) for r in back.select("event_id", "user_id").collect())
        assert a == b
    finally:
        shutil.rmtree(path, ignore_errors=True)


def _intersecting(stats, lo, hi):
    return sum(1 for mn, mx in stats if not (mx < lo or mn > hi))


def test_zorder_skips_files_where_ts_sort_cannot(spark, sf_dir):
    """user_id is uncorrelated with ts in the event log, so a ts-sorted
    layout leaves every file spanning (nearly) the whole id range — a
    user_id slice prunes nothing. The z-order layout must let the same
    slice skip at least half the files, by footer min/max alone."""
    events = load_catalog(spark, sf_dir).table("events")
    n_files = 16
    z_path = tempfile.mkdtemp(prefix="tv_zorder_z_")
    t_path = tempfile.mkdtemp(prefix="tv_zorder_t_")
    try:
        write_zordered(events, z_path, ("ts", "user_id"), n_files=n_files)
        (
            events.repartitionByRange(n_files, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(t_path)
        )
        z_stats = file_stats(z_path, "user_id")
        t_stats = file_stats(t_path, "user_id")
        assert len(z_stats) == n_files and len(t_stats) == n_files
        lo, hi = 4, 5
        z_hit = _intersecting(z_stats, lo, hi)
        t_hit = _intersecting(t_stats, lo, hi)
        assert t_hit == n_files  # ts sort: no id clustering at all
        assert z_hit <= n_files // 2
        assert z_hit < t_hit
    finally:
        shutil.rmtree(z_path, ignore_errors=True)
        shutil.rmtree(t_path, ignore_errors=True)


def test_zorder_still_prunes_time(spark, sf_dir):
    """Clustering on TWO dims must not destroy single-dim locality: a
    narrow ts window still skips most z-ordered files (the curve trades a
    little per-dim locality for coverage of both)."""
    events = load_catalog(spark, sf_dir).table("events")
    n_files = 16
    z_path = tempfile.mkdtemp(prefix="tv_zorder_zt_")
    try:
        write_zordered(events, z_path, ("ts", "user_id"), n_files=n_files)
        stats = file_stats(z_path, "ts")
        bounds = events.agg(F.min("ts"), F.max("ts")).first()
        t0, t1 = bounds[0], bounds[1]
        span = t1 - t0
        lo, hi = t0 + span * 40 // 100, t0 + span * 45 // 100  # 5% window
        hit = _intersecting(stats, lo, hi)
        assert hit < n_files
    finally:
        shutil.rmtree(z_path, ignore_errors=True)


def test_zorder_scan_query(spark, sf_dir):
    out = q_zorder_scan(spark, sf_dir)
    rows = out.collect()
    assert len(rows) > 0
    assert set(out.columns) == {"event_type", "n_events", "sum_uid"}
    uid_ok = (
        load_catalog(spark, sf_dir)
        .table("events")
        .filter(F.col("user_id").between(2, 5))
        .count()
    )
    assert sum(r["n_events"] for r in rows) == uid_ok


def test_z_value_matches_python_reference_property(spark):
    """Differential property: for random values and random declared bounds,
    the SQL bit-interleave equals an independent Python Morton reference
    (including clamping of out-of-bounds rows)."""
    import random

    rng = random.Random(7)
    bits = 8
    grid_max = (1 << bits) - 1

    def scale(v, lo, hi):
        span = (hi - lo) or 1.0
        s = int((float(v) - lo) / span * grid_max)
        return min(grid_max, max(0, s))

    def morton(xs, ys):
        z = 0
        for i in range(bits):
            z |= ((xs >> i) & 1) << (2 * i)
            z |= ((ys >> i) & 1) << (2 * i + 1)
        return z

    for trial in range(3):
        lo_x, hi_x = sorted(rng.sample(range(-1000, 1000), 2))
        lo_y, hi_y = sorted(rng.sample(range(-1000, 1000), 2))
        rows = [
            (i, rng.randint(-1500, 1500), rng.randint(-1500, 1500))
            for i in range(50)
        ]
        df = spark.createDataFrame(rows, "id bigint, x bigint, y bigint")
        got = {
            r["id"]: r["z_value"]
            for r in with_z_value(
                df, ("x", "y"), bits=bits,
                bounds={"x": (lo_x, hi_x), "y": (lo_y, hi_y)},
            ).collect()
        }
        exp = {
            i: morton(scale(x, lo_x, hi_x), scale(y, lo_y, hi_y))
            for i, x, y in rows
        }
        assert got == exp, f"trial {trial}: bounds x=({lo_x},{hi_x}) y=({lo_y},{hi_y})"
