"""Data-quality expectations (operators/dq.py): every rule kind must
actually FIRE on crafted dirty data — a gate that only ever passes is
untested — and the fused per-table aggregate must stay one scan."""

from __future__ import annotations

from pyspark.sql import functions as F

from temporalvault_spark.operators.dq import (
    fk_violations,
    fused_rule_counts,
)


def test_fused_rules_fire_and_count(spark):
    rows = [(1, 10.0), (2, -5.0), (None, -1.0), (4, 0.0)]
    df = spark.createDataFrame(rows, "k int, v double")
    out = {
        r["rule"]: r["n_violations"]
        for r in fused_rule_counts(
            df,
            {
                "k_not_null": F.col("k").isNull(),
                "v_nonneg": F.col("v") < 0,
            },
        ).collect()
    }
    assert out == {"k_not_null": 1, "v_nonneg": 2}


def test_uniqueness_counts_extra_copies(spark):
    df = spark.createDataFrame([(1,), (1,), (1,), (2,), (None,)], "k int")
    out = fused_rule_counts(df, {}, unique_keys={"k_unique": "k"}).first()
    # COUNT(k)=4 non-null, 2 distinct -> 2 extra copies
    assert out["rule"] == "k_unique" and out["n_violations"] == 2


def test_fk_orphans_counted_nulls_exempt(spark):
    child = spark.createDataFrame([(1,), (2,), (99,), (None,)], "fk int")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk int")
    out = fk_violations(child, "fk", parent, "pk", "fk_ok").first()
    # 99 is an orphan; NULL fk is exempt (matches SQL NOT IN + IS NOT NULL)
    assert out["n_violations"] == 1


def test_fused_rules_single_scan(spark, sf_dir):
    """All row-predicate rules for one table must compile to ONE aggregate
    over one scan — rule count must not multiply passes."""
    from temporalvault_spark.catalog import load_catalog
    from temporalvault_spark.plans import plan_counts

    orders = load_catalog(spark, sf_dir).table("orders")
    df = fused_rule_counts(
        orders,
        {
            "a": F.col("o_orderkey").isNull(),
            "b": F.col("o_totalprice") < 0,
            "c": F.col("o_orderdate").isNull(),
        },
    )
    c = plan_counts(df)
    assert c["FileScan"] == 1
    assert c["SortMergeJoin"] == 0 and c["BroadcastHashJoin"] == 0


def test_report_on_clean_star_schema(spark, sf_dir):
    from temporalvault_spark.operators.dq import dq_expectations

    rows = dq_expectations(spark, sf_dir).collect()
    assert len(rows) == 14
    assert all(r["passed"] for r in rows)
    assert all(r["n_violations"] == 0 for r in rows)


def test_version_chain_report_fires_on_corruption(spark):
    """Crafted corrupt log: a gap (v1, v3), a wrong back-link, and a ts
    regression must each be counted; a clean chain scores zero."""
    import datetime as dt

    from temporalvault_spark.operators.dq import version_chain_report

    t0 = dt.datetime(2026, 1, 1)

    def row(rid, vn, prev, ts):
        return (1, rid, f"v{vn}", "{}", ts, vn, prev)

    schema = "id int, record_id string, version string, data string, ts timestamp, version_num int, previous_version string"
    clean = spark.createDataFrame(
        [row("a", 1, None, t0), row("a", 2, "v1", t0 + dt.timedelta(hours=1))], schema
    )
    r = version_chain_report(clean).first()
    assert (r["broken_links"], r["ts_regressions"], r["gapped_keys"]) == (0, 0, 0)

    corrupt = spark.createDataFrame(
        [
            row("a", 1, None, t0),
            row("a", 3, "v1", t0 + dt.timedelta(hours=1)),     # gap: v2 missing (link v1 != expected v... lag gives v1 -> matches, but max!=count)
            row("b", 1, None, t0),
            row("b", 2, "v9", t0 - dt.timedelta(hours=1)),     # wrong back-link + ts regression
        ],
        schema,
    )
    r = version_chain_report(corrupt).first()
    assert r["gapped_keys"] == 1
    assert r["broken_links"] == 1
    assert r["ts_regressions"] == 1


def test_fused_rules_empty_batch_passes(spark):
    """SUM over zero rows is NULL — the gate must coalesce so an empty
    batch is a definite pass, never an indeterminate NULL verdict."""
    df = spark.createDataFrame([], "k int, v double")
    out = {
        r["rule"]: r["n_violations"]
        for r in fused_rule_counts(
            df,
            {"k_not_null": F.col("k").isNull()},
            unique_keys={"k_unique": "k"},
        ).collect()
    }
    assert out == {"k_not_null": 0, "k_unique": 0}
