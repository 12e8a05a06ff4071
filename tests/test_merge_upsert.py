"""MERGE INTO (merge_upsert): crafted-fixture semantics + the
no-vault-shuffle plan contract (the reason it isn't a full-outer join)."""

import pytest

from temporalvault_spark.operators.temporal import merge_upsert


@pytest.fixture()
def frames(spark):
    current = spark.createDataFrame(
        [("k1", 3, "a"), ("k2", 1, "b")],
        "record_id string, version_num int, data string",
    )
    batch = spark.createDataFrame(
        [("k2", "B"), ("k3", "C")], "record_id string, new_data string"
    )
    return current, batch


def test_merge_actions(spark, frames):
    current, batch = frames
    rows = {r["record_id"]: r for r in merge_upsert(current, batch).collect()}
    assert len(rows) == 3
    assert (rows["k1"]["version"], rows["k1"]["data"], rows["k1"]["action"]) == (
        "v3", "a", "keep",
    )
    assert (rows["k2"]["version"], rows["k2"]["data"], rows["k2"]["action"]) == (
        "v2", "B", "update",
    )
    assert (rows["k3"]["version"], rows["k3"]["data"], rows["k3"]["action"]) == (
        "v1", "C", "insert",
    )


def test_merge_empty_batch_is_identity(spark, frames):
    current, batch = frames
    out = merge_upsert(current, batch.limit(0)).collect()
    assert {(r["record_id"], r["version"], r["data"], r["action"]) for r in out} == {
        ("k1", "v3", "a", "keep"),
        ("k2", "v1", "b", "keep"),
    }


def test_merge_all_inserts_into_empty_vault(spark, frames):
    current, batch = frames
    out = merge_upsert(current.limit(0), batch).collect()
    assert {(r["record_id"], r["version"], r["data"], r["action"]) for r in out} == {
        ("k2", "v1", "B", "insert"),
        ("k3", "v1", "C", "insert"),
    }


def test_merge_never_shuffles_the_vault(spark, frames):
    """The vault side must join via BroadcastHashJoin — a full-outer
    rendering would sort-merge-shuffle 100 TB to merge a 1k-row batch."""
    current, batch = frames
    plan = merge_upsert(current, batch)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "Exchange hashpartitioning" not in plan
