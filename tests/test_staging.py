"""Session-rooted staging: every staged artifact lives under one
per-SparkSession root with a single teardown (r9 verdict "what's wrong"
#3 — orphaned mkdtemp dirs)."""

import os

from temporalvault_spark.staging import (
    _ROOTS,
    cleanup_staging,
    stage_dir,
    staging_root,
)


def test_stage_dirs_share_one_session_root(spark):
    root = staging_root(spark)
    a = stage_dir(spark, "unit_a")
    b = stage_dir(spark, "unit_b")
    assert os.path.dirname(a) == root and os.path.dirname(b) == root
    assert a != b and os.path.isdir(a) and os.path.isdir(b)
    assert os.path.basename(a).startswith("unit_a_")
    # the root is keyed by this session's applicationId
    assert spark.sparkContext.applicationId in os.path.basename(root)


def test_cleanup_removes_root_and_restages_self_heal(spark, sf_dir):
    """cleanup_staging removes the whole root; a staged consumer self-heals
    by re-staging on next use (the vanished-path guard in each stage_*)."""
    from temporalvault_spark.operators.llm import stage_shingle_signatures

    first = stage_shingle_signatures(spark, sf_dir)
    root = staging_root(spark)
    assert first.startswith(root) and os.path.isdir(first)

    cleanup_staging(spark)
    assert not os.path.isdir(root)
    assert spark.sparkContext.applicationId not in _ROOTS

    again = stage_shingle_signatures(spark, sf_dir)  # re-stages, no error
    assert os.path.isdir(again)
    assert again.startswith(staging_root(spark))


def test_cleanup_without_session_clears_all_roots(spark):
    staging_root(spark)
    assert _ROOTS
    cleanup_staging()
    assert not _ROOTS
