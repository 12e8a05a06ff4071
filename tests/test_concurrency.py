"""run_concurrent (temporalvault_spark/concurrency.py) — the shared
concurrent-job helper behind the streaming gates and the curation
capstone. The gate tests exercise it end-to-end inside foreachBatch;
these pin its direct contract."""

import pytest

from temporalvault_spark.concurrency import run_concurrent


def test_results_in_input_order(spark):
    # thunks finish out of submission order (the slowest is first);
    # results must still come back positionally
    import time

    def slow():
        time.sleep(0.3)
        return "slow"

    out = run_concurrent([slow, lambda: "mid", lambda: "fast"])
    assert out == ["slow", "mid", "fast"]


def test_single_thunk_runs_inline(spark):
    import threading

    tid = []
    run_concurrent([lambda: tid.append(threading.get_ident())])
    assert tid == [threading.get_ident()]


def test_first_failure_reraises(spark):
    def boom():
        raise ValueError("thunk failed")

    with pytest.raises(ValueError, match="thunk failed"):
        run_concurrent([lambda: 1, boom, lambda: 2])


def test_spark_actions_from_threads(spark):
    # the real shape: independent Spark ACTIONS (localCheckpoint + count)
    # submitted concurrently against one session
    a = spark.range(100).localCheckpoint(eager=False)
    b = spark.range(200).localCheckpoint(eager=False)
    na, nb = run_concurrent([lambda: a.count(), lambda: b.count()])
    assert (na, nb) == (100, 200)
