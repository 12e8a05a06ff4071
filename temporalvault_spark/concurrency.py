"""Concurrent submission of independent Spark actions from driver threads.

ONE implementation (review-pass rule: the job-group-inheritance idiom must
not be re-inlined) shared by the streaming gates (streaming/jobs.py: the
joint gate's four decode+checkpoint jobs and five tail writes, every
single gate's two tail writes) and the curation capstone (operators/
curation.py: the three independent stage materializations).

Why threads: independent actions submitted sequentially from the driver
each pay the full job-scheduling round trip; submitting them from threads
lets the scheduler run them in the same wall window (the standard
local[32]/cluster pattern — Spark's scheduler is thread-safe, and callers
use per-writer options, never session confs, so there is no cross-thread
conf race).

Error contract: the first failure re-raises HERE — a caller inside
foreachBatch still fails BEFORE its batch marker commits, and the replay
rewrites every partially-written ingest partition (each sink is idempotent
under replay by the gates' dynamic-overwrite contract). Sibling thunks
that already started still run to completion (ThreadPoolExecutor shutdown
semantics) — acceptable: their effects are the same idempotent partitions
the replay will rewrite, or plain localCheckpoint materializations with
no external effect.

Thunks are wrapped with pyspark.util.inheritable_thread_target
(round-14 review-pass finding): under PySpark's default pinned-thread
mode a fresh Python thread maps to a fresh JVM thread with EMPTY local
properties, so jobs submitted from a pool would escape the calling
thread's job group — StreamingQuery.stop() could no longer cancel them,
and scheduler-pool assignments would silently drop. The wrapper captures
the calling thread's JVM-local properties (job group, pool) and re-applies
them inside the worker thread, restoring the sequential form's
cancellation semantics.
"""

from __future__ import annotations


def run_concurrent(thunks):
    """Run the callables as concurrent Spark jobs; return their results in
    input order. Single-thunk calls run inline (no pool overhead)."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import SparkSession
    from pyspark.util import inheritable_thread_target

    if len(thunks) == 1:
        return [thunks[0]()]
    # With the session, the wrapper inherits session TAGS on top of the
    # JVM-local properties (and skips pyspark's "Tags will not be
    # inherited" warning); the bare-callable form still inherits the job
    # group, so cancellation semantics hold either way. The session form
    # is only valid under pinned-thread mode (the default): with
    # PYSPARK_PIN_THREAD=false, inheritable_thread_target(session) falls
    # through pyspark's non-pinned branch and returns the SESSION itself
    # rather than a decorator — calling it on a thunk would raise
    # "'SparkSession' object is not callable". Non-pinned JVM threads
    # inherit properties natively, so the bare form (identity there) is
    # exactly right for that mode.
    from py4j.clientserver import ClientServer
    from pyspark import SparkContext

    session = SparkSession.getActiveSession()
    pinned = isinstance(SparkContext._gateway, ClientServer)
    wrap = (
        inheritable_thread_target(session)
        if (pinned and session is not None)
        else inheritable_thread_target
    )
    with ThreadPoolExecutor(max_workers=len(thunks)) as ex:
        futures = [ex.submit(wrap(t)) for t in thunks]
        return [f.result() for f in futures]
