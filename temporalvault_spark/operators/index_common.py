"""Shared machinery for the persisted band-index family (minhash_index /
rp_lsh_index / phash_index). These three indexes carry the identical
write-mode, meta-sidecar, occupancy, and rebuild-swap contracts — round 10's
code review caught the contracts drifting when each module re-stated them
(a missing self-pair filter here, a differently-keyed existence check
there), so the mechanical parts live HERE once:

- ``resolve_write_mode``: bulk namespace ingest=-1 vs per-batch dynamic
  partition overwrite (the exactly-once streaming append);
- ``meta_row``: the mtime-cached 1-row ``_meta`` sidecar read (a full Spark
  parquet job per probe otherwise);
- ``assert_ingest_layout``: refuse appends into a pre-ingest-layer index —
  mixed partition depths are unreadable by Spark's partition discovery
  (probes on a pure legacy layout still work: the explicit read schemas
  null-fill the missing ingest column); the remedy is a rebuild, which
  writes the current layout;
- ``atomic_swap_rebuild``: build into a sibling, rename-swap, drop the old
  — probes never see a half-rebuilt index.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Callable

from pyspark.sql import SparkSession


def resolve_write_mode(
    append: bool, ingest_id: int | None
) -> tuple[str, bool, int]:
    """(mode, dynamic_overwrite, ingest partition value) for an index write.

    Appends with an explicit ``ingest_id`` (a streaming batch id) run as
    dynamic partition overwrites of that ingest's own partitions, so a
    crash-replayed batch REWRITES its rows instead of duplicating them.
    Everything else — base builds and bulk appends — lives in the ``-1``
    namespace, so a stream's batch-id overwrites can never clobber base or
    bulk rows (one gate per index is the caller's contract for batch-id
    uniqueness)."""
    if append and ingest_id is not None:
        return "overwrite", True, int(ingest_id)
    if append:
        return "append", False, -1
    return "overwrite", False, int(ingest_id) if ingest_id is not None else -1


# (normpath(_meta), mtime_ns) -> row dict. An append never rewrites _meta;
# a rebuild does, which bumps the mtime and invalidates the entry.
_META_ROW_CACHE: dict[tuple[str, int], dict] = {}


def meta_row(
    spark: SparkSession, path: str, missing_ok: bool = False
) -> dict | None:
    """The index's 1-row ``_meta`` sidecar as a dict, cached on the
    sidecar's mtime. ``None`` (with ``missing_ok``) or raises when the
    sidecar is absent — a torn write (crash between the data overwrite and
    the _meta rewrite); probing with a guessed width would silently find
    nothing. Callers validate their own field invariants on top."""
    meta = f"{path}/_meta"
    if not os.path.isdir(meta) and not os.path.isfile(meta):
        if missing_ok:
            return None
        raise ValueError(
            f"index at {path} has no _meta sidecar — torn/partial index "
            "write; rebuild the index"
        )
    key = (os.path.normpath(meta), os.stat(meta).st_mtime_ns)
    got = _META_ROW_CACHE.get(key)
    if got is None:
        got = spark.read.parquet(meta).first().asDict()
        _META_ROW_CACHE[key] = got
    return got


def assert_ingest_layout(path: str, family: str) -> None:
    """Refuse to append into a pre-round-10 (no ingest layer) index: new
    files at ``band=*/.../ingest=*`` next to old files directly under the
    leaf would give Spark's partition discovery conflicting directory
    depths and every subsequent read would fail. Probing a PURE legacy
    index still works (explicit schemas null-fill ingest), and the rebuild
    ops read legacy layouts fine and write the current one — so the raise
    names that remedy."""
    if not os.path.isdir(path):
        return  # fresh index: nothing on disk yet
    for band_dir in os.listdir(path):
        if not band_dir.startswith("band="):
            continue
        stack = [os.path.join(path, band_dir)]
        while stack:
            d = stack.pop()
            entries = os.listdir(d)
            if any(e.startswith("ingest=") for e in entries):
                return  # current layout
            subdirs = [
                os.path.join(d, e)
                for e in entries
                if os.path.isdir(os.path.join(d, e)) and "=" in e
            ]
            if subdirs:
                stack.extend(subdirs)
            elif any(e.endswith(".parquet") for e in entries):
                raise ValueError(
                    f"{family} index at {path} uses the pre-ingest-layer "
                    "layout — appending would mix partition depths and "
                    "break every subsequent read; rebuild the index first "
                    "(rebuild-if-grown reads legacy layouts and writes the "
                    "current one)"
                )
        break  # one band directory settles the layout


def atomic_swap_rebuild(path: str, build_to: Callable[[str], None]) -> None:
    """Build a replacement index into a SIBLING directory and atomically
    swap it in (the rollback_state swap precedent): probes racing the
    rebuild see either the old index or the new one, never a mixture."""
    tmp_new, tmp_old = f"{path}.rebuild", f"{path}.old"
    shutil.rmtree(tmp_new, ignore_errors=True)
    shutil.rmtree(tmp_old, ignore_errors=True)
    build_to(tmp_new)
    os.rename(path, tmp_old)
    os.rename(tmp_new, path)
    shutil.rmtree(tmp_old)
