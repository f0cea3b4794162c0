"""Versioned snapshot tables behind an atomic pointer file.

The persisted-state publish protocol shared by the streaming
clustering sink (``docs_stream``) and the streaming CDC apply sink
(``cdc_stream``): each publish writes a COMPLETE new versioned
directory, then flips a pointer file with ``os.replace`` (atomic on
POSIX). A crash before the flip leaves the previous snapshot current;
a crash after it leaves the new one — readers can never observe a
half-written table (ADVICE r7). GC retains BY IDENTITY, not position
(ADVICE r8): survivors are the new snapshot plus whatever directory
the pointer named going in, so a half-written orphan from a publish
that crashed before its flip is collected while the
genuinely-current predecessor survives one more cycle for readers
that resolved the pointer just before the flip (n-1 reader grace).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def current_snapshot_path(
    state_dir: str, pointer: str
) -> str | None:
    """Resolve the pointer file to the currently-committed snapshot
    directory, or None when no snapshot has ever been published (or
    the named directory is gone)."""
    ptr = os.path.join(state_dir, pointer)
    if not os.path.isfile(ptr):
        return None
    name = open(ptr).read().strip()
    path = os.path.join(state_dir, name)
    return path if os.path.isdir(path) else None


def read_snapshot(
    spark: SparkSession, state_dir: str, pointer: str, schema: str
) -> DataFrame:
    """Read the CURRENT snapshot (empty frame with ``schema`` before
    the first publish). Consumers use this, never a raw parquet path:
    snapshots are versioned and the pointer flip is the commit
    point."""
    path = current_snapshot_path(state_dir, pointer)
    if path is None:
        return spark.createDataFrame([], schema)
    return spark.read.parquet(path)


def publish_snapshot(
    updated: DataFrame, state_dir: str, prefix: str, pointer: str
) -> None:
    """Atomically publish ``updated`` as the next versioned snapshot
    under ``state_dir`` (see module docstring for the crash-safety and
    GC contract)."""
    os.makedirs(state_dir, exist_ok=True)
    existing = sorted(
        d
        for d in os.listdir(state_dir)
        if d.startswith(prefix) and os.path.isdir(os.path.join(state_dir, d))
    )
    # The committed predecessor is what the POINTER names — existing[-1]
    # may be a crashed publish's orphan, which must not shield itself.
    prev_current = current_snapshot_path(state_dir, pointer)
    prev_name = os.path.basename(prev_current) if prev_current else None
    next_ord = (
        int(existing[-1].rsplit("v", 1)[1]) + 1 if existing else 0
    )
    snap = f"{prefix}{next_ord:09d}"
    updated.write.mode("overwrite").parquet(os.path.join(state_dir, snap))
    tmp = os.path.join(state_dir, pointer + ".tmp")
    with open(tmp, "w") as fh:
        fh.write(snap)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(state_dir, pointer))
    keep = {snap, prev_name}
    for stale in existing:
        if stale not in keep:
            shutil.rmtree(os.path.join(state_dir, stale), ignore_errors=True)
