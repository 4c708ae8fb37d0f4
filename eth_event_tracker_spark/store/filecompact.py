"""Generic small-file compaction for partition-dir parquet layouts:
staged write → ``_COMMIT`` marker → two-rename swap per partition, an
advisory flock serializing compaction against the layout's writers, and
a recovery pass that every locked entry point runs first.

Two sinks accumulate per-batch file sets the same way and share this
protocol instead of re-implementing it (the streaming/sketch.py lesson,
applied to directories): the streaming curation corpus
(``hash_prefix=XX`` partitions + the ``_minhash_sigs`` sidecar,
streaming/curation.py) and the inverted text index (``pbucket=N``
postings partitions + the flat ``docstats`` table,
operators/retrieval.py).

Crash-window invariants (pinned by the curation/index tests that drive
this code): the swap (rename partition→``_compact_old/…``, rename
``_compact_stage/…``→partition) only starts after the staged copy is
fully written and ``_COMMIT``-marked, so a committed stage whose live
partition is missing rolls FORWARD, an old copy whose live partition is
missing rolls BACK, and everything else in the two scratch roots is
debris.  The flock is kernel-released on crash; a multi-driver DFS
deployment swaps in the DFS lease/lock primitive at this seam (same
caveat as streaming/sketch.py)."""

from __future__ import annotations

import fcntl
import os
import shutil
from contextlib import contextmanager

from pyspark.sql import SparkSession

STAGE = "_compact_stage"
OLD = "_compact_old"
COMMIT = "_COMMIT"


@contextmanager
def dir_lock(root: str):
    """Advisory exclusive lock on ``<root>/_LOCK`` — serializes
    compaction against the layout's append path (both driver-side)."""
    os.makedirs(root, exist_ok=True)
    fd = os.open(os.path.join(root, "_LOCK"), os.O_CREAT | os.O_RDWR, 0o644)
    try:
        fcntl.flock(fd, fcntl.LOCK_EX)
        yield
    finally:
        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)


def compact_recover(root: str) -> None:
    """Finish or roll back an interrupted swap under ``root`` (see module
    docstring for the invariants).  Name-generic: recovers ANY partition
    name found in the scratch roots."""
    stage_root = os.path.join(root, STAGE)
    old_root = os.path.join(root, OLD)
    if os.path.isdir(stage_root):
        for name in os.listdir(stage_root):
            src = os.path.join(stage_root, name)
            final = os.path.join(root, name)
            if os.path.exists(os.path.join(src, COMMIT)) and not os.path.exists(final):
                os.rename(src, final)
    if os.path.isdir(old_root):
        for name in os.listdir(old_root):
            src = os.path.join(old_root, name)
            final = os.path.join(root, name)
            if not os.path.exists(final):
                os.rename(src, final)
    for scratch in (stage_root, old_root):
        if os.path.isdir(scratch):
            shutil.rmtree(scratch)


def compact_dirs(
    spark: SparkSession,
    root: str,
    names: list[str],
    max_files: int = 4,
    files_after: int = 1,
    sort_col: str | None = None,
) -> int:
    """Rewrite each ``<root>/<name>`` holding more than ``max_files``
    parquet files into ``files_after`` files (``sort_col`` re-sorts
    within the rewritten files so row-group min/max pruning keeps
    working — the postings invariant).  Caller MUST hold
    :func:`dir_lock` and have run :func:`compact_recover`.  Returns the
    number of partitions compacted; rows are preserved exactly (the
    rewrite is read→coalesce→write of the same partition)."""
    done = 0
    for name in names:
        pdir = os.path.join(root, name)
        files = [f for f in os.listdir(pdir) if f.endswith(".parquet")]
        if len(files) <= max_files:
            continue
        stage_part = os.path.join(root, STAGE, name)
        if os.path.exists(stage_part):
            shutil.rmtree(stage_part)
        df = spark.read.parquet(pdir).coalesce(files_after)
        if sort_col is not None:
            df = df.sortWithinPartitions(sort_col)
        df.write.mode("overwrite").parquet(stage_part)
        open(os.path.join(stage_part, COMMIT), "w").close()
        old_part = os.path.join(root, OLD, name)
        os.makedirs(os.path.dirname(old_part), exist_ok=True)
        if os.path.exists(old_part):
            shutil.rmtree(old_part)
        os.rename(pdir, old_part)
        os.rename(stage_part, pdir)
        shutil.rmtree(old_part)
        os.remove(os.path.join(pdir, COMMIT))
        done += 1
    for scratch in (STAGE, OLD):
        p = os.path.join(root, scratch)
        if os.path.isdir(p) and not os.listdir(p):
            shutil.rmtree(p)
    return done
