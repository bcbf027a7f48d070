"""Lineage cuts: the shared helper behind the fork/loop-entry
materialization discipline (optimization r08/r09).

Why cuts exist: a frame consumed by k downstream subtrees (or an
iterative loop whose state references the previous round) appears k
(or 2^rounds) times in the analyzed plan; when exchange reuse fails
across differently-aliased subtrees, each copy is re-planned and
re-executed per action. A lazy localCheckpoint at the fork truncates
the plan (guide §3.3) and materializes the frame exactly once INSIDE
the timed action — a fresh checkpoint per build, so nothing is ever
reused across runs.

Why a helper instead of bare ``df.localCheckpoint(eager=False)``:
executor-local checkpoint blocks are non-replicated and pin their
executors — on a multi-node cluster an executor loss makes the job
unrecoverable, and dynamic allocation cannot release pinned executors.
Single-box benches never see that; a 100 TB deployment does. ``cut``
keeps the single-box default bit-identical (plans unchanged) while
giving multi-node runs two escape hatches:

* **Reliable mode** — when the context has a checkpoint directory
  (``sc.setCheckpointDir(...)``), every cut becomes
  ``df.checkpoint(eager=False)``: blocks live in the (replicated,
  HDFS/object-store-backed) checkpoint dir, survive executor loss, and
  executors stay releasable. This is the required mode for multi-node
  deployments with dynamic allocation.
* **Storage level for corpus-proportional frames** — cut sites whose
  materialized size grows with the input (hashed occurrence postings,
  support edges, shingle keys) are marked ``big=True``; the
  ``SPARK_GRAFT_CUT_BIG_LEVEL`` env var (e.g. ``DISK_ONLY``) selects
  their storage level so corpus-scale intermediates stay out of
  executor memory. Bounded cut frames (1-row aggregates, decile edges,
  top-k lists, vocabulary tables) ignore the knob.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def _big_level() -> StorageLevel | None:
    name = os.environ.get("SPARK_GRAFT_CUT_BIG_LEVEL", "").strip()
    if not name:
        return None
    level = getattr(StorageLevel, name, None)
    if not isinstance(level, StorageLevel):
        raise ValueError(
            f"SPARK_GRAFT_CUT_BIG_LEVEL={name!r} is not a"
            " pyspark.StorageLevel name (e.g. DISK_ONLY,"
            " MEMORY_AND_DISK)"
        )
    return level


def cut(df: DataFrame, big: bool = False, eager: bool = False) -> DataFrame:
    """Lineage cut at a consumption fork / loop entry.

    Default behavior is exactly ``df.localCheckpoint(eager=False)``.
    ``eager=True`` materializes immediately — for driver-synced loops
    that act on the frame in the same round anyway (kcore, connected
    components). ``big=True`` marks a frame whose materialized size is
    proportional to the input corpus; see the module docstring for the
    deployment knobs (reliable checkpoint dir,
    SPARK_GRAFT_CUT_BIG_LEVEL)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        # reliable (fault-tolerant) cut: same plan truncation, blocks
        # in the configured checkpoint directory
        return df.checkpoint(eager=eager)
    if big:
        level = _big_level()
        if level is not None:
            return df.localCheckpoint(eager=eager, storageLevel=level)
    return df.localCheckpoint(eager=eager)
