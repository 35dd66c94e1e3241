"""Deterministic release of localCheckpoint storage.

``DataFrame.unpersist()`` goes through the SQL ``CacheManager`` and only
removes entries created by ``DataFrame.persist()`` — it does NOT touch
the RDD-level persistence that ``localCheckpoint()`` creates (verified
empirically on Spark 4.1: after ``ck = df.localCheckpoint();
ck.unpersist()`` the checkpoint RDD is still in
``sc.getPersistentRDDs``). Without an explicit release, superseded
checkpoints in iterative loops (connected components, PageRank, BPE
training, the staged curation pipeline) are freed only when the JVM-side
``ContextCleaner`` notices the RDD is weakly unreachable — which, driven
from Python, waits on BOTH the py4j finalizer cycle and the JVM GC, i.e.
is nondeterministic and unbounded. At 100 TB an iterative job can hold
many corpus-scale block sets hostage to GC timing; this helper makes the
release a deterministic part of the loop.

CONTRACT: a released checkpoint is UNREADABLE — ``localCheckpoint``
truncates lineage, so the cached blocks are the ONLY copy and there is
nothing to recompute from. Release strictly after the last consumer has
materialized (in a loop: after the NEXT eager checkpoint exists).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def release_checkpoint(df: DataFrame | None) -> bool:
    """Free the cached blocks behind a ``localCheckpoint()``-ed frame.

    Returns True when a checkpoint RDD was found and unpersisted, False
    otherwise (plain frames are a no-op — safe to call on anything).
    Best-effort: storage hygiene must never fail the job, so JVM access
    errors are swallowed.
    """
    if df is None:
        return False
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return False
        plan.rdd().unpersist(False)
        return True
    except Exception:
        return False


# ---------------------------------------------------------------------------
# Plan-lifetime checkpoint registry: operators that materialize a shared
# sub-plan (e.g. a query set consumed by several branches — Catalyst cannot
# share such subtrees, see operators/asof_hopped.py) register it here. The
# checkpoint must live as long as the plan that reads it, so the operator
# cannot release it; the SESSION owner releases between top-level
# materializations (bench.force does; the driver's one-shot queries don't
# need to — sf-scale query sets are a few hundred KB).

_plan_checkpoints: list = []


def register_plan_checkpoint(df: DataFrame) -> DataFrame:
    """Track a localCheckpoint()-ed frame for deferred bulk release."""
    _plan_checkpoints.append(df)
    return df


def release_plan_checkpoints() -> int:
    """Free every registered checkpoint. CONTRACT: call only once all
    frames built since the previous release are fully materialized or
    abandoned — released checkpoints are unreadable."""
    n = 0
    for df in _plan_checkpoints:
        n += bool(release_checkpoint(df))
    _plan_checkpoints.clear()
    return n
