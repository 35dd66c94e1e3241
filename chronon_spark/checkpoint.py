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
