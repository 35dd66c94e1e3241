"""Join-lifecycle helpers: coalesced join, bootstrap, key pruning.

Reference counterparts:
- coalescedJoin (JoinUtils.scala:149-189): left join where columns present
  on BOTH sides merge via ``coalesce(left, right)`` — bootstrap semantics:
  precomputed values win, holes fall through to computed values.
- Bootstrap (JoinBootstrapJob.scala; Join.scala:45-60,130-193): a
  precomputed table left-joined on ``row_ids``; rows it fully covers skip
  backfill (CoveringSet).
- Small-mode key injection (JoinUtils.scala:233-284, cutoff 5000 rows
  TableUtils.scala:54-57): literal IN-list pushed into the right-side scan.
- Bloom pre-filter (Extensions.scala:175-218, threshold 1M): approximated
  here by an exact broadcast semi-join — on Spark the broadcast of a
  deduped key set is both exact and cheaper than a bloom UDF round-trip,
  and Catalyst turns it into a BroadcastHashJoin(LeftSemi) that never
  shuffles the big side.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SMALL_MODE_CUTOFF = 5_000  # reference TableUtils.scala:54-57
SEMI_JOIN_KEY_LIMIT = 1_000_000  # reference bloom threshold TableUtils.scala:60-63


def coalesced_join(
    left: DataFrame, right: DataFrame, keys: list, how: str = "left"
) -> DataFrame:
    """Left join; shared non-key columns merge via coalesce(left, right)."""
    shared = [c for c in left.columns if c in right.columns and c not in keys]
    r = right
    for c in shared:
        r = r.withColumnRenamed(c, f"__r_{c}")
    out = left.join(r, on=keys, how=how)
    for c in shared:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__r_{c}"))).drop(f"__r_{c}")
    return out


def bootstrap_join(
    left: DataFrame, bootstrap: DataFrame, row_ids: list
) -> DataFrame:
    """Attach precomputed feature columns from a bootstrap table.

    Returns the coalesced frame; downstream part computation should use
    ``uncovered_rows`` to skip rows the bootstrap fully covers.
    """
    return coalesced_join(left, bootstrap, row_ids)


def uncovered_rows(df: DataFrame, feature_cols: list) -> DataFrame:
    """Rows where at least one of ``feature_cols`` is still null — the ones
    a join part must compute (the complement of the reference's
    CoveringSet)."""
    present = [c for c in feature_cols if c in df.columns]
    if len(present) < len(feature_cols):
        return df  # some columns don't exist yet -> nothing is covered
    cond = None
    for c in present:
        n = F.col(c).isNull()
        cond = n if cond is None else (cond | n)
    return df.where(cond) if cond is not None else df


def inject_small_mode_keys(
    events: DataFrame,
    left_keys: DataFrame,
    keys: list,
    left_count: Optional[int] = None,
    cutoff: int = SMALL_MODE_CUTOFF,
) -> DataFrame:
    """If the left side is tiny, collect its key values and push literal
    IN-lists into the event scan (prunes at the parquet reader)."""
    n = left_count if left_count is not None else left_keys.count()
    if n > cutoff:
        return events
    rows = left_keys.select(*keys).distinct().collect()
    if not rows:
        return events
    for k in keys:
        vals = sorted({r[k] for r in rows if r[k] is not None})
        if vals:
            events = events.where(F.col(k).isin(vals))
    return events


def prune_events_by_keys(
    events: DataFrame,
    left_keys: DataFrame,
    keys: list,
    distinct_key_limit: int = SEMI_JOIN_KEY_LIMIT,
) -> DataFrame:
    """Broadcast semi-join pruning of the event side by the left's key set
    (the Spark-native replacement for the reference's bloom filter)."""
    dk = left_keys.select(*keys).distinct().limit(distinct_key_limit + 1)
    # Only prune when the key set actually fits a broadcast.
    if dk.count() > distinct_key_limit:
        return events
    return events.join(F.broadcast(dk), on=keys, how="leftsemi")
