"""SCD2 validity intervals: entity mutation history as (valid_from,
valid_to) rows — the standard warehouse materialization of the same
history the temporal-entities replay consumes event-by-event.

Reference anchor: EntitySource's ``mutationTable`` (thrift/api.thrift
EntitySource; replay semantics in ``spark/.../GroupBy.scala``'s
temporalEntities path, reimplemented in ``operators/mutations.py``).
The reference keeps history as signed mutation deltas; downstream
consumers (point-in-time lookups, audits, joins against BI tables)
usually want the INTERVAL form instead. These are each other's
inverses, which is exactly how the tests pin correctness: replaying the
mutations at a timestamp must equal reading the interval that covers it.

Plan shape: one hash exchange on the entity key + in-partition sort,
then two window functions over the SAME window frame (no second
exchange): a null-safe lag-compare drops no-op updates, lead(ts) closes
each surviving interval. The hot-entity bound is the same as lag/lead
(per-entity history serializes into one task); entity attribute
churn — unlike raw event volume — is bounded in practice, and the
closing lead can always ride analytic.py's sliced mode if a pathological
key shows up.

Determinism: duplicate (key, ts) updates keep ONE winner — the greatest
attribute tuple (null-last string order, matching the SQL oracle's
``row_number() ... ORDER BY attrs DESC NULLS LAST``) — so engine and
oracle agree bit-for-bit without assuming unique update timestamps.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from chronon_spark.sources.scan import TS


def scd2_intervals(
    updates: DataFrame,
    key_cols: Sequence[str],
    attr_cols: Sequence[str],
    ts_col: str = TS,
    collapse_noops: bool = True,
    open_end_ts: Optional[int] = None,
) -> DataFrame:
    """Validity intervals from an update log.

    Each input row asserts "entity ``key_cols`` had attributes
    ``attr_cols`` from ``ts_col`` onward". Output: one row per surviving
    version with ``valid_from`` / ``valid_to`` (``valid_to`` is NULL for
    the current version unless ``open_end_ts`` closes it) — half-open
    intervals ``[valid_from, valid_to)``.

    ``collapse_noops`` drops updates whose attributes null-safe-equal the
    previous surviving version, so churn-heavy logs (e.g. recrawls that
    rarely change the page) shrink to distinct-version cardinality.
    """
    keys = list(key_cols)
    attrs = list(attr_cols)
    upd = updates.select(*keys, F.col(ts_col).alias("__ts"), *attrs)
    for k in keys + ["__ts"]:
        upd = upd.where(F.col(k).isNotNull())

    # one winner per (key, ts): greatest attr tuple, null-last — the
    # same total order the SQL oracle's row_number uses. Expressed as a
    # per-KEY window ordered (ts, attrs desc) so the dedup shares the
    # single key-hash exchange with the collapse/close windows below
    # (partitioning by (key, ts) would force a SECOND shuffle): the
    # first row of each ts run is the winner.
    tie = W.partitionBy(*keys).orderBy(
        "__ts", *[F.col(c).desc_nulls_last() for c in attrs]
    )
    upd = upd.withColumn(
        "__dup", F.lag("__ts").over(tie).eqNullSafe(F.col("__ts"))
    ).where(~F.col("__dup")).drop("__dup")

    w = W.partitionBy(*keys).orderBy("__ts")
    if collapse_noops:
        # null-safe "any attribute changed" vs the previous update row.
        # Collapsing against the previous ROW equals collapsing against
        # the previous SURVIVING version: dropped rows equal their
        # predecessor, so equality chains are transitive.
        changed = F.lit(False)
        for c in attrs:
            changed = changed | ~F.col(c).eqNullSafe(F.lag(c).over(w))
        first = F.lag("__ts").over(w).isNull()
        upd = upd.withColumn("__keep", first | changed).where(F.col("__keep")).drop(
            "__keep"
        )
    # same window partitioning -> Catalyst runs both windows off ONE
    # exchange + sort (pinned in tests/test_scd2.py)
    out = upd.withColumn("valid_to", F.lead("__ts").over(w)).withColumnRenamed(
        "__ts", "valid_from"
    )
    if open_end_ts is not None:
        out = out.withColumn(
            "valid_to", F.coalesce("valid_to", F.lit(open_end_ts))
        )
    return out.select(*keys, *attrs, "valid_from", "valid_to")


def scd2_lookup(
    intervals: DataFrame,
    queries: DataFrame,
    key_cols: Sequence[str],
    ts_col: str = TS,
) -> DataFrame:
    """Point-in-time read of the interval table: for each query row, the
    version whose ``[valid_from, valid_to)`` covers the query ts (none →
    attrs NULL, left semantics). Equi-join on the key + interval
    predicate — each query row matches AT MOST one interval by
    construction, so no dedup pass is needed; the join is the same
    key-hash exchange the intervals were built on."""
    keys = list(key_cols)
    q = queries.select(*keys, F.col(ts_col).alias("__qts"))
    iv = intervals.alias("__iv")
    qa = q.alias("__q")
    cond = None
    for k in keys:
        c = F.col(f"__q.{k}") == F.col(f"__iv.{k}")
        cond = c if cond is None else (cond & c)
    cond = cond & (F.col("__iv.valid_from") <= F.col("__q.__qts"))
    cond = cond & (
        F.col("__iv.valid_to").isNull()
        | (F.col("__q.__qts") < F.col("__iv.valid_to"))
    )
    attrs = [
        c for c in intervals.columns if c not in set(keys) | {"valid_from", "valid_to"}
    ]
    return qa.join(iv, on=cond, how="left").select(
        *[F.col(f"__q.{k}") for k in keys],
        F.col("__q.__qts").alias(ts_col),
        *[F.col(f"__iv.{c}") for c in attrs],
    )
