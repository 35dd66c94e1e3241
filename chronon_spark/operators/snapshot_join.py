"""SNAPSHOT-accuracy join: features as of the previous day's midnight.

Reference semantics (JoinBase.scala:66-125, batch/MergeJob.scala:174-229):
- right side = the GroupBy's daily snapshot table (one row per key x ds),
- a left EVENT row with timestamp ts joins *yesterday's* snapshot:
  ``left.ts_ds = right.ds + 1 day`` (day-shift rule, MergeJob.scala:203-215;
  right-range shift JoinUtils.scala:400-422) — the point-in-time-at-midnight
  guarantee: no same-day information leaks into the feature,
- a left ENTITY row (keyed by ds) equi-joins the same ds.

Also: ``snapshot_entities`` — per-(keys, ds) aggregation over daily entity
snapshots (reference snapshotEntities, GroupBy.scala:113-153), plain
``groupBy(keys, ds)`` with map-side partial aggregation.

Scale: the snapshot right side is orders of magnitude smaller than the
event side (one row per key x day); Spark's AQE broadcasts it when small,
else it's a shuffle join on (keys, ds) with no skew amplification (ds
spreads hot keys).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api.types import (
    Accuracy,
    EntitySource,
    GroupBy,
    Join,
    Operation,
)
from chronon_spark.operators.snapshot_groupby import snapshot_group_by
from chronon_spark.sources.scan import TS, apply_query, load_table, scan_source


def _agg_col(part) -> Column:
    c, op = part.input_column, part.operation
    name = part.output_column
    if op is Operation.COUNT:
        return F.count(c).alias(name)
    if op is Operation.SUM:
        return F.sum(F.col(c).cast("double")).alias(name)
    if op is Operation.AVERAGE:
        return F.avg(F.col(c).cast("double")).alias(name)
    if op is Operation.MIN:
        return F.min(F.col(c).cast("double")).alias(name)
    if op is Operation.MAX:
        return F.max(F.col(c).cast("double")).alias(name)
    if op is Operation.UNIQUE_COUNT:
        return F.size(F.collect_set(c)).cast("long").alias(name)
    if op is Operation.APPROX_UNIQUE_COUNT:
        return F.approx_count_distinct(c).alias(name)
    raise NotImplementedError(f"snapshot-entities op {op}")


def snapshot_entities(spark: SparkSession, group_by: GroupBy) -> DataFrame:
    """One row per (keys, ds): aggregate each day's snapshot rows — or,
    with ``aggregations=None``, the no-agg PASSTHROUGH (reference:
    GroupBy with null aggregations, join/NoAggTest.scala): the selected
    snapshot columns ARE the features, one row per (keys, ds) expected
    from the source (the reference makes the same assumption)."""
    keys = list(group_by.key_columns)
    if group_by.aggregations is None:
        src = group_by.sources[0]
        pc = src.query.partition_column
        df = scan_source(spark, src)
        return df.select(*keys, pc, *[
            c for c in df.columns if c not in set(keys) | {pc, TS}
        ])
    parts = group_by.unpack()
    dfs = []
    for src in group_by.sources:
        assert isinstance(src, EntitySource), "snapshot_entities needs EntitySources"
        df = apply_query(load_table(spark, src.snapshot_table), src.query)
        dfs.append(df)
    df = dfs[0]
    for other in dfs[1:]:
        df = df.unionByName(other)
    pc = group_by.sources[0].query.partition_column
    return df.groupBy(*keys, pc).agg(*[_agg_col(p) for p in parts])


def join_snapshot(spark: SparkSession, join_conf: Join) -> DataFrame:
    """Left events x daily snapshots with the day-shift PIT rule — or an
    ENTITY left, which joins snapshots at the SAME ds (reference
    batch/MergeJob.scala:175-215: the TimePartitionColumn day-shift
    applies only to an EVENTS left; an entity left's additional join key
    is the partition column itself)."""
    left = scan_source(spark, join_conf.left)
    entity_left = TS not in left.columns
    if entity_left:
        lpc = join_conf.left.query.partition_column
        left = left.withColumn("__ts_ds", F.col(lpc).cast("string"))
        day_shift = 0  # state-at-ds joins state-at-ds
    else:
        # date of the left timestamp (UTC midnight bucketing)
        left = left.withColumn(
            "__ts_ds", F.date_format(F.timestamp_millis(F.col(TS)), "yyyy-MM-dd")
        )
        day_shift = 1  # yesterday's snapshot: nothing same-day leaks
    bounds = left.agg(F.min("__ts_ds"), F.max("__ts_ds")).first()
    min_ds, max_ds = bounds[0], bounds[1]

    result = left
    for jp in join_conf.join_parts:
        gb = jp.group_by
        assert gb.accuracy is Accuracy.SNAPSHOT, "join_snapshot requires SNAPSHOT parts"
        mapping = jp.key_mapping or {k: k for k in gb.key_columns}
        if isinstance(gb.sources[0], EntitySource):
            snap = snapshot_entities(spark, gb)
            pc = gb.sources[0].query.partition_column
        else:
            # events: snapshots from day_shift before the left's first day
            # (yesterday's features for the earliest rows) through max.
            from chronon_spark.plans.partition_range import shift_ds

            snap = snapshot_group_by(spark, gb, shift_ds(min_ds, -day_shift), max_ds)
            pc = "ds"
        prefix = jp.full_prefix()
        feature_cols = [c for c in snap.columns if c not in list(gb.key_columns) + [pc]]
        renames = {c: f"{prefix}_{c}" for c in feature_cols}
        for old, new in renames.items():
            snap = snap.withColumnRenamed(old, new)
        # day-shift: left ts_ds joins snapshot of the PREVIOUS day. Rename
        # the snapshot's key/date columns to unique temps so the equi-join
        # condition is unambiguous regardless of earlier part joins.
        snap = snap.withColumn(
            "__join_ds",
            F.date_format(F.date_add(F.col(pc).cast("date"), day_shift), "yyyy-MM-dd"),
        ).drop(pc)
        for rk in mapping.values():
            snap = snap.withColumnRenamed(rk, f"__r_{rk}")
        cond = F.col("__ts_ds") == F.col("__join_ds")
        for lc, rk in mapping.items():
            cond = cond & F.col(lc).eqNullSafe(F.col(f"__r_{rk}"))
        result = result.join(snap, on=cond, how="left").drop(
            "__join_ds", *[f"__r_{rk}" for rk in mapping.values()]
        )

    result = result.drop("__ts_ds")
    if join_conf.derivations:
        exprs = [f"{e} AS {a}" for a, e in join_conf.derivations.items()]
        result = result.selectExpr("*", *exprs)
    return result
