"""SNAPSHOT-accuracy GroupBy: daily feature tables, pure DataFrame plan.

Reference semantics (spark/.../GroupBy.scala:155-179 ``snapshotEvents``):
for every day ``ds`` in the backfill range and every key, aggregate events
with ``ts <= end-of-day(ds)`` and (for windowed parts) within the window
ending at end-of-day. Daily resolution == sawtooth with a 1-day hop
(aggregator/.../windowing/Resolution.scala:50-63).

Spark-first plan (no RDDs, no UDFs — whole-stage codegen end to end):

1. daily partial IRs per (key, day): one ``groupBy(keys, day)`` — Spark
   does map-side partial aggregation automatically,
2. dense (key x day) grid for the backfill range (small dim cross join),
3. window-merge: ``Window.partitionBy(keys).orderBy(day).rowsBetween(-(W-1), 0)``
   over the dense grid merges day-hop IRs into each window — the hop-reuse
   idea of the reference's HopsAggregator, expressed in Catalyst.

Scale: the only wide exchange is the (key, day) groupBy; the grid join is
broadcast; the window partition is (key), ordered by day — days-per-key is
bounded (range length), so no skew risk beyond the key distribution itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from chronon_spark.api.types import AggregationPart, GroupBy, Operation, TimeUnit
from chronon_spark.operators.asof_join import events_df_for_group_by
from chronon_spark.sources.scan import TS

DAY_MS = 86_400_000


def _window_days(part: AggregationPart) -> int | None:
    if part.window is None:
        return None
    if part.window.time_unit is not TimeUnit.DAYS:
        raise ValueError(
            f"SNAPSHOT accuracy requires whole-day windows, got {part.window}"
            " (reference: DailyResolution, Resolution.scala:50-63)"
        )
    return part.window.length


def _day_frame(keys: list, days: int | None) -> W:
    w = W.partitionBy(*keys).orderBy("day_num")
    if days is None:
        return w.rowsBetween(W.unboundedPreceding, 0)
    return w.rowsBetween(-(days - 1), 0)


def snapshot_group_by(
    spark: SparkSession,
    group_by: GroupBy,
    start_ds: str,
    end_ds: str,
) -> DataFrame:
    """One row per (keys, ds) for every ds in [start_ds, end_ds]."""
    if group_by.aggregations is None:
        raise ValueError(
            "no-agg GroupBys (aggregations=None) are SNAPSHOT entity "
            "passthroughs (snapshot_join.snapshot_entities); temporal "
            "accuracy needs explicit aggregations"
        )
    keys = list(group_by.key_columns)
    parts = group_by.unpack()
    if any(p.bucket for p in parts):
        raise NotImplementedError("bucketed snapshot parts: use asof path")

    max_w = max((d for d in (_window_days(p) for p in parts) if d is not None), default=None)

    events = events_df_for_group_by(spark, group_by, None, None)
    # scan narrowing: events after end-of-range never contribute
    end_day_ms = F.unix_date(F.lit(end_ds).cast("date")).cast("long") * DAY_MS + DAY_MS
    events = events.where(F.col(TS) < end_day_ms)
    if max_w is not None and all(p.window is not None for p in parts):
        start_day_ms = F.unix_date(F.lit(start_ds).cast("date")).cast("long") * DAY_MS
        events = events.where(F.col(TS) >= start_day_ms - max_w * DAY_MS)

    from chronon_spark.operators.asof_join import null_out_nans

    events = null_out_nans(events, list({p.input_column for p in parts}))
    ev = events.withColumn("day_num", (F.col(TS) / DAY_MS).cast("long"))

    # ---- level 1: daily partial IRs -------------------------------------
    partials: list[Column] = []
    needed: set = set()
    for p in parts:
        c = p.input_column
        op = p.operation
        if op in (Operation.COUNT, Operation.SUM, Operation.AVERAGE, Operation.VARIANCE):
            needed |= {f"d_cnt_{c}", f"d_sum_{c}"}
            if op is Operation.VARIANCE:
                needed.add(f"d_ssq_{c}")
        elif op is Operation.MIN:
            needed.add(f"d_min_{c}")
        elif op is Operation.MAX:
            needed.add(f"d_max_{c}")
        elif op in (Operation.LAST, Operation.LAST_K):
            needed.add(f"d_lastk_{c}_{p.k if op is Operation.LAST_K else 1}")
        elif op in (Operation.FIRST, Operation.FIRST_K):
            needed.add(f"d_firstk_{c}_{p.k if op is Operation.FIRST_K else 1}")
        elif op in (Operation.UNIQUE_COUNT, Operation.APPROX_UNIQUE_COUNT):
            needed.add(f"d_set_{c}")
        else:
            raise NotImplementedError(f"snapshot op {op}")

    for name in sorted(needed):
        _, kind, rest = name.split("_", 2)  # d_<kind>_<rest>
        if kind == "cnt":
            partials.append(F.count(F.col(rest)).alias(name))
        elif kind == "sum":
            partials.append(F.sum(F.col(rest).cast("double")).alias(name))
        elif kind == "ssq":
            partials.append(F.sum(F.pow(F.col(rest).cast("double"), 2)).alias(name))
        elif kind == "min":
            partials.append(F.min(F.col(rest).cast("double")).alias(name))
        elif kind == "max":
            partials.append(F.max(F.col(rest).cast("double")).alias(name))
        elif kind == "set":
            partials.append(F.collect_set(F.col(rest)).alias(name))
        elif kind in ("lastk", "firstk"):
            c, k = rest.rsplit("_", 1)
            struct = F.struct(F.col(TS).alias("ts"), F.col(c).alias("v"))
            # null inputs never update IRs (reference DirectColumnAggregator):
            # filter before truncating to k.
            collected = F.collect_list(F.when(F.col(c).isNotNull(), struct))
            if kind == "lastk":
                arr = F.reverse(F.array_sort(collected))  # most-recent first
            else:
                arr = F.array_sort(collected)
            partials.append(F.slice(arr, 1, int(k)).alias(name))

    daily = ev.groupBy(*keys, "day_num").agg(*partials)

    # ---- dense (key x day) grid ------------------------------------------
    # The grid must reach back far enough that every window frame ending in
    # [start_ds, end_ds] sees all its day-hops: maxW-1 days for windowed
    # parts, back to the first event day for unbounded ones. Output rows
    # before start_ds are dropped at the end.
    import datetime as _dt

    start_day = _dt.date.fromisoformat(start_ds).toordinal() - _dt.date(1970, 1, 1).toordinal()
    if all(p.window is not None for p in parts):
        grid_start = start_day - (max_w - 1)
        first_event_day = daily.agg(F.min("day_num")).first()[0]
        if first_event_day is not None:
            grid_start = max(grid_start, int(first_event_day))
    else:
        first_event_day = daily.agg(F.min("day_num")).first()[0]
        grid_start = min(start_day, int(first_event_day)) if first_event_day is not None else start_day
    days = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(
                    F.lit(grid_start).cast("long"),
                    F.unix_date(F.lit(end_ds).cast("date")).cast("long"),
                )
            ).alias("day_num")
        )
    )
    keys_df = daily.select(*keys).distinct()
    grid = keys_df.crossJoin(F.broadcast(days))
    dense = grid.join(daily, on=keys + ["day_num"], how="left")

    # ---- level 2: window-merge over day hops ------------------------------
    out_cols: list[Column] = []
    for p in parts:
        c, op, wd = p.input_column, p.operation, _window_days(p)
        frame = _day_frame(keys, wd)
        name = p.output_column
        if op is Operation.COUNT:
            out_cols.append(F.coalesce(F.sum(f"d_cnt_{c}").over(frame), F.lit(0)).alias(name))
        elif op is Operation.SUM:
            out_cols.append(F.sum(f"d_sum_{c}").over(frame).alias(name))
        elif op is Operation.AVERAGE:
            out_cols.append(
                (F.sum(f"d_sum_{c}").over(frame) / F.sum(f"d_cnt_{c}").over(frame)).alias(name)
            )
        elif op is Operation.VARIANCE:
            s = F.sum(f"d_sum_{c}").over(frame)
            n = F.sum(f"d_cnt_{c}").over(frame)
            ssq = F.sum(f"d_ssq_{c}").over(frame)
            var = ssq / n - F.pow(s / n, 2)
            out_cols.append(F.when(n > 0, F.greatest(var, F.lit(0.0))).alias(name))
        elif op is Operation.MIN:
            out_cols.append(F.min(f"d_min_{c}").over(frame).alias(name))
        elif op is Operation.MAX:
            out_cols.append(F.max(f"d_max_{c}").over(frame).alias(name))
        elif op in (Operation.LAST, Operation.LAST_K, Operation.FIRST, Operation.FIRST_K):
            kind = "lastk" if op in (Operation.LAST, Operation.LAST_K) else "firstk"
            k = p.k if op in (Operation.LAST_K, Operation.FIRST_K) else 1
            col = f"d_{kind}_{c}_{k}"
            merged = F.flatten(F.collect_list(col).over(frame))
            sorted_arr = (
                F.reverse(F.array_sort(merged)) if kind == "lastk" else F.array_sort(merged)
            )
            topk = F.slice(sorted_arr, 1, k)
            vals = F.transform(topk, lambda s: s.v)
            if op in (Operation.LAST, Operation.FIRST):
                out_cols.append(F.get(vals, 0).alias(name))  # null-safe on empty
            else:
                out_cols.append(F.when(F.size(vals) > 0, vals).alias(name))
        elif op in (Operation.UNIQUE_COUNT, Operation.APPROX_UNIQUE_COUNT):
            merged = F.array_distinct(F.flatten(F.collect_list(f"d_set_{c}").over(frame)))
            out_cols.append(F.size(merged).cast("long").alias(name))

    ds_col = F.date_format(F.date_from_unix_date(F.col("day_num").cast("int")), "yyyy-MM-dd")
    return (
        dense.select(*keys, F.col("day_num"), ds_col.alias("ds"), *out_cols)
        .where(F.col("day_num") >= start_day)
        .drop("day_num")
    )
