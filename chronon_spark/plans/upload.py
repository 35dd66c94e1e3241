"""GroupByUpload: the batch-side IR table of the lambda architecture.

Reference (spark/.../GroupByUpload.scala:64-130; FinalBatchIr =
collapsed + tailHops, SawtoothOnlineAggregator.scala): for each key, the
batch job uploads
- one COLLAPSED row — every event older than the largest window's tail,
  pre-merged into a single IR (only unbounded windows read it), and
- one row per TAIL HOP inside [batch_end − maxWindow, batch_end) — the
  mergeable per-hop IRs that windowed features stitch at query time.

Here the "KV store" is a parquet/Iceberg table keyed by (keys, __hop),
with the collapsed row at ``__hop = COLLAPSED_HOP``. Serving == the
batch lambda merge: ``group_by_asof_hopped(..., events_df=fresh rows,
extra_hop_irs=upload)`` — a RANGE window frame naturally reads the
collapsed row only for unbounded frames (its hop index is far below any
windowed frame's lower bound).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api.types import GroupBy, Operation
from chronon_spark.operators.asof_hopped import hop_irs_for, supports_hopped
from chronon_spark.operators.asof_join import events_df_for_group_by, null_out_nans
from chronon_spark.sources.scan import TS

COLLAPSED_HOP = -(10**9)  # far below any real hop index


def _merge_aggs(parts: list) -> list:
    """Second-level MERGE aggregators over i_* IR columns (IRs are
    mergeable by construction — SURVEY.md §1.4)."""
    out: list[Column] = []
    seen: set = set()

    def add(name: str, col: Column):
        if name not in seen:
            seen.add(name)
            out.append(col.alias(name))

    for p in parts:
        c = p.input_column
        op = p.operation
        if op in (Operation.COUNT, Operation.SUM, Operation.AVERAGE, Operation.VARIANCE):
            add(f"i_cnt_{c}", F.sum(f"i_cnt_{c}"))
            add(f"i_sum_{c}", F.sum(f"i_sum_{c}"))
            if op is Operation.VARIANCE:
                # shifted-moments merge about the per-key offset __k_{c}
                # (joined in upload_group_by); finalized to a single i_m2
                # post-agg: i_m2 = sum(m2_h) + sum(n_h*(mean_h-K)^2) - A^2/N
                add(f"__m2s_{c}", F.sum(f"i_m2_{c}"))
                add(
                    f"__b_{c}",
                    F.sum(
                        F.when(
                            F.col(f"i_cnt_{c}") > 0,
                            F.pow(
                                F.col(f"i_sum_{c}")
                                - F.col(f"i_cnt_{c}") * F.col(f"__k_{c}"),
                                2,
                            )
                            / F.col(f"i_cnt_{c}"),
                        )
                    ),
                )
                add(f"__k_{c}", F.first(f"__k_{c}"))
        elif op is Operation.MIN:
            add(f"i_min_{c}", F.min(f"i_min_{c}"))
        elif op is Operation.MAX:
            add(f"i_max_{c}", F.max(f"i_max_{c}"))
        elif op is Operation.LAST:
            add(f"i_last_{c}", F.max(f"i_last_{c}"))
        elif op is Operation.FIRST:
            add(f"i_first_{c}", F.min(f"i_first_{c}"))
        elif op is Operation.UNIQUE_COUNT:
            add(f"i_set_{c}", F.array_distinct(F.flatten(F.collect_list(f"i_set_{c}"))))
        elif op is Operation.APPROX_UNIQUE_COUNT:
            add(f"i_hll_{c}", F.hll_union_agg(f"i_hll_{c}"))
        else:  # pragma: no cover
            raise NotImplementedError(op)
    return out


def upload_group_by(
    spark: SparkSession,
    group_by: GroupBy,
    batch_end_ms: int,
    hop_ms: int,
    output_path: Optional[str] = None,
) -> DataFrame:
    """Build (and optionally write) the FinalBatchIr table at a batch end
    aligned to a hop boundary."""
    assert batch_end_ms % hop_ms == 0, "batch end must align to a hop boundary"
    assert supports_hopped(group_by, hop_ms)
    keys = list(group_by.key_columns)
    parts = [p for p in group_by.unpack() if p.bucket is None]

    events = events_df_for_group_by(spark, group_by, None, batch_end_ms - 1)
    events = null_out_nans(events, list({p.input_column for p in parts}))
    events = events.where(F.col(TS) < batch_end_ms)
    irs = hop_irs_for(events, group_by, hop_ms)

    # tail region = the largest WINDOWED window; everything older collapses
    # into one row per key (read only by unbounded frames — its hop index
    # sits far below any windowed frame's range)
    windowed = [p.window.millis for p in parts if p.window is not None]
    mw_w = max(windowed) if windowed else 0
    tail_start_hop = (batch_end_ms - mw_w) // hop_ms
    tails = irs.where(F.col("__hop") >= tail_start_hop)
    old = irs.where(F.col("__hop") < tail_start_hop)
    var_cols = sorted(
        {p.input_column for p in parts if p.operation is Operation.VARIANCE}
    )
    if var_cols:
        # per-key offset for the stable variance merge — one cheap agg over
        # IR rows (not raw events), shuffle-joined back on the same keys
        # (AQE broadcasts it when it is small; never force at 10^9 keys)
        kdf = old.groupBy(*keys).agg(
            *[
                (F.sum(f"i_sum_{c}") / F.sum(f"i_cnt_{c}")).alias(f"__k_{c}")
                for c in var_cols
            ]
        )
        old = old.join(kdf, on=keys, how="left")
    collapsed = old.groupBy(*keys).agg(*_merge_aggs(parts))
    for c in var_cols:
        a = F.col(f"i_sum_{c}") - F.col(f"i_cnt_{c}") * F.col(f"__k_{c}")
        collapsed = collapsed.withColumn(
            f"i_m2_{c}",
            F.when(
                F.col(f"i_cnt_{c}") > 0,
                F.col(f"__m2s_{c}")
                + F.col(f"__b_{c}")
                - F.pow(a, 2) / F.col(f"i_cnt_{c}"),
            ),
        ).drop(f"__m2s_{c}", f"__b_{c}", f"__k_{c}")
    collapsed = collapsed.withColumn("__hop", F.lit(COLLAPSED_HOP)).select(
        *tails.columns
    )
    upload = tails.unionByName(collapsed)
    if output_path:
        upload.write.mode("overwrite").parquet(output_path)
        upload = spark.read.parquet(output_path)
    return upload
