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
        if op in (Operation.COUNT, Operation.SUM, Operation.AVERAGE, Operation.VARIANCE,
                  Operation.SKEW, Operation.KURTOSIS):
            add(f"i_cnt_{c}", F.sum(f"i_cnt_{c}"))
            add(f"i_sum_{c}", F.sum(f"i_sum_{c}"))
            if op in (Operation.VARIANCE, Operation.SKEW, Operation.KURTOSIS):
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
            if op in (Operation.SKEW, Operation.KURTOSIS):
                # per-row (hop) re-shift of the 3rd/4th central sums to K,
                # then plain SUM — the same exact polynomial transform the
                # hopped tail uses (asof_hopped._tail_cols)
                n_h = F.col(f"i_cnt_{c}")
                d_h = F.when(n_h > 0, F.col(f"i_sum_{c}") / n_h - F.col(f"__k_{c}"))
                m2_h, m3_h = F.col(f"i_m2_{c}"), F.col(f"i_m3_{c}")
                add(
                    f"__s3_{c}",
                    F.sum(m3_h + 3 * d_h * m2_h + n_h * F.pow(d_h, 3)),
                )
                if op is Operation.KURTOSIS:
                    m4_h = F.col(f"i_m4_{c}")
                    add(
                        f"__s4_{c}",
                        F.sum(
                            m4_h
                            + 4 * d_h * m3_h
                            + 6 * F.pow(d_h, 2) * m2_h
                            + n_h * F.pow(d_h, 4)
                        ),
                    )
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

    upload = collapse_irs(irs, keys, parts, _tail_start_hop(parts, batch_end_ms, hop_ms))
    if output_path:
        upload.write.mode("overwrite").parquet(output_path)
        upload = spark.read.parquet(output_path)
    return upload


def _tail_start_hop(parts: list, batch_end_ms: int, hop_ms: int) -> int:
    # tail region = the largest WINDOWED window; everything older collapses
    # into one row per key (read only by unbounded frames — its hop index
    # sits far below any windowed frame's range)
    windowed = [p.window.millis for p in parts if p.window is not None]
    mw_w = max(windowed) if windowed else 0
    return (batch_end_ms - mw_w) // hop_ms


def collapse_irs(
    irs: DataFrame, keys: list, parts: list, tail_start_hop: int
) -> DataFrame:
    """Fold every IR row older than ``tail_start_hop`` (including a prior
    COLLAPSED row — its hop sits below any real hop) into one collapsed
    row per key; rows at/after the boundary pass through untouched. The
    shared merge step of GroupByUpload and tile compaction."""
    tails = irs.where(F.col("__hop") >= tail_start_hop)
    old = irs.where(F.col("__hop") < tail_start_hop)
    # highest central-moment order needed per input column
    order_of: dict = {}
    for p in parts:
        o = {Operation.VARIANCE: 2, Operation.SKEW: 3, Operation.KURTOSIS: 4}.get(
            p.operation, 0
        )
        if o:
            order_of[p.input_column] = max(order_of.get(p.input_column, 0), o)
    var_cols = sorted(order_of)
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
        n = F.col(f"i_cnt_{c}")
        a = F.col(f"i_sum_{c}") - n * F.col(f"__k_{c}")
        s2k = F.col(f"__m2s_{c}") + F.col(f"__b_{c}")
        delta = a / n
        collapsed = collapsed.withColumn(
            f"i_m2_{c}", F.when(n > 0, s2k - n * F.pow(delta, 2))
        )
        drops = [f"__m2s_{c}", f"__b_{c}", f"__k_{c}"]
        if order_of[c] >= 3:
            # re-center the collapsed 3rd/4th sums from K to the collapsed
            # group's own mean — the result is a regular hop-style IR
            s3k = F.col(f"__s3_{c}")
            collapsed = collapsed.withColumn(
                f"i_m3_{c}",
                F.when(
                    n > 0, s3k - 3 * delta * s2k + 2 * n * F.pow(delta, 3)
                ),
            )
            drops.append(f"__s3_{c}")
        if order_of[c] >= 4:
            s4k = F.col(f"__s4_{c}")
            collapsed = collapsed.withColumn(
                f"i_m4_{c}",
                F.when(
                    n > 0,
                    s4k
                    - 4 * delta * F.col(f"__s3_{c}")
                    + 6 * F.pow(delta, 2) * s2k
                    - 3 * n * F.pow(delta, 4),
                ),
            )
            drops.append(f"__s4_{c}")
        collapsed = collapsed.drop(*drops)
    collapsed = collapsed.withColumn("__hop", F.lit(COLLAPSED_HOP)).select(
        *tails.columns
    )
    return tails.unionByName(collapsed)


def compact_tiles(
    spark: SparkSession,
    group_by: GroupBy,
    upload: DataFrame,
    tile_irs: DataFrame,
    old_batch_end_ms: int,
    new_batch_end_ms: int,
    hop_ms: int,
) -> DataFrame:
    """Advance the batch end by folding CLOSED streaming tiles into the
    batch IR table — the lambda architecture's compaction step.

    Reference: the steady-state online topology keeps the batch upload
    (GroupByUpload.scala) plus per-hop streaming tiles; without periodic
    compaction the tile range a fetch must merge grows without bound.
    The reference handles this by re-running the batch upload over raw
    events each day; at a 10^12-event table that is a full recompute.
    This job instead merges the EXISTING upload with the closed tiles
    covering ``[old_batch_end, new_batch_end)`` — IR algebra only, never
    touching raw events — and emits a new FinalBatchIr table whose rows
    are ≡ ``upload_group_by`` at ``new_batch_end_ms`` (pinned in tests;
    VARIANCE merges by the same shifted-moment algebra, allclose).

    Double-count guards: tiles must lie in ``[old_end_hop, new_end_hop)``
    — a tile inside the old batch range is already in the upload, a tile
    at/after the new end belongs to the next compaction — and the tile
    frame must not carry a collapsed row. Scale: one groupBy over
    (keys × tail hops) IR rows — input-size independent.
    """
    assert old_batch_end_ms % hop_ms == 0 and new_batch_end_ms % hop_ms == 0, (
        "batch ends must align to hop boundaries"
    )
    assert new_batch_end_ms >= old_batch_end_ms, "batch end cannot move backward"
    keys = list(group_by.key_columns)
    parts = [p for p in group_by.unpack() if p.bucket is None]
    old_hop, new_hop = old_batch_end_ms // hop_ms, new_batch_end_ms // hop_ms
    bounds = tile_irs.agg(F.min("__hop"), F.max("__hop")).first()
    if bounds[0] is not None:
        if int(bounds[0]) < old_hop:
            raise ValueError(
                f"tile hop {bounds[0]} inside the old batch range (< {old_hop}): "
                "already counted in the upload"
            )
        if int(bounds[1]) >= new_hop:
            raise ValueError(
                f"tile hop {bounds[1]} at/after the new batch end ({new_hop}): "
                "compact it in the next cycle"
            )
    # STRICT union: a tile frame missing an IR column would silently
    # null-fill and corrupt the merge (e.g. a VARIANCE part's i_m2);
    # stream_hop_irs is pinned to the exact batch IR shape, so any
    # mismatch here is a bug that must fail loudly
    if set(upload.columns) != set(tile_irs.columns):
        raise ValueError(
            "tile IR columns != upload IR columns: "
            f"{sorted(set(upload.columns) ^ set(tile_irs.columns))}"
        )
    merged = upload.unionByName(tile_irs)
    return collapse_irs(
        merged, keys, parts, _tail_start_hop(parts, new_batch_end_ms, hop_ms)
    )
