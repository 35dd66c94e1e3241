"""Frequency top-k (heavy hitters) on the lambda/tiled serving path.

Reference parity: the reference's APPROX_FREQUENT_K / UNIQUE_TOP_K
operations serve online from mergeable ItemsSketch IRs
(FetcherUniqueTopKTest family). Sketch libraries are merge-order
dependent, which would break cross-engine oracling — so this module
uses the DETERMINISTIC truncated-count construction instead:

- per (keys, hop): EXACT per-item counts, keep the top ``m`` by
  ``(count DESC, item ASC)`` — a pure function of the hop's events,
- merge (tiles → compaction → fetch window): SUM counts per item across
  retained lists, re-truncate by the same order.

Approximation model (space-saving-style): an item's served count is
exact unless the item fell outside some hop's top-``m``; mass lost that
way is bounded by the dropped tail of each hop. With ``m`` a few times
``k`` the served top-``k`` matches the exact top-``k`` whenever hop
distributions are not adversarially flat — and every step is
deterministic, so the DuckDB oracle replays the algebra bit-for-bit
(the same honesty contract as the BPE / CCNet oracles).

Streaming production note: unlike ``sketch_serving``'s (bucket,count)
rows — which a single cumulative streaming aggregation emits directly —
a k-list is NOT produced incrementally by one streaming agg, and a
last-writer-wins upsert of per-micro-batch lists would drop earlier
batches' entries. Produce closed-hop tiles with a per-hop batch job
after the hop closes (the pattern the tests pin), or a foreachBatch
upsert that MERGES the stored list with the batch's (the same
``_merge`` expression) before writing.

Entries are ``struct(negcnt=-count, v=item)`` sorted ASCENDING —
lexicographic (-count ASC, item ASC) = (count DESC, item ASC) — so the
item column can be ANY orderable Spark type (strings, longs). Scale:
per-(key,hop) IR state ≤ m entries; the per-hop count aggregation is
map-side combinable on (keys, hop, item); fetch fan-in per request is
≤ (window hops + 1) × m entries.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.plans.upload import COLLAPSED_HOP
from chronon_spark.sources.scan import TS


def _entries_from_counts(df: DataFrame, grain: list, m: int) -> DataFrame:
    """(grain..., __cnt, __item) rows -> (grain..., entries) with the
    top-m (count DESC, item ASC) entries per grain."""
    e = F.struct(
        (-F.col("__cnt")).alias("negcnt"), F.col("__item").alias("v")
    )
    return (
        df.select(*grain, e.alias("__e"))
        .groupBy(*grain)
        .agg(
            F.slice(
                F.sort_array(F.collect_list("__e")), 1, int(m)
            ).alias("entries")
        )
    )


def _remerge(df: DataFrame, grain: list, m: int) -> DataFrame:
    """Merge entry lists across extra dimensions down to ``grain``: SUM
    counts per item, re-truncate. The one shared merge of tiles,
    compaction, and the fetch."""
    counts = (
        df.select(*grain, F.explode("entries").alias("__e"))
        .groupBy(*grain, F.col("__e.v").alias("__item"))
        .agg((-F.sum("__e.negcnt")).alias("__cnt"))
    )
    return _entries_from_counts(counts, grain, m)


def freq_hop_irs(
    events: DataFrame,
    keys: Sequence[str],
    item_col: str,
    hop_ms: int,
    m: int,
) -> DataFrame:
    """(keys..., __hop, entries): per-hop exact item counts truncated to
    the top ``m`` — the tile AND upload payload."""
    keys = list(keys)
    counts = (
        events.select(
            *keys,
            (F.col(TS) / F.lit(hop_ms)).cast("long").alias("__hop"),
            F.col(item_col).alias("__item"),
        )
        .where(F.col("__item").isNotNull())
        .groupBy(*keys, "__hop", "__item")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    return _entries_from_counts(counts, keys + ["__hop"], m)


def compact_freq_upload(
    upload: DataFrame,
    tile_irs: DataFrame,
    keys: Sequence[str],
    old_batch_end_ms: int,
    new_batch_end_ms: int,
    hop_ms: int,
    tail_hops: int,
    m: int,
) -> DataFrame:
    """Advance the batch end; pre-tail rows merge into one COLLAPSED
    top-m list per key. Same double-count guards as compact_tiles."""
    assert old_batch_end_ms % hop_ms == 0 and new_batch_end_ms % hop_ms == 0, (
        "batch ends must align to hop boundaries"
    )
    assert new_batch_end_ms >= old_batch_end_ms, "batch end cannot move backward"
    keys = list(keys)
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
    tail_start = new_hop - int(tail_hops)
    merged = upload.unionByName(tile_irs)
    tails = merged.where(F.col("__hop") >= tail_start)
    collapsed = (
        _remerge(merged.where(F.col("__hop") < tail_start), keys, m)
        .withColumn("__hop", F.lit(COLLAPSED_HOP))
        .select(*tails.columns)
    )
    return tails.unionByName(collapsed)


def fetch_freq_topk(
    spark: SparkSession,
    requests: DataFrame,
    irs: DataFrame,
    live_events: DataFrame,
    keys: Sequence[str],
    item_col: str,
    hop_ms: int,
    k: int,
    m: Optional[int] = None,
    n_hops: Optional[int] = None,
    out_col: str = "top_items",
    verify_disjoint: bool = True,
    histogram: bool = False,
) -> DataFrame:
    """Per-request frequency top-k from the serving state: the exact
    ``ts <= request ts`` head over live-hop events ⊕ the window's (or
    all, when ``n_hops=None``) retained tile lists, merged by the shared
    SUM-and-retruncate. Live-hop contract and guards as the other
    serving fetches. Output: keys + ts + ``out_col`` (array<long>,
    most-frequent first, count ties broken by smaller item)."""
    keys = list(keys)
    m = int(m if m is not None else 4 * k)
    q = requests.select(
        *keys, F.col(TS).alias("__qts"),
        (F.col(TS) / F.lit(hop_ms)).cast("long").alias("__qhop"),
    ).distinct()
    bounds = q.agg(F.min("__qhop"), F.max("__qhop")).first()
    if bounds[0] is None:
        return q.select(*keys, F.col("__qts").alias(TS)).withColumn(
            out_col,
            F.lit(None).cast(f"array<{live_events.schema[item_col].dataType.simpleString()}>"),
        )
    assert bounds[0] == bounds[1], "all requests must sit in one live hop"
    live_hop = int(bounds[0])
    if verify_disjoint:
        ir_max = irs.agg(
            F.max(F.when(F.col("__hop") != COLLAPSED_HOP, F.col("__hop")))
        ).first()[0]
        if ir_max is not None and int(ir_max) >= live_hop:
            raise ValueError(
                f"IR hop {ir_max} at/after the live hop {live_hop}: double count"
            )

    lv = live_events.where(
        (F.col(TS) / F.lit(hop_ms)).cast("long") == live_hop
    ).select(
        *keys, F.col(TS).cast("long").alias("__ets"),
        F.col(item_col).alias("__item"),
    ).where(F.col("__item").isNotNull())
    head_counts = (
        q.join(lv, on=keys, how="inner")
        .where(F.col("__ets") <= F.col("__qts"))
        .groupBy(*keys, "__qts", "__item")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    head = _entries_from_counts(head_counts, keys + ["__qts"], m)

    if n_hops is None:
        tail = irs.join(q.select(*keys, "__qts").distinct(), on=keys, how="inner")
    else:
        if n_hops < 1:
            raise ValueError("n_hops must be >= 1 (the head alone is hop 0)")
        tail = irs.where(
            (F.col("__hop") != COLLAPSED_HOP)
            & (F.col("__hop") >= live_hop - int(n_hops))
            & (F.col("__hop") < live_hop)
        ).join(q.select(*keys, "__qts").distinct(), on=keys, how="inner")

    contrib = head.select(*keys, "__qts", "entries").unionByName(
        tail.select(*keys, "__qts", "entries")
    )
    merged = _remerge(contrib, keys + ["__qts"], m)
    if histogram:
        # exact HISTOGRAM finalize: item -> count map, item-sorted for
        # deterministic rendering (exact when m covers every item)
        ent = F.sort_array(
            F.transform(
                "entries",
                lambda e: F.struct(
                    e["v"].alias("key"), (-e["negcnt"]).alias("value")
                ),
            )
        )
        out = merged.withColumn(out_col, F.map_from_entries(ent)).drop("entries")
    else:
        out = merged.withColumn(
            out_col, F.slice(F.transform("entries", lambda e: e["v"]), 1, int(k))
        ).drop("entries")
    return q.select(*keys, "__qts").join(
        out, on=keys + ["__qts"], how="left"
    ).withColumnRenamed("__qts", TS)


def fetch_histogram(
    spark: SparkSession,
    requests: DataFrame,
    irs: DataFrame,
    live_events: DataFrame,
    keys: Sequence[str],
    item_col: str,
    hop_ms: int,
    n_hops: Optional[int] = None,
    out_col: str = "histogram",
    verify_disjoint: bool = True,
    m: Optional[int] = None,
) -> DataFrame:
    """Exact HISTOGRAM on the serving path (reference Operation.HISTOGRAM
    map IR; the 21-op batch kernel's map feature could not ride
    upload ⊕ tiles before): the same truncated-count semilattice with
    ``m`` unbounded by default, so per-hop entries are EXACT counts and
    the merge is a plain per-item SUM; finalize = item-sorted
    item → count map. Bounded-``m`` mode degrades exactly like
    ``fetch_freq_topk`` (per-hop tail mass dropped, deterministic).

    Scale note: an unbounded histogram's state is O(distinct items per
    key) — the reference's map IR has the same bound; pass ``m`` when
    item cardinality is adversarial."""
    return fetch_freq_topk(
        spark,
        requests,
        irs,
        live_events,
        keys,
        item_col,
        hop_ms,
        k=1,  # ignored in histogram mode
        m=m if m is not None else (1 << 31) - 1,
        n_hops=n_hops,
        out_col=out_col,
        verify_disjoint=verify_disjoint,
        histogram=True,
    )
