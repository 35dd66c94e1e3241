"""K-list features (LAST_K / TOP_K) on the lambda/tiled serving path.

Reference parity: the reference serves its K-type operations online
because the GroupBy IRs carry bounded item sketches end-to-end
(aggregator TopK/LastK IRs; FetcherUniqueTopKTest exercises the read
path). This engine's exact Arrow kernel computes K-ops in batch, but
the hopped/upload path (plans/upload.py HOPPED_OPS) is scalar-only —
without this module a LAST_K feature could not ride
upload ⊕ tiles ⊕ live-hop serving.

The IR is an exact k-bounded list — a semilattice, not an approximation:
every entry is ``struct(o1, o2, v)`` with ``(o1, o2)`` the DESCENDING
sort rank and ``v`` the emitted value, and the only operator is
``merge = slice(sort_desc(flatten(lists)), 1, k)``. Top-k of a union
equals top-k of per-part top-ks (any globally-ranked entry is ranked
within its own part), so tiles, compaction, and the fetch-time merge
all reuse ONE expression — and results are exactly what the batch
kernel computes on the same window.

Orders:
- ``last_k``: o1 = ts, o2 = v  (most-recent first; same-ts ties break
  by value DESC — deterministic in both engines),
- ``top_k``:  o1 = v, o2 = -ts (largest first; value ties break by ts
  ASC, the kernel/oracle rule).

Streaming production note: unlike ``sketch_serving``'s (bucket,count)
rows — which a single cumulative streaming aggregation emits directly —
a k-list is NOT produced incrementally by one streaming agg, and a
last-writer-wins upsert of per-micro-batch lists would drop earlier
batches' entries. Produce closed-hop tiles with a per-hop batch job
after the hop closes (the pattern the tests pin), or a foreachBatch
upsert that MERGES the stored list with the batch's (the same
``_merge`` expression) before writing.

Scale: per (key, hop) state is ≤ k entries after the salted two-phase
aggregation (phase 1 bounds per-task state at salt × k — the repo's
standard hot-key treatment, sampling.py's top-k pattern); every join is
a keyed equi-join, zero Python anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.plans.upload import COLLAPSED_HOP
from chronon_spark.sources.scan import TS

_MODES = ("last_k", "top_k", "first_k", "bottom_k", "unique_top_k")


def _entry(mode: str, ts: Column, v: Column) -> Column:
    """Rank encoding per mode; the sort DIRECTION (``_asc``) carries the
    rest, so no value is ever arithmetically negated and every mode is
    generic over orderable value types (the reference's
    BottomK[T: Ordering] etc. — strings included), not just numerics:

    - ``last_k``  (DESC): o1 = ts, o2 = v  (most-recent first; ts ties v DESC)
    - ``top_k``   (DESC): o1 = v,  o2 = -ts (largest first; v ties ts ASC)
    - ``first_k`` (ASC):  o1 = ts, o2 = v  (earliest first; ts ties v ASC)
    - ``bottom_k``(ASC):  o1 = v,  o2 = ts (smallest first; v ties ts ASC)

    first_k/bottom_k under ASC order exactly as the previous
    (-ts, -v)/(-v, -ts) DESC encodings did for numerics. top_k keeps the
    one ts negation (ts is always numeric). The flipped modes are the
    reference's FirstK/BottomK aggregators (aggregator
    SimpleAggregators) riding the same semilattice."""
    if mode == "last_k":
        return F.struct(ts.alias("o1"), v.alias("o2"), v.alias("v"))
    if mode == "top_k":
        return F.struct(v.alias("o1"), (-ts).alias("o2"), v.alias("v"))
    if mode == "first_k":
        return F.struct(ts.alias("o1"), v.alias("o2"), v.alias("v"))
    if mode == "bottom_k":
        return F.struct(v.alias("o1"), ts.alias("o2"), v.alias("v"))
    if mode == "unique_top_k":
        # reference UniqueTopK (base/UniqueOrderByLimit.scala) with the
        # batch kernel's concrete rule: DISTINCT values, largest first —
        # id == order == value, so the entry is fully value-determined
        # and dedup is struct equality at every merge point
        return F.struct(v.alias("o1"), v.alias("o2"), v.alias("v"))
    raise ValueError(f"mode must be one of {_MODES}, got {mode!r}")


def _asc(mode: str) -> bool:
    """first_k/bottom_k rank smallest-(ts|value)-first: ascending sort."""
    return mode in ("first_k", "bottom_k")


def _merge(col: Column, k: int, unique: bool = False, asc: bool = False) -> Column:
    merged = F.sort_array(F.flatten(col), asc=asc)
    if unique:
        # identical entries collapse FIRST — a k-slice before dedup would
        # starve distinct values behind a hot duplicate
        merged = F.array_distinct(merged)
    return F.slice(merged, 1, k)


def klist_hop_irs(
    events: DataFrame,
    keys: Sequence[str],
    value_col: str,
    hop_ms: int,
    k: int,
    mode: str = "last_k",
    salt: int = 8,
) -> DataFrame:
    """(keys..., __hop, entries) — per-hop exact k-bounded lists, built
    with the salted two-phase aggregation so no task ever holds more
    than salt × k entries per (key, hop)."""
    keys = list(keys)
    unique = mode == "unique_top_k"
    ev = events.select(
        *keys,
        (F.col(TS) / F.lit(hop_ms)).cast("long").alias("__hop"),
        _entry(mode, F.col(TS).cast("long"), F.col(value_col)).alias(
            "__e"
        ),
    ).where(
        F.col("__e.v").isNotNull()
        & F.col("__e.o1").isNotNull()
        & F.col("__e.o2").isNotNull()
    )
    # salt on the full rank pair: (o1) alone would put a hot VALUE's
    # top_k entries in one bucket; (o1, o2) is unique per event
    phase1 = (
        ev.withColumn(
            "__salt",
            F.pmod(F.hash(F.col("__e.o1"), F.col("__e.o2")), F.lit(int(salt))),
        )
        .groupBy(*keys, "__hop", "__salt")
        .agg(
            _merge(
                F.array(F.collect_list("__e")), int(k), unique, _asc(mode)
            ).alias("__es")
        )
    )
    return (
        phase1.groupBy(*keys, "__hop")
        .agg(
            _merge(F.collect_list("__es"), int(k), unique, _asc(mode)).alias(
                "entries"
            )
        )
    )


def compact_klist_upload(
    upload: DataFrame,
    tile_irs: DataFrame,
    keys: Sequence[str],
    old_batch_end_ms: int,
    new_batch_end_ms: int,
    hop_ms: int,
    tail_hops: int,
    k: int,
    mode: str = "last_k",
) -> DataFrame:
    """Advance the k-list upload's batch end: closed tiles fold in, rows
    older than the retained tail merge into one COLLAPSED k-list per key
    (read only by unbounded fetches). Same guards as compact_tiles."""
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
        merged.where(F.col("__hop") < tail_start)
        .groupBy(*keys)
        .agg(
            _merge(
                F.collect_list("entries"), int(k), mode == "unique_top_k",
                _asc(mode),
            ).alias("entries")
        )
        .withColumn("__hop", F.lit(COLLAPSED_HOP))
        .select(*tails.columns)
    )
    return tails.unionByName(collapsed)


def fetch_klist(
    spark: SparkSession,
    requests: DataFrame,
    irs: DataFrame,
    live_events: DataFrame,
    keys: Sequence[str],
    value_col: str,
    hop_ms: int,
    k: int,
    mode: str = "last_k",
    n_hops: Optional[int] = None,
    out_col: str = "values",
    verify_disjoint: bool = True,
) -> DataFrame:
    """Per-request exact k-lists from the serving state: sawtooth window
    (hop-rounded far edge ``n_hops`` back, exact ``ts <= request ts``
    head over live-hop events) or unbounded (``n_hops=None`` — collapsed
    ∪ tails ∪ head). Same live-hop contract and guards as
    ``fetch_percentile_sketch``. Output: keys + ts + ``out_col``
    (array of the value column's own type, rank order; NULL when nothing
    is in the window)."""
    keys = list(keys)
    q = requests.select(
        *keys, F.col(TS).alias("__qts"),
        (F.col(TS) / F.lit(hop_ms)).cast("long").alias("__qhop"),
    ).distinct()
    bounds = q.agg(F.min("__qhop"), F.max("__qhop")).first()
    if bounds[0] is None:
        return q.select(*keys, F.col("__qts").alias(TS)).withColumn(
            out_col,
            F.lit(None).cast(
                f"array<{live_events.schema[value_col].dataType.simpleString()}>"
            ),
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
        _entry(mode, F.col(TS).cast("long"), F.col(value_col)).alias(
            "__e"
        ),
    ).where(
        F.col("__e.v").isNotNull()
        & F.col("__e.o1").isNotNull()
        & F.col("__e.o2").isNotNull()
    )
    head = (
        q.join(lv, on=keys, how="inner")
        .where(F.col("__ets") <= F.col("__qts"))
        .groupBy(*keys, "__qts")
        .agg(
            _merge(
                F.array(F.collect_list("__e")), int(k),
                mode == "unique_top_k", _asc(mode),
            ).alias("entries")
        )
    )

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
    merged = contrib.groupBy(*keys, "__qts").agg(
        _merge(
            F.collect_list("entries"), int(k), mode == "unique_top_k",
            _asc(mode),
        ).alias("__m")
    )
    out = merged.withColumn(
        out_col, F.transform(F.col("__m"), lambda e: e["v"])
    ).drop("__m")
    return q.select(*keys, "__qts").join(
        out, on=keys + ["__qts"], how="left"
    ).withColumnRenamed("__qts", TS)
