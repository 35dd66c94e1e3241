"""Exponentially time-decayed as-of counters (half-life features).

A standard feature-engineering aggregate the reference's fixed Operation
set lacks: a counter whose past contributions halve every ``half_life``
milliseconds. We give it the reference's sawtooth architecture — a
PRECISE HEAD over the query's own hop plus a HOPPED TAIL of
pre-aggregated per-hop IRs (reference
aggregator/windowing/HopsAggregator.scala:1-150 builds exactly these
per-hop partial sums; SawtoothOnlineAggregator.scala:1-200 merges hop
IRs with a precise head) — but with hop-granular exponential decay
applied at merge time instead of a sliding cutoff.

Semantics (bucket-granular decay, leakage-free):

- hop ``b(ts) = ts div half_life`` (epoch millis, non-negative).
- an event in the SAME hop as the query contributes at full weight iff
  ``event_ts <= query_ts`` (the repo-wide inclusive as-of head rule,
  kernel/sawtooth.py); later events in the hop contribute NOTHING —
  zero temporal leakage.
- an event ``d >= 1`` hops before the query's hop contributes its value
  times ``2^-d``, independent of the query's sub-hop position. This is
  the hopped-tail resolution trade the reference makes for sliding
  windows (event granularity coarsens to the hop), applied to decay.

Exactness: results are integer IRs in units of ``2^-scale_bits``:

    decayed_q = head_sum * 2^scale_bits
              + sum_{d=1..horizon} hop_sum[b-d] * 2^(scale_bits-d)

With integral ``value_col`` and ``horizon <= scale_bits`` every term is
an exact BIGINT product — no floating point, no rounding, no
order-dependence — so the DuckDB oracle matches bit-for-bit and hop IRs
merge associatively (the lambda-architecture property the reference's
IR design exists for). Contributions older than ``horizon`` hops are
dropped; at the default ``horizon = scale_bits = 20`` a dropped hop's
weight is below one quantum (< 2^-20 of an event), the same cutoff the
quantized result itself can express.

Scale story (100 TB): the head's window partitions by (key, hop) — a
hot key's history splits across hops, so no single task owns a whole
domain (the bound lag/lead once had). The tail explodes the COMPACT
per-hop sum table by ``horizon`` (bounded fan-out on #keys x #hops,
corpus-independent), never the query or event table. Head and tail
both hash on (key, hop), so AQE coalesces them into aligned exchanges;
zero Python stages anywhere.

Overflow bound: |hop_sum| * 2^scale_bits must stay under 2^63 — with
scale_bits=20 that allows per-hop per-key sums up to ~8.8e12 units,
checked nowhere (document, don't pay a runtime pass).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["decayed_sum_asof"]


def _hop(ts: Column, half_life_ms: int) -> Column:
    # epoch millis are non-negative, so truncating div == floor div and
    # Spark's `div` agrees with DuckDB's `//` in the oracle.
    return (ts / F.lit(half_life_ms)).cast("long")


def decayed_sum_asof(
    events: DataFrame,
    queries: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    half_life_ms: int,
    query_id_col: str,
    scale_bits: int = 20,
    horizon: int | None = None,
) -> DataFrame:
    """For each query row, the exponentially decayed sum of prior event
    values: full weight in the query's own hop (inclusive as-of), weight
    ``2^-d`` for events ``d`` hops earlier.

    ``events``: (key_col, ts_col epoch-millis, value_col integral).
    ``queries``: (key_col, ts_col, query_id_col unique per row).
    Returns (query_id_col, key_col, ts_col, decayed_q) where ``decayed_q``
    is the BIGINT IR in units of ``2^-scale_bits`` (divide to taste).
    """
    if horizon is None:
        horizon = scale_bits
    if horizon > scale_bits:
        raise ValueError(
            f"horizon ({horizon}) > scale_bits ({scale_bits}) would need "
            "floor division (order-exactness breaks for negative sums); "
            "raise scale_bits instead"
        )

    key, ts = F.col(key_col), F.col(ts_col)
    ev = events.select(
        key.alias("__k"),
        ts.cast("long").alias("__ts"),
        F.col(value_col).cast("long").alias("__v"),
        _hop(ts.cast("long"), half_life_ms).alias("__hop"),
    )
    qr = queries.select(
        F.col(query_id_col).alias("__qid"),
        key.alias("__k"),
        ts.cast("long").alias("__ts"),
        _hop(ts.cast("long"), half_life_ms).alias("__hop"),
    )

    # --- precise head: same-hop inclusive prefix sum via the union trick
    # (one window over (key, hop) — bounded partitions, no per-key task).
    # Order (ts, is_q): events sort BEFORE queries at equal ts, so an
    # event at exactly query_ts is included — the repo's inclusive rule.
    ev_u = ev.select("__k", "__hop", "__ts", "__v", F.lit(0).alias("__is_q"),
                     F.lit(None).cast(qr.schema["__qid"].dataType).alias("__qid"))
    qr_u = qr.select("__k", "__hop", "__ts", F.lit(0).alias("__v"),
                     F.lit(1).alias("__is_q"), "__qid")
    w = (
        W.partitionBy("__k", "__hop")
        .orderBy("__ts", "__is_q")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    head = (
        ev_u.unionByName(qr_u)
        .withColumn("__head", F.sum("__v").over(w))
        .where(F.col("__is_q") == 1)
        .select("__qid", "__k", "__ts", "__hop", "__head")
    )

    # --- hopped tail: per-hop sums, exploded by offset d=1..horizon so a
    # hop sum lands on every query hop it decays into. Fan-out is on the
    # compact hop-sum table; weights 2^(scale_bits-d) are exact BIGINTs.
    hop_sums = ev.groupBy("__k", "__hop").agg(F.sum("__v").alias("__s"))
    offsets = F.sequence(F.lit(1), F.lit(horizon))
    tail = (
        hop_sums.select(
            "__k",
            F.explode(offsets).alias("__d"),
            F.col("__hop").alias("__src_hop"),
            F.col("__s"),
        )
        .select(
            "__k",
            (F.col("__src_hop") + F.col("__d")).alias("__hop"),
            # python shiftleft() wants an int bit count; the per-row
            # (scale_bits - d) needs the SQL form
            (F.col("__s")
             * F.expr(f"shiftleft(CAST(1 AS BIGINT), {int(scale_bits)} - __d)")
             ).alias("__c"),
        )
        .groupBy("__k", "__hop")
        .agg(F.sum("__c").alias("__tail"))
    )

    out = (
        head.join(tail, ["__k", "__hop"], "left")
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__k").alias(key_col),
            F.col("__ts").alias(ts_col),
            (
                F.col("__head") * F.shiftleft(F.lit(1).cast("long"), scale_bits)
                + F.coalesce(F.col("__tail"), F.lit(0).cast("long"))
            ).alias("decayed_q"),
        )
    )
    return out
