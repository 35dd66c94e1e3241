"""Leakage-safe time-aware target encoding (smoothed prior-mean).

Target encoding replaces a categorical key with the mean of the label
over that key — THE classic leakage trap: encoded naively, each row's
own label (and future labels) leaks into its feature. The time-aware
form is the fix the feature-store world uses (and the reason Chronon's
as-of engine exists, reference spark/.../GroupBy.scala temporalEvents):
each row sees only labels STRICTLY BEFORE its timestamp, smoothed
toward a global prior so thin keys don't memorize noise:

    te = (prior_sum_key + m * prior_mean_global) / (prior_cnt_key + m)

Exactness contract (everything BIGINT, oracle bit-matchable):

- per-key prior: EXACT strictly-before — an event at the query's own
  ts is excluded (ties would leak simultaneous outcomes, and a row
  labeling itself is the classic target-leak). Computed with the repo's
  sawtooth split: a same-hop strict-prefix via the union-trick window
  over (key, hop) — bounded partitions, hot keys split across hops —
  plus a per-key cumulative over the COMPACT per-(key, hop) sum table
  (rows per partition = that key's active hops, corpus-independent).
- global prior: hop-granular strictly-before (all events in hops
  before the query's hop). The global per-hop table is tiny (#hops
  rows); its prefix is one single-partition window over that tiny
  table, then a broadcast join on hop. Coarsening the PRIOR to hop
  granularity is the same resolution trade the reference's sawtooth
  makes for windows — still zero leakage (only strictly-earlier hops).
- the global prior mean is pre-quantized to micro-units per hop
  (g_mean_micro = g_sum * 1e6 div g_cnt), so the final expression is

      te_micro = (k_sum * 1e6 + m * g_mean_micro) div (k_cnt + m)

  with every operand BIGINT. Labels MUST be non-negative: Spark's
  `div` truncates toward zero while DuckDB's `//` floors, so negative
  intermediate sums would diverge between engine and oracle (and a
  negative "label mass" has no target-encoding meaning anyway).
  Overflow bound: |k_sum| * 1e6 < 2^63 → per-key prior label mass up
  to ~9.2e12 micro-units — same documented bound as decay.py.
- rows whose global prior is empty (queries in the corpus's first hop)
  get NULL: there is nothing leakage-free to encode with yet.

Zero Python stages; fan-out only on compact per-hop tables.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["target_encode_asof"]

_MICRO = 1_000_000


def _hop(ts: Column, hop_ms: int) -> Column:
    # epoch millis are non-negative: truncating div == floor div; Spark
    # and DuckDB agree.
    return (ts / F.lit(hop_ms)).cast("long")


def target_encode_asof(
    events: DataFrame,
    queries: DataFrame,
    key_col: str,
    ts_col: str,
    label_col: str,
    hop_ms: int,
    query_id_col: str,
    smoothing: int = 20,
    out_col: str = "te_micro",
) -> DataFrame:
    """(query_id, key, ts, te_micro): smoothed prior-mean of ``label_col``
    in micro-units (divide by 1e6 for the float feature).

    ``events``: (key, ts epoch-millis, label) with NON-NEGATIVE integral
    labels. ``queries``: (query_id unique, key, ts). ``smoothing`` is the
    pseudo-count ``m`` pulling thin keys toward the global prior.
    """
    if smoothing < 1:
        raise ValueError("smoothing must be >= 1")
    key, ts = F.col(key_col), F.col(ts_col)
    ev = events.select(
        key.alias("__k"),
        ts.cast("long").alias("__ts"),
        F.col(label_col).cast("long").alias("__v"),
        _hop(ts.cast("long"), hop_ms).alias("__hop"),
    )
    qr = queries.select(
        F.col(query_id_col).alias("__qid"),
        key.alias("__k"),
        ts.cast("long").alias("__ts"),
        _hop(ts.cast("long"), hop_ms).alias("__hop"),
    )
    qid_t = qr.schema["__qid"].dataType
    # qr is consumed by three branches (same-hop head union, tail hop grid,
    # global per-hop prior) — Catalyst re-derives the subtree per consumer
    # (pruning/pushdown defeats ReuseExchange), so materialize the bounded
    # query set once; registered for session-owner release (see
    # chronon_spark.checkpoint, same contract as the as-of join's q).
    from chronon_spark.checkpoint import register_plan_checkpoint

    qr = register_plan_checkpoint(qr.localCheckpoint(eager=False))

    # --- per-key same-hop STRICT prefix (union trick). Order (ts, is_q
    # DESC): at equal ts the query (is_q=1) sorts FIRST, so a prefix
    # ending at the query row has seen no same-ts event — strictly-before.
    ev_u = ev.select(
        "__k", "__hop", "__ts", "__v", F.lit(1).alias("__n"),
        F.lit(0).alias("__is_q"), F.lit(None).cast(qid_t).alias("__qid"),
    )
    qr_u = qr.select(
        "__k", "__hop", "__ts", F.lit(0).alias("__v"),
        F.lit(0).alias("__n"), F.lit(1).alias("__is_q"), "__qid",
    )
    w_head = (
        W.partitionBy("__k", "__hop")
        .orderBy("__ts", F.desc("__is_q"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    head = (
        ev_u.unionByName(qr_u)
        .withColumn("__hs", F.sum("__v").over(w_head))
        .withColumn("__hc", F.sum("__n").over(w_head))
        .where(F.col("__is_q") == 1)
        .select("__qid", "__k", "__ts", "__hop", "__hs", "__hc")
    )

    # --- per-key earlier-hop cumulative over the COMPACT hop-sum table,
    # with the union trick again at hop granularity so query hops with no
    # same-hop events still pick up everything earlier: at equal hop the
    # query marker sorts FIRST (excludes its own hop's sum — the head
    # already covered that slice exactly).
    hop_sums = ev.groupBy("__k", "__hop").agg(
        F.sum("__v").alias("__s"), F.count(F.lit(1)).alias("__c")
    )
    q_hops = qr.select("__k", "__hop").distinct()
    hs_u = hop_sums.select("__k", "__hop", "__s", "__c", F.lit(0).alias("__is_q"))
    qh_u = q_hops.select(
        "__k", "__hop", F.lit(0).alias("__s"), F.lit(0).alias("__c"),
        F.lit(1).alias("__is_q"),
    )
    w_tail = (
        W.partitionBy("__k")
        .orderBy("__hop", F.desc("__is_q"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    tail = (
        hs_u.unionByName(qh_u)
        .withColumn("__tsum", F.sum("__s").over(w_tail))
        .withColumn("__tcnt", F.sum("__c").over(w_tail))
        .where(F.col("__is_q") == 1)
        .select("__k", "__hop", "__tsum", "__tcnt")
    )

    # --- global hop-granular prior: tiny per-hop table (union in query
    # hops with zeros), one single-partition prefix window over #hops
    # rows, quantize mean to micro-units, broadcast.
    # algebraic rollup of the COMPACT per-key table — NOT a third scan of
    # the event corpus: sum over keys of per-(key,hop) sums/counts is the
    # per-hop global by associativity
    g_hops = hop_sums.groupBy("__hop").agg(
        F.sum("__s").alias("__s"), F.sum("__c").alias("__c")
    )
    gq = qr.select("__hop").distinct()
    g_u = g_hops.select("__hop", "__s", "__c", F.lit(0).alias("__is_q"))
    gq_u = gq.select(
        "__hop", F.lit(0).alias("__s"), F.lit(0).alias("__c"),
        F.lit(1).alias("__is_q"),
    )
    w_g = (
        W.orderBy("__hop", F.desc("__is_q"))
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    glob = (
        g_u.unionByName(gq_u)
        .withColumn("__gs", F.sum("__s").over(w_g))
        .withColumn("__gc", F.sum("__c").over(w_g))
        .where(F.col("__is_q") == 1)
        .select(
            "__hop",
            F.col("__gc").alias("__g_cnt"),
            F.expr(
                f"CASE WHEN __gc > 0 THEN CAST({_MICRO} AS BIGINT) * __gs div __gc END"
            ).alias("__g_mean_micro"),
        )
    )

    k_sum = F.coalesce(F.col("__hs"), F.lit(0)) + F.coalesce(F.col("__tsum"), F.lit(0))
    k_cnt = F.coalesce(F.col("__hc"), F.lit(0)) + F.coalesce(F.col("__tcnt"), F.lit(0))
    m = F.lit(int(smoothing)).cast("long")
    te = F.expr(
        f"(__k_sum * CAST({_MICRO} AS BIGINT) + {int(smoothing)} * __g_mean_micro) "
        f"div (__k_cnt + {int(smoothing)})"
    )
    return (
        head.join(tail, ["__k", "__hop"], "left")
        .join(F.broadcast(glob), "__hop", "left")
        .withColumn("__k_sum", k_sum)
        .withColumn("__k_cnt", k_cnt)
        .select(
            F.col("__qid").alias(query_id_col),
            F.col("__k").alias(key_col),
            F.col("__ts").alias(ts_col),
            F.when(F.col("__g_cnt") > 0, te).alias(out_col),
        )
    )
