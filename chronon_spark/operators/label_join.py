"""Forward-window label join: attach training labels to feature rows.

The as-of engine looks BACKWARD (features must only see the past); a
training set also needs each row's LABEL, aggregated over events that
happen AFTER the feature moment — e.g. "did the user purchase within 7
days of this impression". The reference ships this as the `label-join`
run mode (python/src/ai/chronon/repo/constants.py:26,63,101 — the
offline LabelJoin node the CLI schedules) and models the day-granular
refresh flow with StagingQuery.recomputeDays (thrift/api.thrift:100-106:
"partially mature aggregations ... common labeling flows"). This module
is the engine for both shapes:

- ``label_join_snapshot``: day-granularity (the reference's LabelJoin
  semantics): a feature row on partition ``ds`` gets labels aggregated
  over label-source rows with ds in [ds+1, ds+offset_days]. Rows whose
  label window has not fully landed yet are still emitted with whatever
  mass exists (NULL when none) — the immature-label state recomputeDays
  exists to refresh.

- ``label_sawtooth``: event-granularity with the sawtooth trade flipped
  forward: the LEAKAGE-critical near edge is exact (strictly AFTER the
  query ts — the feature moment itself never labels itself), the far
  edge is hop-rounded (everything in the next ``n_hops`` whole hops).
  Mirrors the reference's backward sawtooth (HopsAggregator partial
  sums + a precise edge at the query's own hop) so batch IRs stay
  associative and lambda-mergeable.

Scale story (100 TB): both modes aggregate the label source to a
compact per-(key, day|hop) partial table FIRST (map-side combine), and
all window fan-out (explode by day offset / hop offset) happens on that
compact table — never on the raw event or query table. The snapshot
join is a hash join on (key, ds); the sawtooth head is the repo's
union-trick window over (key, hop) — bounded partitions, a hot key's
history splits across hops, no per-key task. Zero Python stages.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["label_join_snapshot", "label_sawtooth"]


def label_join_snapshot(
    left: DataFrame,
    labels: DataFrame,
    key_col: str,
    ds_col: str,
    value_col: str,
    offset_days: int,
    prefix: str = "label",
) -> DataFrame:
    """left + (prefix_sum, prefix_cnt, prefix_min, prefix_max) over label
    rows with ``ds`` in [left.ds+1, left.ds+offset_days].

    ``ds_col`` must be a date (or date-castable) column in BOTH frames;
    ``value_col`` (label source) should be integral for bit-exact sums —
    pre-scale floats to cents upstream. Left rows with no landed labels
    keep NULLs (immature window — refresh via recomputeDays).
    """
    if offset_days < 1:
        raise ValueError("offset_days must be >= 1")
    per_day = (
        labels.groupBy(
            F.col(key_col).alias("__k"),
            F.col(ds_col).cast("date").alias("__lds"),
        )
        .agg(
            F.sum(value_col).alias("__s"),
            F.count(F.lit(1)).alias("__c"),
            F.min(value_col).alias("__mn"),
            F.max(value_col).alias("__mx"),
        )
    )
    # a label landing on day L serves every query day L-offset .. L-1:
    # fan-out on the compact per-day table, never the raw label events.
    served = (
        per_day.select(
            "__k", "__s", "__c", "__mn", "__mx",
            F.explode(
                F.sequence(F.lit(1), F.lit(int(offset_days)))
            ).alias("__d"),
            F.col("__lds"),
        )
        .select(
            "__k",
            F.date_sub(F.col("__lds"), F.col("__d")).alias("__qds"),
            "__s", "__c", "__mn", "__mx",
        )
        .groupBy("__k", "__qds")
        .agg(
            F.sum("__s").alias(f"{prefix}_sum"),
            F.sum("__c").alias(f"{prefix}_cnt"),
            F.min("__mn").alias(f"{prefix}_min"),
            F.max("__mx").alias(f"{prefix}_max"),
        )
    )
    return left.join(
        served,
        (left[key_col] == served["__k"])
        & (left[ds_col].cast("date") == served["__qds"]),
        "left",
    ).drop("__k", "__qds")


def _hop(ts: Column, hop_ms: int) -> Column:
    # epoch millis are non-negative: truncating div == floor div, and
    # Spark's cast agrees with DuckDB's // in the oracle.
    return (ts / F.lit(hop_ms)).cast("long")


def label_sawtooth(
    events: DataFrame,
    queries: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    hop_ms: int,
    n_hops: int,
    query_id_col: str,
    prefix: str = "label",
) -> DataFrame:
    """For each query row: SUM + COUNT of event values STRICTLY after the
    query ts, through the end of the query's hop plus ``n_hops`` whole
    hops (forward sawtooth: exact leakage edge, hop-rounded far edge).

    Returns (query_id, key, ts, prefix_sum, prefix_cnt); zero-mass
    windows yield sum NULL / cnt 0 (no label landed yet).
    """
    if n_hops < 0:
        raise ValueError("n_hops must be >= 0")
    key, ts = F.col(key_col), F.col(ts_col)
    ev = events.select(
        key.alias("__k"),
        ts.cast("long").alias("__ts"),
        F.col(value_col).cast("long").alias("__v"),
        _hop(ts.cast("long"), hop_ms).alias("__hop"),
    )
    qr = queries.select(
        F.col(query_id_col).alias("__qid"),
        key.alias("__k"),
        ts.cast("long").alias("__ts"),
        _hop(ts.cast("long"), hop_ms).alias("__hop"),
    )

    # --- precise head: same-hop SUFFIX sum via the union trick. Order
    # (ts, is_q): at equal ts the event (is_q=0) sorts BEFORE the query,
    # so a suffix starting AT the query row excludes it — the strict
    # "label events happen after the feature moment" rule.
    ev_u = ev.select(
        "__k", "__hop", "__ts", "__v",
        F.lit(1).alias("__n"), F.lit(0).alias("__is_q"),
        F.lit(None).cast(qr.schema["__qid"].dataType).alias("__qid"),
    )
    qr_u = qr.select(
        "__k", "__hop", "__ts",
        F.lit(0).alias("__v"), F.lit(0).alias("__n"),
        F.lit(1).alias("__is_q"), "__qid",
    )
    w = (
        W.partitionBy("__k", "__hop")
        .orderBy("__ts", "__is_q")
        .rowsBetween(W.currentRow, W.unboundedFollowing)
    )
    head = (
        ev_u.unionByName(qr_u)
        .withColumn("__hs", F.sum("__v").over(w))
        .withColumn("__hc", F.sum("__n").over(w))
        .where(F.col("__is_q") == 1)
        .select("__qid", "__k", "__ts", "__hop", "__hs", "__hc")
    )

    # --- hopped tail: per-hop partials (the HopsAggregator table shape,
    # aggregator/windowing/HopsAggregator.scala:1-150) exploded by the
    # BACKWARD offsets they serve: a hop lands on query hops
    # hop-n_hops .. hop-1. Compact-table fan-out only.
    if n_hops > 0:
        hop_sums = ev.groupBy("__k", "__hop").agg(
            F.sum("__v").alias("__s"), F.count(F.lit(1)).alias("__c")
        )
        tail = (
            hop_sums.select(
                "__k", "__s", "__c",
                F.explode(
                    F.sequence(F.lit(1), F.lit(int(n_hops)))
                ).alias("__d"),
                F.col("__hop").alias("__src_hop"),
            )
            .select(
                "__k",
                (F.col("__src_hop") - F.col("__d")).alias("__hop"),
                "__s", "__c",
            )
            .groupBy("__k", "__hop")
            .agg(F.sum("__s").alias("__ts_sum"), F.sum("__c").alias("__ts_cnt"))
        )
        merged = head.join(tail, ["__k", "__hop"], "left")
    else:
        merged = head.select(
            "*",
            F.lit(None).cast("long").alias("__ts_sum"),
            F.lit(None).cast("long").alias("__ts_cnt"),
        )

    cnt = F.coalesce(F.col("__hc"), F.lit(0)) + F.coalesce(
        F.col("__ts_cnt"), F.lit(0)
    )
    total = F.coalesce(F.col("__hs"), F.lit(0)) + F.coalesce(
        F.col("__ts_sum"), F.lit(0)
    )
    return merged.select(
        F.col("__qid").alias(query_id_col),
        F.col("__k").alias(key_col),
        F.col("__ts").alias(ts_col),
        F.when(cnt > 0, total).alias(f"{prefix}_sum"),
        cnt.cast("long").alias(f"{prefix}_cnt"),
    )
