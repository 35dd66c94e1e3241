"""Row-analytic features: lag/lead and sessionization by inactivity gap.

The reference has no rank/lag/lead operator family (SURVEY.md §2.5) — these
are north-rule extensions expressed directly in Catalyst:

- lag/lead: ``Window.partitionBy(keys).orderBy(ts)`` + ``F.lag/F.lead`` —
  whole-stage-codegen window exec, one shuffle on the key,
- sessionization (batch): the classic gap+cumsum formulation — a new
  session starts when ``ts - lag(ts) > gap``; the running sum of starts is
  the per-key session index. Streaming equivalent: ``F.session_window``
  (chronon_spark.streaming).

Scale: both are a single hash-exchange on the entity key followed by an
in-partition sort — the same shuffle the as-of kernel needs, so at 100 TB
these reuse the dominant partitioning rather than adding exchanges.

Hot-key honesty: per-entity time order is the SEMANTICS here (unlike
top-k/ntile, lag and running session indexes are not merge-associative),
so one pathological entity (a bot emitting 10^9 events) serializes into
one sorted window partition. Spark's window sort spills, so it completes;
the mitigations are upstream — cap per-entity event volume at ingest, or
exclude known-degenerate keys via the join-level skew-key exclusion the
as-of plans already expose (`Join.skew_keys`). The as-of paths themselves
do NOT have this bound (hop spreading / pmod grouping); it is specific to
the row-analytic family, as it is in every SQL engine's LAG/LEAD.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from chronon_spark.sources.scan import TS


def with_lag_lead(
    df: DataFrame,
    keys: list,
    value_cols: list,
    offsets: tuple = (1,),
    ts_col: str = TS,
) -> DataFrame:
    """Adds ``{col}_lag_{n}`` / ``{col}_lead_{n}`` per value column/offset."""
    w = W.partitionBy(*keys).orderBy(ts_col)
    for c in value_cols:
        for n in offsets:
            df = df.withColumn(f"{c}_lag_{n}", F.lag(c, n).over(w))
            df = df.withColumn(f"{c}_lead_{n}", F.lead(c, n).over(w))
    return df


def sessionize(
    df: DataFrame,
    keys: list,
    gap_ms: int,
    ts_col: str = TS,
    session_col: str = "session_id",
) -> DataFrame:
    """Assigns a per-key session index (0-based) by inactivity gap.

    A new session starts when the time since the previous event of the same
    key exceeds ``gap_ms``. The absolute session id is
    ``concat(keys, '/', session_index)``-style — callers compose as needed.
    """
    w = W.partitionBy(*keys).orderBy(ts_col)
    prev = F.lag(ts_col).over(w)
    is_start = F.when(prev.isNull() | ((F.col(ts_col) - prev) > gap_ms), 1).otherwise(0)
    df = df.withColumn("__session_start", is_start)
    running = W.partitionBy(*keys).orderBy(ts_col).rowsBetween(W.unboundedPreceding, 0)
    df = df.withColumn(session_col, (F.sum("__session_start").over(running) - 1).cast("long"))
    return df.drop("__session_start")


def session_stats(
    df: DataFrame,
    keys: list,
    gap_ms: int,
    ts_col: str = TS,
) -> DataFrame:
    """Sessionize then aggregate: one row per (keys, session_id) with
    start/end ts, duration, and event count."""
    s = sessionize(df, keys, gap_ms, ts_col)
    return s.groupBy(*keys, "session_id").agg(
        F.min(ts_col).alias("session_start_ts"),
        F.max(ts_col).alias("session_end_ts"),
        (F.max(ts_col) - F.min(ts_col)).alias("session_duration_ms"),
        F.count(F.lit(1)).alias("session_events"),
    )
