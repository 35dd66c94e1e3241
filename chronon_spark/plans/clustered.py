"""Key-clustered (sorted-bucket) event-source layout: pay the events
shuffle ONCE at write time, never again.

Reference analogue: Chronon materializes each join part's intermediate
table before the final merge so repeated backfills reuse it
(``spark/src/main/scala/ai/chronon/spark/join/JoinPartJob.scala``, and
``GroupBy.scala``'s ``KvRdd`` layouts are likewise key-partitioned).
Spark-first form: write the rendered events frame ``bucketBy(N, *keys)``
with in-bucket ``sortBy(*keys, ts)``. A bucketed FileSourceScan reports
``HashPartitioning(keys, N)``, which satisfies the ClusteredDistribution
of every downstream as-of consumer:

- the hop-IR aggregation ``groupBy(keys, hop)`` (keys ⊆ clustering —
  subset rule), and
- the exact-head join on ``(keys, hop)`` equi-keys (Spark shuffles only
  the small query side to the bucket partitioning).

so ``group_by_asof_hopped(events_clustered=True)`` runs with ZERO
exchange of the big side — at a 10^12-row events table the one-time
clustered write amortizes across every GroupBy/Join/label/target-encode
backfill that shares the key. The flag is a plan hint only: if the
frame is NOT actually bucketed, EnsureRequirements re-inserts the
exchange and results are unchanged (pytest pins both equality and the
exchange-count drop).

Sizing ``num_buckets``: a bucketed scan reads one task per bucket (no
file splitting), so pick O(cluster cores × small constant) — the same
rule as ``plans/kvstore.py``. Skewed keys spread across hops exactly as
in the shuffled plan (the hop column is part of the aggregation grain,
not the storage clustering).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

from chronon_spark.api.types import validate_identifier
from chronon_spark.sources.scan import TS


def drop_managed_table(spark: SparkSession, table: str) -> None:
    """Idempotence across SESSIONS, not just within one: a prior
    session's managed-table directory survives in the warehouse while
    the new session's catalog has no entry for it, and ``saveAsTable``
    then fails with LOCATION_ALREADY_EXISTS. Drop the catalog entry AND
    purge the location through the session's Hadoop FS (portable to any
    warehouse filesystem)."""
    assert "." not in table, "unqualified (default-database) names only"
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    jvm = spark._jvm
    hconf = spark._jsc.hadoopConfiguration()
    wh = spark.conf.get("spark.sql.warehouse.dir")
    loc = jvm.org.apache.hadoop.fs.Path(wh.rstrip("/") + "/" + table.lower())
    fs = loc.getFileSystem(hconf)
    if fs.exists(loc):
        fs.delete(loc, True)


def write_clustered_events(
    spark: SparkSession,
    events: DataFrame,
    key_columns: Sequence[str],
    table: str,
    num_buckets: int = 64,
) -> str:
    """Materialize ``events`` bucketed by ``key_columns`` and in-bucket
    sorted by ``(*keys, ts)`` when a ``ts`` column is present (the sort
    is free at read time and keeps row groups time-localized for the
    head join's min/max pruning). Overwrites any previous copy — the
    layout is a pure function of (events, keys), idempotent."""
    keys = [validate_identifier(k) for k in key_columns]
    drop_managed_table(spark, table)
    sort_cols = keys + ([TS] if TS in events.columns else [])
    (
        events.write.bucketBy(num_buckets, *keys)
        .sortBy(*sort_cols)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )
    return table


def read_clustered_events(spark: SparkSession, table: str) -> DataFrame:
    """The clustered frame, bucket metadata attached. Callers pass it to
    ``group_by_asof_hopped(events_df=..., events_clustered=True)``.
    Bucketed-scan exploitation must stay ON for the partitioning to
    propagate (Spark drops it — and the exchange saving — when
    ``autoBucketedScan`` decides nothing downstream benefits and this
    scan was planned before the aggregation)."""
    spark.conf.set(
        "spark.sql.sources.bucketing.autoBucketedScan.enabled", "false"
    )
    return spark.table(table)
