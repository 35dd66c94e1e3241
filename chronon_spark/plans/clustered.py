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
    sort_cols = keys + ([TS] if TS in events.columns and TS not in keys else [])
    (
        events.write.bucketBy(num_buckets, *keys)
        .sortBy(*sort_cols)
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )
    return table


def bucketed_merge_fold(
    spark: SparkSession,
    left: DataFrame,
    parts: dict,
    key_columns: Sequence[str],
    num_buckets: int = 64,
    table_prefix: str = "bmf",
) -> DataFrame:
    """The multipart join's MERGE FOLD over storage-partitioned tables —
    the stretch goal of r4 VERDICT Next #9 without an Iceberg runtime:
    Hive-format bucketed tables give the same shuffle-free join shape as
    Iceberg's storage-partitioned join (reference
    ``IcebergSparkSPJTest.scala``; SURVEY §4).

    ``left`` and every part frame in ``parts`` ({name: frame keyed by
    ``key_columns`` + ``ts``}) are written bucketed on the FULL join key
    set ``(*keys, ts)`` with matching in-bucket sort; every join side
    then reports ``HashPartitioning(keys + ts, N)`` — Spark requires all
    cluster keys for join co-partitioning
    (``spark.sql.requireAllClusterKeysForCoPartition``, default true) —
    so EnsureRequirements inserts ZERO exchanges: at 10^12 rows the
    merge reads co-located buckets instead of re-shuffling every part
    table (pytest pins the exchange count AND equality with the
    shuffled fold).

    The write pays one shuffle per table ONCE; in the modular pipeline
    (plans/modular.py) those writes are the part-job outputs themselves,
    so the merge becomes pure co-located IO."""
    keys = [validate_identifier(k) for k in key_columns]
    join_keys = keys + ([TS] if TS in left.columns else [])
    lt = write_clustered_events(
        spark, left, join_keys, f"{table_prefix}_left", num_buckets
    )
    out = read_clustered_events(spark, lt)
    for name, pdf in parts.items():
        validate_identifier(name)
        t = write_clustered_events(
            spark, pdf, join_keys, f"{table_prefix}_part_{name}", num_buckets
        )
        out = out.join(read_clustered_events(spark, t), on=join_keys, how="left")
    return out


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
