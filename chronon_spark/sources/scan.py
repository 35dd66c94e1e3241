"""Source scan: render a Query conf into a pruned, projected DataFrame.

Reference behavior being reproduced (Spark-first, not ported):
- query rendering: selects + wheres -> SQL (api/.../QueryUtils.scala, applied
  at spark/.../catalog/TableUtils.scala:605-662),
- window-derived scan-range narrowing: a GroupBy backfilling queries in
  [start, end] only needs events in [start - maxWindow, end]
  (spark/.../GroupBy.scala:616-663),
- ``ts`` is always epoch millis LONG (spark/.../GroupBy.scala:303,506-513).

All pruning is expressed as Catalyst predicates so parquet/Iceberg partition
pruning and predicate pushdown happen for free — verify with
``df.explain()`` -> PushedFilters.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api.types import EntitySource, EventSource, Query

TS = "ts"  # canonical epoch-millis LONG time column


def load_table(spark: SparkSession, table: str) -> DataFrame:
    """Load a catalog table or a parquet path/dir (paths contain '/')."""
    if "/" in table or table.endswith(".parquet"):
        return spark.read.parquet(table)
    return spark.table(table)


def apply_query(df: DataFrame, query: Query) -> DataFrame:
    """selects -> selectExpr, wheres -> ANDed filter, time_column -> ts millis.

    The select list keeps user aliases only (narrow projection — lets
    Catalyst prune the scan to exactly the referenced columns).
    """
    for setup in query.setups:
        df.sparkSession.sql(setup)

    pcol = F.col(query.partition_column)
    if query.partition_format != "yyyy-MM-dd":
        # canonical yyyy-MM-dd bounds compared against the table's native
        # partition format (reference partitionFormat override)
        pcol = F.to_date(pcol, query.partition_format)
        if query.start_partition:
            df = df.where(pcol >= F.to_date(F.lit(query.start_partition)))
        if query.end_partition:
            df = df.where(pcol <= F.to_date(F.lit(query.end_partition)))
    else:
        if query.start_partition:
            df = df.where(pcol >= query.start_partition)
        if query.end_partition:
            df = df.where(pcol <= query.end_partition)

    for w in query.wheres:
        df = df.where(w)

    exprs = []
    if query.selects:
        exprs = [f"{expr} AS {alias}" for alias, expr in query.selects.items()]
    else:
        exprs = ["*"]
    if query.time_column:
        exprs.append(f"CAST({query.time_column} AS LONG) AS {TS}")
    return df.selectExpr(*exprs)


def latest_partition(spark: SparkSession, df: DataFrame, partition_col: str) -> Optional[str]:
    row = df.agg(F.max(F.col(partition_col).cast("string"))).first()
    return row[0] if row else None


def scan_source(
    spark: SparkSession,
    source,
    min_ts: Optional[int] = None,
    max_ts: Optional[int] = None,
) -> DataFrame:
    """Scan an Event/Entity source, applying the window-derived time range.

    ``min_ts``/``max_ts`` (epoch millis, inclusive) come from the planner:
    query range minus the GroupBy's max window. They are plain ``ts``
    predicates so they push down to the scan.

    Cumulative sources (``is_cumulative``, reference GroupBy.scala:633-645;
    thrift/common.thrift:79-83) contain full history in every partition, so
    only the LATEST available partition is scanned.
    """
    if isinstance(source, EventSource):
        raw = load_table(spark, source.table)
        if source.is_cumulative:
            pc = source.query.partition_column
            if pc in raw.columns:
                latest = latest_partition(spark, raw, pc)
                if latest is not None:
                    raw = raw.where(F.col(pc).cast("string") == latest)
        df = apply_query(raw, source.query)
    elif isinstance(source, EntitySource):
        df = apply_query(load_table(spark, source.snapshot_table), source.query)
    else:
        raise TypeError(f"unknown source type: {type(source)}")

    if min_ts is not None and TS in df.columns:
        df = df.where(F.col(TS) >= F.lit(min_ts))
    if max_ts is not None and TS in df.columns:
        df = df.where(F.col(TS) <= F.lit(max_ts))
    return df


def millis_expr(timestamp_col: str) -> str:
    """SQL expr converting a TIMESTAMP column to epoch millis LONG.

    Integer division (``div``) so sub-millisecond precision truncates
    identically to DuckDB's ``epoch_ms``. The TIMESTAMP cast handles
    TIMESTAMP_NTZ parquet columns (naive treated as UTC — sessions must set
    spark.sql.session.timeZone=UTC, as chronon_spark.session does).
    """
    return f"unix_micros(CAST({timestamp_col} AS TIMESTAMP)) div 1000"
