"""StagingQuery: macro-templated free-form Spark SQL with incremental fill.

Reference (spark/.../batch/StagingQuery.scala:30-137; thrift/api.thrift:66-107):
free-form SQL with ``{{ start_date }}`` / ``{{ end_date }}`` /
``{{ latest_date }}`` / ``{{ max_date(table=...) }}`` macros, rendered per
step range and written with fill-what's-missing semantics. Our engine
renders the same macros and reuses plans.backfill for the incremental fill
(unfilled ranges + step chunking + lineage are shared machinery, not
re-implemented here).
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.plans.backfill import backfill, BackfillResult
from chronon_spark.plans.partition_range import PartitionRange

_MAX_DATE = re.compile(r"\{\{\s*max_date\(table\s*=\s*([^)\s]+)\)\s*\}\}")


def _table_max_ds(spark: SparkSession, table: str, partition_col: str = "ds") -> str:
    from chronon_spark.sources.scan import load_table

    v = (
        load_table(spark, table)
        .agg(F.max(F.col(partition_col).cast("string")))
        .first()[0]
    )
    if v is None:
        raise ValueError(f"max_date: table {table} has no {partition_col} values")
    return v


def render(
    spark: SparkSession,
    sql: str,
    start_date: str,
    end_date: str,
    latest_date: Optional[str] = None,
) -> str:
    """Substitute the four reference macros (whitespace-tolerant)."""
    out = re.sub(r"\{\{\s*start_date\s*\}\}", start_date, sql)
    out = re.sub(r"\{\{\s*end_date\s*\}\}", end_date, out)
    if latest_date is not None:
        out = re.sub(r"\{\{\s*latest_date\s*\}\}", latest_date, out)
    for m in set(_MAX_DATE.findall(out)):
        table = m.strip("'\"")
        out = re.sub(
            r"\{\{\s*max_date\(table\s*=\s*" + re.escape(m) + r"\)\s*\}\}",
            _table_max_ds(spark, table),
            out,
        )
    return out


def run_staging_query(
    spark: SparkSession,
    sql: str,
    start_date: str,
    end_date: str,
    latest_date: Optional[str] = None,
    setups: tuple = (),
) -> DataFrame:
    """Render + execute one range of a staging query."""
    for s in setups:
        spark.sql(s)
    return spark.sql(render(spark, sql, start_date, end_date, latest_date))


def backfill_staging_query(
    spark: SparkSession,
    sql: str,
    output_path: str,
    date_range: PartitionRange,
    step_days: int = 30,
    partition_col: str = "ds",
    setups: tuple = (),
    recompute_days: int = 0,
) -> BackfillResult:
    """Incremental fill: each missing step range renders & runs the SQL
    with that step's start/end dates (reference fill-what's-missing)."""

    def compute(s: SparkSession, rng: PartitionRange) -> DataFrame:
        return run_staging_query(s, sql, rng.start, rng.end, date_range.end, setups)

    return backfill(
        spark,
        compute,
        output_path,
        date_range,
        step_days=step_days,
        partition_col=partition_col,
        job_name="staging_query",
        conf=sql,
        recompute_days=recompute_days,
    )
