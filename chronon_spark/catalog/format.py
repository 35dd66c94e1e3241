"""Table-format providers: partition listing + partitioned writes.

Reference: spark/.../catalog/Format.scala (trait Format — table(),
primaryPartitions(), partitions(), sub-partition filtering,
parseHiveStylePartition, getCatalog), catalog/Iceberg.scala (the
``<table>.partitions`` metadata-table listing + Iceberg commit-retry
table properties), and TableUtils.scala:96-104,197-290 (provider
resolution + partitioned inserts).

Three providers:
- ``HiveFormat``  — Spark-catalog tables (``SHOW PARTITIONS`` listing,
  dynamic ``INSERT OVERWRITE`` writes). Fully exercised in tests.
- ``IcebergFormat`` — partition listing from the ``.partitions`` metadata
  table and writes via DataFrameWriterV2 ``overwritePartitions()`` (an
  atomic snapshot commit — the pruning + dynamic-overwrite guarantees the
  reference rides on). Activates when an Iceberg catalog is configured on
  the session; raises a clear error otherwise (no Iceberg runtime in this
  sandbox).
- ``ParquetPathFormat`` — bare parquet paths (the repo's default), listing
  from hive-style partition directories.

Partition listings are metadata operations (catalog / manifest reads) —
never a data scan — so a resume/unfilled-ranges check on a 100 TB table
costs milliseconds.

Iceberg runtime status (re-checked every round; r5 attempt 2026-08-21 —
unchanged: no iceberg/delta/hudi jar in PySpark's bundled ``jars/``, no
``pyiceberg``, filesystem-wide search finds only the reference's
BigQuery metastore plugin; r4 details below stand):
the sandbox has no network (no pip/ivy/maven resolution), PySpark's
bundled ``jars/`` contains no iceberg/delta/hudi artifact, ``pyiceberg``
is not installed, and the only Iceberg artifact anywhere on the box is
the reference's ``iceberg-bigquery-1.11.0-SNAPSHOT.jar`` — re-inspected
this round (unzip -l: 16 files, 85 KB): it contains ZERO
``org/apache/iceberg/spark`` classes (it is a BigQuery metastore catalog
plugin, not ``iceberg-spark-runtime``), so loading it cannot provide
``SparkCatalog``/``IcebergSource``. The IcebergFormat code paths remain
gated behind ``_require_runtime`` and are exercised only structurally in
tests; on a real cluster, adding
``iceberg-spark-runtime-4.0_2.13`` to ``--jars`` activates them
unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def parse_hive_style_partition(pstring: str) -> list:
    """"ds=2023-04-01/hr=12" -> [("ds", "2023-04-01"), ("hr", "12")]
    (reference Format.parseHiveStylePartition)."""
    out = []
    for part in pstring.split("/"):
        k, v = part.split("=", 1)
        out.append((k, v))
    return out


def get_catalog(spark: SparkSession, table_name: str) -> str:
    """Catalog component of a multipart identifier, defaulting to the
    session's current catalog (reference Format.getCatalog)."""
    parts = table_name.split(".")
    if len(parts) == 3:
        return parts[0]
    return spark.catalog.currentCatalog()


class Format:
    """Provider interface (reference trait Format)."""

    name = "base"
    support_sub_partitions_filter = False

    def table_properties(self) -> dict:
        return {}

    def table(self, spark: SparkSession, table_name: str, partition_filters: str = "") -> DataFrame:
        df = spark.read.table(table_name)
        return df.where(partition_filters) if partition_filters else df

    def partitions(self, spark: SparkSession, table_name: str) -> list:
        """List of {partition_key: value} dicts, one per partition."""
        raise NotImplementedError

    def primary_partitions(
        self,
        spark: SparkSession,
        table_name: str,
        partition_column: str,
        sub_partitions_filter: Optional[dict] = None,
    ) -> list:
        """Values of ``partition_column``, optionally filtered by
        sub-partition key=value equality (reference primaryPartitions)."""
        sub = sub_partitions_filter or {}
        if sub and not self.support_sub_partitions_filter:
            raise NotImplementedError(
                f"subPartitionsFilter is not supported on format {self.name}"
            )
        out = []
        for pmap in self.partitions(spark, table_name):
            if all(pmap.get(k) == v for k, v in sub.items()):
                if partition_column in pmap:
                    out.append(pmap[partition_column])
        return sorted(set(out))

    def write_partitions(
        self, df: DataFrame, table_name: str, partition_col: str
    ) -> None:
        """Dynamic partition overwrite: replace exactly the partitions
        present in ``df``, leave all others intact."""
        raise NotImplementedError

    def table_location(self, spark: SparkSession, table_name: str) -> Optional[str]:
        """Storage root of the table (for filesystem-level metrics like
        per-partition bytes). None when the format keeps sizes only in
        its own metadata (Iceberg/Delta snapshots — runtime-gated)."""
        try:
            rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table_name}").collect()
        except Exception:
            return None
        for r in rows:
            if r[0] == "Location":
                return r[1]
        return None


def auto_expand(df: DataFrame, table_name: str, partition_col: str) -> DataFrame:
    """Schema evolution on insert (reference TableUtils.scala:197-290
    autoExpand): columns the incoming DF adds are APPENDED to the table
    via ALTER TABLE ADD COLUMNS (existing rows read them as NULL); columns
    the DF is missing are filled with typed NULLs. Returns the DF aligned
    to the table's (possibly expanded) column order."""
    spark = df.sparkSession
    table_fields = {f.name: f for f in spark.table(table_name).schema.fields}
    new_cols = [c for c in df.columns if c not in table_fields]
    if new_cols:
        decls = ", ".join(
            f"{c} {df.schema[c].dataType.simpleString()}" for c in new_cols
        )
        spark.sql(f"ALTER TABLE {table_name} ADD COLUMNS ({decls})")
        table_fields = {f.name: f for f in spark.table(table_name).schema.fields}
    aligned = df
    for name, f in table_fields.items():
        if name not in df.columns:
            aligned = aligned.withColumn(name, F.lit(None).cast(f.dataType))
    # insertInto is positional: the table's column order is authoritative
    return aligned.select(*[f for f in table_fields])


class HiveFormat(Format):
    """Spark-catalog (hive-style) tables."""

    name = "hive"
    support_sub_partitions_filter = True

    def partitions(self, spark: SparkSession, table_name: str) -> list:
        rows = spark.sql(f"SHOW PARTITIONS {table_name}").collect()
        return [dict(parse_hive_style_partition(r[0])) for r in rows]

    def write_partitions(self, df: DataFrame, table_name: str, partition_col: str) -> None:
        spark = df.sparkSession
        if not spark.catalog.tableExists(table_name):
            df.write.partitionBy(partition_col).saveAsTable(table_name)
            return
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            aligned = auto_expand(df, table_name, partition_col)
            aligned.write.mode("overwrite").insertInto(table_name)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


class IcebergFormat(Format):
    """Iceberg tables via DataFrameWriterV2 + the .partitions metadata
    table (reference catalog/Iceberg.scala)."""

    name = "iceberg"
    support_sub_partitions_filter = False

    def table_location(self, spark: SparkSession, table_name: str):
        # Iceberg keeps per-file sizes in snapshot metadata; the warehouse
        # location is not hive-layout (data files live under data/), so
        # filesystem ds=... probing is wrong — report no location.
        return None

    def table_properties(self) -> dict:
        # reference Iceberg.tableProperties — commit retry/backoff tuned
        # for many concurrent partition writers at scale
        return {
            "commit.retry.num-retries": "20",
            "commit.retry.min-wait-ms": "10000",
            "commit.retry.max-wait-ms": "600000",
            "commit.status-check.num-retries": "20",
            "commit.status-check.min-wait-ms": "10000",
            "commit.status-check.max-wait-ms": "600000",
            "write.merge.isolation-level": "snapshot",
        }

    def _require_runtime(self, spark: SparkSession, table_name: str):
        cat = get_catalog(spark, table_name)
        impl = spark.conf.get(f"spark.sql.catalog.{cat}", None)
        if impl is None or "iceberg" not in impl.lower():
            raise RuntimeError(
                f"catalog '{cat}' is not an Iceberg catalog (set "
                f"spark.sql.catalog.{cat}=org.apache.iceberg.spark.SparkCatalog "
                "and put the iceberg-spark-runtime jar on the classpath)"
            )

    def partitions(self, spark: SparkSession, table_name: str) -> list:
        self._require_runtime(spark, table_name)
        pdf = spark.read.format("iceberg").load(f"{table_name}.partitions")
        struct_fields = [
            f.name for f in pdf.schema["partition"].dataType.fields
        ]
        rows = pdf.select("partition").collect()
        out = []
        for r in rows:
            p = r["partition"]
            out.append(
                {k: str(p[k]) for k in struct_fields if p[k] is not None}
            )
        # distinct
        seen, uniq = set(), []
        for d in out:
            key = tuple(sorted(d.items()))
            if key not in seen:
                seen.add(key)
                uniq.append(d)
        return uniq

    def write_partitions(self, df: DataFrame, table_name: str, partition_col: str) -> None:
        spark = df.sparkSession
        self._require_runtime(spark, table_name)
        if not spark.catalog.tableExists(table_name):
            w = df.writeTo(table_name).partitionedBy(F.col(partition_col))
            for k, v in self.table_properties().items():
                w = w.tableProperty(k, v)
            w.create()
            return
        # atomic dynamic overwrite of exactly the partitions in df
        df.writeTo(table_name).overwritePartitions()


class DeltaFormat(Format):
    """Delta Lake tables (reference catalog/DeltaLake.scala). Delta has no
    SHOW PARTITIONS (delta-io/delta#996); partitions come from the
    transaction log via the ``partitionValues`` file metadata, surfaced in
    SQL as ``DESCRIBE DETAIL``'s stats + the `_delta_log` snapshot. Gated
    on the delta-spark runtime being on the classpath."""

    name = "delta"
    support_sub_partitions_filter = True

    def table_location(self, spark: SparkSession, table_name: str):
        # Delta keeps file sizes in the transaction log; same reasoning as
        # Iceberg — no hive-layout location to probe.
        return None

    def _require_runtime(self, spark: SparkSession):
        ext = spark.conf.get("spark.sql.extensions", "") or ""
        if "DeltaSparkSessionExtension" not in ext:
            raise RuntimeError(
                "Delta runtime not configured (set spark.sql.extensions="
                "io.delta.sql.DeltaSparkSessionExtension and put "
                "delta-spark on the classpath)"
            )

    def partitions(self, spark: SparkSession, table_name: str) -> list:
        self._require_runtime(spark)
        loc = (
            spark.sql(f"DESCRIBE DETAIL {table_name}")
            .select("location")
            .first()[0]
        )
        files = spark.read.json(f"{loc}/_delta_log/*.json").where(
            F.col("add").isNotNull()
        )
        rows = files.select("add.partitionValues").collect()
        seen, out = set(), []
        for r in rows:
            d = {k: v for k, v in (r[0] or {}).items() if v is not None}
            key = tuple(sorted(d.items()))
            if key not in seen:
                seen.add(key)
                out.append(d)
        return out

    def write_partitions(self, df: DataFrame, table_name: str, partition_col: str) -> None:
        spark = df.sparkSession
        self._require_runtime(spark)
        if not spark.catalog.tableExists(table_name):
            df.write.format("delta").partitionBy(partition_col).saveAsTable(table_name)
            return
        # replaceWhere = Delta's dynamic partition overwrite
        parts = [r[0] for r in df.select(partition_col).distinct().collect()]
        in_list = ", ".join(f"'{p}'" for p in parts)
        (
            df.write.format("delta")
            .mode("overwrite")
            .option("replaceWhere", f"{partition_col} IN ({in_list})")
            .saveAsTable(table_name)
        )


class ParquetPathFormat(Format):
    """Bare parquet paths (hive-style partition directories)."""

    name = "parquet_path"
    support_sub_partitions_filter = True

    def table(self, spark: SparkSession, table_name: str, partition_filters: str = "") -> DataFrame:
        df = spark.read.parquet(table_name)
        return df.where(partition_filters) if partition_filters else df

    def partitions(self, spark: SparkSession, path: str) -> list:
        """Directory-listing only (no data scan): walk hive-style k=v
        directory levels."""
        out = []

        def walk(d: str, acc: dict):
            subs = [
                s for s in os.listdir(d)
                if "=" in s and os.path.isdir(os.path.join(d, s))
            ]
            if not subs:
                if acc:
                    out.append(dict(acc))
                return
            for s in subs:
                k, v = s.split("=", 1)
                walk(os.path.join(d, s), {**acc, k: v})

        if os.path.isdir(path):
            walk(path, {})
        return out

    def write_partitions(self, df: DataFrame, path: str, partition_col: str) -> None:
        spark = df.sparkSession
        prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
        try:
            df.write.mode("overwrite").partitionBy(partition_col).parquet(path)
        finally:
            spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def resolve_format(spark: SparkSession, table: str) -> Format:
    """Provider resolution (reference TableUtils.tableFormatProvider):
    paths -> parquet; catalog tables by provider ('iceberg' when the
    table's catalog is an Iceberg catalog or the provider says so)."""
    if "/" in table or table.endswith(".parquet"):
        return ParquetPathFormat()
    cat = get_catalog(spark, table)
    impl = spark.conf.get(f"spark.sql.catalog.{cat}", None)
    if impl is not None and "iceberg" in impl.lower():
        return IcebergFormat()
    try:
        rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
        provider = next(
            (r["data_type"] for r in rows if r["col_name"] == "Provider"), ""
        )
        if provider and provider.lower() == "iceberg":
            return IcebergFormat()
        if provider and provider.lower() == "delta":
            return DeltaFormat()
    except Exception:
        pass
    return HiveFormat()


def write_partitioned(
    df: DataFrame, table: str, partition_col: str, fmt: Optional[Format] = None
) -> None:
    """Dynamic-partition-overwrite write through the resolved provider."""
    fmt = fmt or resolve_format(df.sparkSession, table)
    fmt.write_partitions(df, table, partition_col)
