"""Format providers (reference catalog/Format.scala, Iceberg.scala,
TableUtils partitioned-insert machinery): partition listing, dynamic
overwrite, resume via missing_ranges, provider resolution."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.catalog.format import (
    HiveFormat,
    IcebergFormat,
    ParquetPathFormat,
    get_catalog,
    parse_hive_style_partition,
    resolve_format,
    write_partitioned,
)
from chronon_spark.plans.partition_range import PartitionRange, missing_ranges


def _days_df(spark, days, value):
    rows = [(d, i, float(value)) for i, d in enumerate(days) for _ in range(3)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["ds", "k", "v"]))


def test_parse_hive_style_partition():
    assert parse_hive_style_partition("ds=2023-04-01/hr=12") == [
        ("ds", "2023-04-01"), ("hr", "12"),
    ]


def test_hive_format_roundtrip(spark):
    fmt = HiveFormat()
    t = "fmt_test_db.tbl"
    spark.sql("CREATE DATABASE IF NOT EXISTS fmt_test_db")
    try:
        days = ["2024-01-01", "2024-01-02", "2024-01-03"]
        write_partitioned(_days_df(spark, days, 1.0), t, "ds", fmt)
        assert isinstance(resolve_format(spark, t), HiveFormat)
        assert fmt.primary_partitions(spark, t, "ds") == days

        # dynamic overwrite: replacing ONE day leaves the others intact
        write_partitioned(_days_df(spark, ["2024-01-02"], 9.0), t, "ds", fmt)
        assert fmt.primary_partitions(spark, t, "ds") == days
        vals = {
            r["ds"]: r["mv"]
            for r in spark.table(t).groupBy("ds").agg(F.max("v").alias("mv")).collect()
        }
        assert vals == {"2024-01-01": 1.0, "2024-01-02": 9.0, "2024-01-03": 1.0}

        # resume: unfilled-ranges over the listed partitions
        holes = missing_ranges(
            PartitionRange("2024-01-01", "2024-01-05"),
            set(fmt.primary_partitions(spark, t, "ds")),
        )
        assert holes == [PartitionRange("2024-01-04", "2024-01-05")]
    finally:
        spark.sql("DROP TABLE IF EXISTS fmt_test_db.tbl")
        spark.sql("DROP DATABASE IF EXISTS fmt_test_db")


def test_hive_subpartition_filter(spark):
    fmt = HiveFormat()
    t = "fmt_test_db2.tbl2"
    spark.sql("CREATE DATABASE IF NOT EXISTS fmt_test_db2")
    try:
        df = spark.createDataFrame(
            pd.DataFrame(
                {
                    "ds": ["2024-01-01", "2024-01-01", "2024-01-02"],
                    "hr": ["00", "01", "00"],
                    "v": [1.0, 2.0, 3.0],
                }
            )
        )
        df.write.partitionBy("ds", "hr").saveAsTable(t)
        got = fmt.primary_partitions(spark, t, "ds", sub_partitions_filter={"hr": "01"})
        assert got == ["2024-01-01"]
        all_ds = fmt.primary_partitions(spark, t, "ds")
        assert all_ds == ["2024-01-01", "2024-01-02"]
    finally:
        spark.sql("DROP TABLE IF EXISTS fmt_test_db2.tbl2")
        spark.sql("DROP DATABASE IF EXISTS fmt_test_db2")


def test_parquet_path_format(spark, tmp_path):
    fmt = ParquetPathFormat()
    p = str(tmp_path / "pq_table")
    days = ["2024-01-01", "2024-01-02"]
    write_partitioned(_days_df(spark, days, 1.0), p, "ds", fmt)
    assert isinstance(resolve_format(spark, p), ParquetPathFormat)
    assert fmt.primary_partitions(spark, p, "ds") == days
    # overwrite one partition only
    write_partitioned(_days_df(spark, ["2024-01-01"], 7.0), p, "ds", fmt)
    assert fmt.primary_partitions(spark, p, "ds") == days
    vals = {
        r["ds"]: r["mv"]
        for r in spark.read.parquet(p)
        .groupBy(F.col("ds").cast("string").alias("ds"))
        .agg(F.max("v").alias("mv"))
        .collect()
    }
    assert vals == {"2024-01-01": 7.0, "2024-01-02": 1.0}


def test_partition_pruning_reaches_catalog_scan(spark):
    """Partition predicates show up as PartitionFilters in the physical
    scan of a catalog table — the pruning the reference's read path relies
    on (TableUtils partition filters)."""
    t = "fmt_test_db3.tbl3"
    spark.sql("CREATE DATABASE IF NOT EXISTS fmt_test_db3")
    try:
        write_partitioned(
            _days_df(spark, ["2024-01-01", "2024-01-02"], 1.0), t, "ds", HiveFormat()
        )
        df = spark.table(t).where(F.col("ds") == "2024-01-02")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PartitionFilters" in plan and "2024-01-02" in plan, plan[:2000]
    finally:
        spark.sql("DROP TABLE IF EXISTS fmt_test_db3.tbl3")
        spark.sql("DROP DATABASE IF EXISTS fmt_test_db3")


def test_iceberg_format_gates_cleanly(spark):
    fmt = IcebergFormat()
    with pytest.raises(RuntimeError, match="not an Iceberg catalog"):
        fmt.partitions(spark, "some_db.some_table")
    with pytest.raises(RuntimeError, match="not an Iceberg catalog"):
        fmt.write_partitions(
            _days_df(spark, ["2024-01-01"], 1.0), "some_db.some_table", "ds"
        )
    # commit-retry table properties match the reference's Iceberg defaults
    props = fmt.table_properties()
    assert props["commit.retry.num-retries"] == "20"
    assert props["write.merge.isolation-level"] == "snapshot"


def test_resolve_format_iceberg_by_catalog_conf(spark):
    spark.conf.set("spark.sql.catalog.icecat", "org.apache.iceberg.spark.SparkCatalog")
    try:
        assert isinstance(resolve_format(spark, "icecat.db.tbl"), IcebergFormat)
    finally:
        spark.conf.unset("spark.sql.catalog.icecat")


def test_get_catalog(spark):
    assert get_catalog(spark, "cat.db.tbl") == "cat"
    assert get_catalog(spark, "db.tbl") == spark.catalog.currentCatalog()


def test_auto_expand_schema_evolution(spark):
    """Reference TableUtils autoExpand: an insert with NEW columns expands
    the table (old rows read NULL); an insert MISSING columns fills typed
    NULLs."""
    spark.sql("CREATE DATABASE IF NOT EXISTS fmt_ae_db")
    t = "fmt_ae_db.tbl"
    fmt = HiveFormat()
    try:
        v1 = spark.createDataFrame(
            pd.DataFrame({"ds": ["2024-01-01"], "k": [1], "v": [1.0]})
        ).select("k", "v", "ds")
        write_partitioned(v1, t, "ds", fmt)

        # v2 adds a column
        v2 = spark.createDataFrame(
            pd.DataFrame({"ds": ["2024-01-02"], "k": [2], "v": [2.0], "extra": [9]})
        ).select("k", "v", "extra", "ds")
        write_partitioned(v2, t, "ds", fmt)
        out = spark.table(t).orderBy("ds").collect()
        assert "extra" in spark.table(t).columns
        assert out[0]["extra"] is None and out[1]["extra"] == 9

        # v3 is missing v -> typed NULL fill
        v3 = spark.createDataFrame(
            pd.DataFrame({"ds": ["2024-01-03"], "k": [3], "extra": [7]})
        ).select("k", "extra", "ds")
        write_partitioned(v3, t, "ds", fmt)
        row = spark.table(t).where("ds = '2024-01-03'").first()
        assert row["v"] is None and row["extra"] == 7 and row["k"] == 3
    finally:
        spark.sql("DROP TABLE IF EXISTS fmt_ae_db.tbl")
        spark.sql("DROP DATABASE IF EXISTS fmt_ae_db")


def test_delta_format_gates_cleanly(spark):
    from chronon_spark.catalog.format import DeltaFormat

    fmt = DeltaFormat()
    with pytest.raises(RuntimeError, match="Delta runtime not configured"):
        fmt.partitions(spark, "some_db.some_table")
    with pytest.raises(RuntimeError, match="Delta runtime not configured"):
        fmt.write_partitions(
            _days_df(spark, ["2024-01-01"], 1.0), "some_db.some_table", "ds"
        )
