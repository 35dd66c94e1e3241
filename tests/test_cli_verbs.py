"""Round-5 CLI verbs (reference Driver.scala subcommand parity):
analyze / compare-tables / check-partitions / summarize / log-flatten /
fetch wiring over the existing plan functions."""

import json

import pytest
from pyspark.sql import functions as F

from chronon_spark.cli import main


def _run(capsys, *argv):
    # cli.main -> build_session -> getOrCreate APPLIES the production
    # runtime confs (arrow on, dynamic overwrite) to the shared test
    # session; snapshot and restore them so later tests keep the
    # conftest session's semantics (pandas NaN handling differs with
    # arrow on/off).
    from pyspark.sql import SparkSession

    s = SparkSession.builder.getOrCreate()
    guarded = [
        "spark.sql.execution.arrow.pyspark.enabled",
        "spark.sql.sources.partitionOverwriteMode",
        "spark.sql.shuffle.partitions",
    ]
    before = {k: s.conf.get(k, None) for k in guarded}
    try:
        rc = main(["--master", "local[4]", *argv])
    finally:
        for k, v in before.items():
            if v is None:
                s.conf.unset(k)
            else:
                s.conf.set(k, v)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert rc == 0
    return json.loads(out)


@pytest.fixture(scope="module")
def conf_file(sf_dir, tmp_path_factory):
    p = tmp_path_factory.mktemp("confs") / "conf.py"
    p.write_text(f'''
from chronon_spark.api.types import (
    Aggregation, EventSource, GroupBy, Join, JoinPart, Operation, Query, Window,
)

def get_group_by():
    return GroupBy(
        sources=(EventSource(
            table="{sf_dir}/events.parquet",
            query=Query(
                selects={{"user_id": "user_id", "value": "value"}},
                time_column="unix_micros(CAST(ts AS TIMESTAMP)) div 1000",
            ),
        ),),
        key_columns=("user_id",),
        aggregations=(Aggregation("value", Operation.SUM, windows=(Window.days(7),)),),
        name="cli_gb",
    )

def get_join():
    return Join(
        left=EventSource(
            table="{sf_dir}/events.parquet",
            query=Query(
                selects={{"user_id": "user_id"}},
                time_column="unix_micros(CAST(ts AS TIMESTAMP)) div 1000",
            ),
        ),
        join_parts=(JoinPart(get_group_by()),),
        name="cli_join",
    )
''')
    return str(p)


def test_analyze_verb(capsys, conf_file):
    out = _run(capsys, "analyze", "--conf", conf_file, "--table", "t_cli")
    assert out["schema"]["cli_gb_value_sum_7d"] == "double"
    assert out["ddl"].startswith("CREATE TABLE")


def test_check_partitions_verb(capsys, spark, tmp_path):
    p = str(tmp_path / "parted")
    spark.createDataFrame(
        [(1, "2024-01-01"), (2, "2024-01-02"), (3, "2024-01-04")],
        "v long, ds string",
    ).write.partitionBy("ds").parquet(p)
    out = _run(capsys, "check-partitions", "--table", p,
               "--start", "2024-01-01", "--end", "2024-01-04")
    assert out["present"] == ["2024-01-01", "2024-01-02", "2024-01-04"]
    assert out["missing_ranges"] == [["2024-01-03", "2024-01-03"]]


def test_compare_tables_verb(capsys, spark, tmp_path):
    a = spark.range(100).selectExpr("id AS k", "id * 2 AS v")
    b = a.withColumn("v", F.when(F.col("k") < 5, F.col("v") + 1).otherwise(F.col("v")))
    pa, pb = str(tmp_path / "a"), str(tmp_path / "b")
    a.write.parquet(pa); b.write.parquet(pb)
    mout = str(tmp_path / "metrics")
    out = _run(capsys, "compare-tables", "--left-table", pa,
               "--right-table", pb, "--keys", "k", "--output", mout)
    assert out["mismatches"]["v"] == 5
    assert spark.read.parquet(mout).count() > 0


def test_summarize_verb_with_upload(capsys, spark, sf_dir, tmp_path):
    src = str(tmp_path / "evd")
    spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ds", F.date_format("ts", "yyyy-MM-dd")
    ).write.parquet(src)
    sout = str(tmp_path / "summ")
    out = _run(capsys, "summarize", "--table", src, "--output", sout,
               "--upload-table", "t_cli_summaries")
    assert out["rows"] > 0 and out["upload_table"] == "t_cli_summaries"
    assert spark.table("t_cli_summaries").count() == out["rows"]


def test_fetch_verb(capsys, spark, sf_dir, tmp_path, conf_file):
    boundary = 1_705_276_800_000
    req = str(tmp_path / "requests")
    spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "user_id", "unix_micros(CAST(ts AS TIMESTAMP)) div 1000 AS ts"
    ).where(F.col("ts") >= boundary).limit(200).write.parquet(req)
    fout = str(tmp_path / "served")
    out = _run(capsys, "fetch", "--conf", conf_file,
               "--requests", req, "--output", fout,
               "--batch-end-ms", str(boundary))
    assert out["rows"] > 0
    assert "cli_gb_value_sum_7d" in spark.read.parquet(fout).columns


def test_streaming_groupby_verb(capsys, spark, sf_dir, tmp_path, conf_file):
    rec = str(tmp_path / "records")
    spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "user_id", "unix_micros(CAST(ts AS TIMESTAMP)) div 1000 AS ts", "value"
    ).write.parquet(rec)
    out = _run(capsys, "streaming-groupby", "--conf", conf_file,
               "--records-dir", rec,
               "--checkpoint", str(tmp_path / "ckpt"),
               "--output", str(tmp_path / "tiles"))
    assert out["tiles"] > 0
    tiles = spark.read.parquet(str(tmp_path / "tiles"))
    assert {"user_id", "tile_start", "tile_end"} <= set(tiles.columns)


def test_metadata_upload_verb(capsys, conf_file, tmp_path):
    out = _run(capsys, "metadata-upload", "--conf", conf_file,
               "--out", str(tmp_path / "md"))
    assert any("joins/" in w for w in out["written"])
    assert any("group_bys/" in w for w in out["written"])
