"""LogFlattenerJob equivalent (reference spark/.../LogFlattenerJob.scala):
schema-versioned log rows -> one merged flattened table, resumable."""

import pandas as pd
import pytest

from chronon_spark.plans.log_flattener import (
    flatten_logs,
    log_flattener_job,
    merged_schema,
)
from chronon_spark.plans.partition_range import PartitionRange


def test_merged_schema_union_and_conflict(spark):
    m = merged_schema(["a LONG, b STRING", "a LONG, c DOUBLE"])
    assert [f.name for f in m.fields] == ["a", "b", "c"]
    with pytest.raises(ValueError, match="schema conflict"):
        merged_schema(["a LONG", "a STRING"])


@pytest.fixture()
def log_tables(spark, tmp_path):
    # v1 logs only feature f1; v2 adds f2 — the merged output carries both,
    # with nulls where the older version predates the column
    logs = pd.DataFrame(
        [
            ("j1", 1000, "2024-01-01", "v1", '{"user_id": 1}', '{"f1": 10.0}'),
            ("j1", 2000, "2024-01-01", "v1", '{"user_id": 2}', '{"f1": 20.0}'),
            ("j1", 3000, "2024-01-02", "v2", '{"user_id": 1}', '{"f1": 11.0, "f2": 5}'),
            ("j2", 4000, "2024-01-02", "v1", '{"user_id": 9}', '{"f1": 90.0}'),
        ],
        columns=["name", "ts_millis", "ds", "schema_hash", "key_json", "value_json"],
    )
    schemas = pd.DataFrame(
        [
            ("v1", "user_id LONG", "f1 DOUBLE"),
            ("v2", "user_id LONG", "f1 DOUBLE, f2 LONG"),
        ],
        columns=["schema_hash", "key_schema", "value_schema"],
    )
    lp = str(tmp_path / "logs.parquet")
    sp = str(tmp_path / "schemas.parquet")
    spark.createDataFrame(logs).write.parquet(lp)
    spark.createDataFrame(schemas).write.parquet(sp)
    return lp, sp


def test_flatten_logs_merges_schema_versions(spark, log_tables):
    lp, sp = log_tables
    out = flatten_logs(
        spark.read.parquet(lp), spark.read.parquet(sp), join_name="j1"
    ).toPandas().sort_values("ts_millis").reset_index(drop=True)
    assert list(out.columns) == [
        "name", "ts_millis", "schema_hash", "user_id", "f1", "f2", "ds",
    ]
    assert len(out) == 3  # j2 filtered out
    # v1 rows: f2 null; v2 row: f2 typed value
    assert out.loc[0, "f1"] == 10.0 and pd.isna(out.loc[0, "f2"])
    assert out.loc[2, "f2"] == 5
    assert out.loc[2, "user_id"] == 1


def test_log_flattener_job_resumes(spark, log_tables, tmp_path):
    lp, sp = log_tables
    outp = str(tmp_path / "flat")
    rng = PartitionRange("2024-01-01", "2024-01-02")
    res = log_flattener_job(spark, lp, sp, outp, rng, join_name="j1", step_days=1)
    assert res.skipped_partitions == 0
    got = spark.read.parquet(outp)
    assert got.count() == 3
    # resume: fully filled -> nothing recomputes
    res2 = log_flattener_job(spark, lp, sp, outp, rng, join_name="j1", step_days=1)
    assert res2.skipped_partitions == 2 and res2.computed == []
