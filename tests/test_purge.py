"""Tombstone purge: only affected partitions rewritten, rest byte-identical."""

import glob
import hashlib
import os

import pytest
from pyspark.sql import functions as F

from chronon_spark.plans.purge import purge


def _files_fingerprint(root):
    out = {}
    for p in sorted(glob.glob(f"{root}/ds=*/*.parquet")):
        with open(p, "rb") as f:
            out[os.path.relpath(p, root)] = hashlib.md5(f.read()).hexdigest()
    return out


@pytest.fixture()
def corpus(spark, tmp_path):
    path = str(tmp_path / "corpus")
    rows = [(i, f"2024-01-{1 + i % 4:02d}", f"text-{i}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, ds string, text string")
    df.repartitionByRange(4, "ds").write.partitionBy("ds").parquet(path)
    return path


def test_purge_rewrites_only_affected_partitions(spark, corpus):
    fp0 = _files_fingerprint(corpus)
    # ids 0 and 4 live in ds=2024-01-01; id 1 in ds=2024-01-02
    tomb = spark.createDataFrame([(0,), (4,), (1,)], "doc_id long")
    res = purge(spark, corpus, tomb, "doc_id")
    assert res.partitions_affected == ["2024-01-01", "2024-01-02"]
    assert res.rows_deleted == 3
    assert res.report["2024-01-01"] == (50, 48)
    assert res.report["2024-01-02"] == (50, 49)

    fp1 = _files_fingerprint(corpus)
    untouched0 = {k: v for k, v in fp0.items() if k.startswith(("ds=2024-01-03", "ds=2024-01-04"))}
    untouched1 = {k: v for k, v in fp1.items() if k.startswith(("ds=2024-01-03", "ds=2024-01-04"))}
    assert untouched0 == untouched1  # byte-identical files, never rewritten

    out = spark.read.parquet(corpus)
    assert out.count() == 197
    assert out.where(F.col("doc_id").isin(0, 1, 4)).count() == 0
    # survivors intact in rewritten partitions
    assert out.where("doc_id = 8").count() == 1

    # lineage sidecar records the purge per partition
    lin = spark.read.parquet(corpus + "__lineage")
    got = {
        (r["ds"], r["rows"])
        for r in lin.where(F.col("job_name") == "purge").collect()
    }
    assert got == {("2024-01-01", 48), ("2024-01-02", 49)}


def test_purge_no_match_is_noop(spark, corpus):
    fp0 = _files_fingerprint(corpus)
    tomb = spark.createDataFrame([(10_000,)], "doc_id long")
    res = purge(spark, corpus, tomb, "doc_id")
    assert res.partitions_affected == [] and res.rows_deleted == 0
    assert _files_fingerprint(corpus) == fp0


def test_purge_converges_and_empties_partition(spark, corpus):
    # purge EVERY row of ds=2024-01-01; the partition stays registered
    # (empty dir) and a second purge is a no-op
    tomb = spark.createDataFrame([(i,) for i in range(0, 200, 4)], "doc_id long")
    res = purge(spark, corpus, tomb, "doc_id")
    assert res.partitions_affected == ["2024-01-01"]
    assert res.rows_deleted == 50
    assert os.path.isdir(f"{corpus}/ds=2024-01-01")
    assert spark.read.parquet(corpus).count() == 150

    res2 = purge(spark, corpus, tomb, "doc_id")
    assert res2.partitions_affected == [] and res2.rows_deleted == 0
