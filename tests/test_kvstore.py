"""Bucketed KV store: pruned point lookups serve exactly what the full
upload table serves.

The layout claim is verifiable in the plan: a literal-key lookup's
FileSourceScan must report ``SelectedBucketsCount: b out of N`` with
b < N — i.e. the store behaves like an index, not a full scan. The
result claim is bitwise: ``fetch_group_by_kv`` ≡ ``fetch_group_by``
over the in-memory upload frame (reference guarantee: the online KV
read path returns what the batch upload wrote — GroupByUpload.scala +
Api.scala multiGet)."""

import re

import pytest
from pyspark.sql import functions as F

from chronon_spark.plans.fetcher import fetch_group_by
from chronon_spark.plans.kvstore import (
    KV_KEY,
    fetch_group_by_kv,
    kv_key_of,
    kv_lookup,
    write_kv_table,
)
from chronon_spark.plans.upload import upload_group_by
from tests.test_fetcher import BOUNDARY, DAY_MS, _gb, _norm, _requests

N_BUCKETS = 16


@pytest.fixture(scope="module")
def kv_table(spark, sf_dir):
    gb = _gb(sf_dir, name="kv_served")
    table = write_kv_table(
        spark, gb, BOUNDARY, DAY_MS, table="t_kv_served", num_buckets=N_BUCKETS
    )
    yield gb, table
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def _point_requests(spark, sf_dir, n_keys=3):
    reqs = _requests(spark, sf_dir)
    keys = [r.user_id for r in reqs.select("user_id").distinct().limit(n_keys).collect()]
    return reqs.where(F.col("user_id").isin(keys)), keys


def test_point_lookup_prunes_buckets(spark, sf_dir, kv_table):
    gb, table = kv_table
    point, keys = _point_requests(spark, sf_dir)
    plan = kv_lookup(spark, table, point, ["user_id"])._jdf.queryExecution().executedPlan().toString()
    m = re.search(r"SelectedBucketsCount: (\d+) out of (\d+)", plan)
    assert m, plan
    assert int(m.group(2)) == N_BUCKETS
    assert 0 < int(m.group(1)) <= len(keys) < N_BUCKETS


def test_kv_serving_equals_full_upload_serving(spark, sf_dir, kv_table):
    gb, table = kv_table
    point, _ = _point_requests(spark, sf_dir)
    got = _norm(fetch_group_by_kv(spark, gb, point, BOUNDARY, DAY_MS, table).toPandas())
    upload = upload_group_by(spark, gb, BOUNDARY, DAY_MS)
    exp = _norm(
        fetch_group_by(spark, gb, point, BOUNDARY, DAY_MS, upload=upload).toPandas()
    )
    assert got.equals(exp) and len(got) > 0


def test_bulk_lookup_falls_back_to_semi_join(spark, sf_dir, kv_table):
    gb, table = kv_table
    reqs = _requests(spark, sf_dir)
    # max_point_keys=1 forces the bulk path on a multi-key request set
    bulk = kv_lookup(spark, table, reqs, ["user_id"], max_point_keys=1)
    plan = bulk._jdf.queryExecution().executedPlan().toString()
    # no prune on the bulk path: every bucket is read, via one semi join
    assert f"SelectedBucketsCount: {N_BUCKETS} out of {N_BUCKETS}" in plan
    assert "LeftSemi" in plan
    # same rows as the IN-literal path over the same keys
    lit = kv_lookup(spark, table, reqs, ["user_id"])
    assert bulk.count() == lit.count() > 0


def test_kv_key_of_matches_column(spark, sf_dir, kv_table):
    _, table = kv_table
    row = spark.table(table).select("user_id", KV_KEY).first()
    assert kv_key_of([row.user_id]) == row[KV_KEY]
