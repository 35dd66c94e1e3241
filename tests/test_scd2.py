"""SCD2 validity intervals: hand oracle, inverse-of-replay equivalence,
no-op collapse, duplicate-ts determinism, parallelism invariance, and
the one-exchange plan pin (both windows ride one shuffle + sort)."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.scd2 import scd2_intervals, scd2_lookup


@pytest.fixture(scope="module")
def updates(spark):
    rows = [
        # key, ts, color, size
        ("a", 10, "red", 1),
        ("a", 20, "red", 1),      # no-op -> collapsed
        ("a", 30, "blue", 1),     # change
        ("a", 30, "red", 2),      # duplicate ts: winner = greatest attrs
        ("a", 40, None, 1),       # null attr is a real change
        ("a", 50, None, 1),       # null == null -> no-op
        ("b", 15, "green", 7),
        (None, 5, "x", 0),        # null key dropped
        ("c", None, "y", 1),      # null ts dropped
    ]
    return spark.createDataFrame(rows, "key string, ts long, color string, size int")


def test_hand_oracle(updates):
    out = scd2_intervals(updates, ["key"], ["color", "size"], ts_col="ts")
    got = {tuple(r) for r in out.collect()}
    # duplicate (a, 30): winner by greatest attr tuple is ('red', 2)
    # ('red' > 'blue' in string desc order), which DIFFERS from
    # ('red', 1) at 10, so it survives; (None, 1) at 40 changes again;
    # 50 null-safe-equals 40 and collapses.
    want = {
        ("a", "red", 1, 10, 30),
        ("a", "red", 2, 30, 40),
        ("a", None, 1, 40, None),
        ("b", "green", 7, 15, None),
    }
    assert got == want


def test_no_collapse_keeps_noops(updates):
    out = scd2_intervals(
        updates, ["key"], ["color", "size"], ts_col="ts", collapse_noops=False
    )
    a_rows = [tuple(r) for r in out.where(F.col("key") == "a").collect()]
    assert len(a_rows) == 5  # 10,20,30,40,50 all kept (30 deduped to one)


def test_open_end_closes_current(updates):
    out = scd2_intervals(
        updates, ["key"], ["color", "size"], ts_col="ts", open_end_ts=100
    )
    assert out.where(F.col("valid_to").isNull()).count() == 0
    assert (
        out.where((F.col("key") == "b") & (F.col("valid_to") == 100)).count() == 1
    )


def test_lookup_is_inverse_of_replay(spark, sf_dir):
    """scd2_lookup at ts must equal 'latest update at or before ts' —
    the interval table and the event replay are two encodings of one
    history."""
    ev = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr(
            "user_id",
            "unix_micros(CAST(ts AS TIMESTAMP)) div 1000 AS ts",
            "event_type",
            "CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents",
        )
    )
    iv = scd2_intervals(ev, ["user_id"], ["event_type", "cents"], ts_col="ts")
    q = ev.select("user_id", "ts").distinct()
    got = scd2_lookup(iv, q, ["user_id"], ts_col="ts")

    # direct replay: arg_max over updates <= qts, same dup-ts tiebreak
    from pyspark.sql import Window as W

    tie = W.partitionBy("user_id", "ts").orderBy(
        F.col("event_type").desc_nulls_last(), F.col("cents").desc_nulls_last()
    )
    one = ev.withColumn("__rn", F.row_number().over(tie)).where(F.col("__rn") == 1)
    j = q.alias("q").join(
        one.alias("e"),
        on=(F.col("q.user_id") == F.col("e.user_id"))
        & (F.col("e.ts") <= F.col("q.ts")),
        how="left",
    )
    pick = W.partitionBy("q.user_id", "q.ts").orderBy(F.col("e.ts").desc())
    want = (
        j.withColumn("__rn", F.row_number().over(pick))
        .where(F.col("__rn") == 1)
        .select(
            F.col("q.user_id").alias("user_id"),
            F.col("q.ts").alias("ts"),
            F.col("e.event_type").alias("event_type"),
            F.col("e.cents").alias("cents"),
        )
    )
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in want.collect()}


def test_parallelism_invariance(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) div 1000 AS ts",
        "event_type",
    )
    res = {}
    for n in (3, 17):
        spark.conf.set("spark.sql.shuffle.partitions", str(n))
        out = scd2_intervals(ev, ["user_id"], ["event_type"], ts_col="ts")
        res[n] = {tuple(r) for r in out.collect()}
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    assert res[3] == res[17]


def test_one_exchange_plan(updates):
    """tie-break window, collapse window, and lead window all partition
    by the key -> Catalyst plans ONE hash exchange; no-op collapse and
    interval close add zero shuffles."""
    out = scd2_intervals(updates, ["key"], ["color", "size"], ts_col="ts")
    plan = out._jdf.queryExecution().executedPlan().toString()
    n = plan.count("Exchange hashpartitioning")
    assert n <= 1, f"{n} exchanges\n{plan[:3000]}"
