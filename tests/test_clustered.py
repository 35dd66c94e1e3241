"""Key-clustered (sorted-bucket) event layout: results identical to the
shuffled plan, and the bucketed scan genuinely removes the events-side
exchange (the one shuffle the hopped plan otherwise pays on the big
side). Reference analogue: JoinPartJob's materialized part tables."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.api.types import Aggregation, GroupBy, Operation, Window
from chronon_spark.operators.asof_hopped import group_by_asof_hopped
from chronon_spark.operators.asof_join import events_df_for_group_by
from chronon_spark.plans.clustered import (
    read_clustered_events,
    write_clustered_events,
)
from chronon_spark.sources.scan import TS

DAY_MS = 86_400_000


def _gb(sf_dir):
    from chronon_spark.api.types import EventSource, Query
    from chronon_spark.sources.scan import millis_expr

    return GroupBy(
        sources=(
            EventSource(
                table=f"{sf_dir}/events.parquet",
                query=Query(
                    selects={
                        "user_id": "user_id",
                        # integer cents: exact across summation orders
                        "value": "floor(value * 100 + 0.5)",
                    },
                    time_column=millis_expr("ts"),
                ),
            ),
        ),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.COUNT, windows=(Window.days(7),)),
            Aggregation("value", Operation.SUM, windows=(Window.days(14),)),
            Aggregation("value", Operation.LAST),
        ),
        name="clustered_gb",
    )


def _queries(spark, ev):
    return ev.select("user_id", F.col(TS)).distinct()


@pytest.fixture(scope="module")
def frames(spark, sf_dir):
    gb = _gb(sf_dir)
    ev = events_df_for_group_by(spark, gb)
    tbl = write_clustered_events(
        spark, ev, ["user_id"], table="test_clustered_events", num_buckets=4
    )
    q = _queries(spark, ev)
    plain = group_by_asof_hopped(spark, gb, q, hop_ms=DAY_MS)
    clustered = group_by_asof_hopped(
        spark,
        gb,
        q,
        hop_ms=DAY_MS,
        events_df=read_clustered_events(spark, tbl),
        events_clustered=True,
    )
    return plain, clustered


def test_clustered_equals_shuffled(frames):
    plain, clustered = frames
    a = {tuple(r) for r in plain.collect()}
    b = {tuple(r) for r in clustered.collect()}
    assert a == b and len(a) > 0


def test_clustered_scan_feeds_agg_without_exchange(frames):
    """The load-bearing pin: in the clustered plan the hop-IR
    HashAggregate consumes the bucketed FileScan with NO Exchange in
    between, while the plain plan repartitions the events side. Spark
    renders bucketed scans with 'Bucketed: true'; we assert the
    exchange count drops AND the scan is actually bucket-exploited
    (not silently read as a plain file scan)."""
    plain, clustered = frames
    p_plan = plain._jdf.queryExecution().executedPlan().toString()
    c_plan = clustered._jdf.queryExecution().executedPlan().toString()
    assert "Bucketed: true" in c_plan, c_plan[:3000]
    p_ex = p_plan.count("Exchange hashpartitioning")
    c_ex = c_plan.count("Exchange hashpartitioning")
    assert c_ex < p_ex, f"clustered {c_ex} !< plain {p_ex}"


def test_flag_without_bucketing_is_safe(spark, sf_dir):
    """events_clustered=True on a NON-bucketed frame: Spark re-inserts
    the exchange (EnsureRequirements) and results stay correct — the
    flag can never corrupt output, only change the plan."""
    gb = _gb(sf_dir)
    ev = events_df_for_group_by(spark, gb)
    q = _queries(spark, ev)
    base = group_by_asof_hopped(spark, gb, q, hop_ms=DAY_MS)
    hinted = group_by_asof_hopped(
        spark, gb, q, hop_ms=DAY_MS, events_clustered=True
    )
    assert {tuple(r) for r in base.collect()} == {
        tuple(r) for r in hinted.collect()
    }


# ------------------------------ bucketed merge fold (r5 stretch)


@pytest.fixture(scope="module")
def fold_frames(spark, sf_dir):
    """A left + two part frames keyed by (user_id, ts), as the modular
    merge job sees them."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) div 1000 AS ts",
        "CAST(floor(value*100 + 0.5) AS BIGINT) AS cents",
    ).dropDuplicates(["user_id", "ts"])
    left = ev.select("user_id", "ts")
    p1 = ev.select("user_id", "ts", F.col("cents").alias("a_cents"))
    p2 = ev.select("user_id", "ts", (F.col("cents") * 2).alias("b_twice"))
    return left, p1, p2


def test_bucketed_merge_fold_zero_exchanges(spark, fold_frames):
    """The storage-partitioned merge fold: with left + parts bucketed by
    the join key, the fold's executed plan contains ZERO exchanges
    (Iceberg SPJ shape on Hive-format buckets), and its rows equal the
    shuffled fold exactly."""
    from chronon_spark.plans.clustered import bucketed_merge_fold

    left, p1, p2 = fold_frames
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        folded = bucketed_merge_fold(
            spark, left, {"a": p1, "b": p2}, ["user_id"], num_buckets=4,
            table_prefix="t_bmf",
        )
        plan = folded._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan
        # shuffled fold for equality + exchange-count contrast
        shuffled = left.join(p1, on=["user_id", "ts"], how="left").join(
            p2, on=["user_id", "ts"], how="left"
        )
        s_plan = shuffled._jdf.queryExecution().executedPlan().toString()
        assert s_plan.count("Exchange") >= 3, s_plan
        a = {tuple(r) for r in folded.collect()}
        b = {tuple(r) for r in shuffled.collect()}
        assert a == b and len(a) >= 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
