"""coalesced join, bootstrap covering-set skip, small-mode, semi pruning."""

from pyspark.sql import functions as F

from chronon_spark.api.types import (
    Aggregation,
    EventSource,
    GroupBy,
    Join,
    JoinPart,
    Operation,
    Query,
    Window,
)
from chronon_spark.operators.asof_join import group_by_asof, join_asof
from chronon_spark.operators.join_utils import (
    coalesced_join,
    inject_small_mode_keys,
    prune_events_by_keys,
    uncovered_rows,
)
from chronon_spark.sources.scan import millis_expr


def test_coalesced_join(spark):
    left = spark.createDataFrame(
        [(1, None), (2, 20.0), (3, None)], "id long, v double"
    )
    right = spark.createDataFrame([(1, 10.0), (3, 30.0)], "id long, v double")
    out = coalesced_join(left, right, ["id"]).toPandas().set_index("id").sort_index()
    assert out.loc[1, "v"] == 10.0  # filled from right
    assert out.loc[2, "v"] == 20.0  # left wins
    assert out.loc[3, "v"] == 30.0


def test_uncovered_rows(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 1.0), (2, None, 1.0), (3, None, None)], "id long, a double, b double"
    )
    assert {r["id"] for r in uncovered_rows(df, ["a", "b"]).collect()} == {2, 3}
    # missing column -> nothing counts as covered
    assert uncovered_rows(df, ["a", "zzz"]).count() == 3


def test_small_mode_injection_pushdown(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = spark.createDataFrame([(3,), (5,)], "user_id long")
    pruned = inject_small_mode_keys(events, left, ["user_id"])
    assert set(r["user_id"] for r in pruned.select("user_id").distinct().collect()) <= {3, 5}
    # the IN-list must reach the parquet scan (PushedFilters)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan and "In(user_id" in plan


def test_prune_events_by_keys(spark, sf_dir):
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    left = spark.createDataFrame([(3,), (5,)], "user_id long")
    pruned = prune_events_by_keys(events, left, ["user_id"])
    got = set(r["user_id"] for r in pruned.select("user_id").distinct().collect())
    assert got == {3, 5}


def _src(sf_dir):
    return EventSource(
        table=f"{sf_dir}/events.parquet",
        query=Query(
            selects={"event_id": "event_id", "user_id": "user_id",
                     "value": "floor(value*100 + 0.5)"},
            time_column=millis_expr("ts"),
        ),
    )


def test_bootstrap_join_skips_covered(spark, sf_dir):
    src = _src(sf_dir)
    gb = GroupBy(
        sources=(src,),
        key_columns=("user_id",),
        aggregations=(Aggregation("value", Operation.SUM, windows=(Window.days(7),)),),
        name="g",
    )
    j = Join(left=src, join_parts=(JoinPart(gb),), name="bj", row_ids=("event_id",))

    # bootstrap covers half the rows with a sentinel value
    left_ids = spark.read.parquet(f"{sf_dir}/events.parquet").select("event_id")
    boot = (
        left_ids.where(F.col("event_id") % 2 == 0)
        .withColumn("g_value_sum_7d", F.lit(-1.0))
    )
    out = join_asof(spark, j, bootstrap_df=boot).select("event_id", "g_value_sum_7d")
    pdf = out.toPandas()
    even = pdf[pdf.event_id % 2 == 0]
    odd = pdf[pdf.event_id % 2 == 1]
    assert (even["g_value_sum_7d"] == -1.0).all()  # bootstrap wins
    assert (odd["g_value_sum_7d"] != -1.0).all()  # computed for the rest
    assert odd["g_value_sum_7d"].notna().all()

    # and the uncovered computation matches the no-bootstrap run
    full = join_asof(spark, j).select("event_id", "g_value_sum_7d").toPandas()
    merged = odd.merge(full, on="event_id", suffixes=("", "_full"))
    assert (merged["g_value_sum_7d"] == merged["g_value_sum_7d_full"]).all()


def test_group_by_derivations(spark, sf_dir):
    gb = GroupBy(
        sources=(_src(sf_dir),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.SUM, windows=(Window.days(7),)),
            Aggregation("value", Operation.COUNT, windows=(Window.days(7),)),
        ),
        name="g",
        derivations={"*": "*", "avg7": "value_sum_7d / value_count_7d"},
    )
    q = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "user_id", f"{millis_expr('ts')} AS ts"
    )
    out = group_by_asof(spark, gb, q)
    assert "avg7" in out.columns
    row = out.where(F.col("value_count_7d") > 0).first()
    assert abs(row["avg7"] - row["value_sum_7d"] / row["value_count_7d"]) < 1e-9
