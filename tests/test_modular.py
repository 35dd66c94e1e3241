"""Modular pipeline == monolithic join (reference ModularJoinTest), plus
stage-level resume."""

import shutil

import pytest
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
from chronon_spark.operators.asof_join import join_asof
from chronon_spark.plans.modular import backfill_join_modular, source_job
from chronon_spark.plans.partition_range import PartitionRange
from chronon_spark.sources.scan import millis_expr


def _join(sf_dir):
    src = EventSource(
        table=f"{sf_dir}/events.parquet",
        query=Query(
            selects={"event_id": "event_id", "user_id": "user_id",
                     "value": "floor(value*100 + 0.5)"},
            time_column=millis_expr("ts"),
        ),
    )
    gb1 = GroupBy((src,), ("user_id",),
                  (Aggregation("value", Operation.SUM, windows=(Window.days(7),)),),
                  name="a")
    gb2 = GroupBy((src,), ("user_id",),
                  (Aggregation("value", Operation.COUNT),),
                  name="b")
    return Join(left=src, join_parts=(JoinPart(gb1), JoinPart(gb2)), name="mod")


RNG = PartitionRange("2024-01-05", "2024-01-12")


def test_modular_equals_monolith(spark, sf_dir, tmp_path):
    out = str(tmp_path / "out")
    res = backfill_join_modular(spark, _join(sf_dir), out, RNG, step_days=4)
    assert res.lineage_rows > 0

    modular = (
        spark.read.parquet(out)
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    mono = (
        join_asof(spark, _join(sf_dir), mode="sawtooth")
        .withColumn("ds", F.date_format(F.timestamp_millis(F.col("ts")), "yyyy-MM-dd"))
        .where((F.col("ds") >= RNG.start) & (F.col("ds") <= RNG.end))
        .toPandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    assert len(modular) == len(mono) > 0
    for col in ["a_value_sum_7d", "b_value_count"]:
        g, e = modular[col].astype(float), mono[col].astype(float)
        assert ((g.isna() & e.isna()) | (abs(g - e) < 1e-9)).all(), col


def test_modular_stage_resume(spark, sf_dir, tmp_path):
    """Nuking one part table re-runs ONLY that stage; left + other part
    stay checkpointed."""
    out = str(tmp_path / "out")
    j = _join(sf_dir)
    backfill_join_modular(spark, j, out, RNG, step_days=4)

    import chronon_spark.plans.modular as M
    shutil.rmtree(out + "__part_a")
    shutil.rmtree(out)  # final must recompute too

    calls = []
    orig = M.source_job

    def spy(*a, **k):
        calls.append("source")
        return orig(*a, **k)

    M.source_job = spy
    try:
        res = backfill_join_modular(spark, j, out, RNG, step_days=4)
    finally:
        M.source_job = orig
    # the source stage ran but computed nothing (all partitions checkpointed)
    assert res.lineage_rows > 0  # merge rewrote
    assert spark.read.parquet(out).count() > 0
    lin_left = spark.read.parquet(out + "__left__lineage").toPandas()
    # left lineage only has rows from the FIRST run (no recompute on resume)
    assert lin_left["written_at"].nunique() <= 2
