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


def test_node_runner_subprocess_equals_monolith(spark, sf_dir, tmp_path):
    """r3 VERDICT Next #7 (reference batch/BatchNodeRunner.scala +
    planner.thrift): every stage runs as its OWN process via
    `python -m chronon_spark.cli run-node`, state handed off only through
    the stage tables — and the merged output equals the monolithic join."""
    import json
    import subprocess
    import sys

    out = str(tmp_path / "np_out")
    conf_py = tmp_path / "conf_mod.py"
    conf_py.write_text(
        f"""
import sys
sys.path.insert(0, "/root/repo")
from chronon_spark.api.types import (
    Aggregation, EventSource, GroupBy, Join, JoinPart, Operation, Query, Window,
)
from chronon_spark.sources.scan import millis_expr

_src = EventSource(
    table="{sf_dir}/events.parquet",
    query=Query(
        selects={{"event_id": "event_id", "user_id": "user_id",
                 "value": "floor(value*100 + 0.5)"}},
        time_column=millis_expr("ts"),
    ),
)
def get_join():
    gb1 = GroupBy((_src,), ("user_id",),
                  (Aggregation("value", Operation.SUM, windows=(Window.days(7),)),),
                  name="a")
    gb2 = GroupBy((_src,), ("user_id",),
                  (Aggregation("value", Operation.COUNT),),
                  name="b")
    return Join(left=_src, join_parts=(JoinPart(gb1), JoinPart(gb2)), name="mod")
"""
    )

    # the plan itself (no Spark session)
    plan = subprocess.run(
        [sys.executable, "-m", "chronon_spark.cli", "plan-join",
         "--conf", str(conf_py), "--output", out],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert plan.returncode == 0, plan.stderr[-2000:]
    nodes = json.loads(plan.stdout.strip().splitlines()[-1])["nodes"]
    assert [n["kind"] for n in nodes] == ["source", "join_part", "join_part", "merge"]
    assert nodes[-1]["inputs"] == [out + "__left", out + "__part_a", out + "__part_b"]

    # full DAG, one subprocess per node
    run = subprocess.run(
        [sys.executable, "-m", "chronon_spark.cli", "--master", "local[4]",
         "run-plan", "--conf", str(conf_py), "--output", out,
         "--start", RNG.start, "--end", RNG.end, "--step-days", "4"],
        capture_output=True, text=True, cwd="/root/repo", timeout=900,
    )
    assert run.returncode == 0, (run.stdout[-2000:], run.stderr[-2000:])
    summary = json.loads(run.stdout.strip().splitlines()[-1])
    assert summary["nodes_run"] == [n["node_id"] for n in nodes]

    got = (
        spark.read.parquet(out)
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    mono = (
        join_asof(spark, _join(sf_dir), mode="sawtooth")
        .withColumn("ds", F.date_format(F.timestamp_millis(F.col("ts")), "yyyy-MM-dd"))
        .where((F.col("ds") >= RNG.start) & (F.col("ds") <= RNG.end))
        .toPandas().sort_values("event_id").reset_index(drop=True)
    )
    assert len(got) == len(mono) > 0
    for col in ["a_value_sum_7d", "b_value_count"]:
        g, e = got[col].astype(float), mono[col].astype(float)
        assert ((g.isna() & e.isna()) | (abs(g - e) < 1e-9)).all(), col


def test_selected_parts_then_full_resume(spark, sf_dir, tmp_path):
    """Reference SelectedJoinPartsTest: compute ONE part (the iterate
    workflow), then the full join — the selected part's stage table is
    reused (its lineage gains no new rows) and the canonical output only
    ever carries the full schema."""
    out = str(tmp_path / "out")
    j = _join(sf_dir)

    with pytest.raises(ValueError, match="selected_parts not in join"):
        backfill_join_modular(spark, j, out, RNG, step_days=4,
                              selected_parts=["nope"])

    res = backfill_join_modular(spark, j, out, RNG, step_days=4,
                                selected_parts=["a"])
    assert res.lineage_rows > 0
    sel = spark.read.parquet(out + "__sel_a")
    assert "a_value_sum_7d" in sel.columns
    assert "b_value_count" not in sel.columns  # only the selected part
    lin_a_1 = spark.read.parquet(out + "__part_a__lineage").count()

    backfill_join_modular(spark, j, out, RNG, step_days=4)
    full = spark.read.parquet(out)
    assert {"a_value_sum_7d", "b_value_count"} <= set(full.columns)
    # part a's stage table resumed — no recompute, no new lineage rows
    lin_a_2 = spark.read.parquet(out + "__part_a__lineage").count()
    assert lin_a_2 == lin_a_1

    sp = sel.toPandas().sort_values("event_id").reset_index(drop=True)
    fp = full.toPandas().sort_values("event_id").reset_index(drop=True)
    assert len(sp) == len(fp) > 0
    g, e = sp["a_value_sum_7d"].astype(float), fp["a_value_sum_7d"].astype(float)
    assert ((g.isna() & e.isna()) | (abs(g - e) < 1e-9)).all()


def test_range_to_fill_rules():
    """Reference JoinUtils.getRangeToFill + NoHistoricalBackfillTest:
    start preference order, end_partition override, and
    historical_backfill=False -> latest-partition-only."""
    from chronon_spark.plans.partition_range import range_to_fill

    r = range_to_fill("2024-01-31", first_available="2024-01-01")
    assert (r.start, r.end) == ("2024-01-01", "2024-01-31")
    # query start beats first_available; override beats both
    r = range_to_fill("2024-01-31", query_start="2024-01-10",
                      first_available="2024-01-01")
    assert r.start == "2024-01-10"
    r = range_to_fill("2024-01-31", query_start="2024-01-10",
                      override_start="2024-01-20")
    assert r.start == "2024-01-20"
    # query end_partition bounds the fill below the requested end
    r = range_to_fill("2024-01-31", query_start="2024-01-10",
                      query_end="2024-01-15")
    assert r.end == "2024-01-15"
    # no historical backfill: single latest partition, overriding everything
    r = range_to_fill("2024-01-31", query_start="2024-01-10",
                      override_start="2024-01-05",
                      historical_backfill=False)
    assert (r.start, r.end) == ("2024-01-31", "2024-01-31")
    assert r.days == 1
    import pytest as _pytest
    with _pytest.raises(ValueError):
        range_to_fill("2024-01-31")
