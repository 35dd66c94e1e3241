"""Streaming tiles == batch tiles; session windows == batch sessionization;
incremental checkpoint resume only processes new files."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.api.types import Aggregation, GroupBy, EventSource, Operation, Query, Window
from chronon_spark.operators.analytic import session_stats
from chronon_spark.streaming.stream_groupby import (
    run_available_now,
    smallest_tail_hop_ms,
    stream_sessionize,
    stream_tile_aggregate,
)

GB = GroupBy(
    sources=(EventSource(table="unused", query=Query()),),
    key_columns=("user_id",),
    aggregations=(
        Aggregation("value", Operation.COUNT, windows=(Window.days(14),)),
        Aggregation("value", Operation.SUM, windows=(Window.days(14),)),
        Aggregation("value", Operation.MIN, windows=(Window.days(14),)),
        Aggregation("value", Operation.LAST),
    ),
    name="stream_gb",
)


def _events_batch(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "user_id", "unix_micros(CAST(ts AS TIMESTAMP)) div 1000 AS ts", "floor(value*100 + 0.5) AS value"
    )


def test_tail_hop_sizing():
    assert smallest_tail_hop_ms(GB) == 86_400_000  # 14d window -> 1d tiles
    gb_h = GroupBy(GB.sources, ("user_id",), (Aggregation("value", Operation.SUM, windows=(Window.hours(13),)),))
    assert smallest_tail_hop_ms(gb_h) == 3_600_000
    gb_m = GroupBy(GB.sources, ("user_id",), (Aggregation("value", Operation.SUM, windows=(Window.hours(2),)),))
    assert smallest_tail_hop_ms(gb_m) == 300_000


def test_stream_tiles_equal_batch_tiles(spark, sf_dir, tmp_path):
    batch = _events_batch(spark, sf_dir)
    # file-source streaming needs a directory; re-write the table there
    src = str(tmp_path / "events_dir")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) div 1000 AS ts", "floor(value*100 + 0.5) AS value")
    )
    got = run_available_now(
        stream_tile_aggregate(stream, GB),
        str(tmp_path / "ckpt"),
        "tiles_stream",
    ).toPandas()
    exp = stream_tile_aggregate(batch, GB).toPandas()
    key = ["user_id", "tile_start"]
    got = got.sort_values(key).reset_index(drop=True)[sorted(got.columns)]
    exp = exp.sort_values(key).reset_index(drop=True)[sorted(exp.columns)]
    assert len(got) == len(exp) > 0
    assert got.equals(exp)


def test_stream_sessionize_matches_batch(spark, sf_dir, tmp_path):
    gap = 30 * 60 * 1000
    batch = _events_batch(spark, sf_dir)
    exp = (
        session_stats(batch, ["user_id"], gap)
        .drop("session_id")
        .toPandas()
        .sort_values(["user_id", "session_start_ts"])
        .reset_index(drop=True)
    )
    src = str(tmp_path / "events_dir")
    spark.read.parquet(f"{sf_dir}/events.parquet").write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = (
        spark.readStream.schema(schema)
        .parquet(src)
        .selectExpr("user_id", "unix_micros(CAST(ts AS TIMESTAMP)) div 1000 AS ts", "floor(value*100 + 0.5) AS value")
    )
    got = (
        run_available_now(
            stream_sessionize(stream, ["user_id"], gap), str(tmp_path / "ck2"), "sess_stream"
        )
        .toPandas()
        .sort_values(["user_id", "session_start_ts"])
        .reset_index(drop=True)
    )
    assert got[exp.columns.tolist()].equals(exp)


def test_incremental_checkpoint_resume(spark, sf_dir, tmp_path):
    """New files after a restart are incorporated; old state survives the
    restart via the checkpoint."""
    ev = _events_batch(spark, sf_dir).limit(2000).cache()
    half1 = ev.where(F.col("ts") % 2 == 0)
    half2 = ev.where(F.col("ts") % 2 == 1)
    src = str(tmp_path / "incoming")
    ckpt = str(tmp_path / "ck3")
    half1.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    def drain(name):
        stream = spark.readStream.schema(schema).parquet(src)
        return run_available_now(stream_tile_aggregate(stream, GB), ckpt, name).toPandas()

    r1 = drain("inc_a")
    half2.write.mode("append").parquet(src)
    r2 = drain("inc_b")
    exp = stream_tile_aggregate(ev, GB).toPandas()
    assert r1["ir_cnt_value"].sum() == half1.count()
    assert r2["ir_cnt_value"].sum() == ev.count()
    m = r2.sort_values(["user_id", "tile_start"]).reset_index(drop=True)[sorted(r2.columns)]
    e = exp.sort_values(["user_id", "tile_start"]).reset_index(drop=True)[sorted(exp.columns)]
    assert m.equals(e)


def test_stateful_last_k_across_restarts(spark, sf_dir, tmp_path):
    """applyInPandasWithState LAST_K: state survives a checkpointed restart
    and the final answer equals the batch kernel's last_k."""
    import numpy as np

    from chronon_spark.api.types import AggregationPart, Operation
    from chronon_spark.kernel.sawtooth import compute_asof_features
    from chronon_spark.streaming.stateful import stream_last_k

    ev = _events_batch(spark, sf_dir).limit(1000).cache()
    half1 = ev.where(F.col("ts") % 2 == 0)
    half2 = ev.where(F.col("ts") % 2 == 1)
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    half1.write.mode("overwrite").parquet(src)
    schema = spark.read.parquet(src).schema

    out_dir = str(tmp_path / "updates")

    def drain(batch_tag):
        stream = spark.readStream.schema(schema).parquet(src)

        def sink(batch_df, batch_id):
            (batch_df.withColumn("tag", F.lit(batch_tag))
             .write.mode("append").parquet(out_dir))

        q = (
            stream_last_k(stream, ["user_id"], k=3)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return (
            spark.read.parquet(out_dir)
            .where(F.col("tag") == batch_tag)
            .toPandas()
        )

    drain("a")
    half2.write.mode("append").parquet(src)
    r2 = drain("b")
    assert r2["n_events_seen"].sum() == ev.count()  # state restored, not reset

    # batch truth per key via the kernel at ts = +inf
    full = ev.toPandas()
    for uid, grp in full.groupby("user_id"):
        got = r2[r2.user_id == uid]["last_k"].iloc[0]
        feats = compute_asof_features(
            grp.rename(columns={"value": "value"}),
            np.array([2**62], dtype=np.int64),
            [AggregationPart("value", Operation.LAST_K, {"k": 3})],
        )
        exp = feats["value_last3"][0]
        assert [round(x, 6) for x in got] == [round(float(v), 6) for v in exp], uid
