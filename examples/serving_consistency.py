"""The full lambda lifecycle, closed offline: batch upload -> serving
replay (offline Fetcher) -> serving logs -> flatten -> ConsistencyJob.

The reference operates this loop across three systems (GroupByUpload on
Spark, the Fetcher in the serving tier writing Kafka logs,
LogFlattenerJob + ConsistencyJob back on Spark:
`spark/.../GroupByUpload.scala`, `online/fetcher/Fetcher.scala`,
`spark/.../LogFlattenerJob.scala`, `spark/.../stats/ConsistencyJob.scala`).
Here the same loop runs as four batch plans over one SparkSession — and
the final consistency metrics must show ZERO drift, because the fetch
path and the offline recompute share sawtooth semantics at the same hop.

Run: python examples/serving_consistency.py
"""

from __future__ import annotations

import os
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DAY_MS = 86_400_000
START_MS = 1_704_067_200_000  # 2024-01-01
BOUNDARY = START_MS + 15 * DAY_MS  # batch end: day 15, hop-aligned


def synth_events(spark: SparkSession, n: int = 60_000, users: int = 500):
    """Deterministic synthetic event stream: 30 days, integer-cent values."""
    return (
        spark.range(0, n, numPartitions=8)
        .select(
            F.col("id").alias("event_id"),
            F.pmod(F.xxhash64("id", F.lit("u")), F.lit(users)).alias("user_id"),
            (
                START_MS
                + F.pmod(F.xxhash64("id", F.lit("t")), F.lit(30 * DAY_MS))
            ).alias("ts"),
            F.pmod(F.xxhash64("id", F.lit("v")), F.lit(10_000)).alias("value"),
        )
    )


def run(spark: SparkSession, workdir: str, verbose: bool = True) -> dict:
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
    from chronon_spark.plans.consistency import consistency_job
    from chronon_spark.plans.fetcher import fetch_join, join_codec
    from chronon_spark.plans.log_flattener import flatten_logs
    from chronon_spark.plans.upload import upload_group_by

    def say(msg):
        if verbose:
            print(msg)

    events_path = os.path.join(workdir, "events")
    synth_events(spark).write.mode("overwrite").parquet(events_path)

    src = EventSource(
        table=events_path,
        query=Query(
            selects={"user_id": "user_id", "value": "value"},
            time_column="ts",
        ),
    )
    gb = GroupBy(
        sources=(src,),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.SUM, windows=(Window.days(7),)),
            Aggregation("value", Operation.COUNT),
            Aggregation("value", Operation.LAST),
        ),
        name="srv",
    )
    join_conf = Join(
        left=src,
        join_parts=(JoinPart(gb, prefix="f"),),
        derivations={"*": "*", "ratio": "f_srv_value_sum_7d / (f_srv_value_count + 1)"},
        name="served",
    )

    # 1. batch side: FinalBatchIr upload at the (hop-aligned) batch end
    upload_path = os.path.join(workdir, "upload")
    upload = upload_group_by(spark, gb, BOUNDARY, DAY_MS, output_path=upload_path)
    say(f"1. upload rows (collapsed + tail hops): {upload.count():,d}")

    # 2. serving replay: every post-boundary event is a fetch request
    requests = (
        spark.read.parquet(events_path)
        .where(F.col("ts") >= BOUNDARY)
        .select("user_id", "ts")
        .distinct()
    )
    served = fetch_join(
        spark, join_conf, requests, BOUNDARY, DAY_MS, uploads={"srv": upload}
    )
    say(f"2. served feature vectors: {served.count():,d}")

    # 3. the serving tier logs (key_json, value_json) per response —
    #    exactly the reference's loggable response shape
    codec = join_codec(spark, join_conf)
    value_cols = [f.name for f in codec["base_value_schema"].fields] + ["ratio"]
    logs = served.select(
        F.lit(join_conf.name).alias("name"),
        F.col("ts").alias("ts_millis"),
        F.date_format(F.timestamp_millis(F.col("ts")), "yyyy-MM-dd").alias("ds"),
        F.lit("v1").alias("schema_hash"),
        F.to_json(F.struct("user_id")).alias("key_json"),
        F.to_json(F.struct(*value_cols)).alias("value_json"),
    )
    schema_df = spark.createDataFrame(
        [
            (
                "v1",
                "user_id BIGINT",
                ", ".join(
                    f"{f.name} {f.dataType.simpleString()}"
                    for f in codec["base_value_schema"].fields
                )
                + ", ratio DOUBLE",
            )
        ],
        "schema_hash STRING, key_schema STRING, value_schema STRING",
    )
    flat_path = os.path.join(workdir, "flat_logs")
    flatten_logs(logs, schema_df, join_name=join_conf.name).write.mode(
        "overwrite"
    ).parquet(flat_path)
    say(f"3. flattened serving logs -> {flat_path}")

    # 4. ConsistencyJob: offline recompute (same sawtooth hop) vs logs
    _, metrics = consistency_job(
        spark, join_conf, flat_path, mode="sawtooth", tail_hop_ms=DAY_MS
    )
    pdf = metrics.toPandas()
    bad = pdf[pdf["metric"].isin(["mismatch", "left_null", "right_null"])]
    mismatches = int(bad["value"].sum())
    say("4. consistency metrics (per ds x column):")
    if verbose:
        print(pdf[pdf["metric"].isin(["mismatch", "total"])].to_string(index=False))
    return {"metrics": pdf, "mismatches": mismatches, "served": served}


def main():
    from chronon_spark.session import build_session

    spark = build_session(
        master="local[8]",
        shuffle_partitions=16,
        extra_conf={"spark.ui.enabled": "false"},
    )
    with tempfile.TemporaryDirectory(prefix="serving_consistency_") as d:
        out = run(spark, d)
    total = out["mismatches"]
    print(f"\ntotal mismatched values across all served features: {total}")
    assert total == 0, "lambda serving drifted from the offline recompute!"


if __name__ == "__main__":
    main()
