"""Scaling pair for the PRODUCTION layout: the key-clustered as-of backfill.

The flagship pairs measure the cold path (events shuffled per run). In
production the clustered layout (plans/clustered.py) pays that shuffle
once at write time, and every subsequent backfill — labels, target
encoding, training-set export, conf-change recompute — scans the
bucketed table with the big side never moving. This tool evidences the
north rule on THAT job: write the bucketed table once at full
parallelism, then run the identical url-keyed as-of GroupBy backfill at
N and 4N cores, each side a fresh Spark session that re-attaches the
bucket metadata by DDL over the existing files (no data rewrite — the
point of the layout).

Run solo (host is time-shared); records a `clustered_backfill` pair in
SCALING.json via bench.record_scaling.
"""

import os
import sys
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

import bench  # noqa: E402
from chronon_spark.api.types import (  # noqa: E402
    Aggregation,
    EventSource,
    GroupBy,
    Operation,
    Query,
    Window,
)
from chronon_spark.operators.asof_hopped import group_by_asof_hopped  # noqa: E402
from chronon_spark.operators.asof_join import events_df_for_group_by  # noqa: E402
from chronon_spark.plans.clustered import (  # noqa: E402
    drop_managed_table,
    read_clustered_events,
)

ROWS = int(os.environ.get("CLUSTERED_SCALING_ROWS", "3000000"))
N = int(os.environ.get("CLUSTERED_SCALING_N", "2"))
FOUR_N = 4 * N
REPEATS = int(os.environ.get("CLUSTERED_SCALING_REPEATS", "2"))
BUCKETS = 16  # serves both core counts; one task per bucket at read
TABLE = "bench_clustered_scaling"
DAY_MS = 86_400_000


def make_group_by(narrow: str) -> GroupBy:
    return GroupBy(
        sources=(
            EventSource(
                table=narrow,
                query=Query(
                    selects={"url": "url", "text_len": "text_len"},
                    time_column="ts_ms",
                ),
            ),
        ),
        key_columns=("url",),
        aggregations=(
            Aggregation("text_len", Operation.COUNT),
            Aggregation("text_len", Operation.AVERAGE, windows=(Window.days(30),)),
            Aggregation("text_len", Operation.LAST),
        ),
        name="url_clustered_scaling",
    )


def attach_bucketed(spark, location: str, ddl_cols: str):
    """Re-register the bucketed table in a fresh session: DDL over the
    existing bucketed files — metadata only, zero data movement."""
    spark.sql(f"DROP TABLE IF EXISTS {TABLE}")
    spark.sql(
        f"CREATE TABLE {TABLE} ({ddl_cols}) USING parquet "
        f"CLUSTERED BY (url) SORTED BY (url, ts) INTO {BUCKETS} BUCKETS "
        f"LOCATION '{location}'"
    )


def run_side(master: str, cores: int, narrow: str, location: str, ddl_cols: str) -> dict:
    spark = bench.build(master, shuffle_partitions=max(cores * 2, 8))
    try:
        attach_bucketed(spark, location, ddl_cols)
        gb = make_group_by(narrow)
        ev = read_clustered_events(spark, TABLE)
        q = (
            spark.read.parquet(narrow)
            .selectExpr("url", "ts_ms AS ts")
            .distinct()
            .localCheckpoint()
        )
        q.count()  # materialize the identical query side outside the walls
        walls = []
        for _ in range(REPEATS):
            t0 = time.time()
            out = group_by_asof_hopped(
                spark, gb, q, hop_ms=DAY_MS, events_df=ev, events_clustered=True
            )
            bench.force(out)
            walls.append(time.time() - t0)
    finally:
        spark.stop()
    wall = min(walls)
    return {
        "cores": cores,
        "wall_sec": round(wall, 3),
        "walls": [round(w, 3) for w in walls],
        "rows_per_sec": round(ROWS / wall, 1),
    }


def main():
    import json

    bench._BW_CEILING.update(bench.bandwidth_canary())
    print("bw ceiling:", bench._BW_CEILING, flush=True)

    # one-time layout write at full parallelism (the production posture:
    # the ingest cluster clusters; backfills only read)
    spark = bench.build("local[32]", shuffle_partitions=64)
    try:
        path = bench.webtext_parquet(spark, ROWS)
        narrow = bench.materialize_source(spark, path)
        ev = events_df_for_group_by(spark, make_group_by(narrow))
        ddl_cols = ev.schema.toDDL()
        drop_managed_table(spark, TABLE)
        t0 = time.time()
        (
            ev.write.bucketBy(BUCKETS, "url")
            .sortBy("url", "ts")
            .mode("overwrite")
            .format("parquet")
            .saveAsTable(TABLE)
        )
        write_wall = round(time.time() - t0, 1)
        wh = spark.conf.get("spark.sql.warehouse.dir")
        location = wh.rstrip("/") + "/" + TABLE.lower()
        print(f"clustered write (one-time, 32 cores): {write_wall}s", flush=True)
    finally:
        spark.stop()

    lo = run_side(f"local[{N}]", N, narrow, location, ddl_cols)
    print("lo", lo, flush=True)
    hi = run_side(f"local[{FOUR_N}]", FOUR_N, narrow, location, ddl_cols)
    print("hi", hi, flush=True)
    e = bench.pair_entry(lo, hi, ROWS, job="clustered_backfill")
    e["note"] = (
        f"production-layout pair: url-keyed as-of backfill over the "
        f"key-clustered (bucketBy {BUCKETS}) event table — the big side "
        f"never shuffles; one-time 32-core clustered write {write_wall}s "
        f"amortized across every backfill sharing the key"
    )
    bench.record_scaling(e)
    print(json.dumps(e))


if __name__ == "__main__":
    main()
