"""One-off measurement: the key-clustered event layout vs the shuffled
hopped plan on the 3M-row webtext config (same generator/cache as
bench.py). Reports the one-time clustered write cost and per-backfill
walls, best-of-N each. Run solo (host is time-shared)."""

import os
import sys
import time

sys.path.insert(0, "/root/repo")

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
    read_clustered_events,
    write_clustered_events,
)

ROWS = int(os.environ.get("CLUSTERED_BENCH_ROWS", "3000000"))
CORES = int(os.environ.get("CLUSTERED_BENCH_CPUS", "8"))
REPEATS = int(os.environ.get("CLUSTERED_BENCH_REPEATS", "2"))
DAY_MS = 86_400_000


def main():
    spark = bench.build(master=f"local[{CORES}]", shuffle_partitions=max(CORES * 2, 16))
    path = bench.webtext_parquet(spark, ROWS)
    narrow = bench.materialize_source(spark, path)

    gb = GroupBy(
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
        name="url_clustered_bench",
    )
    q = (
        spark.read.parquet(narrow)
        .selectExpr("url", "ts_ms AS ts")
        .distinct()
    )
    q = q.localCheckpoint()  # identical query side for every variant
    n_q = q.count()

    def run(tag, **kw):
        walls = []
        for _ in range(REPEATS):
            t0 = time.time()
            out = group_by_asof_hopped(spark, gb, q, hop_ms=DAY_MS, **kw)
            bench.force(out)  # noop sink + query-checkpoint release
            walls.append(round(time.time() - t0, 1))
        print(f"{tag}: walls={walls} best_qps={round(n_q / min(walls))}", flush=True)
        return min(walls)

    plain = run("plain (shuffled)")

    t0 = time.time()
    tbl = write_clustered_events(
        spark,
        events_df_for_group_by(spark, gb),
        ["url"],
        table="bench_clustered_events",
        num_buckets=CORES * 2,
    )
    w = round(time.time() - t0, 1)
    print(f"clustered write (one-time): {w}s")

    clustered = run(
        "clustered",
        events_df=read_clustered_events(spark, tbl),
        events_clustered=True,
    )
    print(
        f"SUMMARY rows={ROWS} cores={CORES} queries={n_q} "
        f"plain={plain}s clustered={clustered}s write_once={w}s "
        f"speedup={round(plain / clustered, 2)}x "
        f"breakeven_runs={round(w / max(plain - clustered, 0.001), 1)}"
    )


if __name__ == "__main__":
    main()
