"""Quickstart: the reference's onboarding flow, on this engine.

Mirrors the reference's quickstart confs
(python/test/sample/group_bys/quickstart/purchases.py:25-70 and
joins/quickstart/training_set.py:28-56): a purchases GroupBy with
SUM/COUNT/AVERAGE over [3d, 14d, 30d] windows plus LAST_K(10), joined
point-in-time onto a checkout event stream. Here the testdata `events`
table plays purchases (user_id/value/ts) and the query side is the same
stream — swap the paths for your tables.

Run end to end (backfill -> resume -> upload):

    python examples/quickstart.py               # library API
    python -m chronon_spark.cli backfill-join \
        --conf examples/quickstart.py --output /tmp/qs_out \
        --start 2024-01-05 --end 2024-01-20 --step-days 7

The CLI path is resumable: re-running fills only missing ds partitions,
and `<output>__lineage` records per-partition rows/bytes/wall.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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

SF = os.environ.get("QS_SF_DIR", "/root/testdata/sf0.001")

purchases = EventSource(
    table=f"{SF}/events.parquet",
    query=Query(
        selects={
            "user_id": "user_id",
            "purchase_price": "floor(value * 100 + 0.5)",  # cents
        },
        time_column="unix_micros(CAST(ts AS TIMESTAMP)) div 1000",
    ),
)

purchases_group_by = GroupBy(
    sources=(purchases,),
    key_columns=("user_id",),
    aggregations=(
        Aggregation("purchase_price", Operation.SUM,
                    windows=(Window.days(3), Window.days(14), Window.days(30))),
        Aggregation("purchase_price", Operation.COUNT,
                    windows=(Window.days(3), Window.days(14), Window.days(30))),
        Aggregation("purchase_price", Operation.AVERAGE,
                    windows=(Window.days(3), Window.days(14), Window.days(30))),
        Aggregation("purchase_price", Operation.LAST_K, {"k": 10}),
    ),
    name="purchases",
)

checkouts = EventSource(
    table=f"{SF}/events.parquet",
    query=Query(
        selects={"event_id": "event_id", "user_id": "user_id"},
        time_column="unix_micros(CAST(ts AS TIMESTAMP)) div 1000",
    ),
)

training_set = Join(
    left=checkouts,
    join_parts=(JoinPart(purchases_group_by),),
    name="quickstart_training_set",
    row_ids=("event_id",),
)


def get_join() -> Join:  # CLI entry (backfill-join --conf examples/quickstart.py)
    return training_set


def get_group_by() -> GroupBy:  # CLI entry (backfill-groupby-snapshot / upload-groupby)
    return purchases_group_by


if __name__ == "__main__":
    from chronon_spark.operators.asof_join import join_asof
    from chronon_spark.session import build_session

    spark = build_session(master="local[4]", shuffle_partitions=8)
    df = join_asof(spark, training_set, mode="exact")
    df.show(5, truncate=False)
    print(f"{df.count()} training rows, columns: {df.columns}")
