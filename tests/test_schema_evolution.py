"""Schema evolution on the serving + logging path.

Reference: spark/src/test/scala/ai/chronon/spark/other/
SchemaEvolutionTest.scala — a Join's GroupBy set changes between conf
versions:

- ADD features: the new GroupBy has no uploaded data yet, so the fetch
  serves the old feature set and the codec ``schema_hash`` is UNCHANGED
  (SchemaEvolutionTest.scala:366-369); once data lands the features
  appear and the hash changes (:384-388).
- REMOVE features: the hash changes immediately (:371) and the removed
  features stop being served (:362) — but they are never dropped from
  the flattened offline table (:412-414), which stays additive across
  schema hashes.
"""

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
from chronon_spark.plans.fetcher import fetch_join, join_codec
from chronon_spark.plans.log_flattener import flatten_logs
from chronon_spark.sources.scan import millis_expr, scan_source

BOUNDARY = 1_705_276_800_000  # 2024-01-15 midnight — mid-data batch end
HOP_MS = 3_600_000


def _events_source(sf_dir):
    return EventSource(
        table=f"{sf_dir}/events.parquet",
        query=Query(
            selects={"user_id": "user_id", "value": "floor(value*100 + 0.5)"},
            time_column=millis_expr("ts"),
        ),
    )


def _left(sf_dir):
    return EventSource(
        table=f"{sf_dir}/events.parquet",
        query=Query(
            selects={"event_id": "event_id", "user_id": "user_id"},
            time_column=millis_expr("ts"),
            wheres=(f"{millis_expr('ts')} >= {BOUNDARY}",),
        ),
    )


@pytest.fixture(scope="module")
def confs(sf_dir):
    gb_a = GroupBy(
        sources=(_events_source(sf_dir),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.SUM, windows=(Window.days(7),)),
            Aggregation("value", Operation.COUNT),
        ),
        name="gb_a",
    )
    gb_b = GroupBy(
        sources=(_events_source(sf_dir),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.AVERAGE, windows=(Window.days(14),)),
        ),
        name="gb_b",
    )
    v1 = Join(left=_left(sf_dir), join_parts=(JoinPart(gb_a),), name="evo")
    v2 = Join(
        left=_left(sf_dir),
        join_parts=(JoinPart(gb_a), JoinPart(gb_b)),
        name="evo",
    )
    return v1, v2


def _requests(spark, conf):
    return scan_source(spark, conf.left).limit(400)


def test_added_groupby_without_data_is_skipped(spark, confs):
    v1, v2 = confs
    req = _requests(spark, v1)
    served_v1 = fetch_join(spark, v1, req, BOUNDARY, HOP_MS)
    # v2 conf, but gb_b has no uploaded data -> fetch serves the v1 surface
    served_v2_missing = fetch_join(
        spark, v2, req, BOUNDARY, HOP_MS, missing={"gb_b"}
    )
    assert served_v2_missing.columns == served_v1.columns
    a = served_v1.orderBy("event_id", "ts").collect()
    b = served_v2_missing.orderBy("event_id", "ts").collect()
    assert a == b


def test_schema_hash_evolution_rules(spark, confs):
    v1, v2 = confs
    h_v1 = join_codec(spark, v1)["schema_hash"]
    # added-but-unserved GroupBy: hash UNCHANGED (reference :366-369)
    h_v2_unserved = join_codec(spark, v2, served_names={"gb_a"})["schema_hash"]
    assert h_v2_unserved == h_v1
    # upload lands: hash changes (:384-388)
    h_v2 = join_codec(spark, v2)["schema_hash"]
    assert h_v2 != h_v1
    # removing a GroupBy (v2 -> v1) changes the hash immediately (:371)
    assert join_codec(spark, v1)["schema_hash"] != h_v2


def test_removed_features_still_served_columns_in_flattened_table(spark, confs):
    """v1-era logs + v2-era logs flatten into ONE additive table: columns
    from both schema versions survive, nulls where a version lacked
    them (reference :403-414)."""
    v1, v2 = confs
    c1 = join_codec(spark, v1)
    c2 = join_codec(spark, v2)
    key_ddl = "user_id BIGINT"
    v1_ddl = "gb_a_value_sum_7d BIGINT, gb_a_value_count BIGINT"
    v2_ddl = v1_ddl + ", gb_b_value_average_14d DOUBLE"
    schema_df = spark.createDataFrame(
        [
            (c1["schema_hash"], key_ddl, v1_ddl),
            (c2["schema_hash"], key_ddl, v2_ddl),
        ],
        "schema_hash string, key_schema string, value_schema string",
    )
    log_df = spark.createDataFrame(
        [
            ("evo", 1, "2024-01-15", c1["schema_hash"],
             '{"user_id": 7}', '{"gb_a_value_sum_7d": 100, "gb_a_value_count": 3}'),
            ("evo", 2, "2024-01-16", c2["schema_hash"],
             '{"user_id": 8}',
             '{"gb_a_value_sum_7d": 50, "gb_a_value_count": 1, '
             '"gb_b_value_average_14d": 2.5}'),
        ],
        "name string, ts_millis long, ds string, schema_hash string, "
        "key_json string, value_json string",
    )
    flat = flatten_logs(log_df, schema_df, join_name="evo")
    cols = set(flat.columns)
    # additive: v2-only feature present even for v1 rows (as null)
    assert "gb_b_value_average_14d" in cols
    rows = {r["ts_millis"]: r for r in flat.collect()}
    assert rows[1]["gb_b_value_average_14d"] is None
    assert rows[2]["gb_b_value_average_14d"] == 2.5
    # and after a REMOVE (back to v1 conf): new logs use c1's hash, the
    # merged table still carries the removed feature column
    flat_after_remove = flatten_logs(
        log_df.where(F.col("schema_hash").isin([c1["schema_hash"], c2["schema_hash"]])),
        schema_df,
        join_name="evo",
    )
    assert "gb_b_value_average_14d" in set(flat_after_remove.columns)


def test_part_failure_embeds_exception_column(spark, confs, sf_dir):
    """Reference FetcherFailureTest.scala:54-81 (KV partial failure):
    a broken part yields a {prefix}__exception column, healthy parts
    still serve; default mode raises."""
    v1, _ = confs
    gb_bad = GroupBy(
        sources=(
            EventSource(
                table=f"{sf_dir}/does_not_exist.parquet",
                query=Query(
                    selects={"user_id": "user_id", "value": "value"},
                    time_column=millis_expr("ts"),
                ),
            ),
        ),
        key_columns=("user_id",),
        aggregations=(Aggregation("value", Operation.COUNT),),
        name="gb_bad",
    )
    conf = Join(
        left=v1.left,
        join_parts=(JoinPart(v1.join_parts[0].group_by), JoinPart(gb_bad)),
        name="evo_fail",
    )
    req = _requests(spark, conf)
    with pytest.raises(Exception):
        fetch_join(spark, conf, req, BOUNDARY, HOP_MS)
    served = fetch_join(
        spark, conf, req, BOUNDARY, HOP_MS, on_part_failure="embed"
    )
    assert "gb_bad__exception" in served.columns
    healthy = [c for c in served.columns if c.startswith("gb_a_")]
    assert healthy  # gb_a features still present
    row = served.limit(1).collect()[0]
    assert row["gb_bad__exception"]  # non-empty error text
