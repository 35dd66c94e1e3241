"""Analyzer: derived schemas must equal the actually-computed schemas."""

from pyspark.sql import types as T

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
from chronon_spark.plans.analyzer import analyze_group_by, analyze_join, create_table_ddl
from chronon_spark.sources.scan import millis_expr


def _src(sf_dir):
    return EventSource(
        table=f"{sf_dir}/events.parquet",
        query=Query(
            selects={"event_id": "event_id", "user_id": "user_id",
                     "value": "value", "event_type": "event_type"},
            time_column=millis_expr("ts"),
        ),
    )


def test_analyze_group_by_matches_execution(spark, sf_dir):
    gb = GroupBy(
        sources=(_src(sf_dir),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.SUM, windows=(Window.days(7),)),
            Aggregation("value", Operation.LAST_K, {"k": 3}),
            Aggregation("value", Operation.COUNT, buckets=("event_type",)),
        ),
        name="an",
        derivations={"*": "*", "dbl": "value_sum_7d * 2"},
    )
    derived = analyze_group_by(spark, gb)
    q = spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "user_id", f"{millis_expr('ts')} AS ts"
    )
    actual = group_by_asof(spark, gb, q).schema
    assert [f.name for f in derived.fields] == [f.name for f in actual.fields]
    assert [f.dataType for f in derived.fields] == [f.dataType for f in actual.fields]


def test_analyze_join_matches_execution(spark, sf_dir):
    gb = GroupBy(
        sources=(_src(sf_dir),),
        key_columns=("user_id",),
        aggregations=(Aggregation("value", Operation.SUM, windows=(Window.days(7),)),),
        name="g",
    )
    j = Join(left=_src(sf_dir), join_parts=(JoinPart(gb),), name="aj")
    derived = analyze_join(spark, j)
    actual = join_asof(spark, j).schema
    assert sorted(f.name for f in derived.fields) == sorted(f.name for f in actual.fields)


def test_create_table_ddl():
    schema = T.StructType(
        [
            T.StructField("user_id", T.LongType()),
            T.StructField("value_sum_7d", T.DoubleType()),
            T.StructField("ds", T.StringType()),
        ]
    )
    ddl = create_table_ddl(
        "features.user_value", schema, ("ds",), fmt="iceberg",
        table_properties={"conf_hash": "abc"},
    )
    assert "USING iceberg" in ddl and "PARTITIONED BY (ds)" in ddl
    assert "user_id bigint" in ddl and "'conf_hash'='abc'" in ddl
    ddl_pq = create_table_ddl("t", schema, ("ds",))
    assert "USING parquet" in ddl_pq and "ds string" in ddl_pq


def test_metadata_exporter(spark, sf_dir, tmp_path):
    """MetadataExporter equivalent: conf JSON enriched with analyzer-derived
    feature schemas, one file per conf under group_bys/ and joins/."""
    import json

    from chronon_spark.plans.exporter import export_metadata

    gb = GroupBy(
        sources=(_src(sf_dir),),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.SUM, windows=(Window.days(7),)),
            Aggregation("value", Operation.COUNT),
        ),
        name="meta_gb",
    )
    out = str(tmp_path / "meta")
    paths = export_metadata(spark, [gb], out)
    assert len(paths) == 1 and paths[0].endswith(f"group_bys/{gb.name}.json")
    data = json.load(open(paths[0]))
    names = [f["name"] for f in data["features"]]
    assert "user_id" in names and "ts" in names
    assert data["key_columns"] == ["user_id"]
    # every declared aggregation output appears in the feature schema
    for p in gb.unpack():
        assert p.output_column in names


def test_local_table_exporter(spark, sf_dir, tmp_path):
    from chronon_spark.plans.exporter import export_table

    out = export_table(
        spark, f"{sf_dir}/nation.parquet", str(tmp_path / "exports"), fmt="csv"
    )
    assert out.endswith(".csv")
    import csv

    with open(out) as f:
        rows = list(csv.reader(f))
    assert rows[0][:2] == ["n_nationkey", "n_name"] or "n_nationkey" in rows[0]
    assert len(rows) == 26  # header + 25 nations


def test_analyze_group_by_over_join_source(spark, tmp_path):
    """Schema derivation must work for chained (JoinSource) and
    model-scored (ModelTransforms) sources without running any job."""
    import pandas as pd

    from chronon_spark.api.types import (
        Aggregation, EventSource, GroupBy, Join, JoinPart, JoinSource,
        Operation, Query, Window,
    )
    from chronon_spark.plans.analyzer import analyze_group_by

    path = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        pd.DataFrame({"user_id": [1], "amount": [1.0], "ts": [1_704_067_200_000]})
    ).write.parquet(path)
    src = EventSource(
        table=path,
        query=Query(selects={"user_id": "user_id", "amount": "amount"}, time_column="ts"),
    )
    pgb = GroupBy(
        sources=(src,), key_columns=("user_id",),
        aggregations=(Aggregation("amount", Operation.COUNT, windows=(Window.days(7),)),),
        name="p",
    )
    parent = Join(left=src, join_parts=(JoinPart(pgb),), name="pj")
    cgb = GroupBy(
        sources=(JoinSource(join=parent, query=Query(
            selects={"user_id": "user_id", "f": "p_amount_count_7d"}
        )),),
        key_columns=("user_id",),
        aggregations=(Aggregation("f", Operation.AVERAGE),),
        name="c",
    )
    schema = analyze_group_by(spark, cgb)
    names = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert names["f_average"] == "double"
    assert names["user_id"] == "bigint" and names["ts"] == "bigint"


def test_analyze_group_by_over_model_transforms(spark, tmp_path):
    import pandas as pd

    from chronon_spark.api.types import Aggregation, EventSource, GroupBy, Operation, Query
    from chronon_spark.operators.model_transforms import Model, ModelTransforms
    from chronon_spark.plans.analyzer import analyze_group_by

    path = str(tmp_path / "ev2.parquet")
    spark.createDataFrame(
        pd.DataFrame({"user_id": [1], "amount": [1.0], "ts": [1_704_067_200_000]})
    ).write.parquet(path)
    src = EventSource(
        table=path,
        query=Query(selects={"user_id": "user_id", "amount": "amount"}, time_column="ts"),
    )
    mt = ModelTransforms(
        sources=(src,),
        models=(Model(name="m", scorer=lambda x: x, input_mapping={"v": "amount"},
                      value_schema="score double"),),
        passthrough_fields=("user_id",),
    )
    gb = GroupBy(
        sources=(mt,), key_columns=("user_id",),
        aggregations=(Aggregation("m__score", Operation.AVERAGE),),
        name="ms",
    )
    schema = analyze_group_by(spark, gb)
    names = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert names["m__score_average"] == "double"
