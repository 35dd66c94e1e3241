"""LogFlattenerJob: serving logs -> flattened offline eval table.

Reference: spark/.../LogFlattenerJob.scala (272 LoC) — pull raw logged
(key_bytes, value_bytes, schema_hash) rows for the unfilled range, fetch
the codec for every schema_hash seen, build ONE merged output schema
across schema versions, unpack each row against it, and write the
ds-partitioned flattened table (schema registry carried in table props).

Spark-first shape: the wire format here is JSON (the sandbox has no Avro
serving stack) and the codec registry is a (schema_hash -> Spark DDL)
table; decoding is pure-Catalyst ``from_json`` against the MERGED schema,
so rows logged under an older schema version simply yield nulls for the
columns they predate — the reference's schema-evolution contract. Resume
rides the same backfill/unfilledRanges machinery as every other job.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.plans.backfill import BackfillResult, backfill
from chronon_spark.plans.partition_range import PartitionRange


def merged_schema(ddls: list) -> T.StructType:
    """Union of fields across schema versions, first-seen type wins;
    a same-name field with a CONFLICTING type is an error (the reference
    asserts codec compatibility the same way)."""
    out_fields: dict = {}
    for ddl in ddls:
        st = T._parse_datatype_string(ddl)
        assert isinstance(st, T.StructType), f"schema DDL must be a struct: {ddl}"
        for f in st.fields:
            prev = out_fields.get(f.name)
            if prev is None:
                out_fields[f.name] = f
            elif prev.dataType != f.dataType:
                raise ValueError(
                    f"schema conflict for field {f.name}: {prev.dataType} vs {f.dataType}"
                )
    return T.StructType(list(out_fields.values()))


def flatten_logs(
    log_df: DataFrame,
    schema_df: DataFrame,
    join_name: Optional[str] = None,
) -> DataFrame:
    """Flatten raw log rows to typed columns.

    ``log_df``: (name, ts_millis, ds, schema_hash, key_json, value_json).
    ``schema_df``: (schema_hash, key_schema, value_schema) with Spark DDL
    struct strings. Only hashes PRESENT in the logs are fetched (driver
    collect of a handful of registry rows — the reference does the same
    KV multiGet)."""
    if join_name is not None:
        log_df = log_df.where(F.col("name") == join_name)
    hashes = [r[0] for r in log_df.select("schema_hash").distinct().collect()]
    reg = {
        r["schema_hash"]: (r["key_schema"], r["value_schema"])
        for r in schema_df.where(F.col("schema_hash").isin(hashes)).collect()
    }
    missing = sorted(set(hashes) - set(reg))
    assert not missing, f"schema_hash(es) {missing} absent from the schema table"
    key_schema = merged_schema([v[0] for v in reg.values()])
    value_schema = merged_schema([v[1] for v in reg.values()])

    decoded = log_df.select(
        "name",
        "ts_millis",
        "ds",
        "schema_hash",
        F.from_json(F.col("key_json"), key_schema).alias("__k"),
        F.from_json(F.col("value_json"), value_schema).alias("__v"),
    )
    return decoded.select(
        "name",
        "ts_millis",
        "schema_hash",
        *[F.col(f"__k.{f.name}").alias(f.name) for f in key_schema.fields],
        *[F.col(f"__v.{f.name}").alias(f.name) for f in value_schema.fields],
        "ds",
    )


def log_flattener_job(
    spark: SparkSession,
    log_table: str,
    schema_table: str,
    output_path: str,
    date_range: PartitionRange,
    join_name: Optional[str] = None,
    step_days: int = 30,
) -> BackfillResult:
    """Step-chunked, resumable flattening (reference LogFlattenerJob.run):
    each unfilled step reads only its ds slice of the log table."""
    from chronon_spark.sources.scan import load_table

    schema_df = load_table(spark, schema_table)

    def compute(s: SparkSession, rng: PartitionRange) -> DataFrame:
        logs = load_table(s, log_table).where(
            (F.col("ds").cast("string") >= rng.start)
            & (F.col("ds").cast("string") <= rng.end)
        )
        return flatten_logs(logs, schema_df, join_name=join_name)

    return backfill(
        spark,
        compute,
        output_path,
        date_range,
        step_days=step_days,
        job_name=f"log_flatten:{join_name or log_table}",
    )
