"""Metadata + local table exporters (operational convenience tier).

Reference: spark/.../MetadataExporter.scala (conf JSON + analyzer-derived
feature schemas -> one enriched JSON per conf) and LocalTableExporter.scala
(any table -> a single local csv/parquet/json file for eyeballing).
"""

from __future__ import annotations

import dataclasses
import json
import os
import shutil
import tempfile
from typing import Optional

from pyspark.sql import SparkSession

from chronon_spark.api.types import GroupBy, Join
from chronon_spark.plans.analyzer import analyze_group_by, analyze_join

SUPPORTED_EXPORT_FORMATS = {"csv", "parquet", "json"}


def _conf_dict(conf) -> dict:
    def enc(o):
        if dataclasses.is_dataclass(o) and not isinstance(o, type):
            return {k: enc(v) for k, v in dataclasses.asdict(o).items()}
        if isinstance(o, dict):
            return {k: enc(v) for k, v in o.items()}
        if isinstance(o, (list, tuple)):
            return [enc(v) for v in o]
        if hasattr(o, "value"):  # enums
            return o.value
        return o

    return enc(conf)


def enrich_metadata(spark: SparkSession, conf) -> dict:
    """conf -> dict + analyzer-derived `features` (name -> Spark type) —
    reference MetadataExporter.enrichMetadata."""
    out = _conf_dict(conf)
    if isinstance(conf, GroupBy):
        schema = analyze_group_by(spark, conf)
    elif isinstance(conf, Join):
        schema = analyze_join(spark, conf)
    else:
        raise TypeError(f"unsupported conf type {type(conf)}")
    out["features"] = [
        {"name": f.name, "type": f.dataType.simpleString()} for f in schema.fields
    ]
    return out


def export_metadata(spark: SparkSession, confs: list, output_dir: str) -> list:
    """Write one enriched JSON per conf under output_dir/{group_bys,joins}
    (the reference's directory convention). Returns written paths."""
    written = []
    for conf in confs:
        sub = "group_bys" if isinstance(conf, GroupBy) else "joins"
        d = os.path.join(output_dir, sub)
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"{conf.name}.json")
        with open(p, "w") as f:
            json.dump(enrich_metadata(spark, conf), f, indent=1, default=str)
        written.append(p)
    return written


def export_table(
    spark: SparkSession,
    table: str,
    export_dir: str,
    fmt: str = "parquet",
    prefix: Optional[str] = None,
    limit: Optional[int] = None,
) -> str:
    """Export a table/path to ONE local file (reference LocalTableExporter:
    coalesce(1) -> tmp dir -> move the single part file into place)."""
    fmt = fmt.lower()
    assert fmt in SUPPORTED_EXPORT_FORMATS, f"unsupported format {fmt}"
    from chronon_spark.sources.scan import load_table

    df = load_table(spark, table)
    if limit is not None:
        df = df.limit(limit)
    tmp = tempfile.mkdtemp(prefix="tbl_export_")
    try:
        w = df.coalesce(1).write.format(fmt).mode("overwrite")
        if fmt == "csv":
            w = w.option("header", "true")
        w.save(tmp)
        parts = [f for f in os.listdir(tmp) if f.endswith(fmt)]
        assert len(parts) == 1, f"unexpected part files: {parts}"
        os.makedirs(export_dir, exist_ok=True)
        base = table.replace("/", "_").strip("_")
        name = f"{prefix + '.' if prefix else ''}{base}.{fmt}"
        out = os.path.join(export_dir, name)
        shutil.move(os.path.join(tmp, parts[0]), out)
        return out
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
