"""ModelTransforms: batch model inference as a SOURCE for downstream ops.

Reference: spark/.../ModelTransformsJob.scala (470 LoC) +
spark/.../model/ModelNodeRunner.scala + thrift/api.thrift:539-610
(``Model``: inputMapping / outputMapping / valueSchema / inferenceSpec;
``ModelTransforms``: sources + models + passthroughFields) and
``Source.ModelTransforms`` (thrift/api.thrift:188-193). The reference
pipeline is:

  scan sources -> apply per-model INPUT mappings (SQL exprs, columns
  prefixed ``{model}__input__{field}``) -> batched bulk inference via
  mapPartitions -> per-model OUTPUT mappings (prefixed ``{model}__``)
  -> select passthrough + final model output fields.

Spark-first shape: the inference step is ``mapInPandas`` — Arrow batches
in/out, the model backend scores a whole pandas batch at once (the exact
analogue of the reference's grouped-bulk-call mapPartitions, minus the
row-at-a-time Row juggling). Input/output mappings stay pure Catalyst.

Model backends are pluggable callables ``pd.DataFrame -> pd.DataFrame``
(input-mapped fields in, value-schema fields out). Real backends (an HTTP
scoring service, an in-process torch model) plug in unchanged; tests and
the driver contract use deterministic stub scorers.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.sources.scan import scan_source

INPUT_SEP = "__input__"


@dataclass(frozen=True)
class Model:
    """One model attached to a ModelTransforms source
    (reference thrift/api.thrift:541-566)."""

    name: str
    scorer: Callable  # pd.DataFrame[input fields] -> pd.DataFrame[value fields]
    input_mapping: dict  # model input field -> Spark SQL expr over the source
    value_schema: str  # Spark DDL of the scorer's output, e.g. "score double"
    output_mapping: Optional[dict] = None  # final field -> SQL expr over raw outputs

    def value_fields(self) -> list:
        st = T._parse_datatype_string(f"struct<{self.value_schema}>")
        return list(st.fields)


@dataclass(frozen=True)
class ModelTransforms:
    """Source union member: model outputs as input rows for GroupBys
    (reference thrift/api.thrift:599-610)."""

    sources: tuple  # tuple[EventSource | EntitySource]
    models: tuple  # tuple[Model]
    passthrough_fields: tuple = ()


def _apply_inference(df: DataFrame, models: tuple) -> DataFrame:
    """Batched bulk inference over Arrow batches (reference
    batchedModelInference, ModelTransformsJob.scala:264-289)."""
    in_schema = df.schema
    out_fields = list(in_schema.fields)
    for m in models:
        for f in m.value_fields():
            out_fields.append(T.StructField(f"{m.name}__{f.name}", f.dataType, True))
    out_schema = T.StructType(out_fields)
    # plain data needed inside the closure (Model dataclasses pickle fine,
    # but keep the captured state minimal and explicit)
    plans = [
        (
            m.name,
            m.scorer,
            [f"{m.name}{INPUT_SEP}{k}" for k in m.input_mapping],
            list(m.input_mapping.keys()),
            [f.name for f in m.value_fields()],
        )
        for m in models
    ]

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf
            for name, scorer, in_cols, model_fields, val_fields in plans:
                inputs = pdf[in_cols].copy()
                inputs.columns = model_fields
                scored = scorer(inputs)
                missing = [f for f in val_fields if f not in scored.columns]
                assert not missing, f"model {name} omitted output fields {missing}"
                for f in val_fields:
                    out = out.assign(**{f"{name}__{f}": scored[f].to_numpy()})
            yield out

    return df.mapInPandas(infer, schema=out_schema)


def model_transforms_source(
    spark: SparkSession,
    conf: ModelTransforms,
    min_ts: Optional[int] = None,
    max_ts: Optional[int] = None,
) -> DataFrame:
    """Materialize a ModelTransforms source as a DataFrame (reference
    ModelTransformsJob.computeBackfill minus the partition loop — callers
    backfill/step-chunk like any other source).

    Column contract (matches the reference's fieldsToKeep): passthrough
    fields (plus ``ts``/``ds`` when present) followed by final model
    output fields — ``{model}__{field}`` raw, or output-mapped names.
    """
    from functools import reduce

    assert conf.models, "ModelTransforms requires at least one model"
    scans = [scan_source(spark, s, min_ts=min_ts, max_ts=max_ts) for s in conf.sources]
    df = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), scans)

    passthrough = [c for c in conf.passthrough_fields if c in df.columns]
    for required in ("ts", "ds"):
        if required in df.columns and required not in passthrough:
            passthrough.append(required)

    # input mappings: pure Catalyst, one prefixed column per model input
    for m in conf.models:
        for fname, sql in m.input_mapping.items():
            df = df.withColumn(f"{m.name}{INPUT_SEP}{fname}", F.expr(sql))

    scored = _apply_inference(df, conf.models)

    # output mappings + final projection
    final_cols = list(passthrough)
    for m in conf.models:
        if m.output_mapping:
            for fname, sql in m.output_mapping.items():
                scored = scored.withColumn(f"{m.name}__{fname}", F.expr(sql))
            final_cols += [f"{m.name}__{f}" for f in m.output_mapping]
        else:
            final_cols += [f"{m.name}__{f.name}" for f in m.value_fields()]
    return scored.select(*final_cols)
