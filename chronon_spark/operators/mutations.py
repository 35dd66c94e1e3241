"""Temporal-entities: point-in-time aggregates over mutating dimensions.

Reference semantics (GroupBy.scala:181-281 ``temporalEntities``;
SawtoothMutationAggregator.scala:117-222): the feature value at query time
``t`` on day ``d`` is the aggregate over the entity's row set as of ``t``,
computed as

    IR(t) = snapshot_IR(key, d-1)            -- end-of-day d-1 state
          ⊕ Σ after-rows  (mutation_ts <= t)  -- day-d inserts/updates
          ⊖ Σ before-rows (mutation_ts <= t)  -- day-d deletions/old values

which is only sound for DELETABLE operations — the abelian-group subset
(COUNT, SUM, AVERAGE; reference thrift/api.thrift:195-227 splits the enum
exactly this way). Non-deletable ops (MIN/MAX/...) raise.

Spark-first plan, no Python:
1. per-(key, ds) snapshot partial IRs: one groupBy with map-side combine,
2. signed day-d mutation deltas: ``sign = is_before ? -1 : +1``,
3. queries join their day's mutations on (key, ds) with ``m_ts <= q_ts``
   and aggregate signed deltas per query — balanced because a day of even
   a hot key's mutations is |mutations|/#days,
4. combine snapshot ⊕ deltas, finalize (avg = sum/count).

Mutation rows carry the same value columns as the snapshot plus
``mutation_ts`` (epoch millis) and ``is_before`` (the reversal flag,
reference thrift/api.thrift EntitySource docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api.types import (
    EntitySource,
    GroupBy,
    Operation,
    validate_identifier,
)
from chronon_spark.sources.scan import TS, apply_query, load_table

DAY_MS = 86_400_000
DELETABLE = {Operation.COUNT, Operation.SUM, Operation.AVERAGE}


def _ir_aggs(parts, signed: bool) -> list:
    out: list[Column] = []
    seen: set = set()
    sign = F.col("__sign") if signed else F.lit(1)

    def add(name: str, col: Column):
        if name not in seen:
            seen.add(name)
            out.append(col.alias(name))

    for p in parts:
        c = p.input_column
        add(f"cnt_{c}", F.sum(F.when(F.col(c).isNotNull(), sign).otherwise(F.lit(0))))
        add(f"sum_{c}", F.sum(F.col(c).cast("double") * sign))
    return out


def temporal_entities(
    spark: SparkSession,
    group_by: GroupBy,
    queries: DataFrame,
) -> DataFrame:
    """Features at each distinct (keys, ts) over a mutating entity source.

    ``queries`` needs the key columns + ``ts`` (epoch millis LONG).
    """
    src = group_by.sources[0]
    assert isinstance(src, EntitySource) and src.mutation_table, (
        "temporal_entities needs an EntitySource with a mutation_table"
    )
    keys = [validate_identifier(k) for k in group_by.key_columns]
    parts = group_by.unpack()
    for p in parts:
        if p.operation not in DELETABLE:
            raise NotImplementedError(
                f"{p.operation} is not deletable; mutation replay supports "
                f"{sorted(o.value for o in DELETABLE)} (reference splits the "
                "Operation enum the same way)"
            )
        if p.window is not None:
            raise NotImplementedError("windowed temporal-entities: out of scope")

    pc = src.query.partition_column
    # mutation meta columns exist only on the mutation table; the snapshot
    # scan uses the same selects minus those (reference: mutationTimeColumn/
    # reversalColumn are mutation-side query fields, thrift/api.thrift:10-58)
    from dataclasses import replace

    snap_query = src.query
    if src.query.selects:
        snap_query = replace(
            src.query,
            selects={
                a: e
                for a, e in src.query.selects.items()
                if a not in ("mutation_ts", "is_before")
            },
        )
    snap = apply_query(load_table(spark, src.snapshot_table), snap_query)
    muts = apply_query(load_table(spark, src.mutation_table), src.query)
    assert "mutation_ts" in muts.columns and "is_before" in muts.columns, muts.columns

    # queries with day + previous-day partition string
    q = (
        queries.select(*keys, F.col(TS).cast("long").alias(TS))
        .dropna(subset=keys)
        .distinct()
        .withColumn(
            "__q_ds",
            F.date_format(F.timestamp_millis(F.col(TS)), "yyyy-MM-dd"),
        )
        .withColumn(
            "__prev_ds",
            F.date_format(
                F.date_sub(F.timestamp_millis(F.col(TS)).cast("date"), 1), "yyyy-MM-dd"
            ),
        )
    )

    # 1. snapshot partial IRs per (keys, ds)
    snap_irs = snap.groupBy(*keys, pc).agg(*_ir_aggs(parts, signed=False))
    snap_irs = snap_irs.select(
        *keys,
        F.col(pc).cast("string").alias("__prev_ds"),
        *[F.col(c).alias(f"s_{c}") for c in snap_irs.columns if c not in keys + [pc]],
    )

    # 2+3. signed same-day deltas up to each query ts
    m = muts.withColumn(
        "__sign", F.when(F.col("is_before").cast("boolean"), F.lit(-1)).otherwise(F.lit(1))
    ).withColumn("__m_ds", F.col(pc).cast("string"))
    qm = q.join(
        m,
        on=[*[q[k] == m[k] for k in keys]],
        how="inner",
    ).where((F.col("__m_ds") == F.col("__q_ds")) & (F.col("mutation_ts") < q[TS]))
    delta_cols = _ir_aggs(parts, signed=True)
    deltas = qm.groupBy(*[q[k] for k in keys], q[TS]).agg(*delta_cols)
    deltas = deltas.select(
        *keys, TS, *[F.col(c).alias(f"d_{c}") for c in deltas.columns if c not in keys + [TS]]
    )

    # 4. combine + finalize
    joined = (
        q.join(snap_irs, on=keys + ["__prev_ds"], how="left")
        .join(deltas, on=keys + [TS], how="left")
    )
    out_cols: list[Column] = []
    for p in parts:
        c = p.input_column
        cnt = F.coalesce(F.col(f"s_cnt_{c}"), F.lit(0)) + F.coalesce(
            F.col(f"d_cnt_{c}"), F.lit(0)
        )
        s = F.coalesce(F.col(f"s_sum_{c}"), F.lit(0.0)) + F.coalesce(
            F.col(f"d_sum_{c}"), F.lit(0.0)
        )
        name = p.output_column
        if p.operation is Operation.COUNT:
            out_cols.append(cnt.cast("long").alias(name))
        elif p.operation is Operation.SUM:
            out_cols.append(F.when(cnt > 0, s).alias(name))
        else:  # AVERAGE
            out_cols.append(F.when(cnt > 0, s / cnt).alias(name))
    return joined.select(*keys, TS, *out_cols)
