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
# The full abelian-group subset of the Operation enum (reference
# thrift/api.thrift:195-227 splits deletable vs non-deletable exactly this
# way; VARIANCE deletes via signed power sums per
# SimpleAggregators.scala:279-291, HISTOGRAM via zero-pruned map-count
# decrements per SawtoothMutationAggregator.scala:117-133).
DELETABLE = {
    Operation.COUNT,
    Operation.SUM,
    Operation.AVERAGE,
    Operation.VARIANCE,
    Operation.HISTOGRAM,
}
_SCALAR_DELETABLE = DELETABLE - {Operation.HISTOGRAM}


def _ir_aggs(parts, signed: bool) -> list:
    out: list[Column] = []
    seen: set = set()
    sign = F.col("__sign") if signed else F.lit(1)

    def add(name: str, col: Column):
        if name not in seen:
            seen.add(name)
            out.append(col.alias(name))

    for p in parts:
        if p.operation is Operation.HISTOGRAM:
            continue  # histogram IRs live in their own (key, ts, value) frame
        c = p.input_column
        add(f"cnt_{c}", F.sum(F.when(F.col(c).isNotNull(), sign).otherwise(F.lit(0))))
        add(f"sum_{c}", F.sum(F.col(c).cast("double") * sign))
        if p.operation is Operation.VARIANCE:
            # raw (unshifted) power sums, like the reference's deletable
            # variance IR — the replay cannot share a per-group shift
            # between the snapshot pass and the mutation pass without an
            # extra scan, so extreme-magnitude inputs should pre-center
            # upstream via Query.selects
            add(f"ssq_{c}", F.sum(F.col(c).cast("double") * F.col(c).cast("double") * sign))
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
        if p.operation is Operation.HISTOGRAM and p.arg_map.get("k"):
            raise NotImplementedError(
                "truncated HISTOGRAM (k) is not deletable — dropped entries "
                "cannot be decremented back; use untruncated replay"
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
        if p.operation is Operation.HISTOGRAM:
            continue
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
        elif p.operation is Operation.VARIANCE:
            ssq = F.coalesce(F.col(f"s_ssq_{c}"), F.lit(0.0)) + F.coalesce(
                F.col(f"d_ssq_{c}"), F.lit(0.0)
            )
            # population variance (matches the kernel / Spark var_pop),
            # clamped at 0 against fp cancellation in the signed sums
            var = F.greatest(ssq / cnt - (s / cnt) * (s / cnt), F.lit(0.0))
            out_cols.append(F.when(cnt > 0, var).alias(name))
        else:  # AVERAGE
            out_cols.append(F.when(cnt > 0, s / cnt).alias(name))
    result = joined.select(*keys, TS, *out_cols)

    hist_parts = [p for p in parts if p.operation is Operation.HISTOGRAM]
    for p in hist_parts:
        hist = _histogram_replay(q, snap, m, keys, pc, p.input_column, p.output_column)
        result = result.join(hist, on=keys + [TS], how="left")
    return result


def _histogram_replay(
    q: DataFrame,
    snap: DataFrame,
    m: DataFrame,
    keys: list,
    pc: str,
    col: str,
    out_name: str,
) -> DataFrame:
    """Deletable HISTOGRAM replay: per-(key, value) counts from the
    previous-day snapshot, plus signed same-day mutation deltas, combined
    per query with ZERO-PRUNING (a value whose count nets to 0 leaves the
    map — reference SawtoothMutationAggregator zero-pruned decrements).
    Long-format (key, ts, value, count) until the final map assembly, so
    the combine is ordinary groupBy/join — no map-typed shuffles."""
    val = F.col(col).cast("string")
    snap_h = (
        snap.where(F.col(col).isNotNull())
        .groupBy(*keys, F.col(pc).cast("string").alias("__prev_ds"), val.alias("__hval"))
        .agg(F.count(F.lit(1)).alias("__hc"))
    )
    qs = q.join(snap_h, on=keys + ["__prev_ds"], how="inner").select(
        *keys, TS, "__hval", F.col("__hc").alias("__c")
    )
    qm = (
        q.join(m.where(F.col(col).isNotNull()), on=[*[q[k] == m[k] for k in keys]], how="inner")
        .where((F.col("__m_ds") == F.col("__q_ds")) & (F.col("mutation_ts") < q[TS]))
        .groupBy(*[q[k] for k in keys], q[TS], val.alias("__hval"))
        .agg(F.sum("__sign").alias("__c"))
    ).select(*keys, TS, "__hval", "__c")
    combined = (
        qs.unionByName(qm)
        .groupBy(*keys, TS, "__hval")
        .agg(F.sum("__c").alias("__n"))
        .where(F.col("__n") > 0)  # zero-pruning
    )
    return combined.groupBy(*keys, TS).agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct(F.col("__hval"), F.col("__n").cast("long"))))
        ).alias(out_name)
    )
