"""Join backfill: the full north-rule job, resumable per partition.

Composes join_asof with plans.backfill: each step range computes the
point-in-time join for left rows whose event date falls in the range,
writes the ``ds``-partitioned output with dynamic overwrite, and emits
per-partition lineage (rows/bytes/wall). A rerun fills only holes
(reference unfilledRanges, TableUtils.scala:347-431).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api.types import Join
from chronon_spark.operators.asof_join import join_asof
from chronon_spark.plans.backfill import BackfillResult, backfill
from chronon_spark.plans.partition_range import PartitionRange
from chronon_spark.sources.scan import TS


def backfill_join(
    spark: SparkSession,
    join_conf: Join,
    output_path: str,
    date_range: PartitionRange,
    step_days: int = 30,
    mode: str = "sawtooth",
    tail_hop_ms: Optional[int] = None,
    prune_keys: bool = False,
) -> BackfillResult:
    from chronon_spark.plans.backfill import require_utc_session

    require_utc_session(spark)

    def compute(s: SparkSession, rng: PartitionRange) -> DataFrame:
        # Bound the LEFT scan to this step's ts range up front so each step
        # computes only its own share of as-of work (part event scans keep
        # the window lookback below min_ts inside group_by_asof). Without
        # this an N-step backfill does N x the full-range join.
        out = join_asof(
            s, join_conf, tail_hop_ms=tail_hop_ms, mode=mode,
            prune_keys=prune_keys, left_ts_range=rng.ts_range(),
        )
        out = out.withColumn(
            "ds", F.date_format(F.timestamp_millis(F.col(TS)), "yyyy-MM-dd")
        )
        return out.where((F.col("ds") >= rng.start) & (F.col("ds") <= rng.end))

    return backfill(
        spark,
        compute,
        output_path,
        date_range,
        step_days=step_days,
        job_name=f"join:{join_conf.name}",
        conf=join_conf,
    )
