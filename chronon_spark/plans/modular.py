"""Modular join pipeline: SourceJob → JoinPartJobs → MergeJob, each a
separately resumable stage with its own materialized table.

Reference (spark/.../batch/ModularMonolith.scala:1-175; node types
thrift/planner.thrift): the monolithic Join runs everything in one app;
the modular pipeline materializes the left source, each join part, and
the merge as separate partitioned tables so a 100 TB backfill restarts at
stage granularity and part jobs parallelize across Spark apps. Fidelity
requirement (reference ModularJoinTest.scala): modular output ==
monolithic output.

Every stage writes through plans.backfill, so each inherits per-partition
checkpoint/resume + lineage for free.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api.types import Join
from chronon_spark.operators.asof_join import compute_join_part, _jp_out_cols
from chronon_spark.plans.backfill import BackfillResult, backfill
from chronon_spark.plans.partition_range import PartitionRange
from chronon_spark.sources.scan import TS, scan_source


def _with_ds(df: DataFrame) -> DataFrame:
    return df.withColumn("ds", F.date_format(F.timestamp_millis(F.col(TS)), "yyyy-MM-dd"))


def source_job(
    spark: SparkSession,
    join_conf: Join,
    output_path: str,
    rng: PartitionRange,
    step_days: int = 30,
) -> str:
    """Materialize the rendered left source (skew keys applied) per ds."""
    left_path = output_path.rstrip("/") + "__left"

    def compute(s: SparkSession, r: PartitionRange) -> DataFrame:
        left = scan_source(s, join_conf.left)
        if join_conf.skew_keys:
            for col, hot in join_conf.skew_keys.items():
                if col in left.columns:
                    left = left.where(~F.col(col).isin(list(hot)) | F.col(col).isNull())
        return _with_ds(left)

    backfill(spark, compute, left_path, rng, step_days=step_days,
             job_name=f"source:{join_conf.name}", conf=join_conf.left)
    return left_path


def join_part_job(
    spark: SparkSession,
    join_conf: Join,
    jp,
    left_path: str,
    output_path: str,
    rng: PartitionRange,
    step_days: int = 30,
    mode: str = "sawtooth",
) -> str:
    """One part's features at the left's (keys, ts), as its own table."""
    part_path = output_path.rstrip("/") + f"__part_{jp.full_prefix()}"
    gb = jp.group_by
    mapping = jp.key_mapping or {k: k for k in gb.key_columns}

    def compute(s: SparkSession, r: PartitionRange) -> DataFrame:
        left = s.read.parquet(left_path).where(
            (F.col("ds").cast("string") >= r.start) & (F.col("ds").cast("string") <= r.end)
        )
        sel = [F.col(lc).alias(rk) for lc, rk in mapping.items()] + [F.col(TS)]
        feats = compute_join_part(s, gb, left.select(*sel), mode=mode)
        inv = {rk: lc for lc, rk in mapping.items()}
        out = feats.select(
            *[F.col(rk).alias(inv.get(rk, rk)) for rk in gb.key_columns],
            F.col(TS),
            *[F.col(c).alias(f"{jp.full_prefix()}_{c}") for c in _jp_out_cols(jp)],
        )
        return _with_ds(out)

    backfill(spark, compute, part_path, rng, step_days=step_days,
             job_name=f"part:{jp.full_prefix()}", conf=(gb, mapping))
    return part_path


def merge_job(
    spark: SparkSession,
    join_conf: Join,
    left_path: str,
    part_paths: list,
    output_path: str,
    rng: PartitionRange,
    step_days: int = 30,
) -> BackfillResult:
    """Fold the part tables back onto the left (reference MergeJob)."""

    def compute(s: SparkSession, r: PartitionRange) -> DataFrame:
        out = s.read.parquet(left_path).where(
            (F.col("ds").cast("string") >= r.start) & (F.col("ds").cast("string") <= r.end)
        )
        value_cols: list = []
        for jp, pp in zip(join_conf.join_parts, part_paths):
            mapping = jp.key_mapping or {k: k for k in jp.group_by.key_columns}
            part = s.read.parquet(pp).drop("ds")
            join_keys = list(mapping.keys()) + [TS]
            value_cols += [c for c in part.columns if c not in join_keys]
            out = out.join(part, on=join_keys, how="left")
        if join_conf.derivations:
            from chronon_spark.operators.asof_join import apply_derivations

            # keep every non-value (left/base) column; replace only part outputs
            value_set = set(value_cols)
            base_cols = [c for c in out.columns if c not in value_set]
            out = apply_derivations(out, join_conf.derivations, base_cols)
        return out

    return backfill(spark, compute, output_path, rng, step_days=step_days,
                    job_name=f"merge:{join_conf.name}", conf=join_conf)


def backfill_join_modular(
    spark: SparkSession,
    join_conf: Join,
    output_path: str,
    rng: PartitionRange,
    step_days: int = 30,
    mode: str = "sawtooth",
    selected_parts: Optional[list] = None,
) -> BackfillResult:
    """Run the full modular pipeline; each stage resumes independently.

    ``selected_parts`` (list of JoinPart full prefixes — reference
    SelectedJoinPartsTest / Join.computeJoin(selectedJoinParts)) restricts
    the run to those parts: the left and the selected part tables compute
    (or resume), the merge emits ONLY their columns. Part tables keep
    their prefix-derived names, so a later full run resumes the selected
    parts' tables for free — the iterate-on-one-part workflow."""
    from chronon_spark.plans.backfill import require_utc_session

    require_utc_session(spark)
    if selected_parts is not None:
        import dataclasses

        want = set(selected_parts)
        keep = tuple(
            jp for jp in join_conf.join_parts if jp.full_prefix() in want
        )
        missing = want - {jp.full_prefix() for jp in keep}
        if missing:
            raise ValueError(
                f"selected_parts not in join: {sorted(missing)} "
                f"(have: {[jp.full_prefix() for jp in join_conf.join_parts]})"
            )
        join_conf = dataclasses.replace(join_conf, join_parts=keep)
        # the canonical output must never hold a partial schema whose
        # partition checkpoints would block the later full merge — a
        # selected run merges to its own suffixed table
        output_sel = f"{output_path}__sel_{'_'.join(sorted(want))}"
        left_path = source_job(spark, join_conf, output_path, rng, step_days)
        part_paths = [
            join_part_job(
                spark, join_conf, jp, left_path, output_path, rng, step_days, mode
            )
            for jp in join_conf.join_parts
        ]
        return merge_job(
            spark, join_conf, left_path, part_paths, output_sel, rng, step_days
        )
    left_path = source_job(spark, join_conf, output_path, rng, step_days)
    part_paths = [
        join_part_job(spark, join_conf, jp, left_path, output_path, rng, step_days, mode)
        for jp in join_conf.join_parts
    ]
    return merge_job(spark, join_conf, left_path, part_paths, output_path, rng, step_days)


# ---------------------------------------------------------------------------
# External node-runner (reference batch/BatchNodeRunner.scala +
# thrift/planner.thrift): the same three stages, but each node is
# addressable by id so an orchestrator can run every stage as its OWN
# spark-submit process, with table-state handoff through the materialized
# stage tables and resume through plans.backfill's partition checkpoints.
# ---------------------------------------------------------------------------


def plan_join_nodes(join_conf: Join, output_path: str) -> list:
    """The planner's node DAG for a modular join backfill: one source
    node, one node per join part, one merge node; edges are the stage
    tables (the planner.thrift TableDependency shape)."""
    base = output_path.rstrip("/")
    left_path = base + "__left"
    source_id = f"source:{join_conf.name}"
    nodes = [{
        "node_id": source_id,
        "kind": "source",
        "output": left_path,
        "inputs": [],
    }]
    part_ids, part_paths = [], []
    for i, jp in enumerate(join_conf.join_parts):
        nid = f"part:{jp.full_prefix()}"
        pp = base + f"__part_{jp.full_prefix()}"
        nodes.append({
            "node_id": nid,
            "kind": "join_part",
            "part_index": i,
            "output": pp,
            "inputs": [left_path],
        })
        part_ids.append(nid)
        part_paths.append(pp)
    nodes.append({
        "node_id": f"merge:{join_conf.name}",
        "kind": "merge",
        "output": output_path,
        "inputs": [left_path] + part_paths,
    })
    return nodes


def run_join_node(
    spark: SparkSession,
    join_conf: Join,
    node: dict,
    output_path: str,
    rng: PartitionRange,
    step_days: int = 30,
    mode: str = "sawtooth",
) -> Optional[BackfillResult]:
    """Execute exactly one planned node in THIS process. An orchestrator
    (cli run-plan, or a real scheduler) invokes one spark-submit per node;
    upstream state arrives only through the stage tables, so a node can
    rerun on a fresh cluster and resume at partition granularity."""
    from chronon_spark.plans.backfill import require_utc_session

    require_utc_session(spark)
    base = output_path.rstrip("/")
    kind = node["kind"]
    if kind == "source":
        source_job(spark, join_conf, output_path, rng, step_days)
        return None
    if kind == "join_part":
        jp = join_conf.join_parts[node["part_index"]]
        join_part_job(
            spark, join_conf, jp, base + "__left", output_path, rng,
            step_days, mode,
        )
        return None
    if kind == "merge":
        part_paths = [
            base + f"__part_{jp.full_prefix()}" for jp in join_conf.join_parts
        ]
        return merge_job(
            spark, join_conf, base + "__left", part_paths, output_path, rng,
            step_days,
        )
    raise ValueError(f"unknown node kind: {kind}")
