"""Sampled-execution pre-flight evaluation (reference batch/Eval.scala:147-220).

Static schema derivation (``plans/analyzer.py``) resolves names and types
through Catalyst analysis, but cannot catch errors that only fire when an
expression actually EXECUTES — an ANSI cast that throws on real data, a
``setups`` UDF that fails on its first row, a malformed regexp, a model
transform whose batch function raises. The reference runs every conf
against sampled source data before a backfill is scheduled
(``Eval.scala``: source-expression check, timestamp check, key/agg/
derivation schema derivation, each reported as SUCCESS/FAILURE/SKIPPED
with a message rather than a stack trace at job time). This module is the
Spark-first equivalent:

- every source is rewritten to a ``limit(sample_rows)`` temp view, so the
  probe executes the REAL plan (same Catalyst analysis, same ANSI
  semantics, same UDFs) over a driver-bounded sample;
- the conf's full compute (``group_by_asof`` / ``join_asof``) runs over
  the sampled views and its EXECUTED schema is compared with the static
  derivation from ``plans/analyzer.py`` — a disagreement is itself a
  FAILURE (one of the two derivations is wrong);
- timestamp sanity mirrors the reference's ``runTimestampChecks``:
  ``ts`` must be non-null and in a plausible epoch-millisecond range.

At 100 TB this is the difference between a conf error surfacing in
seconds on the driver versus hours into a thousand-executor backfill.
"""

from __future__ import annotations

import traceback
from dataclasses import dataclass, field, replace
from typing import Optional

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from chronon_spark.api.types import (
    EntitySource,
    EventSource,
    GroupBy,
    Join,
)
from chronon_spark.sources.scan import TS, load_table, scan_source

SUCCESS = "SUCCESS"
FAILURE = "FAILURE"
SKIPPED = "SKIPPED"

# reference Eval's plausible epoch-millis band (1971-01-01 .. 2099-12-31)
_TS_MIN_MS = 31_536_000_000
_TS_MAX_MS = 4_102_444_800_000


@dataclass
class CheckResult:
    name: str
    status: str
    message: str = ""


@dataclass
class EvalResult:
    checks: list = field(default_factory=list)
    output_schema: Optional[T.StructType] = None

    @property
    def ok(self) -> bool:
        return all(c.status != FAILURE for c in self.checks)

    def add(self, name: str, status: str, message: str = "") -> None:
        self.checks.append(CheckResult(name, status, message))

    def summary(self) -> str:
        return "\n".join(
            f"[{c.status}] {c.name}" + (f": {c.message}" if c.message else "")
            for c in self.checks
        )


def _err(e: BaseException) -> str:
    tb = traceback.format_exception_only(type(e), e)
    return "".join(tb).strip()[:2000]


_eval_view_seq = [0]


def _sampled_source(spark: SparkSession, source, sample_rows: int):
    """Rewrite a source to read a limit(sample_rows) temp view of its
    table — the probe then executes the source's REAL query expressions
    over a driver-bounded sample."""
    _eval_view_seq[0] += 1
    view = f"__chronon_eval_sample_{_eval_view_seq[0]}"
    if isinstance(source, EventSource):
        load_table(spark, source.table).limit(sample_rows).createOrReplaceTempView(view)
        return replace(source, table=view)
    if isinstance(source, EntitySource):
        load_table(spark, source.snapshot_table).limit(sample_rows).createOrReplaceTempView(view)
        out = replace(source, snapshot_table=view)
        if source.mutation_table:
            _eval_view_seq[0] += 1
            mview = f"__chronon_eval_sample_{_eval_view_seq[0]}"
            load_table(spark, source.mutation_table).limit(sample_rows).createOrReplaceTempView(mview)
            out = replace(out, mutation_table=mview)
        return out
    # JoinSource / ModelTransforms: sample their leaf sources recursively
    if hasattr(source, "sources"):
        return replace(
            source,
            sources=tuple(
                _sampled_source(spark, s, sample_rows) for s in source.sources
            ),
        )
    if hasattr(source, "join"):
        inner = source.join
        return replace(source, join=_sampled_join_conf(spark, inner, sample_rows))
    return source


def _sampled_group_by(spark: SparkSession, gb: GroupBy, n: int) -> GroupBy:
    return replace(
        gb, sources=tuple(_sampled_source(spark, s, n) for s in gb.sources)
    )


def _sampled_join_conf(spark: SparkSession, conf: Join, n: int) -> Join:
    return replace(
        conf,
        left=_sampled_source(spark, conf.left, n),
        join_parts=tuple(
            replace(jp, group_by=_sampled_group_by(spark, jp.group_by, n))
            for jp in conf.join_parts
        ),
    )


def _source_tables(source) -> list:
    if isinstance(source, EventSource):
        return [source.table]
    if isinstance(source, EntitySource):
        return [source.snapshot_table] + (
            [source.mutation_table] if source.mutation_table else []
        )
    out = []
    for s in getattr(source, "sources", ()):
        out += _source_tables(s)
    if hasattr(source, "join"):
        out += _source_tables(source.join.left)
        for jp in source.join.join_parts:
            for s in jp.group_by.sources:
                out += _source_tables(s)
    return out


def _check_reachable(spark: SparkSession, res: EvalResult, sources) -> bool:
    missing = []
    for src in sources:
        for t in _source_tables(src):
            try:
                load_table(spark, t)
            except Exception:
                missing.append(t)
    if missing:
        res.add(
            "source_reachable", FAILURE,
            f"source tables not found: {', '.join(missing)}",
        )
        return False
    res.add("source_reachable", SUCCESS)
    return True


def _check_source_expression(
    spark: SparkSession, res: EvalResult, source, sample_rows: int
) -> Optional[list]:
    """Execute the rendered source query over the sample (collect forces
    runtime evaluation of every select/where/setup expression)."""
    try:
        sampled = _sampled_source(spark, source, sample_rows)
        rows = scan_source(spark, sampled).collect()
        res.add("source_expression", SUCCESS, f"{len(rows)} sample rows")
        return rows
    except Exception as e:
        res.add("source_expression", FAILURE, _err(e))
        return None


def _check_timestamps(res: EvalResult, rows, name: str = "source_timestamp") -> None:
    """Reference runTimestampChecks: ts non-null and plausibly epoch
    millis (a second-resolution column is the classic silent killer)."""
    if rows is None:
        res.add(name, SKIPPED, "source expression failed")
        return
    ts_vals = [r[TS] for r in rows if TS in r.__fields__] if rows else []
    if not rows or not ts_vals:
        res.add(name, SKIPPED, "no sample rows with a ts column")
        return
    nulls = sum(1 for v in ts_vals if v is None)
    if nulls:
        res.add(name, FAILURE, f"{nulls}/{len(ts_vals)} null ts values in sample")
        return
    bad = [v for v in ts_vals if not (_TS_MIN_MS <= v <= _TS_MAX_MS)]
    if bad:
        res.add(
            name, FAILURE,
            f"ts outside epoch-millis range (seconds instead of millis?): "
            f"e.g. {bad[0]}",
        )
        return
    res.add(name, SUCCESS)


def _schemas_agree(a: T.StructType, b: T.StructType) -> str:
    """'' if field names+types match (order-insensitive, nullability
    ignored — sampled execution can tighten nullability)."""
    fa = {f.name: f.dataType.simpleString() for f in a.fields}
    fb = {f.name: f.dataType.simpleString() for f in b.fields}
    if fa == fb:
        return ""
    only_a = sorted(set(fa) - set(fb))
    only_b = sorted(set(fb) - set(fa))
    diff = sorted(k for k in set(fa) & set(fb) if fa[k] != fb[k])
    parts = []
    if only_a:
        parts.append(f"static-only fields: {only_a}")
    if only_b:
        parts.append(f"executed-only fields: {only_b}")
    if diff:
        parts.append(
            "type mismatches: "
            + ", ".join(f"{k}: static {fa[k]} vs executed {fb[k]}" for k in diff)
        )
    return "; ".join(parts)


def eval_group_by(
    spark: SparkSession, gb: GroupBy, sample_rows: int = 100
) -> EvalResult:
    """Pre-flight a GroupBy conf: reachability, sampled source-expression
    execution, timestamp sanity, key columns, static agg schema, and a
    sampled end-to-end ``group_by_asof`` run whose executed schema must
    match the static derivation."""
    res = EvalResult()
    if not _check_reachable(spark, res, gb.sources):
        return res
    rows = _check_source_expression(spark, res, gb.sources[0], sample_rows)
    _check_timestamps(res, rows)

    # key columns must exist in the rendered source
    if rows is not None:
        cols = set(rows[0].__fields__) if rows else None
        missing = [k for k in gb.key_columns if cols is not None and k not in cols]
        if missing:
            res.add("key_schema", FAILURE, f"key columns missing from source: {missing}")
            return res
        res.add("key_schema", SUCCESS)

    from chronon_spark.plans.analyzer import analyze_group_by

    try:
        static_schema = analyze_group_by(spark, gb)
        res.add("agg_schema", SUCCESS)
    except Exception as e:
        res.add("agg_schema", FAILURE, _err(e))
        return res

    if rows is None:
        res.add("sampled_execution", SKIPPED, "source expression failed")
        return res
    try:
        from chronon_spark.operators.asof_join import group_by_asof

        sampled_gb = _sampled_group_by(spark, gb, sample_rows)
        src = scan_source(spark, sampled_gb.sources[0])
        queries = src.select(*gb.key_columns, TS).where(
            F.col(TS).isNotNull()
        ).limit(sample_rows)
        out = group_by_asof(spark, sampled_gb, queries)
        out.collect()  # force runtime evaluation (kernel + derivations)
        mismatch = _schemas_agree(static_schema, out.schema)
        if mismatch:
            res.add("sampled_execution", FAILURE, f"schema disagreement: {mismatch}")
        else:
            res.add("sampled_execution", SUCCESS)
            res.output_schema = out.schema
    except Exception as e:
        res.add("sampled_execution", FAILURE, _err(e))
    if res.output_schema is None and res.ok:
        res.output_schema = static_schema
    return res


def eval_join(
    spark: SparkSession, conf: Join, sample_rows: int = 100
) -> EvalResult:
    """Pre-flight a Join conf: left source checks, per-join-part GroupBy
    checks (deduped by GroupBy name, as the reference does), and a sampled
    end-to-end ``join_asof`` run compared with the static join schema."""
    res = EvalResult()
    all_sources = [conf.left] + [
        s for jp in conf.join_parts for s in jp.group_by.sources
    ]
    if not _check_reachable(spark, res, all_sources):
        return res
    rows = _check_source_expression(spark, res, conf.left, sample_rows)
    _check_timestamps(res, rows, name="left_timestamp")

    seen = set()
    for jp in conf.join_parts:
        gb = jp.group_by
        if gb.name in seen:
            continue
        seen.add(gb.name)
        sub = eval_group_by(spark, gb, sample_rows)
        for c in sub.checks:
            res.add(f"{gb.name}.{c.name}", c.status, c.message)
        # key-mapping check is per part even when the GroupBy repeats:
        # key_mapping maps left col -> right key; every right key must be
        # fed by a left column (mapped, else same-named)
        if rows is not None and rows:
            left_cols = set(rows[0].__fields__)
            right_to_left = {v: k for k, v in (jp.key_mapping or {}).items()}
            bad = [
                right_to_left.get(k, k)
                for k in gb.key_columns
                if right_to_left.get(k, k) not in left_cols
            ]
            if bad:
                res.add(
                    f"{jp.full_prefix()}.key_mapping", FAILURE,
                    f"left columns missing for keys: {bad}",
                )
            else:
                res.add(f"{jp.full_prefix()}.key_mapping", SUCCESS)

    from chronon_spark.plans.analyzer import analyze_join

    try:
        static_schema = analyze_join(spark, conf)
        res.add("join_schema", SUCCESS)
    except Exception as e:
        res.add("join_schema", FAILURE, _err(e))
        return res

    if not res.ok:
        res.add("sampled_execution", SKIPPED, "earlier checks failed")
        return res
    try:
        from chronon_spark.operators.asof_join import join_asof

        sampled = _sampled_join_conf(spark, conf, sample_rows)
        out = join_asof(spark, sampled)
        out.collect()
        mismatch = _schemas_agree(static_schema, out.schema)
        if mismatch:
            res.add("sampled_execution", FAILURE, f"schema disagreement: {mismatch}")
        else:
            res.add("sampled_execution", SUCCESS)
            res.output_schema = out.schema
    except Exception as e:
        res.add("sampled_execution", FAILURE, _err(e))
    if res.output_schema is None and res.ok:
        res.output_schema = static_schema
    return res
