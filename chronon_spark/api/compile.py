"""Conf compile surface: validate, serialize, and semantically hash confs.

Reference: python/src/ai/chronon/cli/compile/ — ``parse_configs.py`` turns
the Python DSL into thrift-JSON conf files under ``compiled/``,
``conf_validator.py`` rejects malformed confs before anything runs, and
``column_hashing.py`` assigns every OUTPUT COLUMN a semantic hash so the
orchestrator can recompute only columns whose semantics changed (the
columnHashes field of MetaData, thrift/api.thrift:286-342).

This engine's confs are frozen dataclasses (api/types.py), so "compile"
means: validate -> serialize to JSON (round-trippable) -> attach
column-level semantic hashes. The hash semantics follow the reference's
column_hashing.py:
- base semantics per source: table, mutation table, cumulative flag,
  filters, key-column select expressions, time column expression,
- plus the GroupBy name and each column's input expression,
- derivations: a pure rename keeps the base column's hash; a real
  expression hashes (base semantics + expression + the hashes of every
  base column referenced in it).

``changed_columns(old, new)`` is the incremental-recompute hook: columns
whose hash is unchanged can reuse archived data (plans/backfill.py's
whole-conf hash is the coarse fallback).
"""

from __future__ import annotations

import dataclasses
import enum
import hashlib
import json
import os
import re
from typing import Optional

from chronon_spark.api import types as TY


# ---------------------------------------------------------------- validate


def validate_group_by(gb: TY.GroupBy) -> list:
    """conf_validator.py equivalents for a GroupBy."""
    errors = []
    if not gb.name:
        errors.append("GroupBy.name is required")
    if not gb.sources:
        errors.append("GroupBy.sources must be non-empty")
    if not gb.key_columns:
        errors.append("GroupBy.key_columns must be non-empty")
    if not gb.aggregations:
        errors.append("GroupBy.aggregations must be non-empty")
    for k in gb.key_columns:
        try:
            TY.validate_identifier(k)
        except ValueError as e:
            errors.append(str(e))
    reserved = {"ts", "ds", "mutation_ts", "is_before", "ts_ds"}
    bad = reserved & set(gb.key_columns)
    if bad:
        errors.append(f"key columns use reserved names: {sorted(bad)}")
    for s in gb.sources:
        q = getattr(s, "query", None)
        if q is not None and q.selects:
            missing = [k for k in gb.key_columns if k not in q.selects]
            if missing:
                errors.append(
                    f"source {getattr(s, 'table', getattr(s, 'snapshot_table', '?'))}: "
                    f"selects missing key columns {missing}"
                )
            for a in gb.aggregations:
                if a.input_column not in q.selects:
                    errors.append(
                        f"aggregation input {a.input_column!r} absent from selects"
                    )
                for b in a.buckets or ():
                    if b not in q.selects:
                        errors.append(f"bucket column {b!r} absent from selects")
    seen = set()
    for p in gb.unpack():
        if p.output_column in seen:
            errors.append(f"duplicate output column {p.output_column!r}")
        seen.add(p.output_column)
    return errors


def validate_join(join: TY.Join) -> list:
    errors = []
    if not join.name:
        errors.append("Join.name is required")
    if not join.join_parts:
        errors.append("Join.join_parts must be non-empty")
    left_cols = set((join.left.query.selects or {}).keys())
    prefixes = set()
    for jp in join.join_parts:
        errors += [f"[{jp.group_by.name}] {e}" for e in validate_group_by(jp.group_by)]
        fp = jp.full_prefix()
        if fp in prefixes:
            errors.append(f"duplicate join-part prefix {fp!r}")
        prefixes.add(fp)
        mapping = jp.key_mapping or {k: k for k in jp.group_by.key_columns}
        if left_cols:
            missing = [lc for lc in mapping if lc not in left_cols]
            if missing:
                errors.append(
                    f"[{jp.group_by.name}] key_mapping left columns {missing} "
                    "absent from the left source's selects"
                )
        unknown = [rk for rk in mapping.values() if rk not in jp.group_by.key_columns]
        if unknown:
            errors.append(
                f"[{jp.group_by.name}] key_mapping targets {unknown} are not "
                "GroupBy key columns"
            )
    return errors


# --------------------------------------------------------------- serialize


def to_conf(obj) -> dict:
    """Dataclass conf -> JSON-able dict with _type tags (round-trippable).

    Callables (ModelTransforms scorers) are NOT serializable conf content —
    they compile to their qualified name, and ``from_conf`` refuses to
    rehydrate them (a conf file must not smuggle code)."""
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        d = {"_type": type(obj).__name__}
        for f in dataclasses.fields(obj):
            d[f.name] = to_conf(getattr(obj, f.name))
        return d
    if isinstance(obj, enum.Enum):
        return {"_enum": type(obj).__name__, "value": obj.value}
    if isinstance(obj, tuple):
        return [to_conf(x) for x in obj]
    if isinstance(obj, list):
        return [to_conf(x) for x in obj]
    if isinstance(obj, dict):
        return {k: to_conf(v) for k, v in obj.items()}
    if callable(obj):
        return {"_callable": f"{getattr(obj, '__module__', '?')}.{getattr(obj, '__qualname__', repr(obj))}"}
    return obj


def from_conf(d):
    """Inverse of to_conf (for dataclasses defined in api.types and
    operators.model_transforms, minus callables)."""
    if isinstance(d, dict) and "_type" in d:
        tname = d["_type"]
        cls = getattr(TY, tname, None)
        if cls is None:
            from chronon_spark.operators import model_transforms as MT

            cls = getattr(MT, tname, None)
        if cls is None:
            raise ValueError(f"unknown conf type {tname!r}")
        kwargs = {}
        for f in dataclasses.fields(cls):
            if f.name in d:
                v = from_conf(d[f.name])
                # dataclass fields declared as tuples round-trip from JSON lists
                if isinstance(v, list) and (
                    f.type.startswith("tuple") or f.name in ("wheres", "setups")
                ):
                    v = tuple(v)
                kwargs[f.name] = v
        return cls(**kwargs)
    if isinstance(d, dict) and "_enum" in d:
        return getattr(TY, d["_enum"])(d["value"])
    if isinstance(d, dict) and "_callable" in d:
        raise ValueError(
            f"conf references a callable ({d['_callable']}); callables must be "
            "re-bound in code, not loaded from conf files"
        )
    if isinstance(d, list):
        return tuple(from_conf(x) for x in d)
    if isinstance(d, dict):
        return {k: from_conf(v) for k, v in d.items()}
    return d


def compile_confs(objs: list, out_dir: str) -> list:
    """Validate + write one JSON conf per object under
    ``out_dir/{group_bys|joins}/{name}.json`` with columnHashes attached
    (reference compiled/ output layout). Raises on any validation error;
    returns the written paths."""
    errors = []
    for o in objs:
        if isinstance(o, TY.GroupBy):
            errors += [f"[{o.name}] {e}" for e in validate_group_by(o)]
        elif isinstance(o, TY.Join):
            errors += [f"[{o.name}] {e}" for e in validate_join(o)]
        else:
            errors.append(f"unsupported conf object: {type(o).__name__}")
    if errors:
        raise ValueError("; ".join(errors))
    paths = []
    for o in objs:
        kind = "group_bys" if isinstance(o, TY.GroupBy) else "joins"
        conf = to_conf(o)
        conf["columnHashes"] = (
            group_by_column_hashes(o)
            if isinstance(o, TY.GroupBy)
            else join_column_hashes(o)
        )
        d = os.path.join(out_dir, kind)
        os.makedirs(d, exist_ok=True)
        p = os.path.join(d, f"{o.name}.json")
        with open(p, "w") as f:
            json.dump(conf, f, indent=1, sort_keys=True)
        paths.append(p)
    return paths


# ----------------------------------------------------- column semantic hash


def _hash(components: list) -> str:
    return hashlib.md5("|".join(sorted(components)).encode()).hexdigest()


def _source_semantics(source, key_columns) -> list:
    """column_hashing._extract_source_semantic_info parity."""
    if isinstance(source, TY.EventSource):
        table, mutation, cumulative, q = source.table, "", str(source.is_cumulative or ""), source.query
    elif isinstance(source, TY.EntitySource):
        table, mutation, cumulative, q = (
            source.snapshot_table, source.mutation_table or "", "", source.query,
        )
    elif isinstance(source, TY.JoinSource):
        # chained source: the parent join's identity is its name + left
        # semantics + every part's column hashes (a parent change flows
        # into every downstream column hash)
        comps = [f"join_source:{source.join.name}", f"table:{source.table or ''}"]
        comps += _source_semantics(source.join.left, key_columns)
        for jp in source.join.join_parts:
            comps.append(
                f"part:{jp.full_prefix()}="
                + ",".join(sorted(group_by_column_hashes(jp.group_by).values()))
            )
        selects = source.query.selects or {}
        for k in sorted(key_columns or []):
            comps.append(f"select:{k}={selects.get(k, k)}")
        return sorted(comps)
    else:  # ModelTransforms-like: hash the inner sources + models
        comps = []
        for s in getattr(source, "sources", ()):
            comps += _source_semantics(s, key_columns)
        for m in getattr(source, "models", ()):
            comps.append(f"model:{m.name}={sorted(m.input_mapping.items())}")
        return sorted(comps)
    comps = [
        f"table:{table}",
        f"mutation_table:{mutation}",
        f"cumulative:{cumulative}",
        f"filters:{list(q.wheres) or ''}",
    ]
    selects = q.selects or {}
    for k in sorted(key_columns or []):
        comps.append(f"select:{k}={selects.get(k, k)}")
    if q.time_column:
        comps.append(f"time_column:ts={q.time_column}")
    return sorted(comps)


def group_by_column_hashes(gb: TY.GroupBy, exclude_keys: bool = False) -> dict:
    """Semantic hash per output column (column_hashing.py:12-60 parity):
    base source semantics + GroupBy name + the column's input expression;
    derivations per build_derived_columns (renames keep the base hash)."""
    base = []
    for s in gb.sources:
        base += _source_semantics(s, gb.key_columns)
    base.append(f"group_by_name:{gb.name}")

    out: dict = {}
    selects = {}
    for s in gb.sources:
        q = getattr(s, "query", None)
        if q is not None and q.selects:
            selects.update(q.selects)
    for k in gb.key_columns:
        out[k] = _hash(base + [f"input_expr:{selects.get(k, k)}"])
    for p in gb.unpack():
        input_expr = selects.get(p.input_column, p.input_column)
        if p.bucket:
            input_expr += f"|bucket:{selects.get(p.bucket, p.bucket)}"
        input_expr += f"|op:{p.operation.value}|window:{p.window.suffix if p.window else ''}"
        if p.arg_map:
            input_expr += f"|args:{sorted(p.arg_map.items())}"
        out[p.output_column] = _hash(base + [f"input_expr:{input_expr}"])

    if exclude_keys:
        out = {k: v for k, v in out.items() if k not in gb.key_columns}
    if gb.derivations:
        out = _derived_hashes(out, gb.derivations, base)
        if not exclude_keys:
            for k in gb.key_columns:
                out.setdefault(k, _hash(base + [f"input_expr:{selects.get(k, k)}"]))
    return out


def _derived_hashes(base_hashes: dict, derivations: dict, base_semantics: list) -> dict:
    """build_derived_columns parity: star passes everything through,
    pure renames keep the referenced column's hash, real expressions mix
    in the hashes of every referenced base column."""
    out: dict = {}
    if "*" in derivations:
        out.update(base_hashes)
    for name, expr in derivations.items():
        if name == "*":
            continue
        if expr in base_hashes:
            out[name] = base_hashes[expr]
            continue
        refs = [
            base_hashes[tok]
            for tok in re.findall(r"\b\w+\b", expr)
            if tok in base_hashes
        ]
        out[name] = _hash(base_semantics + [f"derivation:{expr}"] + refs)
    return out


def join_column_hashes(join: TY.Join) -> dict:
    """Per-output-column hashes for a Join: each part's non-key columns
    prefixed (compute_join_column_hashes parity), left columns hashed from
    the left source semantics, then Join-level derivations."""
    out: dict = {}
    left_selects = join.left.query.selects or {}
    left_base = _source_semantics(join.left, list(left_selects.keys()))
    for c, e in left_selects.items():
        out[c] = _hash(left_base + [f"input_expr:{e}"])
    for jp in join.join_parts:
        gb_hashes = group_by_column_hashes(jp.group_by, exclude_keys=True)
        mapping_tag = f"key_mapping:{sorted((jp.key_mapping or {}).items())}"
        for c, h in gb_hashes.items():
            out[f"{jp.full_prefix()}_{c}"] = _hash([h, mapping_tag])
    if join.derivations:
        base_sem = left_base + [f"join_name:{join.name}"]
        out = _derived_hashes(out, join.derivations, base_sem)
    return out


def changed_columns(old: Optional[dict], new: dict) -> dict:
    """Diff two columnHashes maps -> {column: 'added'|'changed'|'removed'}.
    Unchanged columns (same hash) can reuse archived data — the
    incremental-recompute contract of MetaData.columnHashes."""
    old = old or {}
    out = {}
    for c, h in new.items():
        if c not in old:
            out[c] = "added"
        elif old[c] != h:
            out[c] = "changed"
    for c in old:
        if c not in new:
            out[c] = "removed"
    return out
