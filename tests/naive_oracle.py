"""Brute-force O(n·q) oracle for the as-of kernel (TEST-ONLY).

Same role as the reference's NaiveAggregator
(aggregator/src/test/.../NaiveAggregator.scala:1-56): recompute every
feature at every query timestamp by scanning all events with the window
predicate applied literally, with zero cleverness. Property tests assert
``compute_asof_features`` == this for randomized inputs.
"""

from __future__ import annotations

from collections import Counter
from typing import Optional

import numpy as np
import pandas as pd

from chronon_spark.api.types import AggregationPart, Operation


def _qualifies(e_ts, q_ts, window_ms, tail_hop):
    if e_ts > q_ts:
        return False
    if window_ms is None:
        return True
    if tail_hop is None:
        return e_ts > q_ts - window_ms
    return e_ts >= ((q_ts - window_ms) // tail_hop) * tail_hop


def _agg(values: list, op: Operation, part: AggregationPart):
    vals = [v for v in values if v is not None and not (isinstance(v, float) and np.isnan(v))]
    k = part.k
    if op is Operation.COUNT:
        return len(vals)
    if op in (Operation.UNIQUE_COUNT, Operation.APPROX_UNIQUE_COUNT):
        return len(set(vals))
    if not vals:
        return None
    if op is Operation.SUM:
        return float(sum(float(v) for v in vals))
    if op is Operation.AVERAGE:
        return float(np.mean([float(v) for v in vals]))
    if op is Operation.VARIANCE:
        return float(np.var([float(v) for v in vals]))
    if op is Operation.SKEW:
        a = np.array([float(v) for v in vals])
        if len(a) < 2 or np.var(a) == 0:
            return None
        m2, m3 = np.var(a), np.mean((a - a.mean()) ** 3)
        return float(m3 / m2**1.5)
    if op is Operation.KURTOSIS:
        a = np.array([float(v) for v in vals])
        if len(a) < 2 or np.var(a) == 0:
            return None
        return float(np.mean((a - a.mean()) ** 4) / np.var(a) ** 2 - 3.0)
    if op is Operation.MIN:
        return float(min(float(v) for v in vals))
    if op is Operation.MAX:
        return float(max(float(v) for v in vals))
    if op is Operation.FIRST:
        return vals[0]
    if op is Operation.LAST:
        return vals[-1]
    if op is Operation.FIRST_K:
        return vals[:k]
    if op is Operation.LAST_K:
        return vals[-k:][::-1]
    if op is Operation.TOP_K:
        return sorted((float(v) for v in vals), reverse=True)[:k]
    if op is Operation.BOTTOM_K:
        return sorted(float(v) for v in vals)[:k]
    if op is Operation.APPROX_PERCENTILE:
        return [float(x) for x in np.quantile([float(v) for v in vals], part.percentiles, method="linear")]
    if op is Operation.HISTOGRAM:
        c = Counter(str(v) for v in vals)
        trunc = part.arg_map.get("k")
        return dict(c.most_common(int(trunc))) if trunc else dict(c)
    if op is Operation.APPROX_FREQUENT_K:
        return dict(Counter(str(v) for v in vals).most_common(k))
    if op is Operation.APPROX_HEAVY_HITTERS_K:
        c = Counter(str(v) for v in vals)
        thresh = len(vals) / (k + 1)
        return {s_: n for s_, n in c.most_common(k) if n > thresh}
    if op is Operation.UNIQUE_TOP_K:
        return [float(x) for x in np.unique([float(v) for v in vals])[::-1][:k]]
    raise NotImplementedError(op)


def naive_asof_features(
    events: pd.DataFrame,
    query_ts: np.ndarray,
    parts: list[AggregationPart],
    tail_hop_ms: Optional[int] = None,
) -> dict[str, list]:
    ev = events.sort_values("ts", kind="stable").reset_index(drop=True)
    out: dict[str, list] = {}
    for p in parts:
        col_out = []
        w = p.window.millis if p.window else None
        for q in np.asarray(query_ts, dtype=np.int64):
            if len(ev) == 0:
                rows = ev
            else:
                rows = ev[[_qualifies(t, q, w, tail_hop_ms) for t in ev["ts"]]]
            if p.bucket is not None:
                m = {}
                zero_is_empty = p.operation in (
                    Operation.COUNT,
                    Operation.UNIQUE_COUNT,
                    Operation.APPROX_UNIQUE_COUNT,
                )
                for bval, grp in rows.groupby(p.bucket, dropna=True, sort=True):
                    r = _agg(list(grp[p.input_column]), p.operation, p)
                    if r is not None and not (zero_is_empty and r == 0):
                        m[str(bval)] = r
                col_out.append(m if m else None)
            else:
                col_out.append(_agg(list(rows[p.input_column]), p.operation, p))
        out[p.output_column] = col_out
    return out
