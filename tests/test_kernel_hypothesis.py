"""Hypothesis property tests: kernel == naive oracle under adversarial
event/query distributions (duplicate timestamps, all-null columns, bursts,
empty windows, boundary-exact queries)."""

import numpy as np
import pandas as pd
from hypothesis import given, settings, strategies as st

from chronon_spark.api.types import AggregationPart, Operation, Window
from naive_oracle import naive_asof_features
from chronon_spark.kernel.sawtooth import compute_asof_features

HOUR = 3_600_000
T0 = 1_700_000_000_000

PARTS = [
    AggregationPart("v", Operation.COUNT, {}, Window.hours(5)),
    AggregationPart("v", Operation.SUM, {}, Window.hours(5)),
    AggregationPart("v", Operation.MIN, {}, None),
    AggregationPart("v", Operation.LAST, {}, Window.hours(2)),
    AggregationPart("v", Operation.LAST_K, {"k": 2}, None),
    # the two vectorized fast paths (prev-occurrence sweep / per-code
    # prefix counts) must agree with the naive slice-rebuild under
    # duplicate timestamps, bursts, and empty windows
    AggregationPart("v", Operation.UNIQUE_COUNT, {}, Window.hours(5)),
    AggregationPart("v", Operation.HISTOGRAM, {}, Window.hours(3)),
]


@st.composite
def scenario(draw):
    n = draw(st.integers(0, 40))
    # timestamps may collide and cluster (bursts)
    ts = draw(
        st.lists(st.integers(0, 20 * HOUR), min_size=n, max_size=n)
    )
    vals = draw(
        st.lists(
            st.one_of(st.none(), st.integers(-1000, 1000)), min_size=n, max_size=n
        )
    )
    nq = draw(st.integers(1, 15))
    q = draw(st.lists(st.integers(-HOUR, 21 * HOUR), min_size=nq, max_size=nq))
    # include boundary-exact queries: query exactly at an event ts
    if n > 0 and draw(st.booleans()):
        q.append(ts[0])
    hop = draw(st.sampled_from([None, HOUR]))
    return ts, vals, q, hop


@settings(max_examples=120, deadline=None)
@given(scenario())
def test_kernel_matches_naive_under_adversarial_inputs(sc):
    ts, vals, q, hop = sc
    ev = pd.DataFrame(
        {
            "ts": np.array(ts, dtype=np.int64) + T0,
            "v": pd.Series([None if v is None else float(v) for v in vals], dtype=object),
        }
    )
    q_ts = np.array(sorted(q), dtype=np.int64) + T0
    got = compute_asof_features(ev, q_ts, PARTS, tail_hop_ms=hop)
    exp = naive_asof_features(ev, q_ts, PARTS, tail_hop_ms=hop)
    for p in PARTS:
        g = got.get(p.output_column, [None] * len(q_ts))
        e = exp[p.output_column]
        for i in range(len(q_ts)):
            gv, evv = g[i], e[i]
            if isinstance(evv, float):
                assert gv is not None and abs(gv - evv) < 1e-9, (p.output_column, i)
            else:
                assert gv == evv, (p.output_column, i, gv, evv)
