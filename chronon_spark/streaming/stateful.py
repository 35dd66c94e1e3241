"""Custom stateful streaming operator: incremental LAST_K per key.

Demonstrates the ``applyInPandasWithState`` surface (the Structured
Streaming mapping for the reference's keyed row-IR aggregation state,
flink/.../window/FlinkRowAggregators.scala:1-259): per-key mutable state
holds a truncated (ts, value) list — the same truncated-sorted-list IR the
batch kernel uses, so batch and stream agree exactly.

State is Arrow-serialized between micro-batches and restored from the
checkpoint on restart; each micro-batch emits the key's refreshed LAST_K.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_last_k(
    events: DataFrame,
    keys: list,
    k: int = 10,
    value_col: str = "value",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming DF -> per-key LAST_K updates (one row per key per batch).

    Output: keys + ``last_k`` (array<double>, most-recent first) +
    ``n_events_seen`` (running count — a second, trivially-mergeable IR).
    """
    key_schema = ", ".join(f"{c} long" for c in keys)
    out_schema = f"{key_schema}, last_k array<double>, n_events_seen long"
    state_schema = "ts array<long>, v array<double>, n long"

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            ts_list, v_list, n = state.get
            ts_list, v_list = list(ts_list), list(v_list)
        else:
            ts_list, v_list, n = [], [], 0
        for pdf in pdfs:
            pdf = pdf.dropna(subset=[value_col])
            n += len(pdf)
            ts_list.extend(int(t) for t in pdf[ts_col])
            v_list.extend(float(v) for v in pdf[value_col])
        # truncate the IR: keep only the k most recent (ts-sorted)
        order = sorted(range(len(ts_list)), key=lambda i: ts_list[i])[-k:]
        ts_list = [ts_list[i] for i in order]
        v_list = [v_list[i] for i in order]
        state.update((ts_list, v_list, n))
        yield pd.DataFrame(
            {
                **{c: [key[i]] for i, c in enumerate(keys)},
                "last_k": [list(reversed(v_list))],  # most-recent first
                "n_events_seen": [n],
            }
        )

    return events.groupBy(*keys).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
