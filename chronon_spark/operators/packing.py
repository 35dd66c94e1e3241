"""Sequence packing: bin documents into fixed-token-budget training rows.

LLM pretraining consumes fixed-length context windows; packing multiple
documents per window instead of padding each one is the standard
throughput lever. This op assigns every document a (shard, bin) pack id
under NEXT-FIT packing:

- documents are hash-sharded (``n_shards`` independent streams — the
  parallelism unit; packing inside one shard is inherently sequential),
- within a shard, documents are taken in ascending id order and appended
  to the current bin while they fit; a document that would overflow
  ``max_tokens`` opens a new bin,
- a single document longer than ``max_tokens`` gets a bin of its own
  (truncation/splitting is a downstream concern and is flagged).

Why next-fit and not first-fit-decreasing: next-fit is ONE sequential
scan per shard (Arrow-vectorizable, deterministic, O(n)), wastes at most
one bin in two vs optimal in the worst case, and its sequential semantics
are exactly mirrorable in a SQL oracle (a lockstep recursive CTE over the
per-shard rank) — FFD needs a mutable bin index, which neither scales nor
oracles.

Scale shape: one narrow projection + ONE shuffle on shard +
``applyInPandas`` per shard (numpy cumulative scan inside). Shards bound
the sequential work: 10^9 docs / 10^4 shards = 10^5-doc scans per task.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    id_col: str,
    token_col: str,
    max_tokens: int,
    n_shards: int = 64,
) -> DataFrame:
    """-> (id, tokens, shard, bin, oversize) — pack id is (shard, bin).

    Deterministic: shard = portable md5 hash of id, order within shard is
    ascending id — independent of partitioning and engine.
    """
    assert max_tokens > 0 and n_shards > 0
    narrow = df.select(
        F.col(id_col).alias("id"),
        F.col(token_col).cast("long").alias("tokens"),
        (
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10)
            .cast("long") % n_shards
        ).alias("shard"),
    )

    schema = T.StructType(
        [
            narrow.schema["id"],
            T.StructField("tokens", T.LongType()),
            T.StructField("shard", T.LongType()),
            T.StructField("bin", T.LongType()),
            T.StructField("oversize", T.BooleanType()),
        ]
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("id", kind="stable").reset_index(drop=True)
        toks = pdf["tokens"].to_numpy()
        bins = []
        cur_bin, fill = 0, 0
        # next-fit scan; plain loop over the shard is fine — the shard is
        # the parallelism unit and each element is O(1)
        for t in toks:
            if fill > 0 and fill + t > max_tokens:
                cur_bin += 1
                fill = 0
            fill += int(t)
            bins.append(cur_bin)
        out = pdf[["id", "tokens", "shard"]].copy()
        out["bin"] = pd.Series(bins, dtype="int64")
        out["oversize"] = pdf["tokens"] > max_tokens
        return out

    return narrow.groupBy("shard").applyInPandas(pack, schema=schema)


def pack_stats(packed: DataFrame, max_tokens: int) -> DataFrame:
    """Per-(shard, bin) utilization — the packing-efficiency audit:
    (shard, bin, docs, tokens, fill_ratio). One aggregation."""
    return packed.groupBy("shard", "bin").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("tokens").alias("tokens"),
        (F.sum("tokens") / F.lit(float(max_tokens))).alias("fill_ratio"),
    )
