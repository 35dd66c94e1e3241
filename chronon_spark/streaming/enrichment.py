"""Stream enrichment: join a live event stream with feature values.

Reference: the JoinSourceRunner / streaming enrichment path — a streaming
GroupBy whose SOURCE is itself a Join: each incoming event is enriched
with the current feature values for its keys before further aggregation
(spark/.../streaming/JoinSourceRunner.scala; serving-side fetcher joins).

Spark-first shape: a STREAM-STATIC join — Structured Streaming natively
joins a streaming DataFrame against a batch DataFrame with no state store
and no watermark requirement; the static side is re-planned per
micro-batch, so a feature table refreshed by the batch pipeline (e.g. the
FinalBatchIr upload table, or any backfilled feature table) is picked up
as new files land. For point-in-time-correct enrichment against BATCH
outputs use the offline join (operators.asof_join); this operator is the
low-latency "latest known features" semantics of the online path.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    stream: DataFrame,
    features: DataFrame,
    keys: list,
    feature_cols: Optional[list] = None,
    how: str = "left",
) -> DataFrame:
    """Enrich each streaming event with the feature row for its keys.

    ``features`` must be a BATCH DataFrame (one row per key — e.g. the
    result of read_kv_table or a snapshot feature table). Returns a
    streaming DataFrame; every micro-batch re-reads the static side's
    source, so new feature files are visible without restarting the query.
    """
    assert stream.isStreaming, "stream side must be a streaming DataFrame"
    assert not features.isStreaming, "features side must be batch (stream-static join)"
    cols = feature_cols or [c for c in features.columns if c not in keys]
    feat = features.select(*keys, *cols)
    return stream.join(feat, on=keys, how=how)


def enrich_with_latest(
    stream: DataFrame,
    feature_log: DataFrame,
    keys: list,
    version_col: str,
    feature_cols: Optional[list] = None,
) -> DataFrame:
    """Enrichment against an UPSERT LOG (multiple versions per key):
    resolve latest-version-per-key first, then stream-static join — the
    KV-store multiGet semantics over the file-backed KV table
    (stream_groupby.run_untiled_upsert's output shape)."""
    from pyspark.sql import Window as W

    w = W.partitionBy(*keys).orderBy(F.col(version_col).desc())
    latest = (
        feature_log.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", version_col)
    )
    return enrich_stream(stream, latest, keys, feature_cols)
