"""Bucketed KV store: point-lookup serving layout for the batch IR table.

Reference: the online module's KV store contract (``online/src/main/
scala/ai/chronon/online/Api.scala`` KVStore.multiGet/multiPut) answers
per-key point reads of the FinalBatchIr rows that ``GroupByUpload``
wrote (``spark/.../GroupByUpload.scala:64-130``). The offline stand-in
so far (``plans/upload.py``) materializes the IR table but a lookup of
k keys still scanned the whole table.

Spark-first upgrade — no external store, the *layout* is the index:

- ``write_kv_table`` writes the upload frame ``bucketBy(N, __kv_key)``
  (one synthetic string bucket column — Spark prunes buckets only for a
  single bucket column) and in-bucket sorted by ``(__kv_key, __hop)``.
- ``kv_lookup`` filters with literal keys (``IN``-set on the bucket
  column), so FileSourceScan prunes to the buckets those keys hash to —
  ``explain`` shows ``SelectedBucketsCount: b out of N`` — instead of
  reading all N buckets. A replay of a serving-traffic day over a
  10^12-key upload table reads O(distinct request keys / N) of it.
- ``fetch_group_by_kv`` = kv_lookup + the lambda merge
  (``plans/fetcher.fetch_group_by``): batch IRs from the pruned scan,
  heads from fresh events — identical results to serving from the full
  upload table, which the test pins.

Dispatch: literal-``IN`` pruning needs the distinct request keys on the
driver. That is the *definition* of a point-lookup batch (the reference
fetcher receives the keys in the request), but for bulk scoring the
request set can be corpus-sized, so ``kv_lookup`` auto-falls back to a
broadcast left-semi join on ``__kv_key`` above ``max_point_keys``
distinct keys — one pass, no driver materialization, no prune.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.api.types import GroupBy, validate_identifier
from chronon_spark.plans.upload import upload_group_by

KV_KEY = "__kv_key"
_SEP = "\x01"  # never appears in key values produced by our sources

# IN-literal prune vs semi-join fallback boundary: literal sets beyond
# this would bloat the plan (one literal each) and the driver collect.
DEFAULT_MAX_POINT_KEYS = 10_000


_NULL_SENTINEL = "\x00"  # concat_ws SKIPS nulls: ('a', NULL) and
# (NULL, 'a') would otherwise both encode to 'a' and collide


def kv_key_col(key_columns: Sequence[str]) -> F.Column:
    return F.concat_ws(
        _SEP,
        *[
            F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL))
            for c in key_columns
        ],
    )


def kv_key_of(values: Sequence) -> str:
    """Driver-side twin of :func:`kv_key_col` for literal request keys —
    same NULL sentinel, so both sides encode identically."""
    return _SEP.join(_NULL_SENTINEL if v is None else str(v) for v in values)


def write_kv_table(
    spark: SparkSession,
    group_by: GroupBy,
    batch_end_ms: int,
    hop_ms: int,
    table: Optional[str] = None,
    num_buckets: int = 64,
    upload: Optional[DataFrame] = None,
) -> str:
    """Materialize the FinalBatchIr upload as a bucketed warehouse table.

    ``num_buckets`` sizes the prune granularity: at production scale use
    O(cluster cores × a few) so a point batch touches few buckets while
    bulk scans still parallelize. Overwrites any previous upload (the
    upload is a pure function of (group_by, batch_end) — idempotent).
    """
    table = table or f"kv_{validate_identifier(group_by.name)}"
    if upload is None:
        upload = upload_group_by(spark, group_by, batch_end_ms, hop_ms)
    from chronon_spark.plans.clustered import drop_managed_table

    drop_managed_table(spark, table)
    (
        upload.withColumn(KV_KEY, kv_key_col(group_by.key_columns))
        .write.bucketBy(num_buckets, KV_KEY)
        .sortBy(KV_KEY, "__hop")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(table)
    )
    return table


def kv_lookup(
    spark: SparkSession,
    table: str,
    requests: DataFrame,
    key_columns: Sequence[str],
    max_point_keys: int = DEFAULT_MAX_POINT_KEYS,
) -> DataFrame:
    """IR rows of the request keys only, bucket-pruned when possible.

    ``requests`` needs the ``key_columns``; everything else is ignored.
    ≤ ``max_point_keys`` distinct keys → literal ``IN`` filter on the
    bucket column (prunes buckets; the collect is bounded by the same
    constant). Above it → broadcast left-semi join (bulk path).
    """
    # DisableUnnecessaryBucketedScan turns bucket-aware scanning off when
    # no operator exploits the bucketing — which also drops bucket
    # PRUNING, the whole point of this layout. Runtime-settable; only
    # bucketed-table scans are affected, and the only bucketed tables in
    # this engine are KV uploads.
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    kv = spark.table(table)
    req_keys = requests.select(
        kv_key_col(key_columns).alias(KV_KEY)
    ).distinct()
    head = req_keys.limit(max_point_keys + 1).collect()
    if len(head) <= max_point_keys:
        literals = [r[KV_KEY] for r in head]
        return kv.where(F.col(KV_KEY).isin(literals))
    return kv.join(F.broadcast(req_keys), on=KV_KEY, how="left_semi")


def fetch_group_by_kv(
    spark: SparkSession,
    group_by: GroupBy,
    requests: DataFrame,
    batch_end_ms: int,
    hop_ms: int,
    table: str,
    fresh_events: Optional[DataFrame] = None,
    max_point_keys: int = DEFAULT_MAX_POINT_KEYS,
) -> DataFrame:
    """Serve ``requests`` from the bucketed KV table: pruned IR lookup ⊕
    fresh events via the lambda merge. Result ≡ ``fetch_group_by`` with
    the full upload frame (pinned in tests) — the prune only narrows the
    batch-side scan."""
    from chronon_spark.plans.fetcher import fetch_group_by

    irs = kv_lookup(
        spark, table, requests, list(group_by.key_columns), max_point_keys
    ).drop(KV_KEY)
    return fetch_group_by(
        spark,
        group_by,
        requests,
        batch_end_ms,
        hop_ms,
        upload=irs,
        fresh_events=fresh_events,
    )
