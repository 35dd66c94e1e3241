"""Deterministic sampling for training-data pipelines.

Spark's ``df.sample``/``sampleBy`` are seed-dependent on PARTITIONING
(Bernoulli per split), so two runs over differently-partitioned input
disagree — unacceptable for reproducible dataset curation. These ops hash
the row ID instead: membership is a pure function of (seed, id), stable
across partitionings, engines, and re-runs, and mirrorable in SQL
oracles bit-for-bit.

Scale shape: every op is a narrow filter or a single window — no
collects, no extra shuffles beyond the stated ones.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

_BUCKETS = 1_000_000


def _hash_bucket(id_col: str, seed: int) -> Column:
    """Deterministic uniform bucket in [0, 1e6) from md5(seed:id) — the
    same construction the dedup/similarity ops use for portable hashing."""
    h = F.md5(F.concat_ws(":", F.lit(str(seed)), F.col(id_col).cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("long") % _BUCKETS


def hash_sample(
    df: DataFrame,
    fraction: float,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row id (narrow filter —
    pushes past shuffles, repeatable across runs and engines)."""
    assert 0.0 <= fraction <= 1.0
    return df.where(_hash_bucket(id_col, seed) < int(fraction * _BUCKETS))


def stratified_sample(
    df: DataFrame,
    key_col: str,
    fractions: Union[float, dict],
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Per-stratum deterministic sampling (Spark ``sampleBy`` semantics,
    hash-stable): ``fractions`` is one float for every key or a
    {key: fraction} map (keys absent from the map keep fraction 0 — same
    contract as sampleBy)."""
    b = _hash_bucket(id_col, seed)
    if isinstance(fractions, dict):
        expr = F.lit(0.0)
        for k, frac in fractions.items():
            expr = F.when(F.col(key_col) == F.lit(k), F.lit(float(frac))).otherwise(expr)
    else:
        expr = F.lit(float(fractions))
    return df.where(b < (expr * _BUCKETS).cast("long"))


def top_k_per_key(
    df: DataFrame,
    key_col: str,
    k: int,
    id_col: str,
    seed: Optional[int] = 42,
    order_col: Optional[str] = None,
) -> DataFrame:
    """Exactly min(k, n) rows per key. With ``order_col`` the BEST k by
    that column (quality-score selection); otherwise a uniform draw via
    the hash order (deterministic reservoir-sample equivalent). One
    shuffle on the key; ties broken by id for stability."""
    if order_col is not None:
        order = [F.col(order_col).desc(), F.col(id_col).asc()]
    else:
        order = [_hash_bucket(id_col, seed or 42).asc(), F.col(id_col).asc()]
    w = W.partitionBy(key_col).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def rebalance_sample(
    df: DataFrame,
    key_col: str,
    target_weights: dict,
    id_col: str,
    seed: int = 42,
) -> DataFrame:
    """Downsample toward a target group mix (domain/language rebalancing —
    the standard pretraining-mix knob).

    ``target_weights``: {key: relative weight}; keys absent from the map
    are DROPPED (explicit mix = explicit membership). The acceptance
    fraction per key is scaled so the most-underrepresented kept group
    passes whole (fraction 1.0) and every other group is hash-downsampled
    to match the target RATIOS — downsample-only, no duplication, so the
    output is the largest subset of the input with the target mix.

    Two passes: one map-side-combined count per key (tiny result), then
    one narrow hash filter. Deterministic for fixed (seed, id).
    """
    counts = {r[0]: r[1] for r in df.groupBy(key_col).count().collect()
              if r[0] in target_weights}
    if not counts:
        return df.where(F.lit(False))
    # fraction_k ∝ target_k / count_k, scaled so max fraction == 1
    raw = {k: target_weights[k] / counts[k] for k in counts}
    scale = 1.0 / max(raw.values())
    fractions = {k: min(1.0, v * scale) for k, v in raw.items()}
    return stratified_sample(df, key_col, fractions, id_col, seed)
