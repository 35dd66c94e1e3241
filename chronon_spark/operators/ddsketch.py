"""Mergeable approx-percentile IRs: a DDSketch-style log histogram.

Reference parity: the reference keeps KLL/CPC sketches inside GroupBy IRs
so percentile features survive partial aggregation and the lambda merge
(aggregator/.../ApproxPercentiles; Flink tiles carry the same sketches).
Spark has no public mergeable quantile-sketch COLUMN, so this module uses
the published DDSketch construction (Masson et al., VLDB 2019): bucket
index i = ceil(log_gamma(x)) with gamma = (1+alpha)/(1-alpha) gives a
RELATIVE-error guarantee |q_est - q_true| <= alpha * q_true for positive
values; zero and negatives get dedicated sign buckets (log on |x|).

The IR is just (bucket:int, count:long) rows — mergeable by SUM, which
makes it:
- a streaming tile payload (`groupBy(window, keys, bucket).count()` is a
  single streaming aggregation),
- a hopped-path payload (window-sum over hop frames per bucket),
- trivially unionable across batch ⊕ stream for the lambda merge.

Everything here is pure Catalyst (bucketing is one log + ceil per row);
quantile EXTRACTION folds the per-key bucket map on the driver-side-free
path via higher-order functions.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_ALPHA = 0.01

# sign buckets: positive values use i >= 1 offsets (shifted by +Z), zero
# uses Z, negatives use Z - i (mirrored); Z big enough to keep ints >= 0
_Z = 1 << 20


def gamma_of(alpha: float) -> float:
    return (1.0 + alpha) / (1.0 - alpha)


def bucket_expr(col, alpha: float = DEFAULT_ALPHA) -> Column:
    """DDSketch bucket index of a numeric column (null-safe)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("double")
    g = gamma_of(alpha)
    lg = math.log(g)
    pos = F.ceil(F.log(F.abs(c)) / F.lit(lg)).cast("long")
    return (
        F.when(c.isNull(), F.lit(None).cast("long"))
        .when(c == 0.0, F.lit(_Z))
        .when(c > 0.0, F.lit(_Z) + pos)
        .otherwise(F.lit(_Z) - pos - F.lit(1))  # negatives mirrored below zero bucket
    )


def bucket_value(bucket, alpha: float = DEFAULT_ALPHA) -> Column:
    """Representative value of a bucket (midpoint estimator 2g^i/(g+1))."""
    b = (F.col(bucket) if isinstance(bucket, str) else bucket).cast("double")
    g = gamma_of(alpha)
    lg = math.log(g)
    pos_val = F.exp((b - _Z) * lg) * (2.0 * g / (g + 1.0)) / g
    neg_val = -F.exp((_Z - 1 - b) * lg) * (2.0 * g / (g + 1.0)) / g
    return (
        F.when(b == _Z, F.lit(0.0))
        .when(b > _Z, pos_val)
        .otherwise(neg_val)
    )


def sketch_aggregate(
    df: DataFrame,
    keys: list,
    value_col: str,
    alpha: float = DEFAULT_ALPHA,
) -> DataFrame:
    """(keys..., bucket, count) IR rows — ONE aggregation, streaming-legal
    when ``df`` is a stream already grouped by a time window upstream."""
    return (
        df.withColumn("bucket", bucket_expr(value_col, alpha))
        .where(F.col("bucket").isNotNull())
        .groupBy(*keys, "bucket")
        .agg(F.count(F.lit(1)).alias("count"))
    )


def merge_sketches(ir: DataFrame, keys: list) -> DataFrame:
    """Merge IR rows across any extra dimensions (tiles, sources, batch ⊕
    stream) down to per-key sketches: plain SUM per (keys, bucket)."""
    return ir.groupBy(*keys, "bucket").agg(F.sum("count").alias("count"))


def quantiles_from_sketch(
    ir: DataFrame,
    keys: list,
    qs: list,
    alpha: float = DEFAULT_ALPHA,
    prefix: str = "p",
) -> DataFrame:
    """Extract quantiles per key from (keys, bucket, count) rows.

    One groupBy collects each key's (bucket,count) pairs (bounded:
    <= ~2*log_gamma(max/min) buckets per key regardless of row count),
    sorts by bucket, walks the cumulative histogram with higher-order
    functions — no Python, no driver collect.
    """
    pairs = ir.groupBy(*keys).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("bucket"), F.col("count")))
        ).alias("hist"),
        F.sum("count").alias("__n"),
    )
    out = pairs
    for q in qs:
        # rank of the q-quantile (lower interpolation on counts)
        rank = F.ceil(F.col("__n").cast("double") * F.lit(float(q)))
        rank = F.greatest(rank, F.lit(1)).cast("long")
        # cumulative walk: find first bucket whose running count >= rank.
        # aggregate keeps (remaining_rank, found_bucket)
        found = F.aggregate(
            F.col("hist"),
            F.struct(rank.alias("rem"), F.lit(None).cast("long").alias("bkt")),
            lambda acc, x: F.when(
                acc["bkt"].isNotNull(), acc
            ).otherwise(
                F.when(
                    x["count"] >= acc["rem"],
                    F.struct(F.lit(0).cast("long").alias("rem"), x["bucket"].alias("bkt")),
                ).otherwise(
                    F.struct((acc["rem"] - x["count"]).alias("rem"),
                             F.lit(None).cast("long").alias("bkt"))
                )
            ),
        )["bkt"]
        out = out.withColumn(
            f"{prefix}{int(q * 100)}", bucket_value(found, alpha)
        )
    return out.drop("hist", "__n")
