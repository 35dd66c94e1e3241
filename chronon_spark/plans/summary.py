"""Per-partition feature summaries + drift series between two ranges.

Reference: spark/.../stats/drift/Summarizer.scala (per-tile summary
expressions: counts, null rates, moments, percentiles, histograms) and
stats/StatsCompute.scala:63-137 (daily summary aggregator + null-rate
derivation). The reference stores percentile SKETCHES; here the summary
is one groupBy over the partition column with exact interpolated
percentiles (F.percentile — order-independent and engine-portable) plus
stable moments, and the drift series is a self-join of the summary table
between a baseline and a current range — all pure Catalyst, one shuffle
on the (tiny) partition-column domain.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (T.LongType, T.IntegerType, T.ShortType, T.ByteType, T.DoubleType, T.FloatType)


def summarize(
    df: DataFrame,
    partition_col: str,
    columns: Optional[list] = None,
    percentiles: tuple = (0.1, 0.5, 0.9),
) -> DataFrame:
    """Long-format per-partition per-column summary:
    (ds, column, n_rows, null_count, null_rate, distinct, mean, variance,
    p10, p50, p90). Non-numeric columns get null moments/percentiles.

    One groupBy(partition_col) computes every column's stats in a single
    pass (map-side combined); the output is |partitions| x |columns| rows
    regardless of input size — safe to collect, plot, or diff.
    """
    cols = columns or [c for c in df.columns if c != partition_col]
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
        if isinstance(df.schema[c].dataType, _NUMERIC):
            d = F.col(c).cast("double")
            aggs.append(F.avg(d).alias(f"__mean_{c}"))
            # var_pop: Welford-based in Catalyst — stable at mu >> sigma
            aggs.append(F.var_pop(d).alias(f"__var_{c}"))
            for p in percentiles:
                aggs.append(
                    F.expr(f"percentile(CAST({c} AS DOUBLE), {p})").alias(
                        f"__p{int(p * 100)}_{c}"
                    )
                )
    wide = df.groupBy(F.col(partition_col).cast("string").alias("ds")).agg(*aggs)

    rows = []
    for c in cols:
        is_num = isinstance(df.schema[c].dataType, _NUMERIC)

        def num(name):
            return F.col(name) if is_num else F.lit(None).cast("double")

        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n_rows"),
                F.col(f"__nulls_{c}").cast("long").alias("null_count"),
                (F.col(f"__nulls_{c}") / F.col("__n")).alias("null_rate"),
                F.col(f"__dist_{c}").cast("long").alias("n_distinct"),
                num(f"__mean_{c}").alias("mean"),
                num(f"__var_{c}").alias("variance"),
                *[
                    num(f"__p{int(p * 100)}_{c}").alias(f"p{int(p * 100)}")
                    for p in percentiles
                ],
            )
        )
    return wide.select("ds", F.explode(F.array(*rows)).alias("s")).select("ds", "s.*")


def drift_series(
    df: DataFrame,
    partition_col: str,
    baseline: tuple,
    current: tuple,
    columns: Optional[list] = None,
) -> DataFrame:
    """Distribution drift of each column between two ds ranges.

    ``baseline``/``current`` are inclusive (start, end) ds-string ranges.
    Each side is summarized as ONE aggregated distribution (not per-day),
    then joined per column: mean / null-rate / median shifts plus the
    normalized mean shift |mean_c - mean_b| / sqrt(var_b) (a z-score-like
    magnitude, the cheap stand-in for the reference's sketch-based
    distribution distances).
    """
    ds = F.col(partition_col).cast("string")

    def side(rng, name):
        part = df.where((ds >= rng[0]) & (ds <= rng[1])).withColumn(
            "__side", F.lit(name)
        )
        return summarize(part, "__side", columns)

    b = side(baseline, "baseline").drop("ds")
    c = side(current, "current").drop("ds")
    bb = b.select(
        "column",
        *[F.col(x).alias(f"b_{x}") for x in b.columns if x != "column"],
    )
    cc = c.select(
        "column",
        *[F.col(x).alias(f"c_{x}") for x in c.columns if x != "column"],
    )
    out = bb.join(cc, on="column", how="full")
    return out.select(
        "column",
        F.col("b_n_rows").alias("baseline_rows"),
        F.col("c_n_rows").alias("current_rows"),
        (F.col("c_null_rate") - F.col("b_null_rate")).alias("null_rate_shift"),
        (F.col("c_mean") - F.col("b_mean")).alias("mean_shift"),
        (F.col("c_p50") - F.col("b_p50")).alias("median_shift"),
        F.when(
            F.col("b_variance") > 0,
            F.abs(F.col("c_mean") - F.col("b_mean")) / F.sqrt(F.col("b_variance")),
        ).alias("normalized_mean_shift"),
    )
