"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023).

Selects raw-corpus documents that look like a TARGET domain by importance
weighting under hashed-n-gram unigram models:

    log w(d) = sum over d's hashed features f of
                 c_{d,f} * [ln p_target(f) - ln q_raw(f)]

with add-one smoothing over the ``dim`` hash buckets. The standard
recipe for "give me CC data that looks like Wikipedia/books" selection.

Engine-exact determinism: the per-bucket log-ratio is quantized to 1e-6
units (``floor(x * 1e6 + 0.5)`` — same pattern as textstats'
unigram_logprob_score), so each doc's log-weight is an INTEGER sum of
(count x quantized-ratio) products: order-independent, partition-
invariant, and bit-identical to a DuckDB oracle.

Scale story (100 TB raw corpus): feature extraction is one explode +
groupBy pass over each corpus (map-side combined); the bucket-ratio table
is at most ``dim`` rows (default 10k) and rides a broadcast join; the
per-doc weight is one more map-side-combined aggregation. Nothing scans
the raw corpus more than twice (count pass + weight pass), and the target
corpus — typically orders smaller — once.

Features are md5-hashed word n-grams (n=2 default, per the paper), the
same engine-portable 60-bit md5 trick dedup.py uses.

The reference has no data-selection surface; this is a
training-data-pipeline extension alongside quality_classifier (supervised
distillation) and unigram_logprob (perplexity filtering) — DSIR covers
the "match a target distribution" selection mode both of those lack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MICRO = 1_000_000


def _norm_text(col: str):
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def _words(text_col: str):
    return F.split(_norm_text(text_col), " ")


def hashed_ngram_features(
    df: DataFrame, id_col: str, text_col: str = "text", n: int = 2, dim: int = 10_000
):
    """(id, f, c): md5-hashed word-n-gram bucket counts per document.

    n-grams built with the zip_with-against-shifted-slice formulation
    (one linear pass — the measured Catalyst HOF lesson in BASELINE.md),
    joined with a separator that cannot appear inside normalized words.
    """
    w = _words(text_col)
    if n == 1:
        grams = F.filter(w, lambda t: t != "")
    else:
        gram_col = w
        for k in range(1, n):
            shifted = F.slice(w, F.lit(k + 1), F.greatest(F.size(w) - k, F.lit(0)))
            gram_col = F.zip_with(
                F.slice(gram_col, F.lit(1), F.greatest(F.size(w) - k, F.lit(0))),
                shifted,
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        grams = gram_col
    g = F.explode(grams).alias("g")
    return (
        df.select(F.col(id_col).alias("id"), g)
        .where(F.col("g") != "")
        .select(
            "id",
            (F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long") % dim).alias(
                "f"
            ),
        )
        .groupBy("id", "f")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _bucket_totals(feats: DataFrame) -> DataFrame:
    """(f, n): corpus-level bucket counts from a per-doc feature frame."""
    return feats.groupBy("f").agg(F.sum("c").alias("n"))


def log_ratio_table(
    raw_feats: DataFrame, target_feats: DataFrame, dim: int = 10_000
) -> DataFrame:
    """(f, q): quantized ln p_target(f) - ln q_raw(f), add-one smoothed.

    q = floor((ln((tc+1)/(T+dim)) - ln((rc+1)/(R+dim))) * 1e6 + 0.5) —
    a <= dim-row frame, meant to be broadcast.
    """
    t = _bucket_totals(target_feats).withColumnRenamed("n", "tc")
    r = _bucket_totals(raw_feats).withColumnRenamed("n", "rc")
    # totals as 1-row cross join (computed once, Catalyst scalar)
    tot = t.agg(F.sum("tc").alias("T")).crossJoin(r.agg(F.sum("rc").alias("R")))
    joined = (
        t.join(r, "f", "full_outer")
        .select(
            "f",
            F.coalesce(F.col("tc"), F.lit(0)).alias("tc"),
            F.coalesce(F.col("rc"), F.lit(0)).alias("rc"),
        )
        .crossJoin(F.broadcast(tot))
    )
    ratio = F.log((F.col("tc") + 1) / (F.col("T") + dim)) - F.log(
        (F.col("rc") + 1) / (F.col("R") + dim)
    )
    return joined.select(
        "f", F.floor(ratio * MICRO + F.lit(0.5)).cast("long").alias("q")
    )


def dsir_log_weights(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str = "text",
    n: int = 2,
    dim: int = 10_000,
) -> DataFrame:
    """(id, n_feats, log_w_micro): per-raw-doc importance log-weight in
    1e-6 units (BIGINT — exact), plus the doc's feature mass.

    Buckets absent from BOTH corpora contribute the same smoothed ratio a
    present-in-neither bucket would — but no document references them, so
    only observed buckets matter (the full_outer join covers every
    referenced bucket).
    """
    raw_feats = hashed_ngram_features(raw, id_col, text_col, n, dim)
    target_feats = hashed_ngram_features(target, id_col, text_col, n, dim)
    ratios = log_ratio_table(raw_feats, target_feats, dim)
    return (
        raw_feats.join(F.broadcast(ratios), "f")
        .groupBy("id")
        .agg(
            F.sum("c").alias("n_feats"),
            F.sum(F.col("c") * F.col("q")).alias("log_w_micro"),
        )
    )


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    id_col: str,
    text_col: str = "text",
    keep_fraction: float = 0.25,
    n: int = 2,
    dim: int = 10_000,
) -> DataFrame:
    """Deterministic top-fraction selection by importance weight
    (ties broken by id — reproducible across runs and partitionings).

    The paper resamples with Gumbel noise; for an engine gate the
    deterministic top-k variant is the right contract (noisy resampling
    is one extra seeded-hash column away).

    Selection rides ``sampling.global_top_k`` (range-partitioned exact
    top-k) — a plain ``orderBy().limit(k)`` would TakeOrdered k x P rows
    onto the driver, and k here is a CORPUS FRACTION."""
    from chronon_spark.operators.sampling import global_top_k

    weights = dsir_log_weights(raw, target, id_col, text_col, n, dim)
    k = max(int(raw.count() * keep_fraction), 1)
    top = global_top_k(
        weights, k, [("log_w_micro", True), ("id", False)]
    ).select(F.col("id").alias(id_col))
    return raw.join(top, id_col)
