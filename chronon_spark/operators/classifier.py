"""Distributed quality-classifier training: integer-exact batch perceptron.

Modern corpus curation distills cheap heuristics (or a small set of human
labels) into a linear classifier over hashed bag-of-words features and
scores every document with it (the fastText-quality-filter recipe used by
CCNet/LLaMA-style pipelines). This module implements the TRAINING side as
a batch-parallel perceptron whose every update is integer arithmetic:

    epoch t:  score(d) = sum_f w[f] * c[d,f]          (w integer, c integer)
              misclassified: y(d) * score(d) <= 0
              w[f] += sum over misclassified d of y(d) * c[d,f]

Batch (not per-sample) updates make the algorithm order-independent and
partition-invariant — the same property that makes it expressible as an
unrolled SQL oracle and bit-identical across engines. No floats anywhere.

Scale story (100 TB corpus): the feature table is ONE explode+groupBy pass
over the corpus, persisted; each epoch is a broadcast join of the (tiny,
<= dim rows) weight vector against it plus one map-side-combined shuffle
on the feature id. Weights live on the driver between epochs (dim * 8
bytes — 8 MB at dim=1M). Epoch count is fixed and small; nothing iterates
over the corpus more than epochs+1 times.

The reference has no model training (its ModelTransforms is inference
only — ModelTransformsJob.scala); this is a training-data-pipeline
extension feeding the same model_transforms scoring path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _norm_text(col: str):
    return F.regexp_replace(F.lower(F.trim(F.col(col))), r"\s+", " ")


def _gram_array(text_col: str, ngrams: int):
    """Array of unigram..n-gram strings of the normalized token stream —
    the fastText feature set (word n-grams hashed into one bucket space).
    Pure Catalyst HOFs: slice + zip_with concat per order, one array."""
    toks = F.filter(F.split(_norm_text(text_col), " "), lambda t: t != "")
    out = toks
    for n in range(2, ngrams + 1):
        grams = toks
        for i in range(1, n):
            n_keep = F.greatest(F.size(toks) - i, F.lit(0))
            grams = F.zip_with(
                F.slice(grams, 1, n_keep),
                F.slice(toks, i + 1, n_keep),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        out = F.concat(out, grams)
    return out


def hashed_features(
    df: DataFrame, id_col: str, text_col: str = "text", dim: int = 256,
    ngrams: int = 1,
) -> DataFrame:
    """(id, f, c): engine-portable hashed bag-of-words counts.

    f = (first 15 hex chars of md5(gram) as int) % dim — the same
    md5-60-bit trick dedup.py uses, so a DuckDB oracle computes identical
    buckets. ``ngrams > 1`` adds fastText-style word n-gram features
    (hashed into the same dim-bucket space, the standard trick). One
    corpus pass: explode + count groupBy (map-side combined).
    """
    tok = F.explode(_gram_array(text_col, ngrams)).alias("tok")
    return (
        df.select(F.col(id_col).alias("id"), tok)
        .select(
            "id",
            (
                F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long") % dim
            ).alias("f"),
        )
        .groupBy("id", "f")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def batch_perceptron(
    spark: SparkSession,
    feats: DataFrame,
    labels: DataFrame,
    epochs: int = 3,
) -> dict:
    """Train; returns {feature_id: integer_weight}.

    ``feats``: (id, f, c) — persist it yourself if you pass a non-trivial
    plan; this function scans it epochs times.
    ``labels``: (id, y) with y in {+1, -1}.
    """
    weights: dict = {}
    for _ in range(epochs):
        if weights:
            wdf = spark.createDataFrame(
                [(int(f), int(w)) for f, w in sorted(weights.items())], "f long, w long"
            )
            scored = (
                feats.join(F.broadcast(wdf), "f", "left")
                .groupBy("id")
                .agg(F.sum(F.coalesce(F.col("w"), F.lit(0)) * F.col("c")).alias("s"))
            )
            # docs with no features score 0 (left join from labels)
            mis = (
                labels.join(scored, "id", "left")
                .where(F.col("y") * F.coalesce(F.col("s"), F.lit(0)) <= 0)
                .select("id", "y")
            )
        else:
            # epoch 0: all scores are 0 => every doc is misclassified
            mis = labels.select("id", "y")
        delta = (
            feats.join(mis, "id")
            .groupBy("f")
            .agg(F.sum(F.col("y") * F.col("c")).alias("d"))
            .collect()
        )
        if not delta:
            break
        for r in delta:
            weights[int(r["f"])] = weights.get(int(r["f"]), 0) + int(r["d"])
        weights = {f: w for f, w in weights.items() if w != 0}
    return weights


def perceptron_scores(
    spark: SparkSession, feats: DataFrame, labels: DataFrame, weights: dict
) -> DataFrame:
    """(id, y, score, pred) under the trained weights; pred in {+1,-1}
    (score 0 -> -1, matching the training-time misclassification rule)."""
    if weights:
        wdf = spark.createDataFrame(
            [(int(f), int(w)) for f, w in sorted(weights.items())], "f long, w long"
        )
        scored = (
            feats.join(F.broadcast(wdf), "f")
            .groupBy("id")
            .agg(F.sum(F.col("w") * F.col("c")).alias("score"))
        )
    else:
        scored = feats.select("id").distinct().withColumn("score", F.lit(0).cast("long"))
    return (
        labels.join(scored, "id", "left")
        .select(
            "id",
            "y",
            F.coalesce(F.col("score"), F.lit(0)).cast("long").alias("score"),
            F.when(F.coalesce(F.col("score"), F.lit(0)) > 0, F.lit(1))
            .otherwise(F.lit(-1))
            .cast("int")
            .alias("pred"),
        )
    )


def scoring_expr(weights: dict, text_col: str = "text", dim: int = 256,
                 ngrams: int = 1):
    """Pure-expression scorer under trained weights: the DEPLOY-side twin
    of batch_perceptron. The weight map rides as a literal (sorted for
    plan determinism), the token fold is a Catalyst `aggregate` HOF — no
    shuffle, no join, no Python — so the same distilled model that
    trained offline scores rows in a `readStream` pipeline or a serving
    projection unchanged.

    Size note: a literal map holds fine to a few thousand entries
    (perceptron weights are dim-bounded and zero-pruned); for 1M-feature
    models use perceptron_scores' broadcast join instead.
    """
    if not weights:
        return F.lit(0).cast("long")
    m = F.create_map(
        *[
            F.lit(v).cast("long")
            for f, w in sorted(weights.items())
            for v in (int(f), int(w))
        ]
    )
    toks = _gram_array(text_col, ngrams)
    return F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: acc
        + F.coalesce(
            F.element_at(
                m, F.conv(F.substring(F.md5(t), 1, 15), 16, 10).cast("long") % dim
            ),
            F.lit(0).cast("long"),
        ),
    )


def quality_classifier(
    spark: SparkSession,
    df: DataFrame,
    id_col: str,
    label_expr: str,
    text_col: str = "text",
    dim: int = 256,
    epochs: int = 3,
) -> DataFrame:
    """End-to-end distillation: hash features once, train, score every doc.

    ``label_expr``: SQL expression over the input columns evaluating to
    +1/-1 (the heuristic being distilled, e.g.
    ``IF(lang = 'en' AND length(text) > 200, 1, -1)``).
    Returns (id, y, score, pred) — integer columns only.
    """
    feats = hashed_features(df, id_col, text_col, dim).persist()
    labels = df.select(
        F.col(id_col).alias("id"), F.expr(label_expr).cast("int").alias("y")
    )
    try:
        w = batch_perceptron(spark, feats, labels, epochs)
        return perceptron_scores(spark, feats, labels, w)
    finally:
        # lazily unpersist: the returned plan still references feats; Spark
        # recomputes if evicted, correctness unaffected
        feats.unpersist(blocking=False)
