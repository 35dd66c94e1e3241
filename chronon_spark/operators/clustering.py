"""Embedding clustering for corpus curation: distributed Lloyd's k-means
and SemDeDup-style within-cluster semantic dedup.

Why it's here: modern curation pipelines cluster document embeddings to
(a) drop semantic near-duplicates cluster-locally instead of all-pairs
(SemDeDup — Abbas et al. 2023, arXiv:2303.09540) and (b) balance topic
mix. The reference engine has no clustering operator; this is part of the
training-data surface built on the same oracle discipline.

Design for scale (the Spark-MLlib shape, re-derived):
- centroids are TINY (k x dim doubles) — they live on the driver and are
  broadcast into the assignment expression as literal arrays, so the
  per-iteration hot path is ONE projection over the corpus with zero
  joins and zero Python,
- the centroid update is posexplode -> groupBy(cell, pos).sum — map-side
  partial aggregation reduces each partition to k*dim rows before the
  (only) shuffle,
- per-iteration driver traffic is k*dim longs — independent of corpus
  size.

Cross-engine determinism (the DuckDB oracle replays every iteration):
- vectors are quantized ONCE to integer 1e-6 units (floor(x*1e6+0.5) as
  BIGINT), so centroid-update sums are exact integer arithmetic —
  order-independent, partitioning-independent,
- assignment ranks by cosine ROUNDED to 1e-6 with a smallest-cell
  tie-break, so float noise below the quantum can't flip assignments,
- cosine is scale-invariant, so quantized units never need rescaling.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chronon_spark.operators.similarity import dot, norm

Q = 1_000_000  # quantization: 1e-6 embedding units


def quantize(vec_col: str = "embedding") -> Column:
    """array<long> of 1e-6-unit components (portable floor(x*1e6+0.5))."""
    return F.transform(
        F.col(vec_col),
        lambda x: F.floor(x.cast("double") * Q + F.lit(0.5)).cast("long"),
    )


def _r6(c: Column) -> Column:
    return F.floor(c * Q + F.lit(0.5)) / Q


def _py_norm(v: list[float]) -> float:
    import math

    return math.sqrt(sum(x * x for x in v))


def _cosine_to(qv: Column, qn: Column, centroid: list[float]) -> Column:
    """Cosine against a literal centroid. The centroid's norm is folded in
    Python (exact same double arithmetic as the engines' sequential
    sum-of-squares over the literal values) and the row's norm ``qn`` is
    computed ONCE by the caller — the naive form re-ran both fold
    expressions per centroid per row (measured 3x slower assignment)."""
    cv = F.array(*[F.lit(float(v)) for v in centroid])
    return dot(qv, cv) / (qn * F.lit(_py_norm(centroid)))


def assign_expr(
    centroids: list[list[float]], qv_col: str = "qv", qn_col: str = "qn"
) -> Column:
    """cell id of the nearest centroid: argmax of 1e-6-rounded cosine,
    ties to the smallest cell id. Pure expression over literal centroids;
    requires a pre-projected ``qn`` = norm(qv) column."""
    qv, qn = F.col(qv_col), F.col(qn_col)
    scored = F.array(
        *[
            F.struct(
                _r6(_cosine_to(qv, qn, c)).alias("score"),
                F.lit(-cell).alias("negcell"),
            )
            for cell, c in enumerate(centroids)
        ]
    )
    best = F.array_max(scored)
    return (-best["negcell"]).cast("long")


def kmeans_fit(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd's k-means; returns the final centroids (k lists of doubles,
    in quantized units — cosine users never rescale).

    Init: the k corpus vectors with smallest md5(id) — a deterministic
    uniform pseudo-random draw, NOT the lowest ids (generation-order
    correlation quantizes poorly; same rationale as similarity.ivf_topk).
    Iteration: assign (literal-centroid projection) -> exact integer
    per-(cell, dim) sums -> driver mean. Empty cells keep their previous
    centroid.
    """
    from chronon_spark.operators.dedup import ensure_parallelism

    qdf = (
        ensure_parallelism(corpus)
        .select(F.col(id_col).alias("id"), quantize(vec_col).alias("qv"))
        .withColumn("qn", norm("qv"))
        .persist()
    )
    init = (
        qdf.orderBy(F.md5(F.col("id").cast("string")).asc())
        .limit(k)
        .select("qv")
        .collect()
    )
    centroids = [[float(x) for x in r["qv"]] for r in init]
    dim = len(centroids[0])
    for _ in range(iters):
        assigned = qdf.select("qv", assign_expr(centroids).alias("cell"))
        # per-(cell, dim) sums as dim plain SUM aggregates (map-side
        # combined -> k*(dim+1) longs cross the wire) — a posexplode would
        # shuffle n*dim rows AND blow the per-row cell expression up by
        # the explode factor
        sums = (
            assigned.groupBy("cell")
            .agg(
                F.count(F.lit(1)).alias("n"),
                *[
                    F.sum(F.element_at("qv", p + 1)).alias(f"s{p}")
                    for p in range(dim)
                ],
            )
            .collect()
        )
        by_cell = {r["cell"]: r for r in sums}
        centroids = [
            [by_cell[cell][f"s{p}"] / by_cell[cell]["n"] for p in range(dim)]
            if cell in by_cell
            else centroids[cell]
            for cell in range(k)
        ]
    qdf.unpersist()
    return centroids


def kmeans_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, cell, sim): nearest-centroid assignment + 1e-6-rounded cosine."""
    from chronon_spark.operators.dedup import ensure_parallelism

    qdf = (
        ensure_parallelism(corpus)
        .select(F.col(id_col).alias("id"), quantize(vec_col).alias("qv"))
        .withColumn("qn", norm("qv"))
    )
    assigned = qdf.select("id", "qv", "qn", assign_expr(centroids).alias("cell"))
    sims = F.array(
        *[_r6(_cosine_to(F.col("qv"), F.col("qn"), c)) for c in centroids]
    )
    return assigned.select(
        "id",
        "cell",
        F.element_at(sims, F.col("cell").cast("int") + 1).alias("sim"),
    )


def kmeans_cluster(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """fit + assign in one call -> (id, cell, sim)."""
    cents = kmeans_fit(corpus, k, iters, id_col, vec_col)
    return kmeans_assign(corpus, cents, id_col, vec_col)


def semdedup_pairs(
    corpus: DataFrame,
    k: int = 8,
    iters: int = 3,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_cluster: int = 100_000,
) -> DataFrame:
    """SemDeDup: semantic near-dup pairs found WITHIN k-means clusters
    only -> (id_a, id_b, cell, cosine) with id_a < id_b.

    The cluster blocks turn the O(n^2) cosine join into k within-cluster
    joins (expected O(n^2/k) pairs scored for balanced clusters); at
    10^9 docs k scales to ~sqrt(n) cells so each block stays bounded.
    ``max_cluster`` drops degenerate blocks (same polarity as the LSH
    bucket caps: broadcast the OVERSIZED cell list, anti-join). Compose
    with dedup.duplicate_clusters + keep_canonical to prune the corpus.
    """
    from chronon_spark.operators.dedup import ensure_parallelism

    cents = kmeans_fit(corpus, k, iters, id_col, vec_col)
    qdf = (
        ensure_parallelism(corpus)
        .select(F.col(id_col).alias("id"), quantize(vec_col).alias("qv"))
        .withColumn("qn", norm("qv"))
    )
    assigned = qdf.select(
        "id", "qv", assign_expr(cents).alias("cell"), F.col("qn").alias("nn")
    ).persist()
    sizes = assigned.groupBy("cell").count()
    big = sizes.where(F.col("count") > max_cluster).drop("count")
    assigned = assigned.join(F.broadcast(big), on="cell", how="left_anti")
    a, b = assigned.alias("a"), assigned.alias("b")
    cos = _r6(dot(F.col("a.qv"), F.col("b.qv")) / (F.col("a.nn") * F.col("b.nn")))
    return (
        a.join(
            b,
            (F.col("a.cell") == F.col("b.cell")) & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.cell").alias("cell"),
            cos.alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
