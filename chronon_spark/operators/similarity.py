"""Similarity search over embedding columns (array<float>).

Three tiers, trading recall for scale:
- brute_force_topk: exact cosine top-k — cross join against a broadcast
  query set; the correctness baseline and the right answer when |queries|
  is small (the common training-data-audit case),
- lsh_topk: random-hyperplane LSH buckets — candidate generation shuffles
  O(n) rows on bucket id instead of O(n*q) pairs,
- ivf_topk: inverted-file (coarse-quantizer) probe — deterministic
  centroids (seeded sample), assign once, probe nprobe cells.

Dot products run as Catalyst higher-order functions (zip_with + aggregate)
in double precision — JVM-side, no Python. Cosines are rounded to 1e-9
before ranking with a deterministic (similarity desc, id asc) tie-break so
results are stable across partitionings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def dot(a, b) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a) -> Column:
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _ranked_topk(scored: DataFrame, k: int) -> DataFrame:
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus (self excluded).

    The query side is broadcast — corpus streams once, no shuffle of the
    big side; ranking shuffles only |q| * |corpus| scored rows pruned to
    |q| * k by the window (AQE-compacted).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), norm(vec_col).alias("qn")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), norm(vec_col).alias("cn")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot("qv", "cv") / (F.col("qn") * F.col("cn")), 9).alias("cosine"),
        )
    )
    return _ranked_topk(scored, k)


def _hyperplane(dim: int, plane: int, seed: int = 42) -> list:
    """Deterministic pseudo-random unit-free hyperplane via splitmix64."""
    import numpy as np

    x = np.arange(dim, dtype=np.uint64) + np.uint64(plane * 1_000_003 + seed * 11400714819323198485 % (2**64))
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        x = x ^ (x >> np.uint64(31))
    return ((x % np.uint64(2001)).astype(np.float64) / 1000.0 - 1.0).tolist()


def lsh_bucket(vec_col: str, dim: int, n_planes: int = 8, seed: int = 42) -> Column:
    """Random-hyperplane signature -> integer bucket id (sign bits)."""
    bucket = F.lit(0).cast("long")
    for p in range(n_planes):
        plane = F.array(*[F.lit(v) for v in _hyperplane(dim, p, seed)])
        bit = F.when(dot(F.col(vec_col), plane) >= 0, F.lit(1)).otherwise(F.lit(0))
        bucket = bucket * 2 + bit
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: candidates limited to the query's LSH bucket.

    Scale path: corpus is bucketed once (narrow map + one shuffle on
    bucket); queries probe only their own bucket. Recall measured vs
    brute force in tests.
    """
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(vec_col).alias("cn"),
        lsh_bucket(vec_col, dim, n_planes).alias("bucket"),
    )
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(vec_col).alias("qn"),
        lsh_bucket(vec_col, dim, n_planes).alias("bucket"),
    )
    scored = (
        cb.join(F.broadcast(qb), on="bucket")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot("qv", "cv") / (F.col("qn") * F.col("cn")), 9).alias("cosine"),
        )
    )
    return _ranked_topk(scored, k)


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-flat: deterministic centroids = lowest-id corpus vectors; assign
    every corpus vector to its nearest centroid; queries probe the nprobe
    nearest cells. Centroid table is broadcast everywhere."""
    cents = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(
            F.col(id_col).cast("long").alias("cell_id"),
            F.col(vec_col).alias("centv"),
            norm(vec_col).alias("centn"),
        )
    )

    def best_cells(df: DataFrame, out_id: str, n: int, idc: str, vc: str) -> DataFrame:
        scored = df.crossJoin(F.broadcast(cents)).select(
            F.col(idc).alias(out_id),
            F.col(vc).alias("__v"),
            "cell_id",
            (dot(vc, "centv") / (norm(vc) * F.col("centn"))).alias("__cs"),
        )
        w = W.partitionBy(out_id).orderBy(F.col("__cs").desc(), F.col("cell_id").asc())
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .where(F.col("__r") <= n)
            .drop("__cs", "__r")
        )

    assigned = best_cells(corpus, "neighbor_id", 1, id_col, vec_col).withColumnRenamed(
        "__v", "cv"
    )
    probes = best_cells(queries, "query_id", nprobe, id_col, vec_col).withColumnRenamed(
        "__v", "qv"
    )
    scored = (
        assigned.join(F.broadcast(probes), on="cell_id")
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(dot("qv", "cv") / (norm("qv") * norm("cv")), 9).alias("cosine"),
        )
    )
    return _ranked_topk(scored, k)


def embedding_near_dups(
    corpus: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 0,
    dim: int = 0,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold (id_a < id_b).

    ``n_planes=0``: exact all-pairs (the oracle formulation — O(n^2) dot
    products, fine for verification scale). ``n_planes>0``: candidates
    restricted to matching random-hyperplane LSH buckets first — the scale
    path; near-identical vectors collide in every bucket with high
    probability, so recall loss concentrates exactly where threshold
    tolerance lives.
    """
    a = corpus.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), norm(vec_col).alias("na")
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), norm(vec_col).alias("nb")
    )
    if n_planes > 0:
        assert dim > 0, "dim required for LSH bucketing"
        bucket = lsh_bucket(vec_col, dim, n_planes)
        a = corpus.select(
            F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"),
            norm(vec_col).alias("na"), bucket.alias("bkt"),
        )
        b = corpus.select(
            F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"),
            norm(vec_col).alias("nb"), bucket.alias("bkt"),
        )
        pairs = a.join(b, (a.bkt == b.bkt) & (F.col("id_a") < F.col("id_b"))).drop("bkt")
    else:
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    cos = F.floor((dot("va", "vb") / (F.col("na") * F.col("nb"))) * 1000000 + F.lit(0.5)) / 1000000
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
