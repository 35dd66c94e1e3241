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

# closure-broadcast ceiling for score_against_set's eval set: ~100k
# 1024-dim float64 vectors is ~800 MB in every task — past this the
# broadcast-matmul plan is mis-applied (r4 ADVICE #3)
MAX_EVAL_VECTORS = 100_000


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


def _r9(c: Column) -> Column:
    """Portable 1e-9 rounding (floor(x*1e9+0.5) — identical semantics in
    Spark and DuckDB for positive AND negative inputs, unlike round()
    whose tie behavior differs across engines)."""
    return F.floor(c * 1000000000 + F.lit(0.5)) / 1000000000


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


def _multi_buckets(vec_col: str, dim: int, n_planes: int, n_tables: int, seed: int) -> Column:
    """array<struct<t,bucket>>: one signature per hash table (table t uses
    an independent plane set via seed offset) — exploded downstream so all
    tables ride ONE shuffle on (t, bucket)."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("t"),
                lsh_bucket(vec_col, dim, n_planes, seed=seed + 7919 * t).alias("bucket"),
            )
            for t in range(n_tables)
        ]
    )


def _drop_big_buckets(tb: DataFrame, max_bucket: int) -> DataFrame:
    """Remove rows of (t, bucket) groups larger than ``max_bucket``.

    Degenerate buckets (near-zero vectors, one dominant direction — common
    for padded/empty-doc embeddings) make any bucket self/equi-join
    quadratic in that bucket. Same polarity as dedup.py's MinHash cap:
    broadcast the OVERSIZED buckets (a handful) and anti-join — never the
    small-bucket list, which is O(n) rows shipped to every executor.
    """
    sizes = tb.groupBy("t", "bucket").count()
    big = sizes.where(F.col("count") > max_bucket).drop("count")
    return tb.join(F.broadcast(big), on=["t", "bucket"], how="left_anti")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 8,
    n_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Approximate top-k with OR-amplified multi-table hyperplane LSH.

    A single table misses pairs whose signature differs in any bit
    (P(collide) = (1-theta/pi)^n_planes ~ 0.43 at cosine 0.95 for 8
    planes); L independent tables union their candidates, lifting recall
    to 1-(1-p)^L (the same OR-amplification banding MinHash uses,
    dedup.py). Scale shape: ids+buckets explode (L small rows per vector,
    vectors NOT duplicated), one shuffle on (t, bucket), candidate pairs
    dedup, then vectors re-join only for surviving candidates.
    """
    cb = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.explode(_multi_buckets(vec_col, dim, n_planes, n_tables, seed)).alias("tb"),
    ).select("neighbor_id", "tb.t", "tb.bucket")
    cb = _drop_big_buckets(cb, max_bucket)
    qb = queries.select(
        F.col(id_col).alias("query_id"),
        F.explode(_multi_buckets(vec_col, dim, n_planes, n_tables, seed)).alias("tb"),
    ).select("query_id", "tb.t", "tb.bucket")
    cand = (
        cb.join(F.broadcast(qb), on=["t", "bucket"])
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), norm(vec_col).alias("cn")
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv"), norm(vec_col).alias("qn")
    )
    scored = (
        cand.join(c, on="neighbor_id")
        .join(F.broadcast(q), on="query_id")
        .select(
            "query_id",
            "neighbor_id",
            _r9(dot("qv", "cv") / (F.col("qn") * F.col("cn"))).alias("cosine"),
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
    """IVF-flat: deterministic seeded-sample centroids (md5-hash order — a
    uniform pseudo-random draw, NOT the lowest ids, which would correlate
    with generation order and quantize poorly); assign every corpus vector
    to its nearest centroid; queries probe the nprobe nearest cells.
    Centroid table is broadcast everywhere (n_cells rows; TakeOrdered
    heap-select, no full sort at scale)."""
    cents = (
        corpus.orderBy(F.md5(F.col(id_col).cast("string")).asc())
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
    n_tables: int = 4,
    seed: int = 42,
    max_bucket: int = 100_000,
) -> DataFrame:
    """Near-duplicate pairs by embedding cosine >= threshold (id_a < id_b).

    ``n_planes=0``: exact all-pairs (the oracle formulation — O(n^2) dot
    products, fine for verification scale). ``n_planes>0``: the scale
    path — candidates restricted to pairs colliding in ANY of ``n_tables``
    independent random-hyperplane tables (OR-amplification; a single
    table's recall at cosine 0.95 with 8 planes is only ~0.43 — union of
    L tables lifts it to 1-(1-p)^L). Ids+buckets explode; vectors re-join
    only for deduped candidate pairs.
    """
    a = corpus.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), norm(vec_col).alias("na")
    )
    b = corpus.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), norm(vec_col).alias("nb")
    )
    if n_planes > 0:
        assert dim > 0, "dim required for LSH bucketing"
        tb = corpus.select(
            F.col(id_col).alias("id"),
            F.explode(_multi_buckets(vec_col, dim, n_planes, n_tables, seed)).alias("tb"),
        ).select("id", "tb.t", "tb.bucket")
        tb = _drop_big_buckets(tb, max_bucket)
        x, y = tb.alias("x"), tb.alias("y")
        cand = (
            x.join(
                y,
                (F.col("x.t") == F.col("y.t"))
                & (F.col("x.bucket") == F.col("y.bucket"))
                & (F.col("x.id") < F.col("y.id")),
            )
            .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
            .distinct()
        )
        pairs = cand.join(a, on="id_a").join(b, on="id_b")
    else:
        pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    cos = F.floor((dot("va", "vb") / (F.col("na") * F.col("nb"))) * 1000000 + F.lit(0.5)) / 1000000
    return (
        pairs.select("id_a", "id_b", cos.alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )


def score_against_set(
    corpus: DataFrame,
    eval_df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
) -> DataFrame:
    """Max cosine of every corpus vector against a SMALL reference set —
    the broadcast-matmul pattern for semantic decontamination /
    eval-overlap scoring (Lee et al. 2022 §4 discuss n-gram overlap; the
    embedding variant is standard in newer curation stacks).

    100 TB shape: the eval set is collected once on the driver (eval
    benchmarks are thousands of rows — bounded by contract), shipped in
    the task closure, and the corpus streams through ``mapInPandas`` in
    Arrow batches with ONE float64 BLAS matmul per batch: a pure
    projection — zero shuffles, zero joins, embarrassingly parallel over
    any partition layout. Ties on the max pick the smallest eval id
    (numpy argmax first-hit over ascending ids == SQL min-by-max).

    Output: (id_col, max_cosine double, matched_eval long).

    Guards (r4 ADVICE #2/#3): the eval set is size-capped before the
    collect (``MAX_EVAL_VECTORS`` — past that the closure broadcast
    stops being the right plan; chunk the eval set or flip the
    corpus/eval roles), null/ragged eval vectors raise a descriptive
    error instead of an opaque numpy one, and corpus rows with a NULL
    or wrong-dimension vector are reported with their ids.
    """
    import numpy as np

    n_eval = eval_df.limit(MAX_EVAL_VECTORS + 1).count()
    if n_eval > MAX_EVAL_VECTORS:
        raise ValueError(
            f"eval set exceeds {MAX_EVAL_VECTORS:,} vectors; "
            "score_against_set broadcasts it in every task closure — "
            "chunk the eval set (union the per-chunk max) or swap the "
            "corpus/eval roles"
        )
    rows = (
        eval_df.select(
            F.col(eval_id_col).cast("long").alias("i"), F.col(eval_vec_col).alias("v")
        )
        .orderBy("i")
        .collect()
    )
    if not rows:
        raise ValueError("empty eval set")
    bad = [r["i"] for r in rows if r["v"] is None]
    if bad:
        raise ValueError(f"eval vectors are NULL for ids {bad[:10]}")
    dims = {len(r["v"]) for r in rows}
    if len(dims) != 1:
        raise ValueError(f"eval vectors are ragged: dimensions {sorted(dims)}")
    dim = dims.pop()
    eval_ids = np.array([r["i"] for r in rows], dtype=np.int64)
    E = np.array([r["v"] for r in rows], dtype=np.float64)
    En = E / np.maximum(np.linalg.norm(E, axis=1, keepdims=True), 1e-300)

    out_schema = f"{id_col} long, max_cosine double, matched_eval long"

    def score(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vecs = list(pdf[vec_col])
            bad_rows = [
                i for v, i in zip(vecs, pdf[id_col])
                if v is None or len(v) != dim
            ]
            if bad_rows:
                raise ValueError(
                    f"corpus vectors NULL or not {dim}-dimensional for "
                    f"ids {bad_rows[:10]} — filter/fix upstream"
                )
            M = np.array(vecs, dtype=np.float64)
            norms = np.linalg.norm(M, axis=1, keepdims=True)
            Mn = M / np.maximum(norms, 1e-300)
            S = Mn @ En.T  # (batch, n_eval)
            best = S.argmax(axis=1)
            mc = S[np.arange(len(S)), best]
            mc = np.where(norms[:, 0] == 0.0, 0.0, mc)
            import pandas as pd

            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "max_cosine": mc,
                    "matched_eval": eval_ids[best],
                }
            )

    return corpus.select(id_col, vec_col).mapInPandas(score, schema=out_schema)


def semantic_decontaminate(
    corpus: DataFrame,
    eval_df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
) -> DataFrame:
    """Corpus rows whose max eval-set cosine stays BELOW ``threshold``
    (the kept set), annotated with the score — n-gram `benchmark_contamination`'s
    embedding sibling: catches paraphrased leakage n-grams miss."""
    scored = score_against_set(
        corpus, eval_df, id_col, vec_col, eval_id_col, eval_vec_col
    )
    return corpus.join(
        scored.where(F.col("max_cosine") < threshold).select(id_col), on=id_col
    )
