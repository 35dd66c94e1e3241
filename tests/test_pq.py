"""Product quantization vs an independent pure-Python oracle.

The oracle implements Jégou et al. 2011 directly on Python ints —
quantize, slice, per-subspace Lloyd's with round-half-up integer
centroids, argmin-by-(dist, cell), ADC sums — with none of the Spark
expression machinery, so agreement is evidence, not tautology.
"""

from __future__ import annotations

import hashlib
import math

import pytest

from chronon_spark.operators.pq import pq_encode, pq_fit, pq_topk

M, K, ITERS, DIM = 4, 4, 2, 16


# ---------------------------------------------------------------- oracle


def py_quantize(vec):
    return [int(math.floor(float(x) * 1_000_000 + 0.5)) for x in vec]


def py_sub(qv, s, d):
    return qv[s * d : (s + 1) * d]


def py_sq_l2(a, b):
    return sum((x - y) * (x - y) for x, y in zip(a, b))


def py_assign(sv, cents):
    return min(range(len(cents)), key=lambda c: (py_sq_l2(sv, cents[c]), c))


def py_fit(rows, m, k, iters):
    """rows: [(id, vec)]. Same md5-order init as the engine."""
    q = {i: py_quantize(v) for i, v in rows}
    dim = len(next(iter(q.values())))
    d = dim // m
    order = sorted(q, key=lambda i: hashlib.md5(str(i).encode()).hexdigest())
    cbs = [[py_sub(q[i], s, d) for i in order[:k]] for s in range(m)]
    for _ in range(iters):
        sums = {}
        for qv in q.values():
            for s in range(m):
                sv = py_sub(qv, s, d)
                cell = py_assign(sv, cbs[s])
                acc = sums.setdefault((s, cell), [0] * (d + 1))
                acc[0] += 1
                for p in range(d):
                    acc[p + 1] += sv[p]
        cbs = [
            [
                [int(math.floor(acc[p + 1] / acc[0] + 0.5)) for p in range(d)]
                if (s, c) in sums and (acc := sums[(s, c)])
                else cbs[s][c]
                for c in range(k)
            ]
            for s in range(m)
        ]
    return cbs


def py_encode(rows, cbs):
    m, d = len(cbs), len(cbs[0][0])
    return {
        i: [py_assign(py_sub(py_quantize(v), s, d), cbs[s]) for s in range(m)]
        for i, v in rows
    }


def py_adc(q_qv, codes, cbs):
    d = len(cbs[0][0])
    return sum(
        py_sq_l2(py_sub(q_qv, s, d), cbs[s][codes[s]]) for s in range(len(cbs))
    )


def corpus(n=80, dim=DIM):
    # deterministic, clusterable: 4 loose groups + a couple of ties
    rows = []
    for i in range(n):
        g = i % 4
        vec = [
            ((g * 37 + j * 11 + (i * i) % 13) % 29 - 14) / 7.0 for j in range(dim)
        ]
        rows.append((i, vec))
    rows.append((n, rows[0][1]))  # exact duplicate vector, distinct id
    return rows


@pytest.fixture(scope="module")
def emb_df(spark):
    return spark.createDataFrame(
        corpus(), "vec_id bigint, embedding array<float>"
    )


def _spark_fit(emb_df):
    return pq_fit(emb_df, m=M, k=K, iters=ITERS)


def test_fit_matches_oracle(emb_df):
    got = _spark_fit(emb_df)
    want = py_fit(
        [(i, [float(f) for f in v]) for i, v in corpus()], M, K, ITERS
    )
    assert got == want


def test_encode_matches_oracle(emb_df):
    cbs = _spark_fit(emb_df)
    got = {r["id"]: list(r["codes"]) for r in pq_encode(emb_df, cbs).collect()}
    want = py_encode(corpus(), cbs)
    assert got == want


def test_topk_matches_oracle(emb_df):
    from pyspark.sql import functions as F

    cbs = _spark_fit(emb_df)
    queries = emb_df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["adist"])
        for r in pq_topk(emb_df, queries, cbs, k_neighbors=5).collect()
    }
    codes = py_encode(corpus(), cbs)
    vecs = dict(corpus())
    for qid in range(3):
        q_qv = py_quantize(vecs[qid])
        scored = sorted(
            (py_adc(q_qv, codes[i], cbs), i) for i in codes if i != qid
        )
        for rank, (dist, nid) in enumerate(scored[:5], start=1):
            assert got[(qid, rank)] == (nid, dist), (qid, rank)


def test_parallelism_invariance(emb_df):
    cbs = _spark_fit(emb_df)
    few = pq_fit(emb_df.repartition(1), m=M, k=K, iters=ITERS)
    many = pq_fit(emb_df.repartition(17), m=M, k=K, iters=ITERS)
    assert few == cbs and many == cbs


def test_adc_recall_vs_brute_force(emb_df):
    """PQ is lossy but must be a real approximation: query 0's rank-1
    adist must equal its own reconstruction distance (the exact
    duplicate of query 0 shares its codes, so the ADC minimum is
    attained — any rank-1 winner is a tie-mate of the duplicate), and
    mean recall@5 vs exact integer L2 must clear 0.6 on this easy
    clustered corpus."""
    from pyspark.sql import functions as F

    cbs = _spark_fit(emb_df)
    queries = emb_df.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    approx = pq_topk(emb_df, queries, cbs, k_neighbors=5).collect()
    by_q, dist_q = {}, {}
    for r in approx:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
        dist_q.setdefault(r["query_id"], []).append(r["adist"])
    vecs = {i: py_quantize(v) for i, v in corpus()}
    codes = py_encode(corpus(), cbs)
    dup_id = len(corpus()) - 1
    # the duplicate attains the ADC minimum (its codes are q0's argmin
    # cells); rank-1 must sit at exactly that distance
    assert dist_q[0][0] == py_adc(vecs[0], codes[dup_id], cbs)
    recalls = []
    for qid, got in by_q.items():
        exact = sorted(
            (py_sq_l2(vecs[qid], vecs[i]), i) for i in vecs if i != qid
        )[:5]
        exact_ids = {i for _, i in exact}
        recalls.append(len(exact_ids & set(got)) / 5)
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_fit_validates_inputs(emb_df):
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(emb_df, m=5, k=K, iters=1)
    with pytest.raises(ValueError, match="m and k"):
        pq_fit(emb_df, m=0, k=K)


def test_topk_salted_equals_unsalted(emb_df):
    """The salted two-phase rank (r4 VERDICT Wrong #3 fix) is exactly
    the single-window rank — top-k is merge-associative — including on
    a hot many-query batch where every query scores the whole corpus."""
    from pyspark.sql import functions as F

    cbs = _spark_fit(emb_df)
    queries = emb_df.where(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def key(rows):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["adist"])
            for r in rows
        )

    plain = key(
        pq_topk(emb_df, queries, cbs, k_neighbors=5, salt_partitions=0).collect()
    )
    salted = key(
        pq_topk(emb_df, queries, cbs, k_neighbors=5, salt_partitions=32).collect()
    )
    assert plain == salted and len(plain) == 20 * 5


def test_topk_plan_has_no_corpus_wide_query_window(emb_df):
    """Plan pin for the scale fix: the window that sees corpus-scale
    input must be salted (partition keys include __salt); only the
    bounded <=k-rows-per-query survivor stage may window on query_id
    alone."""
    from pyspark.sql import functions as F

    cbs = _spark_fit(emb_df)
    queries = emb_df.where(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    plan = (
        pq_topk(emb_df, queries, cbs, k_neighbors=5)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    assert len(windows) >= 2, plan
    # optimizedPlan lists operators top-down: the LAST windows are the
    # deepest (corpus-scale phase-1); they must carry the salt key
    assert "__salt" in windows[-1], windows[-1]


@pytest.fixture(scope="module")
def ivf_parts(emb_df):
    from chronon_spark.operators.pq import ivf_coarse_fit

    cbs = _spark_fit(emb_df)
    coarse = ivf_coarse_fit(emb_df, n_cells=4)
    return cbs, coarse


def test_ivf_full_probe_equals_exhaustive(emb_df, ivf_parts):
    """nprobe == n_cells probes every cell — the IVF composition must
    then reproduce exhaustive pq_topk exactly."""
    from pyspark.sql import functions as F

    from chronon_spark.operators.pq import pq_ivf_topk

    cbs, coarse = ivf_parts
    queries = emb_df.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )

    def key(rows):
        return sorted(
            (r["query_id"], r["rank"], r["neighbor_id"], r["adist"])
            for r in rows
        )

    exhaustive = key(pq_topk(emb_df, queries, cbs, k_neighbors=5).collect())
    full_probe = key(
        pq_ivf_topk(
            emb_df, queries, cbs, coarse, k_neighbors=5, nprobe=len(coarse)
        ).collect()
    )
    assert full_probe == exhaustive


def test_ivf_pruned_probe_recall(emb_df, ivf_parts):
    """nprobe < n_cells scans a strict subset; results must be a
    per-query prefix-consistent subset ranking with recall >= 0.6
    vs exhaustive ADC on this clustered corpus."""
    from pyspark.sql import functions as F

    from chronon_spark.operators.pq import pq_ivf_topk

    cbs, coarse = ivf_parts
    queries = emb_df.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = {}
    for r in pq_topk(emb_df, queries, cbs, k_neighbors=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    got = {}
    rows = pq_ivf_topk(
        emb_df, queries, cbs, coarse, k_neighbors=5, nprobe=2
    ).collect()
    for r in rows:
        got.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [
        len(exact[q] & got.get(q, set())) / len(exact[q]) for q in exact
    ]
    assert sum(recalls) / len(recalls) >= 0.6, recalls


def test_ivf_validates_nprobe(emb_df, ivf_parts):
    from pyspark.sql import functions as F

    from chronon_spark.operators.pq import pq_ivf_topk

    cbs, coarse = ivf_parts
    queries = emb_df.where(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    with pytest.raises(ValueError, match="nprobe"):
        pq_ivf_topk(emb_df, queries, cbs, coarse, nprobe=0)
    with pytest.raises(ValueError, match="nprobe"):
        pq_ivf_topk(emb_df, queries, cbs, coarse, nprobe=99)
