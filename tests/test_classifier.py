"""Batch perceptron vs a pure-Python oracle + learning/invariance properties."""

from __future__ import annotations

import hashlib
import re
from collections import Counter, defaultdict

import pytest

from chronon_spark.operators.classifier import (
    batch_perceptron,
    hashed_features,
    perceptron_scores,
    quality_classifier,
)

DIM = 64


# ---------------------------------------------------------------- oracle


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode("utf-8")).hexdigest()[:15], 16) % DIM


def py_features(texts: dict) -> dict:
    out = {}
    for did, t in texts.items():
        norm = re.sub(r"\s+", " ", t.strip().lower())
        c: Counter = Counter(_bucket(w) for w in norm.split(" ") if w)
        out[did] = dict(c)
    return out


def py_train(texts: dict, labels: dict, epochs: int) -> dict:
    feats = py_features(texts)
    w: dict = defaultdict(int)
    for _ in range(epochs):
        delta: dict = defaultdict(int)
        any_mis = False
        for did, y in labels.items():
            s = sum(w[f] * c for f, c in feats.get(did, {}).items())
            if y * s <= 0:
                any_mis = True
                for f, c in feats.get(did, {}).items():
                    delta[f] += y * c
        if not any_mis:
            break
        for f, d in delta.items():
            w[f] += d
    return {f: v for f, v in w.items() if v != 0}


# ----------------------------------------------------------------- data

GOOD = "excellent prose with coherent structured informative writing style"
BAD = "spam spam buy now click here casino pills xxx"


def make_texts():
    texts, labels = {}, {}
    for i in range(60):
        if i % 2 == 0:
            texts[f"d{i}"] = f"{GOOD} sample number {i % 7}"
            labels[f"d{i}"] = 1
        else:
            texts[f"d{i}"] = f"{BAD} offer {i % 5}"
            labels[f"d{i}"] = -1
    texts["empty"] = "   "
    labels["empty"] = -1
    return texts, labels


@pytest.fixture(scope="module")
def data(spark):
    texts, labels = make_texts()
    df = spark.createDataFrame(
        [(k, v) for k, v in texts.items()], "doc_id string, text string"
    )
    ldf = spark.createDataFrame(
        [(k, y) for k, y in labels.items()], "id string, y int"
    )
    return df, ldf, texts, labels


def test_weights_match_python_oracle(spark, data):
    df, ldf, texts, labels = data
    feats = hashed_features(df, "doc_id", dim=DIM).persist()
    got = batch_perceptron(spark, feats, ldf, epochs=3)
    want = py_train(texts, labels, 3)
    assert got == want
    feats.unpersist()


def test_learns_separable_data(spark, data):
    df, ldf, texts, labels = data
    out = quality_classifier(
        spark, df, "doc_id",
        label_expr="IF(text LIKE '%excellent%', 1, -1)",
        dim=DIM, epochs=4,
    ).collect()
    # linearly separable by construction (disjoint vocab): must fit it,
    # except the empty doc (no features -> score 0 -> pred -1, label -1 ok)
    acc = sum(1 for r in out if r["pred"] == r["y"]) / len(out)
    assert acc == 1.0


def test_partition_invariance(spark, data):
    df, ldf, texts, labels = data
    f1 = hashed_features(df, "doc_id", dim=DIM)
    w1 = batch_perceptron(spark, f1, ldf, epochs=2)
    w2 = batch_perceptron(spark, f1.repartition(7), ldf.repartition(3), epochs=2)
    assert w1 == w2


def test_scoring_expr_equals_join_scores(spark, data):
    """The stream-safe literal-map scorer must agree bit-for-bit with the
    broadcast-join scorer (and hence with training-time scores)."""
    from chronon_spark.operators.classifier import scoring_expr

    df, ldf, texts, labels = data
    w = py_train(texts, labels, 3)
    feats = hashed_features(df, "doc_id", dim=DIM)
    via_join = {
        r["id"]: r["score"]
        for r in perceptron_scores(spark, feats, ldf, w).collect()
    }
    via_expr = {
        r["doc_id"]: r["s"]
        for r in df.select("doc_id", scoring_expr(w, dim=DIM).alias("s")).collect()
    }
    assert via_expr == via_join


def test_scores_are_integers_and_stable(spark, data):
    df, ldf, texts, labels = data
    feats = hashed_features(df, "doc_id", dim=DIM)
    w = py_train(texts, labels, 2)
    got = {r["id"]: r["score"] for r in perceptron_scores(spark, feats, ldf, w).collect()}
    pf = py_features(texts)
    for did, s in got.items():
        want = sum(w.get(f, 0) * c for f, c in pf.get(did, {}).items())
        assert s == want


def test_ngram_features_match_python_oracle(spark):
    import hashlib

    from chronon_spark.operators.classifier import hashed_features

    docs = spark.createDataFrame(
        [(0, "Good  Stuff here"), (1, "stuff good"), (2, "x"), (3, "  ")],
        ["doc_id", "text"],
    )
    got = {
        (r.id, r.f): r.c
        for r in hashed_features(docs, "doc_id", dim=64, ngrams=2).collect()
    }

    def h(g):
        return int(hashlib.md5(g.encode()).hexdigest()[:15], 16) % 64

    exp: dict = {}
    for i, text in [(0, "good stuff here"), (1, "stuff good"), (2, "x"), (3, "")]:
        toks = [t for t in text.split() if t]
        grams = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
        for g in grams:
            k = (i, h(g))
            exp[k] = exp.get(k, 0) + 1
    assert got == exp


def test_bigrams_separate_what_unigrams_cannot(spark):
    from chronon_spark.operators.classifier import (
        batch_perceptron,
        hashed_features,
        perceptron_scores,
        scoring_expr,
    )

    # every doc contains both 'good' and 'stuff'; only the ORDER differs.
    # unigram counts are identical across classes -> no linear separation;
    # the bigram feature 'good stuff' separates perfectly.
    rows = [(i, "good stuff filler", 1) for i in range(10)] + [
        (i + 10, "stuff good filler", -1) for i in range(10)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "y"])
    labels = docs.selectExpr("doc_id AS id", "y")

    uni = hashed_features(docs, "doc_id", dim=512, ngrams=1)
    w_uni = batch_perceptron(spark, uni, labels, epochs=4)
    acc_uni = (
        perceptron_scores(spark, uni, labels, w_uni)
        .selectExpr("avg(CAST(pred = y AS INT)) AS a")
        .first()[0]
    )
    assert acc_uni <= 0.5  # identical unigram profiles: no better than chance

    bi = hashed_features(docs, "doc_id", dim=512, ngrams=2)
    w_bi = batch_perceptron(spark, bi, labels, epochs=4)
    scored = perceptron_scores(spark, bi, labels, w_bi)
    acc_bi = scored.selectExpr("avg(CAST(pred = y AS INT)) AS a").first()[0]
    assert acc_bi == 1.0

    # deploy-side literal-map scorer agrees with the broadcast-join scorer
    from pyspark.sql import functions as F

    expr_scores = docs.select(
        F.col("doc_id").alias("id"),
        scoring_expr(w_bi, dim=512, ngrams=2).alias("score"),
    )
    both = scored.join(expr_scores.withColumnRenamed("score", "s2"), "id")
    assert both.where(F.col("score") != F.col("s2")).count() == 0
