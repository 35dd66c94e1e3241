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
