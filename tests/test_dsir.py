"""DSIR importance weights vs a pure-Python oracle + selection properties."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest

from chronon_spark.operators.dsir import (
    MICRO,
    dsir_log_weights,
    dsir_select,
    hashed_ngram_features,
)

DIM = 512
N = 2


# ---------------------------------------------------------------- oracle


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode("utf-8")).hexdigest()[:15], 16) % DIM


def _grams(text: str, n: int = N):
    ws = [w for w in re.sub(r"\s+", " ", text.strip().lower()).split(" ")]
    if ws == [""]:
        ws = []
    if n == 1:
        return [w for w in ws if w]
    return [" ".join(ws[i : i + n]) for i in range(len(ws) - n + 1)]


def py_feats(texts: dict) -> dict:
    return {
        did: Counter(_bucket(g) for g in _grams(t)) for did, t in texts.items()
    }


def py_weights(raw: dict, target: dict) -> dict:
    rf, tf = py_feats(raw), py_feats(target)
    rc: Counter = Counter()
    tc: Counter = Counter()
    for c in rf.values():
        rc.update(c)
    for c in tf.values():
        tc.update(c)
    R, T = sum(rc.values()), sum(tc.values())
    q = {}
    for f in set(rc) | set(tc):
        ratio = math.log((tc.get(f, 0) + 1) / (T + DIM)) - math.log(
            (rc.get(f, 0) + 1) / (R + DIM)
        )
        q[f] = math.floor(ratio * MICRO + 0.5)
    out = {}
    for did, c in rf.items():
        if not c:
            continue
        out[did] = (sum(c.values()), sum(cnt * q[f] for f, cnt in c.items()))
    return out


# ----------------------------------------------------------------- data

TARGETY = "the curated encyclopedia of structured knowledge and science"
RAWY = "buy cheap deals now limited offer flash sale discount code"


def make_corpora():
    raw = {}
    for i in range(80):
        base = TARGETY if i % 4 == 0 else RAWY
        raw[f"r{i}"] = f"{base} item {i % 9} extra {i % 5}"
    raw["empty"] = " "
    raw["oneword"] = "single"
    target = {f"t{i}": f"{TARGETY} entry {i % 3}" for i in range(20)}
    return raw, target


@pytest.fixture(scope="module")
def corpora(spark):
    raw, target = make_corpora()
    rdf = spark.createDataFrame(list(raw.items()), "doc_id string, text string")
    tdf = spark.createDataFrame(list(target.items()), "doc_id string, text string")
    return rdf, tdf, raw, target


def test_weights_match_python_oracle(spark, corpora):
    rdf, tdf, raw, target = corpora
    got = {
        r["id"]: (r["n_feats"], r["log_w_micro"])
        for r in dsir_log_weights(rdf, tdf, "doc_id", n=N, dim=DIM).collect()
    }
    assert got == py_weights(raw, target)


def test_target_like_docs_rank_higher(spark, corpora):
    rdf, tdf, raw, target = corpora
    w = {
        r["id"]: r["log_w_micro"]
        for r in dsir_log_weights(rdf, tdf, "doc_id", n=N, dim=DIM).collect()
    }
    target_like = [w[k] for k in w if k.startswith("r") and int(k[1:]) % 4 == 0]
    raw_like = [w[k] for k in w if k.startswith("r") and int(k[1:]) % 4 != 0]
    assert min(target_like) > max(raw_like)


def test_select_keeps_target_like(spark, corpora):
    rdf, tdf, raw, target = corpora
    kept = dsir_select(rdf, tdf, "doc_id", keep_fraction=0.2, n=N, dim=DIM)
    ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    assert ids  # non-empty
    assert all(int(i[1:]) % 4 == 0 for i in ids if i.startswith("r"))


def test_partition_invariance(spark, corpora):
    rdf, tdf, raw, target = corpora
    a = sorted(
        map(tuple, dsir_log_weights(rdf, tdf, "doc_id", n=N, dim=DIM).collect())
    )
    b = sorted(
        map(
            tuple,
            dsir_log_weights(
                rdf.repartition(7), tdf.repartition(5), "doc_id", n=N, dim=DIM
            ).collect(),
        )
    )
    assert a == b


def test_unigram_mode(spark, corpora):
    rdf, tdf, raw, target = corpora
    feats = hashed_ngram_features(rdf, "doc_id", n=1, dim=DIM).collect()
    got = {}
    for r in feats:
        got.setdefault(r["id"], Counter())[r["f"]] = r["c"]
    for did, t in raw.items():
        want = Counter(_bucket(w) for w in _grams(t, 1))
        assert got.get(did, Counter()) == want, did
