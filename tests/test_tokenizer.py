"""Distributed BPE trainer/encoder vs a pure-Python Sennrich-style oracle.

The oracle is the textbook algorithm (Sennrich et al. 2016, Algorithm 1):
word-frequency dict, overlapping adjacent-pair counts, greedy
left-to-right merge application — implemented independently of the Spark
string-replace algebra so agreement is evidence, not tautology.
"""

from __future__ import annotations

import re
from collections import Counter

import pytest

from chronon_spark.operators.tokenizer import (
    TRAINABLE_WORD,
    bpe_encode,
    bpe_token_stats,
    bpe_tokens,
    bpe_train,
    word_frequencies,
)

# ---------------------------------------------------------------- oracle


def _norm(t: str) -> str:
    return re.sub(r"\s+", " ", t.strip().lower())


def py_word_freq(texts):
    c: Counter = Counter()
    for t in texts:
        for w in _norm(t).split(" "):
            if w and re.match(TRAINABLE_WORD, w):
                c[w] += 1
    return c


def _merge_syms(syms, a, b):
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def py_train(texts, num_merges, min_count=2):
    wf = {tuple(w): c for w, c in py_word_freq(texts).items()}
    merges = []
    for _ in range(num_merges):
        pairs: Counter = Counter()
        for syms, c in wf.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
    # count DESC, pair-string ASC (engine tie-break)
        cands = [
            (cnt, f"{a} {b}", (a, b)) for (a, b), cnt in pairs.items() if cnt >= min_count
        ]
        if not cands:
            break
        cnt, _, (a, b) = min(cands, key=lambda x: (-x[0], x[1]))
        merges.append((a, b, cnt))
        wf = {_merge_syms(s, a, b): c for s, c in wf.items()}
    return merges


def py_encode(text: str, merges):
    toks = []
    for w in _norm(text).split(" "):
        if not w:
            continue
        syms = tuple(w)
        for m in merges:
            syms = _merge_syms(syms, m[0], m[1])
        toks.extend(t for t in syms if t != "§")
    return toks


# ----------------------------------------------------------------- corpus

WORDS = (
    "the quick brown fox jumps over lazy dog and then runs away "
    "feature engineering requires the same tokens again again the the"
).split()


def corpus(n=120):
    # deterministic pseudo-docs with a Zipfy word mix + edge cases
    docs = []
    for i in range(n):
        ws = [WORDS[(i * 7 + j * j) % len(WORDS)] for j in range(3 + i % 9)]
        docs.append(" ".join(ws))
    docs += ["", "   ", "a", "café au lait", "a§b weird", "don't stop", "x y z x y"]
    return docs


@pytest.fixture(scope="module")
def docs_df(spark):
    data = [(f"d{i}", t) for i, t in enumerate(corpus())]
    return spark.createDataFrame(data, "doc_id string, text string")


def test_word_frequencies_match_oracle(docs_df):
    got = {r["word"]: r["cnt"] for r in word_frequencies(docs_df).collect()}
    want = dict(py_word_freq(corpus()))
    assert got == want
    assert "café" not in got  # non-ASCII excluded from training


def test_train_matches_reference_bpe_bit_for_bit(docs_df):
    got = bpe_train(docs_df, num_merges=24, min_count=2)
    want = py_train(corpus(), 24, 2)
    assert [tuple(m) for m in got] == want


def test_encode_matches_oracle_per_doc(docs_df):
    merges = py_train(corpus(), 16, 2)
    rows = bpe_encode(docs_df, merges).select("doc_id", "text", "bpe_tokens").collect()
    assert len(rows) == len(corpus())
    for r in rows:
        assert list(r["bpe_tokens"]) == py_encode(r["text"], merges), r["doc_id"]


def test_token_stats_counts(docs_df):
    merges = py_train(corpus(), 8, 2)
    stats = {r["doc_id"]: r["n_tokens"] for r in bpe_token_stats(docs_df, merges, "doc_id").collect()}
    texts = {f"d{i}": t for i, t in enumerate(corpus())}
    for did, n in stats.items():
        assert n == len(py_encode(texts[did], merges))


def test_batched_training_is_valid_and_encodable(docs_df):
    """batch_size>1 trades exact merge ORDER for fewer aggregation rounds;
    every accepted pair must still have had count >= min_count at selection
    time, and the result must be a usable merge table."""
    merges = bpe_train(docs_df, num_merges=24, min_count=2, batch_size=6)
    assert 1 <= len(merges) <= 24
    assert all(m[2] >= 2 for m in merges)
    # no duplicate pairs
    assert len({(m[0], m[1]) for m in merges}) == len(merges)
    out = bpe_encode(docs_df, merges).select("bpe_tokens").collect()
    assert all(r["bpe_tokens"] is not None for r in out)


def test_merges_compress(docs_df):
    """Encoding with merges must never produce MORE tokens than chars, and
    must strictly compress a corpus with repeated words."""
    merges = bpe_train(docs_df, num_merges=16, min_count=2)
    from pyspark.sql import functions as F

    agg = (
        bpe_encode(docs_df, merges)
        .select(
            F.size("bpe_tokens").alias("n"),
            F.length(F.regexp_replace("text", r"\s+", "")).alias("chars"),
        )
        .agg(F.sum("n").alias("n"), F.sum("chars").alias("chars"))
        .collect()[0]
    )
    assert agg["n"] < agg["chars"]


# ------------------------------------------- shared-boundary regression
# A single-space encoding (' a b ' -> ' ab ') consumes the boundary space
# shared by adjacent occurrences, so 'banana'+(a,n) came out [b,an,a,n,a]
# and the trainer re-selected the leftover pair, producing duplicate
# merges. The double-space algebra must match reference BPE exactly.

ABAB_CORPUS = ["banana banana bandana", "mama papa mama", "aaaaa aaa", "banana mama"]


@pytest.fixture(scope="module")
def abab_df(spark):
    data = [(f"b{i}", t) for i, t in enumerate(ABAB_CORPUS)]
    return spark.createDataFrame(data, "doc_id string, text string")


def test_adjacent_occurrences_merge_like_reference(abab_df):
    got = bpe_train(abab_df, num_merges=12, min_count=2)
    want = py_train(ABAB_CORPUS, 12, 2)
    assert [tuple(m) for m in got] == want
    # the single-space bug produced duplicate merges; pin uniqueness too
    assert len({(a, b) for a, b, _ in got}) == len(got)


def test_encode_banana_and_runs(abab_df):
    rows = (
        bpe_encode(abab_df, [("a", "n"), ("a", "a")])
        .select("doc_id", "text", "bpe_tokens")
        .collect()
    )
    got = {r["doc_id"]: list(r["bpe_tokens"]) for r in rows}
    texts = {f"b{i}": t for i, t in enumerate(ABAB_CORPUS)}
    for did, toks in got.items():
        assert toks == py_encode(texts[did], [("a", "n"), ("a", "a")]), did
    # spot-pin the canonical cases
    assert got["b3"] == ["b", "an", "an", "a", "m", "a", "m", "a"]
    # 'aaaaa aaa' + (a,n)(a,a): greedy left-to-right pairs
    assert got["b2"] == ["aa", "aa", "a", "aa", "a"]


# ------------------------------------------- incremental delta trainer
# bpe_train(incremental=True) maintains the pair-count table by delta
# (only words containing a merged occurrence are re-exploded) instead of
# a full per-round recount. Same selection rule, same tie-break, same
# batch non-interference filter -> output must be BIT-EQUAL to the full
# path on every corpus, including the shared-boundary regression corpus
# and multi-merge batches.


def test_incremental_training_bit_equal_full(docs_df):
    full = bpe_train(docs_df, num_merges=24, min_count=2)
    inc = bpe_train(docs_df, num_merges=24, min_count=2, incremental=True)
    assert inc == full


def test_incremental_training_bit_equal_batched(docs_df):
    full = bpe_train(docs_df, num_merges=24, min_count=2, batch_size=6)
    inc = bpe_train(docs_df, num_merges=24, min_count=2, batch_size=6, incremental=True)
    assert inc == full


def test_incremental_training_handles_overlapping_runs(abab_df):
    # 'aaaaa' + (a,a) is where delta maintenance is easiest to get wrong:
    # overlapping positions count, and one replace changes several pairs.
    full = bpe_train(abab_df, num_merges=12, min_count=2)
    inc = bpe_train(abab_df, num_merges=12, min_count=2, incremental=True)
    assert inc == full
    assert [tuple(m) for m in inc] == py_train(ABAB_CORPUS, 12, 2)
