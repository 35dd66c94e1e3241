"""Tests for incremental snapshot dedup and unigram-LM scoring."""

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F


def test_incremental_dedup_exact_and_near(spark):
    from chronon_spark.operators.dedup import incremental_dedup

    snap_rows = [
        (100, "the existing corpus document about distributed query engines"),
        (101, "a snapshot page describing sort merge joins in detail today"),
    ]
    new_rows = [
        # exact normalized match of snapshot doc (case/whitespace differ)
        (1, "  THE existing corpus document about distributed query engines "),
        # near-dup of snapshot doc 101 (one word changed)
        (2, "a snapshot page describing sort merge joins in detail tonight"),
        # genuinely new
        (3, "completely novel content on streaming watermarks and state stores"),
    ]
    snap = spark.createDataFrame(pd.DataFrame(snap_rows, columns=["doc_id", "text"]))
    new = spark.createDataFrame(pd.DataFrame(new_rows, columns=["doc_id", "text"]))
    out = incremental_dedup(
        new, snap, "doc_id", snapshot_id_col="doc_id", jaccard_threshold=0.5
    )
    ids = {r["doc_id"] for r in out.collect()}
    assert 1 not in ids          # exact dup dropped
    assert 2 not in ids          # near-dup dropped
    assert 3 in ids              # novel survives


def test_incremental_dedup_verify_threshold_keeps_low_overlap(spark):
    from chronon_spark.operators.dedup import incremental_dedup

    snap = spark.createDataFrame(
        pd.DataFrame([(9, "alpha beta gamma delta epsilon zeta eta theta")],
                     columns=["doc_id", "text"])
    )
    new = spark.createDataFrame(
        pd.DataFrame([(1, "alpha beta gamma unrelated words entirely different here")],
                     columns=["doc_id", "text"])
    )
    # raw band collision possible on shared prefix shingles; the exact
    # verify at 0.9 must keep the low-overlap doc
    out = incremental_dedup(
        new, snap, "doc_id", snapshot_id_col="doc_id", jaccard_threshold=0.9
    )
    assert {r["doc_id"] for r in out.collect()} == {1}


def test_unigram_logprob_ranks_gibberish_above_typical(spark):
    from chronon_spark.operators.textstats import unigram_logprob_score

    common = "the cat sat on the mat and the dog sat too"
    rows = [(i, common) for i in range(10)]
    rows.append((99, "zyxqwv kjhgfd poiuyt mnbvcx qazwsx edcrfv"))
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = unigram_logprob_score(df, "doc_id").toPandas().set_index("id")
    # the gibberish doc (every token unique in the corpus) scores a
    # strictly higher mean -logp than the repeated typical text
    assert out.loc[99, "mean_neg_logp"] > out.loc[0, "mean_neg_logp"]
    # typical docs all score identically (same text)
    typ = out.drop(99)["mean_neg_logp"]
    assert typ.nunique() == 1


def test_unigram_logprob_external_counts_floor_unseen(spark):
    from chronon_spark.operators.textstats import (
        unigram_counts,
        unigram_logprob_score,
    )

    train = spark.createDataFrame(
        pd.DataFrame([(1, "seen tokens only here"), (2, "seen tokens again now")],
                     columns=["doc_id", "text"])
    )
    counts = unigram_counts(train)
    total = counts.agg(F.sum("c")).first()[0]
    score = unigram_logprob_score(
        spark.createDataFrame(
            pd.DataFrame([(7, "unseen unseen unseen")], columns=["doc_id", "text"])
        ),
        "doc_id",
        counts=counts,
    ).first()
    # every token floors at count 1 -> mean -logp == ln(total)
    assert score["mean_neg_logp"] == pytest.approx(math.log(total), abs=1e-5)


def test_unigram_logprob_parallelism_invariant(spark, sf_dir):
    from chronon_spark.operators.textstats import unigram_logprob_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    def run(nparts):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
        try:
            return (
                unigram_logprob_score(docs, "doc_id")
                .toPandas()
                .sort_values("id")
                .reset_index(drop=True)
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    a, b = run(2), run(16)
    assert a.equals(b)


# ---------------------------------------------------------------------------
# bigram Stupid Backoff LM (Brants et al. 2007)
# ---------------------------------------------------------------------------

def _sb_oracle(rows, penalty=916291):
    """Pure-Python Stupid Backoff replica: same normalization, same
    1e-6 quantization, same floor-at-1 unseen rule."""
    import re

    norm = lambda t: re.sub(r"\s+", " ", t.strip().lower())
    toks = {i: norm(t).split(" ") for i, t in rows}
    uc, bc = {}, {}
    for ts in toks.values():
        for w in ts:
            uc[w] = uc.get(w, 0) + 1
        for a, b in zip(ts, ts[1:]):
            bc[(a, b)] = bc.get((a, b), 0) + 1
    n = float(sum(uc.values()))
    out = {}
    for i, ts in toks.items():
        s = bo = 0
        for p, w in enumerate(ts):
            qu = math.floor((-(math.log(float(uc.get(w, 1))) - math.log(n))) * 1e6 + 0.5)
            if p == 0:
                q = qu
            elif (ts[p - 1], w) in bc:
                q = math.floor(
                    (-(math.log(float(bc[(ts[p - 1], w)]))
                       - math.log(float(uc[ts[p - 1]])))) * 1e6 + 0.5
                )
            else:
                q = qu + penalty
                bo += 1
            s += q
        out[i] = (len(ts), bo, s / len(ts) / 1e6)
    return out


def test_stupid_backoff_vs_python_oracle(spark):
    from chronon_spark.operators.textstats import stupid_backoff_score

    rows = [
        (1, "the cat sat on the mat and the cat sat again"),
        (2, "the dog sat on the mat while the cat ran off"),
        (3, "  The   cat SAT on the mat  "),            # normalization case
        (4, "banana banana banana split banana banana"),  # repeated-token bigrams
        (5, "mat the on sat cat the"),                  # reversed order -> backoffs
        (6, "solo"),                                    # single token, no bigrams
        (7, ""),                                        # empty -> one '' token
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    got = {
        r["id"]: (r["n_tokens"], r["n_backoff"], r["mean_neg_logscore"])
        for r in stupid_backoff_score(df, "doc_id").collect()
    }
    want = _sb_oracle(rows)
    assert set(got) == set(want)
    for i in want:
        assert got[i][0] == want[i][0], (i, got[i], want[i])
        assert got[i][1] == want[i][1], (i, got[i], want[i])
        assert got[i][2] == pytest.approx(want[i][2], abs=2e-6), (i, got[i], want[i])
    # doc 3 normalizes to a substring of doc 1's vocabulary in natural
    # order: every position must have resolved as a seen bigram
    assert got[3][1] == 0
    # reversed word order (doc 5): self-trained, so its own bigrams ARE
    # in the model (no backoff) — but at count 1 they still score
    # strictly worse than the natural-order doc's repeated bigrams
    assert got[5][2] > got[1][2]


def test_stupid_backoff_word_order_signal(spark):
    """The bigram LM separates texts a unigram LM provably cannot:
    identical token multisets, different order."""
    from chronon_spark.operators.textstats import (
        stupid_backoff_score,
        unigram_logprob_score,
    )

    from chronon_spark.operators.textstats import bigram_counts, unigram_counts

    natural = "the quick brown fox jumps over the lazy dog"
    scrambled = "fox the over quick dog jumps brown lazy the"
    train = spark.createDataFrame(
        pd.DataFrame([(i, natural) for i in range(20)], columns=["doc_id", "text"])
    )
    probe = spark.createDataFrame(
        pd.DataFrame([(0, natural), (99, scrambled)], columns=["doc_id", "text"])
    )

    # unigram LM: identical token multisets -> identical scores (blind)
    uni = {r["id"]: r["mean_neg_logp"]
           for r in unigram_logprob_score(
               probe, "doc_id",
               counts=unigram_counts(train)).collect()}
    assert uni[99] == pytest.approx(uni[0], abs=1e-9)

    # bigram backoff LM scored against the natural-order model: the
    # scrambled doc backs off at every unseen pair and scores worse
    sb = {r["id"]: (r["n_backoff"], r["mean_neg_logscore"])
          for r in stupid_backoff_score(
              probe, "doc_id",
              bigrams=bigram_counts(train),
              unigrams=unigram_counts(train)).collect()}
    assert sb[0][0] == 0
    assert sb[99][0] > 0
    assert sb[99][1] > sb[0][1]


def test_stupid_backoff_external_model_and_min_count(spark):
    from chronon_spark.operators.textstats import (
        bigram_counts,
        stupid_backoff_score,
        unigram_counts,
    )

    train = spark.createDataFrame(
        pd.DataFrame(
            [(i, "alpha beta gamma delta") for i in range(4)]
            + [(9, "alpha beta rare pair")],
            columns=["doc_id", "text"],
        )
    )
    uni = unigram_counts(train)
    # min_count=2 prunes every bigram seen once ('beta rare', 'rare pair',
    # 'gamma delta' survives at 4, ...)
    big = bigram_counts(train, min_count=2)
    assert big.where("c < 2").count() == 0

    score = stupid_backoff_score(
        spark.createDataFrame(
            pd.DataFrame([(1, "beta rare"), (2, "alpha beta")],
                         columns=["doc_id", "text"])),
        "doc_id", bigrams=big, unigrams=uni,
    )
    got = {r["id"]: r["n_backoff"] for r in score.collect()}
    assert got[1] == 1  # pruned bigram -> backoff
    assert got[2] == 0  # frequent bigram survives the prune


def test_stupid_backoff_partition_invariance(spark, sf_dir):
    from chronon_spark.operators.textstats import stupid_backoff_score

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(200)

    def run(nparts):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
        try:
            return (
                stupid_backoff_score(docs.repartition(nparts), "doc_id")
                .toPandas()
                .sort_values("id")
                .reset_index(drop=True)
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    a, b = run(3), run(17)
    assert a.equals(b)


def test_lm_scoring_empty_corpus_and_leakfree(spark):
    """Empty corpus must yield an empty frame (not a plan-build crash),
    and scoring must leave NOTHING persisted — it is a pure plan (the
    global_top_k contract); the scale path passes pre-checkpointed model
    tables instead."""
    from chronon_spark.operators.textstats import (
        stupid_backoff_score,
        unigram_logprob_score,
    )

    empty = spark.createDataFrame([], "doc_id long, text string")
    assert stupid_backoff_score(empty, "doc_id").count() == 0
    assert unigram_logprob_score(empty, "doc_id").count() == 0

    def _ids():
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it, out = m.iterator(), set()
        while it.hasNext():
            out.add(it.next()._1())
        return out

    docs = spark.createDataFrame(
        pd.DataFrame([(i, "some plain text here") for i in range(20)],
                     columns=["doc_id", "text"])
    )
    before = _ids()
    stupid_backoff_score(docs, "doc_id").collect()
    unigram_logprob_score(docs, "doc_id").collect()
    assert not (_ids() - before)
