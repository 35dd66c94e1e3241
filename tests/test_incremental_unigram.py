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
