"""Tests for PII redaction, corpus-internal duplicated spans, and
embedding k-means / SemDeDup clustering."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# PII
# ---------------------------------------------------------------------------

def test_pii_cascade_counts_and_redaction(spark):
    from chronon_spark.operators.pii import pii_scan

    rows = [
        (1, "mail a@b.io then card 1234-5678-9012-3456 then 555-123-4567"),
        (2, "ssn 123-45-6789 ip 10.0.0.1"),
        (3, "clean text 2026-08-17 with date and number 42"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r["doc_id"]: r for r in pii_scan(df, "doc_id").collect()}

    r1 = out[1]
    assert (r1["n_email"], r1["n_card"], r1["n_phone"]) == (1, 1, 1)
    # cascade: the card's trailing 3-4 digits must NOT also count as phone
    assert r1["n_pii"] == 3
    assert "<EMAIL>" in r1["redacted"] and "<CARD>" in r1["redacted"]
    assert "<PHONE>" in r1["redacted"]
    assert "3456" not in r1["redacted"]

    r2 = out[2]
    assert (r2["n_ssn"], r2["n_ipv4"]) == (1, 1)
    assert r2["redacted"] == "ssn <SSN> ip <IP>"

    r3 = out[3]
    assert not r3["has_pii"] and r3["redacted"] == rows[2][1]


def test_pii_duckdb_parity(spark):
    """The generated oracle SQL and the Spark cascade agree bit-for-bit
    (RE2-safe pattern subset — same pattern text runs in both engines)."""
    from chronon_spark.operators.pii import pii_oracle_sql, pii_scan

    rows = [
        (i, f"user{i}@ex{i % 3}.org called +1 (555) 123-{i % 10000:04d} from "
            f"192.168.{i % 256}.{i % 100} badge {i}")
        for i in range(50)
    ]
    pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
    got = (
        pii_scan(spark.createDataFrame(pdf), "doc_id")
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register("documents", pdf)
    want = con.execute(pii_oracle_sql()).df().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


# ---------------------------------------------------------------------------
# duplicated spans (internal ExactSubstr signal)
# ---------------------------------------------------------------------------

def test_duplicated_span_flags(spark):
    from chronon_spark.operators.dedup import duplicated_span_flags

    boiler = "all rights reserved contact the webmaster for licensing terms"  # 10 words
    rows = [
        (1, f"unique alpha words one {boiler} tail a"),
        (2, f"other beta content two {boiler} tail b"),
        (3, "completely different text without any shared spans at all here okay"),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r["id"]: r for r in duplicated_span_flags(df, "doc_id", k=8).collect()}
    assert out[1]["flagged"] and out[2]["flagged"]
    assert not out[3]["flagged"] and out[3]["n_dup_spans"] == 0
    # the shared 10-word run contributes 3 shared 8-gram positions
    assert out[1]["n_dup_spans"] == out[2]["n_dup_spans"] == 3
    assert 0 < out[1]["dup_span_frac"] < 1


def test_duplicated_span_case_whitespace_insensitive(spark):
    from chronon_spark.operators.dedup import duplicated_span_flags

    span = "the quick brown fox jumps over the lazy dog"
    rows = [(1, span.upper() + "  extra"), (2, span + " other tail words")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))
    out = {r["id"]: r for r in duplicated_span_flags(df, "doc_id", k=8).collect()}
    assert out[1]["flagged"] and out[2]["flagged"]


# ---------------------------------------------------------------------------
# k-means + SemDeDup
# ---------------------------------------------------------------------------

def _emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def test_kmeans_assignment_valid_and_deterministic(spark, sf_dir):
    from chronon_spark.operators.clustering import kmeans_cluster

    out = kmeans_cluster(_emb(spark, sf_dir), k=4, iters=2).toPandas()
    n = _emb(spark, sf_dir).count()
    assert len(out) == n
    assert set(out.cell) <= set(range(4))
    assert out.sim.between(-1.0, 1.0).all()
    # every cell non-empty on this data
    assert out.cell.nunique() == 4


def test_kmeans_parallelism_invariance(spark, sf_dir):
    """Shuffle-partition count must not change assignments: quantized
    integer update sums are order-free and the rounded argmax absorbs
    float noise."""
    from chronon_spark.operators.clustering import kmeans_cluster

    def run(nparts):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", str(nparts))
        try:
            return (
                kmeans_cluster(_emb(spark, sf_dir), k=4, iters=2)
                .toPandas()
                .sort_values("id")
                .reset_index(drop=True)
            )
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    a, b = run(2), run(16)
    assert a.equals(b)


def test_semdedup_subset_of_global_pairs(spark, sf_dir):
    """Within-cluster pairs are exactly the global near-dup pairs whose
    endpoints share a cluster (blocking loses only cross-cluster pairs)."""
    from chronon_spark.operators.clustering import (
        kmeans_assign,
        kmeans_fit,
        semdedup_pairs,
    )
    from chronon_spark.operators.similarity import embedding_near_dups

    emb = _emb(spark, sf_dir)
    got = semdedup_pairs(emb, k=4, iters=2, threshold=0.3).toPandas()
    cents = kmeans_fit(emb, k=4, iters=2)
    cells = kmeans_assign(emb, cents).toPandas().set_index("id").cell
    glob = embedding_near_dups(emb, threshold=0.3).toPandas()
    same_cell = glob[
        glob.apply(lambda r: cells[r.id_a] == cells[r.id_b], axis=1)
    ] if len(glob) else glob
    assert set(map(tuple, got[["id_a", "id_b"]].values)) == set(
        map(tuple, same_cell[["id_a", "id_b"]].values)
    )
    assert len(got) > 0


def test_semdedup_planted_cluster(spark):
    """Ten near-identical vectors + scattered noise: all 45 planted pairs
    survive the cluster blocking (they must co-cluster)."""
    import numpy as np

    from chronon_spark.operators.clustering import semdedup_pairs

    rng = np.random.RandomState(7)
    base = rng.randn(16)
    rows = [(i, (base + rng.randn(16) * 0.01).tolist()) for i in range(10)]
    rows += [(100 + i, rng.randn(16).tolist()) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    out = semdedup_pairs(df, k=4, iters=2, threshold=0.95).toPandas()
    planted = {(a, b) for a in range(10) for b in range(10) if a < b}
    assert planted <= set(map(tuple, out[["id_a", "id_b"]].values))
