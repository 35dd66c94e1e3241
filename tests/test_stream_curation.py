"""Streaming curation: stream results must match the batch operators."""

import os

import pandas as pd
import pytest
from pyspark.sql import functions as F


def _write_crawl(spark, tmp_path, rows):
    src = str(tmp_path / "crawl")
    pdf = pd.DataFrame(rows, columns=["doc_id", "ts", "text"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="ms", utc=True).dt.tz_localize(None)
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)
    return src


def _run_stream(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name).toPandas()


def test_stream_dedup_exact_one_per_hash(spark, tmp_path):
    from chronon_spark.streaming.curation import stream_dedup_exact

    t0 = 1_700_000_000_000
    rows = [
        (1, t0 + 1000, "the same page text body"),
        (2, t0 + 2000, "the same page text body"),      # dup (later)
        (3, t0 + 3000, "a different page entirely"),
        (4, t0 + 4000, "The  Same   page TEXT body"),   # dup after normalize
    ]
    src = _write_crawl(spark, tmp_path, rows)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = _run_stream(
        spark, stream_dedup_exact(stream, "ts"), "dedup_stream_t1"
    )
    # exactly one survivor per distinct normalized text
    assert len(out) == 2
    from chronon_spark.operators.dedup import exact_dedup

    batch_hashes = {
        r["__h"]
        for r in exact_dedup(spark.read.parquet(src), "doc_id")
        .select(F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("__h"))
        .collect()
    }
    got_hashes = {
        r["__h"]
        for r in spark.createDataFrame(out)
        .select(F.md5(F.regexp_replace(F.lower(F.trim("text")), r"\s+", " ")).alias("__h"))
        .collect()
    }
    assert got_hashes == batch_hashes


def test_stream_quality_and_pii_match_batch(spark, tmp_path):
    from chronon_spark.operators.pii import pii_scan
    from chronon_spark.operators.textstats import quality_score, token_count
    from chronon_spark.streaming.curation import (
        stream_quality_filter,
        stream_redact_pii,
    )

    t0 = 1_700_000_000_000
    long_text = (
        "the quick brown fox jumps over the lazy dog and the cat sat on "
        "the mat while the dog ran far away to the hills and back again. "
        "contact me at jane.doe@example.org or 555-123-4567 for details."
    )
    rows = [
        (1, t0 + 1000, long_text),
        (2, t0 + 2000, "short junk 123"),
        (3, t0 + 3000, long_text + " more of the usual filler text here."),
    ]
    src = _write_crawl(spark, tmp_path, rows)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = _run_stream(
        spark,
        stream_redact_pii(stream_quality_filter(stream)),
        "quality_stream_t1",
    )
    batch = (
        spark.read.parquet(src)
        .where((quality_score("text") >= 0.3) & (token_count("text") >= 20))
    )
    red = pii_scan(batch, "doc_id").select("doc_id", "redacted")
    batch_pdf = (
        batch.join(red, "doc_id")
        .select("doc_id", F.col("redacted").alias("text"))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = out[["doc_id", "text"]].sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, batch_pdf)
    assert (got.doc_id == [1, 3]).all()
    assert got.text.str.contains("<EMAIL>").all()
    assert not got.text.str.contains("example.org").any()


def test_stream_decontaminate_matches_batch(spark, tmp_path):
    from chronon_spark.operators.dedup import decontaminate
    from chronon_spark.streaming.curation import stream_decontaminate

    t0 = 1_700_000_000_000
    eval_text = "benchmark question about the capital of france and its rivers"
    rows = [
        (1, t0 + 1000, f"intro words then {eval_text} closing words"),
        (2, t0 + 2000, "completely unrelated document about spark shuffles and joins"),
        (3, t0 + 3000, "another clean document with plenty of ordinary words inside"),
    ]
    src = _write_crawl(spark, tmp_path, rows)
    eval_df = spark.createDataFrame(pd.DataFrame({"text": [eval_text]}))
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = _run_stream(
        spark, stream_decontaminate(stream, eval_df, k=8), "decon_stream_t1"
    )
    batch = decontaminate(spark.read.parquet(src), eval_df, "doc_id", k=8)
    assert sorted(out.doc_id) == sorted(r["doc_id"] for r in batch.collect())
    assert 1 not in set(out.doc_id)


def test_stream_model_filter_matches_batch(spark, tmp_path):
    """Distilled-model ingest gate: offline-trained perceptron weights
    score the stream identically to the batch scorer (lambda consistency
    for a LEARNED filter)."""
    from chronon_spark.operators.classifier import (
        batch_perceptron,
        hashed_features,
        perceptron_scores,
    )
    from chronon_spark.streaming.curation import stream_model_filter

    t0 = 1_700_000_000_000
    good = "excellent coherent informative structured prose with substance"
    bad = "spam click here buy now casino pills"
    rows = [(i, t0 + i * 1000, (good if i % 2 == 0 else bad) + f" tail {i % 3}")
            for i in range(20)]
    src = _write_crawl(spark, tmp_path, rows)
    train = spark.read.parquet(src)
    feats = hashed_features(train, "doc_id", dim=64)
    labels = train.selectExpr("doc_id AS id",
                              "IF(text LIKE '%excellent%', 1, -1) AS y")
    w = batch_perceptron(spark, feats, labels, epochs=3)

    schema = train.schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = _run_stream(
        spark, stream_model_filter(stream, w, dim=64), "model_stream_t1"
    )
    batch_kept = {
        r["id"]
        for r in perceptron_scores(spark, feats, labels, w).collect()
        if r["score"] > 0
    }
    assert set(out.doc_id) == batch_kept
    assert all(i % 2 == 0 for i in out.doc_id)  # learned gate keeps the good half


def test_stream_phrase_filter_matches_batch(spark, tmp_path):
    """Streaming phrase gate == batch positional-intersection search:
    a doc survives the stream iff phrase_search reports no phrase hit."""
    from chronon_spark.operators.indexing import phrase_search, tokenize
    from chronon_spark.streaming.curation import stream_phrase_filter

    t0 = 1_700_000_000_000
    rows = [
        (1, t0 + 1000, "the capital of France is Paris, everyone knows"),
        (2, t0 + 2000, "capital the of france scrambled words never match"),
        (3, t0 + 3000, "short doc"),  # shorter than any phrase
        (4, t0 + 4000, "ends with the capital of france"),  # match at END
        (5, t0 + 5000, "!!! ???"),  # zero tokens
        (6, t0 + 6000, "clean document with plenty of ordinary words"),
    ]
    src = _write_crawl(spark, tmp_path, rows)
    phrases = spark.createDataFrame(
        [(1, "The Capital of FRANCE!"), (2, "plenty of ordinary")],
        "phrase_id long, phrase string",
    )
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    out = _run_stream(
        spark, stream_phrase_filter(stream, phrases), "phrase_stream_t1"
    )
    batch_docs = spark.read.parquet(src)
    hit_ids = {
        r.doc_id
        for r in phrase_search(tokenize(batch_docs), phrases).collect()
    }
    assert hit_ids == {1, 4, 6}
    assert sorted(out.doc_id) == sorted(
        r.doc_id for r in batch_docs.collect() if r.doc_id not in hit_ids
    )
    # empty phrase set is the identity
    none = spark.createDataFrame([], "phrase_id long, phrase string")
    out2 = _run_stream(
        spark,
        stream_phrase_filter(
            spark.readStream.schema(schema).parquet(src), none
        ),
        "phrase_stream_t2",
    )
    assert len(out2) == 6
