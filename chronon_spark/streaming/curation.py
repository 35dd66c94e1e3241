"""Streaming corpus curation: the ingest-time half of the training-data
pipeline (filter/redact/dedup documents AS THEY ARRIVE, so the batch
passes start from a pre-cleaned corpus).

Everything stateless (quality, PII, decontamination) is the SAME Catalyst
expression tree as the batch operators — a streaming DataFrame accepts
them unchanged, so stream and batch results are identical by
construction and the batch oracles transfer. The only stateful piece is
exact dedup, which uses Structured Streaming's
``dropDuplicatesWithinWatermark`` so the dedup state is BOUNDED by the
watermark delay (an unbounded dropDuplicates state would OOM on an
infinite crawl; within-watermark is the correct semantics for a crawl
stream where re-fetches of the same page cluster in time).

Scale shape: stateless stages are per-record projections (no state, no
shuffle); dedup keeps one hash per in-flight watermark window in the
state store; decontamination broadcasts only the eval set's gram hashes
(small by construction) into every micro-batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chronon_spark.operators.dedup import norm_text, shingles
from chronon_spark.operators.pii import redact_pii
from chronon_spark.operators.textstats import quality_score, token_count


def stream_dedup_exact(
    stream: DataFrame,
    ts_col: str,
    text_col: str = "text",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """Keep the FIRST-arriving document per distinct normalized text.

    State is bounded: a text hash is remembered only while its event time
    is within ``watermark_delay`` of the stream's max event time
    (dropDuplicatesWithinWatermark), matching how page re-fetches arrive
    in practice. Batch equivalence: one survivor per distinct hash (the
    batch op keeps min-id; the stream keeps first-arrival — same
    survivor COUNT and same covered hash set, pinned in tests).
    """
    assert stream.isStreaming
    hashed = stream.withColumn("__h", F.md5(norm_text(text_col)))
    return (
        hashed.withWatermark(ts_col, watermark_delay)
        .dropDuplicatesWithinWatermark(["__h"])
        .drop("__h")
    )


def stream_quality_filter(
    stream: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.3,
    min_tokens: int = 20,
) -> DataFrame:
    """Stateless quality gate — identical expression tree to the batch
    filter, so stream output == batch output row-for-row."""
    return stream.where(
        (quality_score(text_col) >= F.lit(min_quality))
        & (token_count(text_col) >= F.lit(min_tokens))
    )


def stream_model_filter(
    stream: DataFrame,
    weights: dict,
    text_col: str = "text",
    dim: int = 256,
    threshold: int = 0,
) -> DataFrame:
    """Stateless distilled-model gate: score each row under
    batch-perceptron weights (operators.classifier.scoring_expr — literal
    weight map + Catalyst aggregate HOF, no shuffle/join/Python) and keep
    rows scoring above ``threshold``. The offline-trained quality model
    deployed at ingest time unchanged — the lambda-consistency stance the
    rest of this module takes, applied to a learned filter."""
    from chronon_spark.operators.classifier import scoring_expr

    return stream.where(scoring_expr(weights, text_col, dim) > F.lit(threshold))


def stream_redact_pii(stream: DataFrame, text_col: str = "text") -> DataFrame:
    """Stateless PII cascade in place (same cascade as operators.pii)."""
    return stream.withColumn(text_col, redact_pii(text_col))


def stream_phrase_filter(
    stream: DataFrame,
    phrases_df: DataFrame,
    text_col: str = "text",
    phrase_col: str = "phrase",
) -> DataFrame:
    """Drop streaming docs containing ANY probe phrase as a contiguous
    token run — the phrase-level decontamination gate at ingest time,
    STATELESS: the (bounded-by-construction) phrase set is collected once
    and compiled into a nested higher-order Catalyst expression over the
    doc's token array, so the filter is a per-record projection with
    zero streaming state, no join, no Python.

    Semantics are pinned equal to the batch positional-intersection
    ``operators.indexing.phrase_search`` (pytest): a doc is dropped iff
    phrase_search would report it for some phrase. The per-record cost is
    O(|tokens| x total phrase length) — right for eval-set-sized phrase
    lists; for an UNBOUNDED phrase corpus run the batch ``phrase_search``
    inside ``foreachBatch`` where the broadcast join applies unchanged.
    """
    from chronon_spark.operators.indexing import norm_words

    assert not phrases_df.isStreaming
    plist = [
        r[0]
        for r in phrases_df.select(norm_words(phrase_col)).collect()
        if r[0]  # empty-token phrases can never occur
    ]
    if not plist:
        return stream
    phrase_lits = F.array(
        *[F.array(*[F.lit(w) for w in p]) for p in plist]
    )
    toks = norm_words(text_col)

    def occurs(p):
        # i = 1-based start into toks; CASE-guarded so the sequence is
        # never descending (sequence(1, 0) would yield index 0 and
        # element_at would throw)
        return F.exists(
            F.sequence(F.lit(1), (F.size(toks) - F.size(p) + 1).cast("int")),
            lambda i: F.forall(
                F.sequence(F.lit(0), (F.size(p) - 1).cast("int")),
                lambda j: F.element_at(toks, (i + j).cast("int"))
                == F.element_at(p, (j + 1).cast("int")),
            ),
        )

    match = F.exists(
        phrase_lits,
        lambda p: F.when(F.size(toks) >= F.size(p), occurs(p)).otherwise(
            F.lit(False)
        ),
    )
    return stream.where(~match)


def stream_decontaminate(
    stream: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    eval_text_col: str = "text",
    k: int = 8,
) -> DataFrame:
    """Drop streaming docs sharing any word k-gram with the (batch)
    eval/benchmark set — STATELESS: the eval set's distinct 60-bit gram
    hashes are collected once and compiled into an InSet predicate (a
    hash-set membership test per gram, not a join), so the filter is a
    per-record projection with zero streaming state.

    Correct because benchmark sets are bounded by construction (at most a
    few hundred thousand gram hashes — the same cardinality the batch op
    broadcasts). ``arrays_overlap`` probes a hash set of the smaller
    side, so the per-record cost is linear, not #grams x #eval. For an
    UNBOUNDED contamination list, run the batch
    ``operators.dedup.decontaminate`` inside ``foreachBatch`` instead —
    per-micro-batch it is a plain batch frame and the broadcast anti-join
    applies unchanged. Stream output == batch output row-for-row
    (pytest-pinned)."""
    assert not eval_df.isStreaming
    gh = lambda c: F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")  # noqa: E731
    hashes = [
        r["gh"]
        for r in eval_df.select(F.explode(shingles(eval_text_col, k)).alias("g"))
        .select(gh(F.col("g")).alias("gh"))
        .distinct()
        .collect()
    ]
    if not hashes:
        return stream
    lit_hashes = F.array(*[F.lit(h) for h in hashes])
    doc_grams = F.transform(shingles(text_col, k), lambda g: gh(g))
    return stream.where(~F.arrays_overlap(doc_grams, lit_hashes))
