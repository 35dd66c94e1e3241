"""Context-window chunking: split documents into overlapping token
windows — the step between curation and sequence packing in a training
pipeline (long documents must be cut to the model context before
``packing.pack_sequences`` bins them).

Pure Catalyst: tokenize with one ``split``, derive the chunk-start list
with ``sequence``, ``explode`` it, and cut each window with ``slice`` +
``array_join`` — a narrow projection with ZERO exchanges, so at 100 TB
it pipelines inside the scan stage; output size is bounded by
``ceil(n_tokens / stride)`` chunks per document, each chunk at most
``chunk_tokens`` tokens.

Tokenization is the repo-wide whitespace convention
(``dedup.words`` — the same stream ``textstats.token_count`` counts);
rejoining with single spaces is the standard lossy-whitespace chunk
normalization (a chunk is a token window, not a byte span).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chronon_spark.operators.dedup import words


def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str = "text",
    chunk_tokens: int = 512,
    overlap: int = 64,
) -> DataFrame:
    """One row per (document, chunk): ``(id_col, chunk_index, n_tokens,
    chunk_text)``.

    Windows start every ``stride = chunk_tokens - overlap`` tokens; the
    last window is the remainder (never padded). Documents whose text is
    blank produce no chunks. Deterministic — no sampling, no hashing.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = words(text_col)
    n = F.size(toks)
    # chunk count: 1 window if n <= chunk_tokens else 1 + ceil((n-c)/stride)
    extra = F.floor(
        (n - F.lit(chunk_tokens) + F.lit(stride) - 1) / F.lit(stride)
    ).cast("int")
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(F.lit(1) + extra)
    base = df.where(F.length(F.trim(F.col(text_col))) > 0).select(
        F.col(id_col),
        toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_index"),
    )
    start = F.col("chunk_index") * stride
    window = F.slice(F.col("__toks"), start + 1, chunk_tokens)
    return base.select(
        F.col(id_col),
        F.col("chunk_index").cast("long").alias("chunk_index"),
        F.size(window).cast("long").alias("n_tokens"),
        F.array_join(window, " ").alias("chunk_text"),
    )


def chunk_stats(chunks: DataFrame, id_col: str) -> DataFrame:
    """Per-document chunk accounting (chunk count, token total, tail
    fill) — one map-side-combinable aggregation."""
    return chunks.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.sum("n_tokens").alias("total_tokens"),
        F.max("n_tokens").alias("max_chunk_tokens"),
        F.min("n_tokens").alias("min_chunk_tokens"),
    )
