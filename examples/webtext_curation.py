"""End-to-end webtext curation pipeline — the LLM-training-data shape.

Composes the engine's pipeline operators the way a Common-Crawl-style
curation job does:

  1. generate/load crawl records (url, warc_ts, html, text, lang)
  2. extract text (byte-identical contract) + canonicalize URLs
  3. keep the latest crawl per canonical url (as-of dedup by url)
  4. exact-dedup identical texts
  5. quality filtering: doc stats + Gopher repetition rules
  6. near-dup removal with banded MinHash LSH (keep min doc per cluster)
  7. emit per-stage survivor counts (the pipeline's audit trail)

Run:  python examples/webtext_curation.py [n_rows]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate(spark: SparkSession, crawl: DataFrame, verbose: bool = True) -> dict:
    """Returns {"stages": [(name, rows)], "result": DataFrame}."""
    from chronon_spark.operators.dedup import exact_dedup, minhash_lsh_pairs
    from chronon_spark.operators.text_extract import extract_text
    from chronon_spark.operators.textstats import (
        canonical_url,
        document_stats,
        repetition_flags,
    )

    stages = []

    def stage(name, df):
        n = df.count()
        stages.append((name, n))
        if verbose:
            print(f"  {name:<28s} {n:>10,d} rows")
        return df

    docs = stage("crawl records", crawl)

    # 2. extraction + canonical url
    docs = docs.withColumn("text", extract_text(F.col("html")))
    docs = docs.withColumn("curl", canonical_url("url"))

    # 3. latest crawl per canonical url
    from pyspark.sql import Window as W

    w = W.partitionBy("curl").orderBy(F.col("warc_ts").desc())
    docs = stage(
        "latest per canonical url",
        docs.withColumn("__rn", F.row_number().over(w)).where("__rn = 1").drop("__rn"),
    )
    docs = docs.select(F.col("curl").alias("doc_id"), "text").persist()

    # 4. exact dedup of identical normalized texts
    docs = stage("exact text dedup", exact_dedup(docs, "doc_id").select("doc_id", "text"))

    # 5. quality filters
    stats = document_stats(docs, "doc_id").select("doc_id", "quality", "n_tokens")
    rep = repetition_flags(docs, "doc_id").select("doc_id", "passes_repetition")
    docs = stage(
        "quality + repetition filters",
        docs.join(stats, "doc_id")
        .join(rep, "doc_id")
        .where("quality >= 0.3 AND n_tokens >= 20 AND passes_repetition")
        .select("doc_id", "text"),
    )

    # 6. near-dup removal: LSH pairs -> connected components -> keep the
    # canonical (min-id) document per cluster. Dropping id_b per pair
    # would over-drop under transitive chains (a~b, b~c keeps only a
    # correct set when resolved as ONE cluster).
    from chronon_spark.operators.dedup import duplicate_clusters, keep_canonical

    # each audited stage is persisted so later stage counts (and the
    # iterative cluster resolution) do not recompute the whole upstream
    # pipeline per action
    docs = docs.persist()
    pairs = minhash_lsh_pairs(
        docs, "doc_id", n_hashes=16, bands=4, shingle_k=3, verify_threshold=0.85
    ).localCheckpoint()
    docs = stage(
        "near-dup removal (LSH + CC)",
        keep_canonical(docs, duplicate_clusters(pairs), "doc_id"),
    ).persist()

    # 7. deterministic downsample (reproducible across runs/partitionings)
    from chronon_spark.operators.sampling import hash_sample

    docs = stage("hash downsample (90%)", hash_sample(docs, 0.9, "doc_id", seed=11))

    # 8. pack into fixed-token training rows
    from chronon_spark.operators.packing import pack_sequences, pack_stats

    packed = pack_sequences(
        docs.selectExpr("doc_id", "length(text) div 4 AS n_tok"),
        "doc_id", "n_tok", max_tokens=4096, n_shards=16,
    )
    bins = pack_stats(packed, 4096)
    n_bins = bins.count()
    stages.append(("packed training rows", n_bins))
    if verbose:
        fill = bins.agg(F.avg("fill_ratio")).first()[0]
        print(f"  {'packed training rows':<28s} {n_bins:>10,d} bins "
              f"(mean fill {fill:.2f})")

    return {"stages": stages, "result": docs, "packed": packed}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    from chronon_spark.session import build_session
    from chronon_spark.sources.webtext import generate_webtext

    spark = build_session(master="local[8]", shuffle_partitions=16,
                          extra_conf={"spark.ui.enabled": "false"})
    print(f"curating {n:,d} synthetic crawl records:")
    crawl = generate_webtext(spark, n, seed=7, n_domains=max(n // 600, 10))
    out = curate(spark, crawl)
    print("final corpus:", out["stages"][-1][1], "documents")


if __name__ == "__main__":
    main()
