"""End-to-end webtext curation pipeline — the LLM-training-data shape.

Composes the engine's pipeline operators the way a Common-Crawl-style
curation job does:

  1. generate/load crawl records (url, warc_ts, html, text, lang)
  2. extract text (byte-identical contract) + canonicalize URLs
  3. keep the latest crawl per canonical url (as-of dedup by url)
  4. exact-dedup identical texts
  5. quality filtering: doc stats + Gopher repetition rules
  6. PII redaction in place (email/card/SSN/IP/phone cascade)
  7. duplicated-span filter (ExactSubstr doc signal: drop docs that are
     mostly exact 8-gram spans shared with other docs)
  8. near-dup removal with banded MinHash LSH (keep min doc per cluster)
  9. benchmark decontamination (8-gram overlap vs a held-out eval set)
 10. temperature-scaled language mix (count^0.7 target mass)
 11. leakage-safe train/val/test split
 12. train a BPE vocabulary on the TRAIN split, tokenize with it, pack
     the real token counts into fixed-token training rows, and
     shard-shuffle the packed bins into a reproducible training order
 13. emit per-stage survivor counts (the pipeline's audit trail); along
     the way the quality heuristic is distilled into a batch-perceptron
     classifier (audit stage: reports training agreement)

Run:  python examples/webtext_curation.py [n_rows]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chronon_spark.checkpoint import release_checkpoint


def curate(
    spark: SparkSession,
    crawl: DataFrame,
    eval_set: DataFrame = None,
    blocked_domains: tuple = (),
    blocked_terms: tuple = (),
    boilerplate_min_docs: int = 10,
    dup_span_max: float = 0.5,
    decontam_k: int = 8,
    verbose: bool = True,
) -> dict:
    """Returns {"stages": [(name, rows, stage_wall_sec)], "result": DataFrame}.

    ``eval_set``: optional (text) benchmark frame to decontaminate
    against; when None the decontamination stage is skipped.
    ``blocked_domains``/``blocked_terms``: optional blocklists — when
    empty the blocklist stage is skipped."""
    from chronon_spark.operators.dedup import (
        boilerplate_lines,
        exact_dedup,
        minhash_lsh_pairs,
    )
    from chronon_spark.operators.text_extract import extract_text_lines
    from chronon_spark.operators.textstats import (
        blocklist_flags,
        canonical_url,
        document_stats,
        repetition_flags,
    )

    stages = []
    _last = [None]  # previous stage's checkpoint, released when superseded
    _t = [__import__("time").time()]  # per-stage wall (since prior stage)

    def stage(name, df):
        # localCheckpoint, NOT persist: persist caches execution but the
        # logical plan keeps growing — after ~10 chained stages Catalyst's
        # project-collapse substitutes aliased expressions into each other
        # until a single expression tree is exponentially large, and one
        # driver thread burns minutes in Expression.toString/optimization
        # (observed: 6-min single-thread stall between two trivial stages
        # at 20k rows). Checkpointing every audited stage both caches the
        # rows for the audit count AND truncates the plan, so every
        # stage's optimization cost is one stage deep, independent of
        # pipeline length. The pipeline is a linear chain, so once this
        # stage's checkpoint is materialized the previous one is dead —
        # released deterministically (DataFrame GC + ContextCleaner is
        # unbounded; chronon_spark.checkpoint) unless pin_last() kept it
        # for the caller (the returned corpus/train frames).
        df = df.localCheckpoint()
        n = df.count()
        release_checkpoint(_last[0])
        _last[0] = df
        now = __import__("time").time()
        stages.append((name, n, round(now - _t[0], 3)))
        _t[0] = now
        if verbose:
            print(f"  {name:<28s} {n:>10,d} rows  {stages[-1][2]:7.2f}s")
        return df

    def pin_last():
        _last[0] = None

    docs = stage("crawl records", crawl)

    # 2. LINE-PRESERVING extraction + canonical url (block tags become
    # newlines so the line-level boilerplate stage has lines to act on)
    docs = docs.withColumn("text", extract_text_lines(F.col("html")))
    docs = docs.withColumn("curl", canonical_url("url"))

    # 3. latest crawl per canonical url
    from pyspark.sql import Window as W

    w = W.partitionBy("curl").orderBy(F.col("warc_ts").desc())
    docs = stage(
        "latest per canonical url",
        docs.withColumn("__rn", F.row_number().over(w)).where("__rn = 1").drop("__rn"),
    )
    docs = docs.select(F.col("curl").alias("doc_id"), "text", "lang")

    # 3b. line-level boilerplate removal (C4 §2.2): drop every line that
    # appears on >= boilerplate_min_docs distinct pages (per-domain nav
    # bars, cookie footers), rebuild the doc, then collapse the surviving
    # lines to single-line text for the document-level stages. Docs whose
    # every line was boilerplate drop out here.
    bp = boilerplate_lines(docs, "doc_id", min_docs=boilerplate_min_docs)
    docs = stage(
        "boilerplate line removal",
        docs.drop("text")
        .join(bp.where("length(clean_text) > 0"), "doc_id")
        .select(
            "doc_id",
            F.regexp_replace("clean_text", "\n", " ").alias("text"),
            "lang",
        ),
    )

    # 3c. optional domain/term blocklist (UT1/LDNOOBW-style)
    if blocked_domains or blocked_terms:
        flags = blocklist_flags(
            docs.withColumn(
                "domain", F.regexp_extract("doc_id", r"://([^/]+)", 1)
            ),
            "doc_id",
            domain_col="domain",
            blocked_domains=blocked_domains,
            blocked_terms=blocked_terms,
        )
        docs = stage(
            "blocklist filter",
            docs.join(flags.where("kept").select("doc_id"), "doc_id"),
        )

    # 4. exact dedup of identical normalized texts
    docs = stage(
        "exact text dedup", exact_dedup(docs, "doc_id").select("doc_id", "text", "lang")
    )

    # 5. quality filters
    stats = document_stats(docs, "doc_id").select("doc_id", "quality", "n_tokens")
    rep = repetition_flags(docs, "doc_id").select("doc_id", "passes_repetition")
    labeled = (
        docs.join(stats, "doc_id")
        .join(rep, "doc_id")
        .withColumn(
            "__y",
            F.expr(
                "IF(quality >= 0.3 AND n_tokens >= 20 AND passes_repetition, 1, -1)"
            ),
        )
        .persist()
    )
    docs = stage(
        "quality + repetition filters",
        labeled.where("__y = 1").select("doc_id", "text", "lang"),
    )

    # 5b. distill the quality heuristic into a hashed-bag-of-words batch
    # perceptron (fastText-quality-filter recipe): at production scale the
    # heuristic runs once to label, the linear model scores every future
    # crawl for a fraction of the cost. Audit-only stage: reports training
    # agreement, does not change survivorship.
    from chronon_spark.operators.classifier import (
        batch_perceptron,
        hashed_features,
        perceptron_scores,
    )

    cls_feats = hashed_features(labeled, "doc_id", dim=512).persist()
    cls_labels = labeled.select(F.col("doc_id").alias("id"), F.col("__y").alias("y"))
    cls_w = batch_perceptron(spark, cls_feats, cls_labels, epochs=3)
    agree = (
        perceptron_scores(spark, cls_feats, cls_labels, cls_w)
        .agg(F.avg((F.col("pred") == F.col("y")).cast("double")))
        .first()[0]
    )
    cls_feats.unpersist()
    labeled.unpersist()
    if verbose:
        print(f"  {'quality classifier distilled':<28s} {agree:>9.1%} agreement "
              f"({len(cls_w)} non-zero weights)")

    # 6. PII redaction in place (same row count — audit-trail stage):
    # training text must not ship raw emails/cards/SSNs/IPs/phones
    from chronon_spark.operators.pii import pii_scan

    red = pii_scan(docs, "doc_id").select("doc_id", "redacted")
    docs = stage(
        "pii redaction (in place)",
        docs.join(red, "doc_id").select(
            "doc_id", F.col("redacted").alias("text"), "lang"
        ),
    )

    # 7. duplicated-span filter: drop docs that are MOSTLY exact 8-gram
    # spans shared with other docs (boilerplate/licence pages survive
    # whole-doc near-dup checks but still poison training data)
    from chronon_spark.operators.dedup import duplicated_span_flags

    spans = duplicated_span_flags(docs, "doc_id", k=8).select(
        F.col("id").alias("doc_id"), "dup_span_frac"
    )
    docs = stage(
        f"duplicated-span filter (<={dup_span_max:.0%})",
        docs.join(spans, "doc_id")
        .where(F.col("dup_span_frac") <= dup_span_max)
        .select("doc_id", "text", "lang"),
    )

    # 8. near-dup removal: LSH pairs -> connected components -> keep the
    # canonical (min-id) document per cluster. Dropping id_b per pair
    # would over-drop under transitive chains (a~b, b~c keeps only a
    # correct set when resolved as ONE cluster).
    from chronon_spark.operators.dedup import duplicate_clusters, keep_canonical

    # (docs is the live staged frame — already cached by stage())
    pairs = minhash_lsh_pairs(
        docs, "doc_id", n_hashes=16, bands=4, shingle_k=3, verify_threshold=0.85
    ).localCheckpoint()
    clusters = duplicate_clusters(pairs)
    docs = stage(
        "near-dup removal (LSH + CC)",
        keep_canonical(docs, clusters, "doc_id"),
    )
    # both side-frames are checkpoints fully consumed by the stage above
    release_checkpoint(pairs)
    release_checkpoint(clusters)

    # 9. benchmark decontamination: drop any doc sharing an 8-gram with
    # the held-out eval set (broadcast semi-join on gram hashes)
    from chronon_spark.operators.dedup import decontaminate

    if eval_set is not None:
        docs = stage(
            "benchmark decontamination",
            decontaminate(docs, eval_set, "doc_id", k=decontam_k),
        )
    corpus = docs  # the curated corpus; stages below assemble training data
    pin_last()  # corpus is returned to the caller — exempt from release

    # 10. temperature-scaled language mix: head languages damped toward
    # count^0.7 target mass, smallest kept whole (deterministic hash
    # membership — reproducible across runs/partitionings)
    from chronon_spark.operators.sampling import (
        shuffle_shards,
        temperature_mix,
        train_val_test_split,
    )

    docs = stage(
        "temperature mix (alpha=0.7)",
        temperature_mix(docs, "lang", 0.7, "doc_id", seed=23),
    )

    # 11. leakage-safe split; only the TRAIN split is packed
    split = train_val_test_split(docs, "doc_id", seed=29)
    train = stage("train split (90%)", split.where("split = 'train'"))

    # 12. train a BPE vocabulary on the TRAIN split (batched merges: 4
    # aggregation rounds for 32 merges), tokenize with it, and pack REAL
    # token counts into fixed-token training rows; shard-shuffle the
    # packed bins into a reproducible pseudo-random training order
    from chronon_spark.operators.packing import pack_sequences, pack_stats
    from chronon_spark.operators.tokenizer import bpe_token_stats, bpe_train

    merges = bpe_train(train, num_merges=32, min_count=2, batch_size=8)
    tokenized = bpe_token_stats(train, merges, "doc_id").select("doc_id", "n_tokens")
    if verbose:
        print(f"  {'bpe vocabulary trained':<28s} {len(merges):>10,d} merges")
    packed = pack_sequences(
        train.join(tokenized, "doc_id").selectExpr("doc_id", "n_tokens AS n_tok"),
        "doc_id", "n_tok", max_tokens=4096, n_shards=16,
    )
    bins = pack_stats(packed, 4096).withColumn(
        "bin_id", F.col("shard").cast("long") * 1_000_000 + F.col("bin")
    )
    order = shuffle_shards(bins, "bin_id", n_shards=4, seed=31)
    n_bins = order.count()
    stages.append(
        ("packed training rows", n_bins,
         round(__import__("time").time() - _t[0], 3))
    )
    if verbose:
        fill = bins.agg(F.avg("fill_ratio")).first()[0] or 0.0
        print(f"  {'packed training rows':<28s} {n_bins:>10,d} bins "
              f"(mean fill {fill:.2f}; shuffled into 4 read shards)")

    return {
        "stages": stages,
        "result": corpus,
        "train": train,
        "packed": packed,
        "order": order,
    }


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    from chronon_spark.session import build_session
    from chronon_spark.sources.webtext import generate_webtext

    spark = build_session(master="local[8]", shuffle_partitions=16,
                          extra_conf={"spark.ui.enabled": "false"})
    print(f"curating {n:,d} synthetic crawl records:")
    crawl = generate_webtext(
        spark, n, seed=7, n_domains=max(n // 600, 10), nav_boilerplate=True
    )
    # Decontamination demo: the generator walks a tiny cyclic word list, so
    # a same-generator eval set shares unbounded word runs with EVERY doc
    # and would (correctly) flag the whole corpus. Instead: a hand-written
    # disjoint benchmark set, plus 5 PLANTED crawl pages that leak eval
    # questions verbatim — the stage must remove exactly those.
    eval_qs = [
        f"benchmark question {i} probes the unseen topic {i * 7 + 1} "
        f"and the expected answer is {i * 13 + 5} according to the rubric"
        for i in range(50)
    ]
    eval_set = spark.createDataFrame([(q,) for q in eval_qs], "text string")
    base_row = crawl.select("warc_ts").limit(1).collect()[0]
    filler = ("with some additional context about the methodology and the "
              "evaluation protocol that was used when this question appeared")
    leaks = [
        (
            f"https://leak.example.com/q{i}",
            base_row["warc_ts"],
            f"<html><body><p>as seen online {eval_qs[i]} {filler} part {i}"
            f"</p></body></html>".encode(),
            None,
            "en",
        )
        for i in range(5)
    ]
    crawl = crawl.unionByName(spark.createDataFrame(leaks, crawl.schema))

    # crawl-archive leg: round-trip the corpus through real gzip-multistream
    # WARC archives — the ingestion path a production run takes from Common
    # Crawl files (html bytes stay identical; text/lang are recomputed from
    # the crawled bytes, which is exactly what a real ingest does).
    import tempfile

    from chronon_spark.sources.warc import warc_to_webtext, write_warc

    warc_dir = tempfile.mkdtemp(prefix="curation_warc_")
    manifest = write_warc(
        crawl, warc_dir, payload_col="html", warc_type="response",
        records_per_file=5000,
    ).collect()
    print(f"  exported {sum(m['n_records'] for m in manifest):,d} records "
          f"to {len(manifest)} WARC archives; re-ingesting")
    crawl = warc_to_webtext(spark, warc_dir)

    out = curate(
        spark,
        crawl,
        eval_set=eval_set,
        blocked_domains=("domain1.example.com",),
        blocked_terms=("casino",),
        # the generator's cyclic word stream makes EVERY synthetic doc share
        # 88-92% of its 8-grams with others (measured) — the real-data
        # default (0.5) would zero the demo corpus; 0.95 keeps the filter
        # exercised while dropping only outright near-copies
        dup_span_max=0.95,
    )
    survivors = out["result"].where("doc_id LIKE '%leak.example.com%'").count()
    print("planted eval-leak pages surviving decontamination:", survivors)
    print("final packed training rows:", out["stages"][-1][1])

    # WET-style export: the curated corpus back out as crawl archives —
    # the handoff format downstream tokenizer/training jobs consume.
    wet_dir = tempfile.mkdtemp(prefix="curation_wet_")
    wet = write_warc(
        out["result"].select(F.col("doc_id").alias("url"), "text"),
        wet_dir, payload_col="text", warc_type="conversion",
    ).collect()
    print(f"  curated corpus exported: {sum(m['n_records'] for m in wet):,d} "
          f"records / {sum(m['bytes'] for m in wet):,d} bytes in {len(wet)} WET files")


if __name__ == "__main__":
    main()
