"""End-to-end web-index pipeline — the search-engine shape of the
webtext surface, composing the round-4 operators the way a small crawl
processor does:

  1. generate/load crawl records (url, warc_ts, html, text, lang)
  2. link graph: href extraction → distinct domain edges
  3. rank domains three ways — integer-exact PageRank, HITS
     hubs/authorities, truncated harmonic centrality (HyperBall HLL at
     scale, exact BFS here)
  4. anchor-text top-k per target domain (salted two-phase top-k)
  5. inverted index with positions + vocabulary (df / total tf)
  6. BM25 top-k retrieval for a query set over the index
  7. phrase search (positional intersection) for exact-phrase probes
  8. per-domain rollup joining dup rate, length stats, and rank
  9. crawl-frontier priorities from recrawl change rates x rank
 10. TrustRank from the top-PageRank domains as a stand-in seed list
     (a real deployment hand-vets the seeds)
 11. crawl-trap detection over the URL space (template explosion)
 12. politeness-slot fetch waves over the prioritized frontier

Every step is a pure DataFrame plan from chronon_spark.operators —
nothing here is bespoke; the example only wires the operators.

Run:  python examples/web_index.py [n_rows]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def build_index(
    spark: SparkSession,
    crawl: DataFrame,
    queries: list,
    phrases: list,
    k: int = 5,
    verbose: bool = True,
) -> dict:
    """Returns a dict of the index artifacts, each a DataFrame."""
    from chronon_spark.operators.indexing import (
        bm25_topk,
        build_postings,
        crawl_priority,
        phrase_search,
        recrawl_stats,
        term_stats,
        tokenize,
    )
    from chronon_spark.operators.linkgraph import (
        anchor_top_k,
        domain_edges,
        domain_hits,
        domain_pagerank,
        extract_anchors,
        extract_links,
        harmonic_centrality,
    )

    def log(name, df):
        if verbose:
            print(f"  {name}: {df.count()} rows")
        return df

    pages = crawl.select(
        F.col("url"),
        F.expr("parse_url(url, 'HOST')").alias("src_domain"),
        "html",
        "text",
    )

    # --- link graph + three centralities ------------------------------
    edges = domain_edges(extract_links(pages)).persist()
    ranks = log("pagerank", domain_pagerank(edges, iters=4))
    hits = log("hits", domain_hits(edges, iters=3))
    # centrality counts who can REACH a domain: reverse the edges
    rev = edges.select(
        F.col("dst_domain").alias("src_domain"),
        F.col("src_domain").alias("dst_domain"),
    )
    harmonic = log("harmonic", harmonic_centrality(rev, max_dist=3, mode="exact"))
    anchors = log("anchors", anchor_top_k(extract_anchors(pages), k=3))

    # --- inverted index + retrieval -----------------------------------
    docs = pages.select(F.col("url").alias("doc_id"), "text")
    toks = tokenize(docs, "doc_id")
    postings = log("postings", build_postings(toks))
    vocab = log("vocab", term_stats(toks))
    qdf = (
        spark.createDataFrame(
            [(i, t) for i, q in enumerate(queries) for t in q.split()],
            "query_id int, term string",
        ).distinct()
    )
    hitsq = log("bm25", bm25_topk(toks, qdf, k=k))
    pdf = spark.createDataFrame(
        [(i, p) for i, p in enumerate(phrases)], "phrase_id int, phrase string"
    )
    matches = log("phrases", phrase_search(toks, pdf))

    # --- rollup + frontier --------------------------------------------
    from chronon_spark.operators.linkgraph import domain_rollup

    rollup = log(
        "rollup",
        domain_rollup(
            pages.select(
                F.col("src_domain").alias("domain"),
                "text",
                F.length("text").alias("n_chars"),
            ),
            ranks,
        ),
    )
    stats = recrawl_stats(pages.select("url", "text"))
    frontier = log("frontier", crawl_priority(stats, ranks))

    # --- trust, traps, fetch schedule ----------------------------------
    from chronon_spark.operators.indexing import schedule_crawl, url_trap_stats
    from chronon_spark.operators.linkgraph import domain_trustrank

    # stand-in seed list: the top PageRank domains (|seeds| rows to the
    # driver — bounded by construction); a real deployment hand-vets this
    seeds = spark.createDataFrame(
        [(r.domain,) for r in ranks.orderBy(F.desc("rank"), "domain").limit(3).collect()],
        "domain string",
    )
    trust = log("trust", domain_trustrank(edges, seeds, iters=4))
    traps = log("traps", url_trap_stats(crawl.select("url")))
    schedule = log(
        "schedule",
        schedule_crawl(
            frontier.select("url", "domain", "priority_micro"),
            per_slot=5,
            max_frontier_per_domain=50,
        ),
    )
    edges.unpersist()
    return {
        "ranks": ranks,
        "hits": hits,
        "harmonic": harmonic,
        "anchors": anchors,
        "postings": postings,
        "vocab": vocab,
        "bm25": hitsq,
        "phrases": matches,
        "rollup": rollup,
        "frontier": frontier,
        "trust": trust,
        "traps": traps,
        "schedule": schedule,
    }


def main(n_rows: int = 2_000):
    from chronon_spark.session import build_session
    from chronon_spark.sources.webtext import generate_webtext

    spark = build_session(
        master="local[8]",
        shuffle_partitions=8,
        extra_conf={"spark.ui.enabled": "false"},
    )
    crawl = generate_webtext(
        spark, n_rows, seed=42, n_domains=50, partitions=8, with_links=True
    )
    # corpus-derived probes: guaranteed hits, deterministic
    sample = crawl.select("text").first()["text"].split()
    arts = build_index(
        spark,
        crawl,
        queries=[" ".join(sample[:3]), "crawl index"],
        phrases=[" ".join(sample[:2]), " ".join(sample[2:5])],
    )
    top = arts["ranks"].orderBy(F.desc("rank")).limit(5).collect()
    print("top domains:", [(r.domain, r.rank) for r in top])


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2_000)
