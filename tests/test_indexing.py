"""Inverted index, phrase search, and crawl diff (operators/indexing.py).

Hand-computed oracles on adversarial micro-corpora: repeated terms inside
phrases, punctuation-only docs, phrase at doc start/end, self-overlapping
occurrences, and every crawl_diff status.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.indexing import (
    JACCARD_SCALE,
    build_postings,
    crawl_diff,
    phrase_search,
    term_stats,
    tokenize,
)

DOCS = [
    (1, "The cat sat on the mat."),
    (2, "the cat THE cat the"),  # repeated bigram "the cat"
    (3, "!!! ???"),  # normalizes to zero tokens
    (4, "mat"),  # single-token doc
    (5, "cat the cat the cat"),  # alternating, overlapping candidates
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_tokenize_positions_and_normalization(docs):
    rows = tokenize(docs).where(F.col("doc_id") == 1).orderBy("pos").collect()
    assert [(r.pos, r.term) for r in rows] == [
        (1, "the"),
        (2, "cat"),
        (3, "sat"),
        (4, "on"),
        (5, "the"),
        (6, "mat"),
    ]
    # punctuation-only doc contributes no tokens at all
    assert tokenize(docs).where(F.col("doc_id") == 3).count() == 0


def test_postings_and_term_stats(docs):
    toks = tokenize(docs)
    post = {
        (r.term, r.doc_id): (r.tf, r.positions)
        for r in build_postings(toks).collect()
    }
    assert post[("the", 1)] == (2, [1, 5])
    assert post[("the", 2)] == (3, [1, 3, 5])
    assert post[("cat", 5)] == (3, [1, 3, 5])
    stats = {r.term: (r.df, r.total_tf) for r in term_stats(toks).collect()}
    assert stats["the"] == (3, 7)  # docs 1,2,5
    assert stats["cat"] == (3, 6)
    assert stats["mat"] == (2, 2)
    assert stats["sat"] == (1, 1)


def _search(spark, docs, phrases):
    pdf = spark.createDataFrame(
        list(enumerate(phrases)), "phrase_id long, phrase string"
    )
    out = phrase_search(tokenize(docs), pdf)
    return {(r.phrase_id, r.doc_id) for r in out.collect()}


def test_phrase_search_basic_and_boundaries(spark, docs):
    hits = _search(spark, docs, ["the cat", "on the mat", "cat sat", "mat"])
    assert {d for p, d in hits if p == 0} == {1, 2, 5}  # "the cat"
    assert {d for p, d in hits if p == 1} == {1}  # phrase at doc END
    assert {d for p, d in hits if p == 2} == {1}
    assert {d for p, d in hits if p == 3} == {1, 4}  # single-term phrase


def test_phrase_with_repeated_term(spark, docs):
    # "the cat the" needs DISTINCT offsets: doc 2 = the cat the cat the
    hits = _search(spark, docs, ["the cat the", "cat the cat"])
    # doc 2 = the cat the cat the; doc 5 = cat the cat the cat — both
    # contain both phrases, at self-overlapping starts
    assert {d for p, d in hits if p == 0} == {2, 5}
    assert {d for p, d in hits if p == 1} == {2, 5}


def test_phrase_no_false_adjacency(spark, docs):
    # terms present but never adjacent in this order
    hits = _search(spark, docs, ["mat the", "sat cat"])
    assert hits == set()


def test_phrase_normalization_matches_doc_side(spark, docs):
    hits = _search(spark, docs, ["The, CAT!"])
    assert {d for _, d in hits} == {1, 2, 5}


def _diff(spark, old_rows, new_rows):
    old = spark.createDataFrame(old_rows, "url string, text string")
    new = spark.createDataFrame(new_rows, "url string, text string")
    return {
        r.url: (r.status, r.jaccard_micro)
        for r in crawl_diff(old, new).collect()
    }


def test_crawl_diff_statuses(spark):
    got = _diff(
        spark,
        [
            ("u1", "alpha beta gamma"),
            ("u2", "old page body"),
            ("u3", "same text"),
            ("u4", "alpha beta"),
        ],
        [
            ("u1", "alpha beta delta"),  # changed: |∩|=2, |∪|=4
            ("u3", "same text"),  # unchanged
            ("u4", "Alpha  BETA"),  # same word set, different bytes
            ("u5", "brand new"),  # added
        ],
    )
    assert got["u1"] == ("changed", JACCARD_SCALE * 2 // 4)
    assert got["u2"] == ("deleted", None)
    assert got["u3"] == ("unchanged", JACCARD_SCALE)
    assert got["u4"] == ("changed", JACCARD_SCALE)  # byte-diff, set-identical
    assert got["u5"] == ("added", None)


def test_crawl_diff_empty_token_bodies(spark):
    got = _diff(spark, [("u1", "!!!"), ("u2", "words here")], [("u1", "???"), ("u2", "!!!")])
    # both sides tokenize to empty sets -> identical-empties convention
    assert got["u1"] == ("changed", JACCARD_SCALE)
    # one side empty, other not -> jaccard 0
    assert got["u2"] == ("changed", 0)


def test_plan_is_python_free(docs, spark):
    from bench import plan_digest

    pdf = spark.createDataFrame([(0, "the cat")], "phrase_id long, phrase string")
    d = plan_digest(phrase_search(tokenize(docs), pdf))
    assert d["python_stages"] == 0
    assert d["broadcast_joins"] >= 2  # phrase terms + phrase lengths
    d2 = plan_digest(crawl_diff(docs.selectExpr("cast(doc_id as string) url", "text"),
                                docs.selectExpr("cast(doc_id as string) url", "text")))
    assert d2["python_stages"] == 0


def _bm25_py(docs_tokens, queries, k=5):
    """Pure-Python replica of the integer BM25 algebra (k1=1.2, b=0.75)."""
    import math
    from collections import Counter

    N = len(docs_tokens)
    total = sum(len(t) for t in docs_tokens.values())
    tf = {d: Counter(t) for d, t in docs_tokens.items()}
    vocab = set().union(*queries.values())
    df = {w: sum(1 for d in docs_tokens if tf[d][w] > 0) for w in vocab}
    idf = {
        w: max(0, math.floor(math.log((2 * N - 2 * df[w] + 1) / (2 * df[w] + 1)) * 1e6 + 0.5))
        for w in vocab
        if df[w] > 0
    }
    out = set()
    for q, terms in queries.items():
        scores = {}
        for d, toks in docs_tokens.items():
            matched = [w for w in terms if tf[d][w] > 0 and w in idf]
            if not matched:
                continue
            dl = len(toks)
            norm = (dl * N * 1000) // total
            s = 0
            for w in matched:
                t = tf[d][w]
                denom = t * 1000 + (120 * (250 + (750 * norm) // 1000)) // 100
                s += (idf[w] * t * 2200) // denom
            scores[d] = s
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
        for rnk, (d, s) in enumerate(ranked, 1):
            out.add((q, d, s, rnk))
    return out


def test_bm25_matches_python_oracle(spark):
    docs_tokens = {
        1: "the cat sat on the mat".split(),
        2: "the cat the cat the".split(),
        3: "dog park dog".split(),
        4: "mat".split(),
        5: "cat dog mat cat dog mat cat".split(),
        6: "completely unrelated words here".split(),
    }
    queries = {10: {"cat", "mat"}, 20: {"dog"}, 30: {"the"}}
    docs = spark.createDataFrame(
        [(d, " ".join(t)) for d, t in docs_tokens.items()], "doc_id long, text string"
    )
    qdf = spark.createDataFrame(
        [(q, w) for q, ws in queries.items() for w in ws], "query_id long, term string"
    )
    from chronon_spark.operators.indexing import bm25_topk

    got = {tuple(r) for r in bm25_topk(tokenize(docs), qdf, k=3).collect()}
    assert got == _bm25_py(docs_tokens, queries, k=3)
    # sanity: for the 'dog' query, doc 3 (2/3 dog density) outranks doc 5
    by_q = {(q, r): d for q, d, s, r in got}
    assert by_q[(20, 1)] == 3
    # 'the' occurs in half the docs -> idf tiny but non-negative; rows exist
    assert any(q == 30 for q, _, _, _ in got)


def test_bm25_stopword_idf_clamped(spark):
    # a term present in ALL docs has negative raw idf -> clamped to 0
    docs = spark.createDataFrame(
        [(i, "common filler") for i in range(1, 5)], "doc_id long, text string"
    )
    qdf = spark.createDataFrame([(1, "common")], "query_id long, term string")
    from chronon_spark.operators.indexing import bm25_topk

    rows = bm25_topk(tokenize(docs), qdf, k=10).collect()
    assert len(rows) == 4 and all(r.score_micro == 0 for r in rows)
    assert [r.doc_id for r in sorted(rows, key=lambda r: r.rnk)] == [1, 2, 3, 4]


def test_bm25_salted_equals_unsalted(spark):
    import random

    rng = random.Random(7)
    vocab = ["the", "cat", "dog", "mat", "web", "data", "page"]
    docs = spark.createDataFrame(
        [(i, " ".join(rng.choices(vocab, k=rng.randint(3, 12)))) for i in range(1, 61)],
        "doc_id long, text string",
    )
    qdf = spark.createDataFrame(
        [(1, "the"), (1, "cat"), (2, "dog"), (2, "mat"), (3, "web")],
        "query_id long, term string",
    )
    from chronon_spark.operators.indexing import bm25_topk

    toks = tokenize(docs)
    plain = sorted(map(tuple, bm25_topk(toks, qdf, k=7).collect()))
    salted = sorted(map(tuple, bm25_topk(toks, qdf, k=7, salt_partitions=4).collect()))
    assert plain == salted and len(plain) == 21


def test_incremental_index_merge_and_retraction(spark, docs):
    from chronon_spark.operators.indexing import merge_term_stats, negate_term_stats

    full = term_stats(tokenize(docs))
    base = term_stats(tokenize(docs.where(F.col("doc_id") % 2 == 0)))
    delta = term_stats(tokenize(docs.where(F.col("doc_id") % 2 == 1)))
    merged = merge_term_stats(base, delta)
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, full.collect()))
    # retraction: full minus the odd docs == the even-docs stats
    retracted = merge_term_stats(full, negate_term_stats(delta))
    assert sorted(map(tuple, retracted.collect())) == sorted(map(tuple, base.collect()))
    # terms whose df hits zero drop out entirely
    only_odd = {r.term for r in delta.collect()} - {r.term for r in base.collect()}
    surviving = {r.term for r in retracted.collect()}
    assert only_odd and not (only_odd & surviving)


def test_recrawl_stats(spark):
    from chronon_spark.operators.indexing import recrawl_stats

    snaps = spark.createDataFrame(
        [
            ("u1", "v1"), ("u1", "v1"), ("u1", "v1"),   # never changed
            ("u2", "v1"), ("u2", "v2"), ("u2", "v3"),   # changed every time
            ("u3", "v1"), ("u3", "v1"), ("u3", "v2"),   # one change in two
            ("u4", "only once"),                        # single observation
        ],
        "url string, text string",
    )
    got = {r.url: (r.n_obs, r.n_versions, r.change_rate_micro)
           for r in recrawl_stats(snaps).collect()}
    assert got["u1"] == (3, 1, 0)
    assert got["u2"] == (3, 3, 1_000_000)
    assert got["u3"] == (3, 2, 500_000)
    assert got["u4"] == (1, 1, None)


def test_crawl_priority_composition(spark):
    from chronon_spark.operators.indexing import crawl_priority

    stats = spark.createDataFrame(
        [
            ("https://a.com/1", 3, 3, 1_000_000),   # always changes
            ("https://a.com/2", 3, 1, 0),           # never changes
            ("https://b.org/1", 1, 1, None),        # one observation
            ("https://nowhere.net/1", 2, 2, 1_000_000),  # unranked domain
        ],
        "url string, n_obs long, n_versions long, change_rate_micro long",
    )
    ranks = spark.createDataFrame(
        [("a.com", 4_000_000), ("b.org", 2_000_000)], "domain string, rank long"
    )
    got = {
        r.url: (r.domain, r.rank, r.priority_micro)
        for r in crawl_priority(stats, ranks, rank_div=1_000_000).collect()
    }
    assert got["https://a.com/1"] == ("a.com", 4_000_000, (1 + 1_000_000) * 5)
    assert got["https://a.com/2"] == ("a.com", 4_000_000, 1 * 5)
    # single observation -> default rate 500k
    assert got["https://b.org/1"] == ("b.org", 2_000_000, (1 + 500_000) * 3)
    # unranked domain -> rank 0, multiplier 1
    assert got["https://nowhere.net/1"] == ("nowhere.net", 0, (1 + 1_000_000) * 1)


def test_crawl_priority_plan_broadcasts_ranks(spark):
    import bench
    from chronon_spark.operators.indexing import crawl_priority

    stats = spark.createDataFrame(
        [("https://a.com/1", 2, 2, 1_000_000)],
        "url string, n_obs long, n_versions long, change_rate_micro long",
    )
    ranks = spark.createDataFrame([("a.com", 10)], "domain string, rank long")
    d = bench.plan_digest(crawl_priority(stats, ranks))
    assert d["broadcast_joins"] >= 1 and d["python_stages"] == 0
    assert d["sort_merge_joins"] == 0


def test_schedule_crawl_waves_and_cap(spark):
    from chronon_spark.operators.indexing import schedule_crawl

    rows = [(f"https://a.com/{i}", "a.com", 100 - i) for i in range(7)] + [
        ("https://b.org/1", "b.org", 5)
    ]
    frontier = spark.createDataFrame(rows, ["url", "domain", "priority_micro"])
    out = schedule_crawl(frontier, per_slot=3).collect()
    got = {r.url: (r.rank, r.slot) for r in out}
    # a.com: priorities 100..94 -> ranks 1..7, waves of 3
    for i in range(7):
        assert got[f"https://a.com/{i}"] == (i + 1, i // 3)
    assert got["https://b.org/1"] == (1, 0)
    # cap: only top-4 per domain survive; salted == unsalted
    capped = schedule_crawl(
        frontier, per_slot=3, max_frontier_per_domain=4
    ).collect()
    assert {r.url for r in capped if r.domain == "a.com"} == {
        f"https://a.com/{i}" for i in range(4)
    }
    salted = schedule_crawl(
        frontier, per_slot=3, max_frontier_per_domain=4, salt_partitions=3
    ).collect()
    assert sorted((r.url, r.rank, r.slot) for r in capped) == sorted(
        (r.url, r.rank, r.slot) for r in salted
    )


# ---------------------------------------------------------------------------
# crawl-trap detection (URL-template explosion)
# ---------------------------------------------------------------------------

def test_url_trap_stats_hand_computed(spark):
    from chronon_spark.operators.indexing import url_trap_stats

    urls = (
        # calendar trap: 30 urls, ONE template /cal/N/N
        [f"https://trap.example/cal/{i}/{i * 7}" for i in range(30)]
        # session-id explosion in the QUERY string: one template /p?sid=N
        + [f"https://sid.example/p?sid={10000 + i}" for i in range(25)]
        # healthy: 30 urls, 30 distinct letter-based templates
        + [f"https://ok.example/article/{'x' * (i % 10)}y{'z' * (i // 10)}" for i in range(30)]
        # low volume: collapses to one template but under min_urls
        + [f"https://tiny.example/d/{i}" for i in range(5)]
    )
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    got = {r["domain"]: r for r in url_trap_stats(df, min_urls=20,
                                                  min_urls_per_template=10).collect()}

    assert got["trap.example"]["n_templates"] == 1
    assert got["trap.example"]["n_urls"] == 30
    assert got["trap.example"]["urls_per_template"] == 30
    assert got["trap.example"]["is_trap"]

    assert got["sid.example"]["n_templates"] == 1
    assert got["sid.example"]["is_trap"]

    assert got["ok.example"]["n_templates"] == 30
    assert got["ok.example"]["urls_per_template"] == 1
    assert not got["ok.example"]["is_trap"]

    # volume gate: full collapse but only 5 urls
    assert got["tiny.example"]["urls_per_template"] == 5
    assert not got["tiny.example"]["is_trap"]


def test_url_trap_stats_partition_invariance(spark):
    from chronon_spark.operators.indexing import url_trap_stats

    urls = [f"https://d{i % 7}.example/p/{i}/{i % 13}" for i in range(200)]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))

    def run(parts):
        return (
            url_trap_stats(df.repartition(parts))
            .toPandas()
            .sort_values("domain")
            .reset_index(drop=True)
        )

    assert run(2).equals(run(16))


def test_url_trap_stats_case_insensitive_host(spark):
    """Case variants of one host (and an uppercase scheme) must count as
    ONE domain — a crawl control never splits on case."""
    from chronon_spark.operators.indexing import url_trap_stats

    urls = (
        [f"https://trap.example/cal/{i}" for i in range(10)]
        + [f"https://TRAP.example/cal/{i}" for i in range(10, 20)]
        + [f"HTTPS://Trap.Example/cal/{i}" for i in range(20, 25)]
    )
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    got = {r["domain"]: r for r in url_trap_stats(df, min_urls=20,
                                                  min_urls_per_template=10).collect()}
    assert set(got) == {"trap.example"}
    assert got["trap.example"]["n_urls"] == 25
    assert got["trap.example"]["n_templates"] == 1
    assert got["trap.example"]["is_trap"]


def test_schedule_crawl_delay_join_case_insensitive(spark):
    """parse_crawl_delay lowercases domains; a mixed-case frontier must
    still pick up its directive instead of failing open to the default."""
    from chronon_spark.operators.indexing import schedule_crawl

    frontier = spark.createDataFrame(
        [("Example.com", f"https://Example.com/{i}", 10 - i) for i in range(3)],
        "domain string, url string, priority_micro long",
    )
    delays = spark.createDataFrame([("example.com", 30)],
                                   "domain string, crawl_delay_sec long")
    out = schedule_crawl(frontier, per_slot=2, delays=delays, default_delay_sec=1)
    got = {r.rank: r.not_before_sec for r in out.collect()}
    assert got == {1: 0, 2: 30, 3: 60}
