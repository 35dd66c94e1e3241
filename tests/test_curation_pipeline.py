"""End-to-end curation pipeline (examples/webtext_curation.py) with
PLANTED url-dups, text-dups, junk docs, and near-dups — each stage must
remove exactly its targets."""

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"))


@pytest.fixture(scope="module")
def planted(spark):
    from chronon_spark.sources.webtext import generate_webtext

    base = generate_webtext(spark, 2000, seed=9, n_domains=20).cache()
    # url dup: same url re-crawled later with marker text
    marker_words = " ".join(
        w for pair in zip(
            ["the and of to is for with on that this are was has had were".split()[i % 15] for i in range(30)],
            ["apple river stone cloud meadow forest harbor winter summer garden".split()[i % 10] for i in range(30)],
        ) for w in pair
    )
    recrawl_html = f"<html><body><p>RECRAWLED PAGE {marker_words}</p></body></html>"
    recrawl = (
        base.limit(5)
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 10 DAYS"))
        .withColumn("html", F.encode(F.lit(recrawl_html), "utf-8"))
    )
    # exact text dup: two distinct urls, same html
    src = base.limit(1).collect()[0]
    dup_rows = spark.createDataFrame(
        [
            ("https://dupA.example.com/x", src["warc_ts"], src["html"], src["text"], "en"),
            ("https://dupB.example.com/x", src["warc_ts"], src["html"], src["text"], "en"),
        ],
        base.schema,
    )
    # junk: repeated boilerplate (fails Gopher top-bigram rule)
    junk = spark.createDataFrame(
        [
            (
                "https://junk.example.com/spam",
                src["warc_ts"],
                ("<html><body><p>" + "click here " * 200 + "</p></body></html>").encode(),
                None,
                "en",
            )
        ],
        base.schema,
    )
    return base.unionByName(recrawl).unionByName(dup_rows).unionByName(junk)


def test_curation_stages(spark, planted):
    from webtext_curation import curate

    out = curate(spark, planted, verbose=False)
    stages = {n: c for n, c, _w in out["stages"]}
    result = out["result"]

    # recrawl rows collapse into their originals (latest wins)
    kept_texts = {r["text"] for r in result.collect()}
    assert any("RECRAWLED PAGE" in t for t in kept_texts)  # newest crawl won

    # exact dup: the lexicographically-smallest id survives — that's the
    # ORIGINAL url (domain... < dupA...), so both planted dup urls vanish
    dup_survivors = result.where("doc_id LIKE '%dup%.example.com%'").count()
    assert dup_survivors == 0

    # junk fails the repetition filter
    assert result.where("doc_id LIKE '%junk.example.com%'").count() == 0

    # stage counts monotonically non-increasing and each planted class removed
    names = [n for n, _c, _w in out["stages"]]
    counts = [c for _n, c, _w in out["stages"]]
    assert counts == sorted(counts, reverse=True)
    assert stages["latest per canonical url"] < stages["crawl records"]
    assert stages["exact text dedup"] < stages["latest per canonical url"] + 1

    # training-assembly tail: split/pack/shuffle produce a valid order
    order = out["order"].toPandas()
    assert stages["packed training rows"] == len(order)
    for _, g in order.groupby("shard"):
        assert sorted(g.pos) == list(range(1, len(g) + 1))


def test_curation_decontamination_stage(spark, planted):
    """Docs sharing 8-grams with the eval set are dropped; the pipeline
    with an eval set built FROM the corpus removes those documents."""
    from webtext_curation import curate

    # eval set = the text of a doc that SURVIVES the base pipeline ->
    # guaranteed 8-gram overlap with the corpus fed to decontamination
    base = curate(spark, planted, verbose=False)
    eval_set = base["result"].select("text").limit(1)
    out = curate(spark, planted, eval_set=eval_set, verbose=False)
    stages = {n: c for n, c, _w in out["stages"]}
    assert "benchmark decontamination" in stages
    assert stages["benchmark decontamination"] < {n: c for n, c, _w in base["stages"]}[
        "near-dup removal (LSH + CC)"
    ]


def test_curation_boilerplate_and_blocklist(spark):
    """With nav_boilerplate=True every page of a domain shares a nav line
    and a cookie footer; the line-level stage must strip them (no
    'cookie' survives) while the body text stays. Blocked domains vanish
    entirely."""
    from webtext_curation import curate

    from chronon_spark.sources.webtext import generate_webtext

    crawl = generate_webtext(
        spark, 1200, seed=13, n_domains=6, nav_boilerplate=True
    ).cache()
    # min_docs=25: the generator has only ~200 distinct bodies, so at
    # 1200 rows bodies repeat ~6 docs each — min_docs must sit between
    # the body-repetition tail and the per-domain nav/footer frequency
    # (every domain here has >= ~40 distinct pages).
    # dup_span_max=1.0 disables the corpus-duplication gate: the synthetic
    # vocabulary has only ~200 distinct bodies, so EVERY 8-gram here is
    # corpus-duplicated and the default 50% gate would empty the corpus.
    out = curate(
        spark,
        crawl,
        blocked_domains=("domain0.example.com",),
        boilerplate_min_docs=25,
        dup_span_max=1.0,
        verbose=False,
    )
    stages = {n: c for n, c, _w in out["stages"]}
    assert "boilerplate line removal" in stages
    assert "blocklist filter" in stages
    texts = [r["text"] for r in out["result"].collect()]
    assert texts, "corpus should survive curation"
    assert not any("cookie" in t for t in texts)
    assert not any("| about |" in t for t in texts)
    assert all("the" in t or "data" in t or len(t) > 0 for t in texts)
    # the hottest domain was blocked -> none of its urls survive
    assert out["result"].where("doc_id LIKE '%domain0.example.com%'").count() == 0
