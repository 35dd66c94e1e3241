"""The web-index example composes the round-4 operators end to end."""

import sys

sys.path.insert(0, "/root/repo/examples")


def test_web_index_example_artifacts(spark):
    from web_index import build_index

    from chronon_spark.sources.webtext import generate_webtext

    crawl = generate_webtext(
        spark, 800, seed=42, n_domains=20, partitions=4, with_links=True
    )
    sample = crawl.select("text").first()["text"].split()
    arts = build_index(
        spark,
        crawl,
        queries=[" ".join(sample[:3])],
        phrases=[" ".join(sample[:2])],
        verbose=False,
    )
    counts = {k: df.count() for k, df in arts.items()}
    for k in ("ranks", "hits", "harmonic", "anchors", "postings", "vocab",
              "bm25", "phrases", "rollup", "frontier", "trust", "traps",
              "schedule"):
        assert counts[k] > 0, (k, counts)
    # all three centralities rank the same node set; trust too
    assert counts["ranks"] == counts["hits"] == counts["harmonic"]
    assert counts["trust"] == counts["ranks"]
    # the fetch schedule covers the capped frontier (per-domain budget
    # trims hot domains, so schedule <= frontier and every domain <= cap)
    assert 0 < counts["schedule"] <= counts["frontier"]
    per_dom = arts["schedule"].groupBy("domain").count().agg(
        {"count": "max"}).first()[0]
    assert per_dom <= 50


def test_generator_links_flag_is_optin(spark):
    """with_links must not change the text column nor the default html."""
    from chronon_spark.sources.webtext import generate_webtext

    base = generate_webtext(spark, 50, seed=7, n_domains=5, partitions=2)
    linked = generate_webtext(
        spark, 50, seed=7, n_domains=5, partitions=2, with_links=True
    )
    b = base.orderBy("url", "warc_ts").collect()
    l = linked.orderBy("url", "warc_ts").collect()
    assert [r.text for r in b] == [r.text for r in l]
    assert any(b"<a href=" in r.html for r in l)
    assert not any(b"<a href=" in r.html for r in b)
