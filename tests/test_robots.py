"""robots.txt parsing + URL exclusion vs hand-derived RFC semantics."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.robots import apply_robots, parse_robots

ROBOTS_A = """
# crawler policy
User-agent: *
Disallow: /private/
Allow: /private/ok/
Disallow: /tmp

User-agent: specialbot
User-agent: otherbot
Disallow: /special/
"""

ROBOTS_B = """
User-agent: *
Disallow: /wild*card
Disallow: /end$
Disallow:
Allow: /a/b/
Disallow: /a/
"""


@pytest.fixture(scope="module")
def robots_df(spark):
    return spark.createDataFrame(
        [("a.com", ROBOTS_A), ("b.org", ROBOTS_B)], ["domain", "robots_txt"]
    )


def test_parse_groups_and_agents(spark, robots_df):
    star = {
        (r.domain, r.rule, r.path_prefix)
        for r in parse_robots(robots_df, agent="*").collect()
    }
    assert star == {
        ("a.com", "disallow", "/private/"),
        ("a.com", "allow", "/private/ok/"),
        ("a.com", "disallow", "/tmp"),
        # wildcard rules dropped, empty Disallow dropped
        ("b.org", "allow", "/a/b/"),
        ("b.org", "disallow", "/a/"),
    }
    # a specific agent's groups SHADOW the * groups for that domain
    special = {
        (r.domain, r.rule, r.path_prefix)
        for r in parse_robots(robots_df, agent="SpecialBot").collect()
    }
    assert special == {
        ("a.com", "disallow", "/special/"),
        ("b.org", "allow", "/a/b/"),   # b.org has no specialbot group -> *
        ("b.org", "disallow", "/a/"),
    }


def test_apply_longest_match_and_ties(spark, robots_df):
    rules = parse_robots(robots_df, agent="*")
    urls = spark.createDataFrame(
        [
            ("https://a.com/private/x",),        # disallow /private/
            ("https://a.com/private/ok/x",),     # allow (longer) wins
            ("https://a.com/tmpfile",),          # prefix match: /tmp
            ("https://a.com/public",),           # no rule -> allowed
            ("https://b.org/a/x",),              # disallow /a/
            ("https://b.org/a/b/c",),            # allow /a/b/ (longest)
            ("https://b.org/wildXcard",),        # wildcard rule ignored
            ("https://nowhere.net/x",),          # ruleless domain
            ("https://a.com",),                  # empty path -> "/"
        ],
        ["url"],
    )
    got = {r.url: (r.allowed, r.matched_prefix) for r in apply_robots(urls, rules).collect()}
    assert got["https://a.com/private/x"] == (False, "/private/")
    assert got["https://a.com/private/ok/x"] == (True, "/private/ok/")
    assert got["https://a.com/tmpfile"] == (False, "/tmp")
    assert got["https://a.com/public"] == (True, None)
    assert got["https://b.org/a/x"] == (False, "/a/")
    assert got["https://b.org/a/b/c"] == (True, "/a/b/")
    assert got["https://b.org/wildXcard"] == (True, None)
    assert got["https://nowhere.net/x"] == (True, None)
    assert got["https://a.com"] == (True, None)


def test_apply_plan_broadcasts_rules(spark, robots_df):
    import bench

    rules = parse_robots(robots_df)
    urls = spark.createDataFrame([("https://a.com/x",)], ["url"])
    d = bench.plan_digest(apply_robots(urls, rules))
    assert d["broadcast_joins"] >= 1 and d["python_stages"] == 0
    # SMJs inside parse_robots join the tiny agents/rules tables (AQE
    # broadcasts them at runtime); the URL-side join itself is the
    # explicit broadcast asserted above


def test_parse_sitemap(spark):
    from chronon_spark.operators.robots import parse_sitemap

    xml = """<?xml version="1.0"?>
<urlset>
  <url>
    <loc> https://a.com/page1 </loc>
    <lastmod>2024-01-15</lastmod>
    <priority>0.8</priority>
  </url>
  <url><loc>https://a.com/page2</loc></url>
  <url><lastmod>2024-02-02</lastmod></url>
</urlset>"""
    idx = """<sitemapindex>
  <sitemap><loc>https://b.org/sitemap-news.xml</loc><lastmod>2024-03-01</lastmod></sitemap>
</sitemapindex>"""
    df = spark.createDataFrame(
        [("a.com", xml), ("b.org", idx)], ["domain", "sitemap_xml"]
    )
    got = {
        (r.domain, r.kind, r.loc): (r.lastmod, r.priority_milli)
        for r in parse_sitemap(df).collect()
    }
    # loc-less entries dropped; whitespace trimmed; defaults applied
    assert got == {
        ("a.com", "url", "https://a.com/page1"): ("2024-01-15", 800),
        ("a.com", "url", "https://a.com/page2"): (None, 500),
        ("b.org", "sitemap", "https://b.org/sitemap-news.xml"): ("2024-03-01", 500),
    }


def test_parse_sitemap_plan_is_narrow(spark):
    import bench
    from chronon_spark.operators.robots import parse_sitemap

    df = spark.createDataFrame([("a.com", "<urlset/>")], ["domain", "sitemap_xml"])
    d = bench.plan_digest(parse_sitemap(df))
    assert d["exchanges"] == 0 and d["python_stages"] == 0


def test_case_insensitive_host_never_fails_open(spark, robots_df):
    rules = parse_robots(robots_df, agent="*")
    urls = spark.createDataFrame(
        [("HTTPS://A.com/private/x",), ("https://A.COM/private/ok/y",)], ["url"]
    )
    got = {r.url: r.allowed for r in apply_robots(urls, rules).collect()}
    assert got["HTTPS://A.com/private/x"] is False
    assert got["https://A.COM/private/ok/y"] is True


def test_duplicate_url_rows_are_preserved(spark, robots_df):
    rules = parse_robots(robots_df, agent="*")
    urls = spark.createDataFrame(
        [("https://a.com/private/x",)] * 3 + [("https://a.com/ok",)], ["url"]
    )
    out = apply_robots(urls, rules)
    assert out.count() == 4
    assert out.where("NOT allowed").count() == 3


def test_multiple_robots_files_per_domain_union(spark):
    # two snapshots of a.com's robots: groups must NOT interleave across
    # files; the effective rule set is the union of both files' * groups
    f1 = "User-agent: *\nDisallow: /one/"
    f2 = "User-agent: specialbot\nDisallow: /spec/\nUser-agent: *\nDisallow: /two/"
    df = spark.createDataFrame(
        [("a.com", f1), ("a.com", f2)], ["domain", "robots_txt"]
    )
    got = {
        (r.rule, r.path_prefix) for r in parse_robots(df, agent="*").collect()
    }
    assert got == {("disallow", "/one/"), ("disallow", "/two/")}


def test_kv_key_null_sentinel(spark):
    from chronon_spark.plans.kvstore import kv_key_col, kv_key_of

    df = spark.createDataFrame(
        [("a", None), (None, "a"), ("a", "b")], ["k1", "k2"]
    )
    keys = [r.k for r in df.select(kv_key_col(["k1", "k2"]).alias("k")).collect()]
    assert len(set(keys)) == 3  # ('a', NULL) and (NULL, 'a') must differ
    assert keys[0] == kv_key_of(["a", None])
    assert keys[1] == kv_key_of([None, "a"])
    assert keys[2] == kv_key_of(["a", "b"])


# ---------------------------------------------------------------------------
# Crawl-delay directive + politeness-rate scheduling
# ---------------------------------------------------------------------------

ROBOTS_DELAY = """
User-agent: fastbot
Crawl-delay: 0

User-agent: *
Crawl-delay: 2.5
Disallow: /private/

User-agent: slowbot
Crawl-delay: 99
"""


def test_parse_crawl_delay_agent_shadowing_and_ceil(spark):
    from chronon_spark.operators.robots import parse_crawl_delay

    df = spark.createDataFrame([("a.com", ROBOTS_DELAY)], ["domain", "robots_txt"])
    # '*' group: 2.5 rounds UP to 3 (politeness floor never rounds down)
    star = {(r.domain, r.crawl_delay_sec)
            for r in parse_crawl_delay(df, agent="*").collect()}
    assert star == {("a.com", 3)}
    # specific agents shadow '*' entirely
    assert {(r.domain, r.crawl_delay_sec)
            for r in parse_crawl_delay(df, agent="slowbot").collect()} == {("a.com", 99)}
    assert {(r.domain, r.crawl_delay_sec)
            for r in parse_crawl_delay(df, agent="fastbot").collect()} == {("a.com", 0)}


def test_crawl_delay_separates_groups(spark):
    """A Crawl-delay line between two User-agent lines means the second
    UA starts a NEW group (RFC 9309 start-of-group counts every non-UA
    line) — bot 'b' must NOT inherit group a's delay or rules."""
    from chronon_spark.operators.robots import parse_crawl_delay, parse_robots

    txt = "User-agent: a\nCrawl-delay: 5\nUser-agent: b\nDisallow: /x/\n"
    df = spark.createDataFrame([("d.com", txt)], ["domain", "robots_txt"])
    assert parse_crawl_delay(df, agent="b").count() == 0
    assert parse_crawl_delay(df, agent="a").collect()[0].crawl_delay_sec == 5
    # and the rules attach to b's group only
    assert parse_robots(df, agent="a").count() == 0
    assert {r.path_prefix for r in parse_robots(df, agent="b").collect()} == {"/x/"}


def test_parse_crawl_delay_nonnumeric_and_multifile_max(spark):
    from chronon_spark.operators.robots import parse_crawl_delay

    df = spark.createDataFrame(
        [
            ("m.com", "User-agent: *\nCrawl-delay: soon\n"),   # ignored
            ("m.com", "User-agent: *\nCrawl-delay: 4\n"),
            ("m.com", "User-agent: *\nCrawl-delay: 9\n"),      # max wins
        ],
        ["domain", "robots_txt"],
    )
    got = parse_crawl_delay(df, agent="*").collect()
    assert [(r.domain, r.crawl_delay_sec) for r in got] == [("m.com", 9)]


def test_schedule_crawl_not_before(spark):
    from chronon_spark.operators.indexing import schedule_crawl

    frontier = spark.createDataFrame(
        [("a.com", f"https://a.com/{i}", 100 - i) for i in range(6)]
        + [("b.com", f"https://b.com/{i}", 50 - i) for i in range(3)],
        "domain string, url string, priority_micro long",
    )
    delays = spark.createDataFrame([("a.com", 10)],
                                   "domain string, crawl_delay_sec long")
    out = schedule_crawl(frontier, per_slot=2, delays=delays,
                         default_delay_sec=3)
    got = {(r.domain, r.rank): r.not_before_sec for r in out.collect()}
    # a.com honors its directive: rank r fetches at (r-1)*10
    assert got[("a.com", 1)] == 0 and got[("a.com", 4)] == 30
    # b.com takes the default delay
    assert got[("b.com", 3)] == 6
    assert "not_before_sec" in out.columns and "__delay" not in out.columns
