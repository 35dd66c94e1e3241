"""Link-graph operators: href extraction, domain edges, integer-exact
PageRank vs a pure-Python oracle and the generated DuckDB unrolled-CTE
oracle."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.linkgraph import (
    SCALE,
    domain_edges,
    domain_pagerank,
    extract_links,
    pagerank_oracle_sql,
)


def _py_pagerank(edges, iters=4, damping=85, scale=SCALE):
    """Reference implementation of the exact integer algebra."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    n = len(nodes)
    outdeg = {}
    for s, _ in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    teleport = ((100 - damping) * scale // 100) // n
    rank = {d: scale // n for d in nodes}
    for _ in range(iters):
        dm = sum(r for d, r in rank.items() if d not in outdeg)
        inflow = {d: 0 for d in nodes}
        for s, d in edges:
            inflow[d] += rank[s] // outdeg[s]
        rank = {
            d: teleport + damping * (inflow[d] + dm // n) // 100 for d in nodes
        }
    return rank


def test_extract_links_binary_and_string(spark):
    html = (
        '<html><a href="https://a.com/x">one</a> '
        '<a href="http://b.org/y?z=1">two</a> '
        "<a href='https://nope.unquoted/skip'>not double-quoted</a></html>"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"src_domain": ["me.io"], "html": [html.encode()]})
    )
    out = extract_links(df).orderBy("href").collect()
    assert [(r["src_domain"], r["dst_domain"]) for r in out] == [
        ("me.io", "b.org"),
        ("me.io", "a.com"),
    ]
    # string column behaves identically
    df2 = spark.createDataFrame(pd.DataFrame({"src_domain": ["me.io"], "html": [html]}))
    assert extract_links(df2).count() == 2


def test_domain_edges_distinct_no_selfloop(spark):
    links = spark.createDataFrame(
        pd.DataFrame(
            {
                "src_domain": ["a", "a", "a", "b"],
                "dst_domain": ["b", "b", "a", "c"],
                "href": ["u1", "u2", "u3", "u4"],
            }
        )
    )
    got = sorted(tuple(r) for r in domain_edges(links).collect())
    assert got == [("a", "b"), ("b", "c")]


EDGES = [
    ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
    ("d", "a"), ("d", "b"), ("d", "c"),
    ("e", "sink1"), ("e", "sink2"),  # sinks = dangling nodes
]


def _edges_df(spark, parts):
    pdf = pd.DataFrame(EDGES, columns=["src_domain", "dst_domain"])
    return spark.createDataFrame(pdf).repartition(parts)


def test_pagerank_matches_python_oracle(spark):
    want = _py_pagerank(EDGES)
    got = {r["domain"]: r["rank"] for r in domain_pagerank(_edges_df(spark, 4)).collect()}
    assert got == want
    # rank mass stays within DIV-truncation of the total
    assert 0 < sum(got.values()) <= SCALE


def test_pagerank_partitioning_invariant(spark):
    a = {r["domain"]: r["rank"] for r in domain_pagerank(_edges_df(spark, 1)).collect()}
    b = {r["domain"]: r["rank"] for r in domain_pagerank(_edges_df(spark, 16)).collect()}
    assert a == b


def test_pagerank_duckdb_oracle_parity(spark):
    got = (
        domain_pagerank(_edges_df(spark, 3), iters=5, damping=80)
        .orderBy("domain")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("edges_src", pd.DataFrame(EDGES, columns=["src_domain", "dst_domain"]))
    sql = pagerank_oracle_sql(
        "SELECT DISTINCT src_domain, dst_domain FROM edges_src"
        " WHERE src_domain <> dst_domain",
        iters=5,
        damping=80,
    )
    want = con.sql(sql + " ORDER BY domain").df()
    assert got["domain"].tolist() == want["domain"].tolist()
    assert got["rank"].astype(int).tolist() == want["rank"].astype(int).tolist()


def test_pagerank_empty_and_validation(spark):
    empty = spark.createDataFrame([], "src_domain string, dst_domain string")
    assert domain_pagerank(empty).count() == 0
    with pytest.raises(ValueError):
        domain_pagerank(empty, damping=101)


def test_extract_anchors_and_topk(spark):
    from chronon_spark.operators.linkgraph import anchor_top_k, extract_anchors

    rows = []
    for i in range(40):
        # 'news' anchor twice per doc, 'blog' once, one empty anchor
        rows.append(
            (
                f"s{i % 4}.io",
                f'<a href="https://t.example/x">news</a>'
                f'<a href="https://t.example/y">news</a>'
                f'<a href="https://t.example/z">blog</a>'
                f'<a href="https://t.example/e"></a>'
                f'<a href="https://u{i % 3}.example/w">rare{i}</a>',
            )
        )
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["src_domain", "html"]))
    anchors = extract_anchors(df)
    # empty anchors extracted but dropped by anchor_top_k
    assert anchors.where("anchor = ''").count() == 40

    top = anchor_top_k(anchors, k=2).where("domain = 't.example'").collect()
    got = [(r["anchor"], r["n_links"], r["rnk"]) for r in sorted(top, key=lambda r: r["rnk"])]
    assert got == [("news", 80, 1), ("blog", 40, 2)]

    # salted two-phase == unsalted (exactness under hot targets)
    a = sorted(map(tuple, anchor_top_k(anchors, k=2, salt_partitions=8).collect()))
    b = sorted(map(tuple, anchor_top_k(anchors, k=2).collect()))
    assert a == b


def test_pagerank_no_persisted_leak(spark):
    """Intermediate checkpoints are released every iteration via
    release_checkpoint (DataFrame.unpersist is a silent no-op on
    localCheckpoints); only the returned frame's |domains|-row checkpoint
    outlives a call, and the caller can release that too — the registry
    returns to baseline, never growing by the per-iteration chain
    (init + 6 iteration checkpoints + edges + nodes would be +9/call)."""
    from chronon_spark.checkpoint import release_checkpoint

    def _ids():
        # track ids, not counts: the ContextCleaner may release OTHER
        # tests' GC'd frames concurrently, so absolute sizes are flaky
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it, out = m.iterator(), set()
        while it.hasNext():
            out.add(it.next()._1())
        return out

    before = _ids()
    for _ in range(2):
        out = domain_pagerank(_edges_df(spark, 2), iters=6)
        out.collect()
        added = _ids() - before
        assert len(added) == 1, added
        assert release_checkpoint(out)
        assert not (_ids() - before)


def test_domain_rollup(spark):
    """Hand-computed rollup: corpus-wide dup flags (mirrors across
    domains count as dups for BOTH), integer mean_chars, rank joined
    with 0 default for unlinked domains."""
    from chronon_spark.operators.linkgraph import domain_rollup

    docs = spark.createDataFrame(
        [
            ("a.com", "shared body", 11),
            ("a.com", "unique alpha", 12),
            ("b.com", "Shared   BODY", 13),  # normalizes equal to a.com's
            ("b.com", "unique beta", 14),
            ("b.com", "unique gamma", 16),
            ("c.com", "lonely", 6),
        ],
        "domain string, text string, n_chars long",
    )
    ranks = spark.createDataFrame(
        [("a.com", 700), ("b.com", 300)], "domain string, rank long"
    )
    got = {r.domain: (r.n_docs, r.dup_docs, r.mean_chars, r.rank)
           for r in domain_rollup(docs, ranks).collect()}
    assert got["a.com"] == (2, 1, 11, 700)  # (11+12)//2
    assert got["b.com"] == (3, 1, 14, 300)  # (13+14+16)//3
    assert got["c.com"] == (1, 0, 6, 0)  # unranked -> 0


def _py_hits(edges, iters=3, scale=None):
    from chronon_spark.operators.linkgraph import HITS_SCALE

    scale = scale or HITS_SCALE
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    hub = {d: scale for d in nodes}
    auth = {}
    for _ in range(iters):
        a_raw = {}
        for s, d in edges:
            if s in hub:
                a_raw[d] = a_raw.get(d, 0) + hub[s]
        sa = sum(a_raw.values())
        auth = {d: v // max(1, sa // scale) for d, v in a_raw.items()}
        h_raw = {}
        for s, d in edges:
            if d in auth:
                h_raw[s] = h_raw.get(s, 0) + auth[d]
        sh = sum(h_raw.values())
        hub = {d: v // max(1, sh // scale) for d, v in h_raw.items()}
    return {
        d: (hub.get(d, 0), auth.get(d, 0)) for d in nodes
    }


def test_hits_matches_python_oracle(spark):
    from chronon_spark.operators.linkgraph import domain_hits

    want = _py_hits(EDGES)
    got = {
        r["domain"]: (r["hub"], r["authority"])
        for r in domain_hits(_edges_df(spark, 4)).collect()
    }
    assert got == want
    # structure: c has the most in-links -> top authority; d links to all
    # of a/b/c -> top hub; sinks have no out-edges -> hub 0
    auth = {d: a for d, (h, a) in got.items()}
    hub = {d: h for d, (h, a) in got.items()}
    assert auth["c"] == max(auth.values()) > 0
    assert hub["d"] == max(hub.values()) > 0
    assert hub["sink1"] == hub["sink2"] == 0


def test_hits_duckdb_oracle_parity_and_invariance(spark):
    from chronon_spark.operators.linkgraph import domain_hits, hits_oracle_sql

    got = domain_hits(_edges_df(spark, 3), iters=4).orderBy("domain").toPandas()
    con = duckdb.connect()
    con.register("edges_src", pd.DataFrame(EDGES, columns=["src_domain", "dst_domain"]))
    sql = hits_oracle_sql(
        "SELECT DISTINCT src_domain, dst_domain FROM edges_src"
        " WHERE src_domain <> dst_domain",
        iters=4,
    )
    want = con.sql(f"SELECT * FROM ({sql}) ORDER BY domain").df()
    assert got["domain"].tolist() == want["domain"].tolist()
    assert got["hub"].astype(int).tolist() == want["hub"].astype(int).tolist()
    assert (
        got["authority"].astype(int).tolist()
        == want["authority"].astype(int).tolist()
    )
    # partitioning invariance (integer algebra is order-independent)
    again = domain_hits(_edges_df(spark, 16), iters=4).orderBy("domain").toPandas()
    assert got.equals(again)


def test_hits_no_persisted_leak(spark):
    from chronon_spark.checkpoint import release_checkpoint
    from chronon_spark.operators.linkgraph import domain_hits

    def _ids():
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it, out = m.iterator(), set()
        while it.hasNext():
            out.add(it.next()._1())
        return out

    before = _ids()
    out = domain_hits(_edges_df(spark, 2), iters=3)
    out.collect()
    added = _ids() - before
    assert len(added) == 1, added
    assert release_checkpoint(out)
    assert not (_ids() - before)


def _py_harmonic(edges, max_dist=4, scale=None):
    """Pure-Python truncated harmonic centrality by BFS."""
    from chronon_spark.operators.linkgraph import HARMONIC_SCALE

    scale = scale or HARMONIC_SCALE
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    adj: dict = {}
    for s, d in edges:
        adj.setdefault(s, []).append(d)
    out = {}
    for v in nodes:
        dist = {v: 0}
        frontier = [v]
        for t in range(1, max_dist + 1):
            nxt = []
            for u in frontier:
                for w in adj.get(u, []):
                    if w not in dist:
                        dist[w] = t
                        nxt.append(w)
            frontier = nxt
        reached = [d for d in dist.values() if d > 0]
        out[v] = (len(reached), sum(scale // d for d in reached))
    return out


def test_harmonic_exact_matches_python_bfs(spark):
    from chronon_spark.operators.linkgraph import harmonic_centrality

    want = _py_harmonic(EDGES)
    got = {
        r["domain"]: (r["reached"], r["harmonic"])
        for r in harmonic_centrality(_edges_df(spark, 4), mode="exact").collect()
    }
    assert got == want
    # d links into the a-b-c cycle: reaches everything but the sinks
    assert got["d"][0] == 3
    assert got["sink1"] == (0, 0)  # sinks reach nothing


def test_harmonic_exact_duckdb_oracle_parity(spark):
    from chronon_spark.operators.linkgraph import (
        harmonic_centrality,
        harmonic_oracle_sql,
    )

    got = (
        harmonic_centrality(_edges_df(spark, 3), max_dist=3, mode="exact")
        .orderBy("domain")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("edges_src", pd.DataFrame(EDGES, columns=["src_domain", "dst_domain"]))
    sql = harmonic_oracle_sql(
        "SELECT DISTINCT src_domain, dst_domain FROM edges_src"
        " WHERE src_domain <> dst_domain",
        max_dist=3,
    )
    want = con.sql(f"SELECT * FROM ({sql}) ORDER BY domain").df()
    assert got["domain"].tolist() == want["domain"].tolist()
    for c in ("reached", "harmonic"):
        assert got[c].astype(int).tolist() == want[c].astype(int).tolist(), c


def test_harmonic_hll_close_to_exact_and_leakfree(spark):
    from chronon_spark.checkpoint import release_checkpoint
    from chronon_spark.operators.linkgraph import harmonic_centrality

    def _ids():
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it, out = m.iterator(), set()
        while it.hasNext():
            out.add(it.next()._1())
        return out

    before = _ids()
    e1 = harmonic_centrality(_edges_df(spark, 2), mode="exact")
    exact = {r["domain"]: r["harmonic"] for r in e1.collect()}
    hll = harmonic_centrality(_edges_df(spark, 2), mode="hll")
    got = {r["domain"]: r["harmonic"] for r in hll.collect()}
    # at 7 nodes the sketches are effectively exact (rel err ~1.6%)
    for d, h in exact.items():
        assert abs(got[d] - h) <= max(0.05 * h, 1), (d, got[d], h)
    added = _ids() - before
    assert len(added) == 2, added  # one result checkpoint per call
    assert release_checkpoint(e1) and release_checkpoint(hll)
    assert not (_ids() - before)


def test_harmonic_rejects_bad_mode(spark):
    from chronon_spark.operators.linkgraph import harmonic_centrality

    with pytest.raises(ValueError, match="mode"):
        harmonic_centrality(_edges_df(spark, 1), mode="nope")


# ---------------------------------------------------------------------------
# TrustRank (seed-personalized PageRank, Gyöngyi et al. 2004)
# ---------------------------------------------------------------------------

def _py_trustrank(edges, seeds, iters=4, damping=85, scale=SCALE):
    """Reference implementation of the exact seed-teleport integer algebra."""
    nodes = sorted({s for s, _ in edges} | {d for _, d in edges})
    seedset = {d for d in seeds if d in nodes}
    s = len(seedset)
    outdeg = {}
    for a, _ in edges:
        outdeg[a] = outdeg.get(a, 0) + 1
    teleport = ((100 - damping) * scale // 100) // s
    rank = {d: (scale // s if d in seedset else 0) for d in nodes}
    for _ in range(iters):
        dm = sum(r for d, r in rank.items() if d not in outdeg)
        inflow = {d: 0 for d in nodes}
        for a, b in edges:
            inflow[b] += rank[a] // outdeg[a]
        rank = {
            d: (teleport + damping * (inflow[d] + dm // s) // 100
                if d in seedset else damping * inflow[d] // 100)
            for d in nodes
        }
    return rank


def _seeds_df(spark, seeds):
    return spark.createDataFrame(pd.DataFrame({"domain": list(seeds)}))


def test_trustrank_matches_python_oracle(spark):
    from chronon_spark.operators.linkgraph import domain_trustrank

    seeds = ["a", "d", "not-in-graph"]  # out-of-graph seed must be ignored
    want = _py_trustrank(EDGES, seeds)
    got = {
        r["domain"]: r["rank"]
        for r in domain_trustrank(
            _edges_df(spark, 4), _seeds_df(spark, seeds)
        ).collect()
    }
    assert got == want
    # trust demotion: 'sink1' is only reachable from e, which no seed
    # links to — it must hold ZERO trust while plain PageRank gives it
    # teleport mass
    assert got["sink1"] == 0
    assert {
        r["domain"]: r["rank"] for r in domain_pagerank(_edges_df(spark, 4)).collect()
    }["sink1"] > 0


def test_trustrank_duckdb_oracle_parity_and_invariance(spark):
    import duckdb

    from chronon_spark.operators.linkgraph import (
        domain_trustrank,
        trustrank_oracle_sql,
    )

    seeds = ["a", "b"]
    got = (
        domain_trustrank(_edges_df(spark, 3), _seeds_df(spark, seeds),
                         iters=5, damping=80)
        .orderBy("domain")
        .toPandas()
    )
    con = duckdb.connect()
    con.register("edges_src", pd.DataFrame(EDGES, columns=["src_domain", "dst_domain"]))
    sql = trustrank_oracle_sql(
        "SELECT DISTINCT src_domain, dst_domain FROM edges_src"
        " WHERE src_domain <> dst_domain",
        "SELECT * FROM (VALUES ('a'), ('b')) t(domain)",
        iters=5,
        damping=80,
    )
    want = con.sql(sql + " ORDER BY domain").df()
    assert got["domain"].tolist() == want["domain"].tolist()
    assert got["rank"].astype(int).tolist() == want["rank"].astype(int).tolist()

    # partitioning invariance
    a = {r["domain"]: r["rank"]
         for r in domain_trustrank(_edges_df(spark, 1), _seeds_df(spark, seeds)).collect()}
    b = {r["domain"]: r["rank"]
         for r in domain_trustrank(_edges_df(spark, 16), _seeds_df(spark, seeds)).collect()}
    assert a == b


def test_trustrank_validation_and_leakfree(spark):
    from chronon_spark.checkpoint import release_checkpoint
    from chronon_spark.operators.linkgraph import domain_trustrank

    with pytest.raises(ValueError):
        domain_trustrank(_edges_df(spark, 2), _seeds_df(spark, ["zzz"]))
    with pytest.raises(ValueError):
        domain_trustrank(_edges_df(spark, 2), _seeds_df(spark, ["a"]), damping=101)

    def _ids():
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it, out = m.iterator(), set()
        while it.hasNext():
            out.add(it.next()._1())
        return out

    before = _ids()
    out = domain_trustrank(_edges_df(spark, 2), _seeds_df(spark, ["a"]), iters=6)
    out.collect()
    added = _ids() - before
    assert len(added) == 1, added
    assert release_checkpoint(out)
    assert not (_ids() - before)


# ---------------------------------------------------------------------------
# redirect-chain resolution
# ---------------------------------------------------------------------------

def _py_resolve(edges, max_hops=8):
    """Pure-Python replica: min-dst determinization, <= max_hops steps."""
    nxt = {}
    for s, d in edges:
        nxt[s] = min(nxt.get(s, d), d)
    out = {}
    for s in nxt:
        cur, hops = nxt[s], 1
        for _ in range(max_hops - 1):
            if cur in nxt:
                cur, hops = nxt[cur], hops + 1
        out[s] = (cur, hops, "unresolved" if cur in nxt else "resolved")
    return out


REDIRECT_EDGES = [
    ("a", "b"), ("b", "c"), ("c", "final"),      # 3-hop chain
    ("loop", "loop"),                            # self-loop trap
    ("x", "y"), ("y", "x"),                      # 2-cycle
    ("dup", "z2"), ("dup", "z1"),                # multi-dst -> min wins
    ("deep0", "deep1"), ("deep1", "deep2"), ("deep2", "deep3"),
    ("deep3", "deep4"), ("deep4", "deep5"), ("deep5", "deep6"),
    ("deep6", "deep7"), ("deep7", "deep8"), ("deep8", "deep9"),
]


def test_resolve_redirects_matches_python_oracle(spark):
    from chronon_spark.operators.linkgraph import resolve_redirects

    df = spark.createDataFrame(
        pd.DataFrame(REDIRECT_EDGES, columns=["src_url", "dst_url"])
    ).repartition(4)
    got = {r.src_url: (r.final_url, r.n_hops, r.status)
           for r in resolve_redirects(df, max_hops=8).collect()}
    assert got == _py_resolve(REDIRECT_EDGES, max_hops=8)
    # the interesting rows, spelled out
    assert got["a"] == ("final", 3, "resolved")
    assert got["loop"] == ("loop", 8, "unresolved")
    assert got["x"][2] == "unresolved"
    assert got["dup"] == ("z1", 1, "resolved")
    # 9-hop chain exceeds the 8-hop budget
    assert got["deep0"] == ("deep8", 8, "unresolved")
    assert got["deep1"] == ("deep9", 8, "resolved")


def test_resolve_redirects_duckdb_parity_and_invariance(spark):
    import duckdb

    from chronon_spark.operators.linkgraph import (
        redirect_oracle_sql,
        resolve_redirects,
    )

    pdf = pd.DataFrame(REDIRECT_EDGES, columns=["src_url", "dst_url"])
    df = spark.createDataFrame(pdf)
    got = resolve_redirects(df, max_hops=5).orderBy("src_url").toPandas()
    con = duckdb.connect()
    con.register("redir", pdf)
    want = con.sql(
        redirect_oracle_sql("SELECT src_url, dst_url FROM redir", max_hops=5)
        + " ORDER BY src_url"
    ).df()
    assert got["src_url"].tolist() == want["src_url"].tolist()
    assert got["final_url"].tolist() == want["final_url"].tolist()
    assert got["n_hops"].astype(int).tolist() == want["n_hops"].astype(int).tolist()
    assert got["status"].tolist() == want["status"].tolist()

    a = sorted(map(tuple, resolve_redirects(df.repartition(1)).collect()))
    b = sorted(map(tuple, resolve_redirects(df.repartition(16)).collect()))
    assert a == b


def test_resolve_redirects_validation_and_leakfree(spark):
    from chronon_spark.checkpoint import release_checkpoint
    from chronon_spark.operators.linkgraph import resolve_redirects

    df = spark.createDataFrame(
        pd.DataFrame(REDIRECT_EDGES, columns=["src_url", "dst_url"])
    )
    with pytest.raises(ValueError):
        resolve_redirects(df, max_hops=0)

    def _ids():
        m = spark.sparkContext._jsc.sc().getPersistentRDDs()
        it, out = m.iterator(), set()
        while it.hasNext():
            out.add(it.next()._1())
        return out

    before = _ids()
    out = resolve_redirects(df, max_hops=6)
    out.collect()
    added = _ids() - before
    assert len(added) == 1, added
    assert release_checkpoint(out)
    assert not (_ids() - before)


def test_registered_domain_cases(spark):
    from chronon_spark.operators.linkgraph import registered_domain

    cases = {
        "www.example.com": "example.com",
        "a.b.news.co.uk": "news.co.uk",
        "news.co.uk": "news.co.uk",
        "foo.github.io": "foo.github.io",
        "deep.sub.foo.github.io": "foo.github.io",
        "user.blogspot.com": "user.blogspot.com",
        "example.com": "example.com",
        "localhost": "localhost",
        "WWW.Example.COM": "example.com",   # hosts are case-insensitive
        "x.com.au": "x.com.au",
        "m.x.com.au": "x.com.au",
    }
    df = spark.createDataFrame(pd.DataFrame({"host": list(cases)}))
    got = {r["host"]: r["reg"] for r in df.select(
        "host", registered_domain("host").alias("reg")).collect()}
    assert got == cases


def test_registered_domain_port_and_fqdn_dot(spark):
    from chronon_spark.operators.linkgraph import registered_domain

    cases = {
        "www.example.com:8080": "example.com",
        "example.com.": "example.com",
        "a.news.co.uk:443": "news.co.uk",
    }
    df = spark.createDataFrame(pd.DataFrame({"host": list(cases)}))
    got = {r["host"]: r["reg"] for r in df.select(
        "host", registered_domain("host").alias("reg")).collect()}
    assert got == cases
