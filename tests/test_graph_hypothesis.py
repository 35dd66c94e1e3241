"""Hypothesis property tests for the graph operators: the distributed
integer-exact plans equal pure-Python oracles on ADVERSARIAL random
graphs (self-loop attempts, multi-edges collapsing, disconnected nodes,
sinks, cycles). Example counts are small — every example runs real
Spark jobs with iterative checkpoints."""

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tests.test_linkgraph import _py_harmonic, _py_hits, _py_pagerank

NODES = list("abcdefgh")


@st.composite
def graph(draw):
    n_edges = draw(st.integers(1, 14))
    edges = set()
    for _ in range(n_edges):
        s = draw(st.sampled_from(NODES))
        d = draw(st.sampled_from(NODES))
        if s != d:
            edges.add((s, d))
    if not edges:
        edges.add(("a", "b"))
    return sorted(edges)


def _df(spark, edges):
    return spark.createDataFrame(
        pd.DataFrame(edges, columns=["src_domain", "dst_domain"])
    ).repartition(3)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=graph())
def test_pagerank_random_graphs(spark, edges):
    from chronon_spark.operators.linkgraph import domain_pagerank

    got = {
        r["domain"]: r["rank"]
        for r in domain_pagerank(_df(spark, edges), iters=3).collect()
    }
    assert got == _py_pagerank(edges, iters=3)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=graph())
def test_hits_random_graphs(spark, edges):
    from chronon_spark.operators.linkgraph import domain_hits

    got = {
        r["domain"]: (r["hub"], r["authority"])
        for r in domain_hits(_df(spark, edges), iters=2).collect()
    }
    assert got == _py_hits(edges, iters=2)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=graph(), max_dist=st.integers(1, 3))
def test_harmonic_random_graphs(spark, edges, max_dist):
    from chronon_spark.operators.linkgraph import harmonic_centrality

    got = {
        r["domain"]: (r["reached"], r["harmonic"])
        for r in harmonic_centrality(
            _df(spark, edges), max_dist=max_dist, mode="exact"
        ).collect()
    }
    assert got == _py_harmonic(edges, max_dist=max_dist)
