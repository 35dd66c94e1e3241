"""target_encode_asof: brute-force oracle, leakage edges, invariance."""

import random

import pytest

from chronon_spark.operators.target_encode import target_encode_asof

HOP = 1_000
M = 5
MICRO = 1_000_000


def _brute(events, queries, m=M):
    out = {}
    for qid, k, t in queries:
        bq = t // HOP
        g = [v for _, ets, v in events if ets // HOP < bq]
        if not g:
            out[qid] = None
            continue
        g_mean_micro = (MICRO * sum(g)) // len(g)
        kvals = [v for ek, ets, v in events if ek == k and ets < t]
        out[qid] = (sum(kvals) * MICRO + m * g_mean_micro) // (len(kvals) + m)
    return out


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(31)
    events = [
        (rng.randint(0, 4), rng.randint(0, 20_000), rng.randint(0, 40))
        for _ in range(400)
    ]
    queries = [(i, rng.randint(0, 4), rng.randint(0, 20_000)) for i in range(150)]
    # self-leak plants: events exactly AT query timestamps (must not count)
    for i, (qid, k, t) in enumerate(queries[:20]):
        events.append((k, t, 1000 + i))
    # first-hop queries (no global prior yet -> NULL)
    queries += [(900, 0, 3), (901, 4, 999)]
    ev = spark.createDataFrame(events, "k long, ts long, v long")
    qr = spark.createDataFrame(queries, "qid long, k long, ts long")
    return events, queries, ev, qr


def test_matches_brute_force(spark, planted):
    events, queries, ev, qr = planted
    got = {
        r["qid"]: r["te_micro"]
        for r in target_encode_asof(ev, qr, "k", "ts", "v", HOP, "qid", M).collect()
    }
    assert got == _brute(events, queries)


def test_self_and_tie_leak_excluded(spark):
    # the query's own-moment label and a same-ts other event must not
    # leak; an event 1ms earlier in the same hop must count exactly.
    ev = spark.createDataFrame(
        [(1, 100, 8), (1, 5_500, 999), (2, 5_500, 777), (1, 5_499, 4)],
        "k long, ts long, v long",
    )
    qr = spark.createDataFrame([(0, 1, 5_500)], "qid long, k long, ts long")
    [row] = target_encode_asof(ev, qr, "k", "ts", "v", HOP, "qid", M).collect()
    # global prior = hops < 5: only (1,100,8); key prior = ts<5500: 8 and 4
    g_mean_micro = MICRO * 8
    assert row["te_micro"] == (12 * MICRO + M * g_mean_micro) // (2 + M)


def test_cold_key_gets_global_prior(spark):
    ev = spark.createDataFrame([(1, 100, 6), (1, 200, 10)], "k long, ts long, v long")
    qr = spark.createDataFrame([(0, 99, 5_000)], "qid long, k long, ts long")
    [row] = target_encode_asof(ev, qr, "k", "ts", "v", HOP, "qid", M).collect()
    assert row["te_micro"] == (MICRO * 16) // 2  # pure global mean, 8.0

def test_first_hop_is_null(spark):
    ev = spark.createDataFrame([(1, 500, 6)], "k long, ts long, v long")
    qr = spark.createDataFrame([(0, 1, 900)], "qid long, k long, ts long")
    [row] = target_encode_asof(ev, qr, "k", "ts", "v", HOP, "qid", M).collect()
    assert row["te_micro"] is None


def test_partition_invariance(spark, planted):
    events, queries, ev, qr = planted
    want = _brute(events, queries)
    for n in (3, 17):
        got = {
            r["qid"]: r["te_micro"]
            for r in target_encode_asof(
                ev.repartition(n), qr.repartition(n), "k", "ts", "v",
                HOP, "qid", M,
            ).collect()
        }
        assert got == want


def test_plan_has_no_python_stages(spark, planted):
    _, _, ev, qr = planted
    plan = (
        target_encode_asof(ev, qr, "k", "ts", "v", HOP, "qid", M)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan
