"""label_join: brute-force oracles, leakage edge, partition invariance."""

import datetime
import random

import pytest

from chronon_spark.operators.label_join import label_join_snapshot, label_sawtooth

HOP = 1_000
NH = 3


def _brute_sawtooth(events, queries):
    out = {}
    for qid, k, t in queries:
        bq = t // HOP
        vals = [
            v
            for ek, ets, v in events
            if ek == k and ets > t and ets // HOP <= bq + NH
        ]
        out[qid] = (sum(vals) if vals else None, len(vals))
    return out


@pytest.fixture(scope="module")
def planted(spark):
    rng = random.Random(23)
    events = [
        (rng.randint(0, 4), rng.randint(0, 20_000), rng.randint(-5, 50))
        for _ in range(500)
    ]
    queries = [(i, rng.randint(0, 4), rng.randint(0, 20_000)) for i in range(150)]
    # adversarial ties: events exactly AT several query timestamps (must
    # NOT label those queries — the strict forward edge)
    for i, (qid, k, t) in enumerate(queries[:20]):
        events.append((k, t, 1000 + i))
    ev = spark.createDataFrame(events, "k long, ts long, v long")
    qr = spark.createDataFrame(queries, "qid long, k long, ts long")
    return events, queries, ev, qr


def test_sawtooth_matches_brute_force(spark, planted):
    events, queries, ev, qr = planted
    got = {
        r["qid"]: (r["label_sum"], r["label_cnt"])
        for r in label_sawtooth(ev, qr, "k", "ts", "v", HOP, NH, "qid").collect()
    }
    assert got == _brute_sawtooth(events, queries)


def test_sawtooth_strict_edge_and_hop_rounding(spark):
    # event exactly AT query ts: excluded (features never label their own
    # moment). 1 ms later, same hop: counts. Far edge hop-rounds UP: an
    # event at the END of hop bq+NH counts, first ms of bq+NH+1 does not.
    ev = spark.createDataFrame(
        [
            (1, 5_500, 10),  # at query ts -> excluded
            (1, 5_501, 7),  # same hop, later -> head
            (1, (5 + NH) * HOP + 999, 3),  # last ms of far hop -> tail
            (1, (5 + NH + 1) * HOP, 99),  # one hop too far -> dropped
        ],
        "k long, ts long, v long",
    )
    qr = spark.createDataFrame([(0, 1, 5_500)], "qid long, k long, ts long")
    [row] = label_sawtooth(ev, qr, "k", "ts", "v", HOP, NH, "qid").collect()
    assert (row["label_sum"], row["label_cnt"]) == (10, 2)


def test_sawtooth_zero_hops_empty_window(spark):
    # n_hops=0: only the remainder of the query's own hop labels it; a
    # query with nothing after it in-hop gets (NULL, 0)
    ev = spark.createDataFrame([(1, 5_400, 4)], "k long, ts long, v long")
    qr = spark.createDataFrame(
        [(0, 1, 5_300), (1, 1, 5_400)], "qid long, k long, ts long"
    )
    got = {
        r["qid"]: (r["label_sum"], r["label_cnt"])
        for r in label_sawtooth(ev, qr, "k", "ts", "v", HOP, 0, "qid").collect()
    }
    assert got == {0: (4, 1), 1: (None, 0)}


def test_sawtooth_partition_invariance(spark, planted):
    events, queries, ev, qr = planted
    want = _brute_sawtooth(events, queries)
    for n in (3, 17):
        got = {
            r["qid"]: (r["label_sum"], r["label_cnt"])
            for r in label_sawtooth(
                ev.repartition(n), qr.repartition(n), "k", "ts", "v",
                HOP, NH, "qid",
            ).collect()
        }
        assert got == want


def test_sawtooth_plan_has_no_python_stages(spark, planted):
    _, _, ev, qr = planted
    plan = (
        label_sawtooth(ev, qr, "k", "ts", "v", HOP, NH, "qid")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Python" not in plan


def _d(s):
    return datetime.date.fromisoformat(s)


def test_snapshot_matches_brute_force(spark):
    rng = random.Random(7)
    base = _d("2024-01-01")
    rows = [
        (rng.randint(0, 3), base + datetime.timedelta(days=rng.randint(0, 30)))
        for i in range(120)
    ]
    left = spark.createDataFrame(
        [(i, k, d) for i, (k, d) in enumerate(rows)], "rid long, k long, ds date"
    )
    labels_py = [
        (rng.randint(0, 3), base + datetime.timedelta(days=rng.randint(0, 35)),
         rng.randint(-3, 9))
        for _ in range(300)
    ]
    labels = spark.createDataFrame(labels_py, "k long, ds date, v long")
    off = 7
    got = {
        r["rid"]: (r["label_sum"], r["label_cnt"], r["label_min"], r["label_max"])
        for r in label_join_snapshot(left, labels, "k", "ds", "v", off).collect()
    }
    assert len(got) == len(rows)  # left join preserves every feature row
    for i, (k, d) in enumerate(rows):
        vals = [
            v for lk, ld, v in labels_py
            if lk == k and d < ld <= d + datetime.timedelta(days=off)
        ]
        want = (
            (sum(vals), len(vals), min(vals), max(vals))
            if vals else (None, None, None, None)
        )
        assert got[i] == want, i


def test_snapshot_immature_window_is_null(spark):
    left = spark.createDataFrame(
        [(0, 1, _d("2024-03-01"))], "rid long, k long, ds date"
    )
    labels = spark.createDataFrame(
        [(1, _d("2024-03-01"), 5)], "k long, ds date, v long"  # same day: NOT a label
    )
    [row] = label_join_snapshot(left, labels, "k", "ds", "v", 7).collect()
    assert row["label_sum"] is None and row["label_cnt"] is None
