"""CompareJob + Summarizer/drift equivalents (stats/CompareJob.scala,
stats/CompareBaseJob.scala, stats/drift/Summarizer.scala)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from chronon_spark.plans.compare import check_consistency, compare_job
from chronon_spark.plans.summary import drift_series, summarize


@pytest.fixture(scope="module")
def tables(spark):
    left = spark.createDataFrame(
        pd.DataFrame(
            {"k": [1, 2, 3, 4], "a": [10, 20, 30, 40], "b": [1.0, 2.0, None, 4.0],
             "extra": ["x"] * 4}
        )
    )
    right = spark.createDataFrame(
        pd.DataFrame({"k": [1, 2, 3, 5], "a": [10, 21, 30, 50], "b": [1.0, 2.0, 3.0, 5.0]})
    )
    return left, right


def test_check_consistency_errors(tables):
    left, right = tables
    # strict mode: field-count mismatch (left has `extra`)
    errs = check_consistency(left, right, ["k"])
    assert any("field counts" in e for e in errs)
    # migration mode: superset left is fine
    assert check_consistency(left, right, ["k"], migration_check=True) == []
    # dtype mismatch flagged
    bad = right.withColumn("a", right["a"].cast("string"))
    errs = check_consistency(left, bad, ["k"], migration_check=True)
    assert any("dtype mismatch" in e for e in errs)


def test_compare_job_metrics(tables):
    left, right = tables
    cdf, metrics = compare_job(left, right, ["k"], migration_check=True)
    assert cdf.count() == 5  # full outer: keys 1..5
    m = {
        (r["column"], r["metric"]): r["value"]
        for r in metrics.collect()
    }
    # k=4 exists only left, k=5 only right
    assert m[("a", "right_null")] == 1
    assert m[("a", "left_null")] == 1
    # a mismatches at k=2 (20 vs 21)
    assert m[("a", "mismatch")] == 1
    assert m[("a", "total")] == 5
    # b: one genuine null on the left at k=3 -> left_null
    assert m[("b", "left_null")] == 1
    assert m[("a", "max_abs_diff")] == 1.0
    # null rows contribute 0 to the smape average (reference .otherwise(0.0))
    assert m[("a", "smape")] == pytest.approx((2 * 1 / 41) / 5)


def test_compare_job_identical_tables_all_zero(tables):
    left, _ = tables
    sub = left.drop("extra")
    _, metrics = compare_job(sub, sub, ["k"])
    bad = metrics.where(
        "metric IN ('mismatch', 'left_null', 'right_null') AND value != 0"
    )
    assert bad.count() == 0


def test_summarize_shape_and_values(spark):
    df = spark.createDataFrame(
        [("d1", 1.0), ("d1", 2.0), ("d1", 3.0), ("d1", None), ("d2", 10.0), ("d2", 20.0)],
        "ds string, v double",
    )
    out = summarize(df, "ds", ["v"]).toPandas().set_index("ds")
    assert len(out) == 2
    d1 = out.loc["d1"]
    assert d1["n_rows"] == 4 and d1["null_count"] == 1 and d1["n_distinct"] == 3
    assert d1["mean"] == pytest.approx(2.0)
    # percentiles are DDSketch-based: alpha=0.01 relative-error bound
    assert d1["p50"] == pytest.approx(2.0, rel=0.02)
    d2 = out.loc["d2"]
    assert d2["variance"] == pytest.approx(25.0)  # var_pop of {10,20}


def test_drift_series_detects_shift(spark):
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "ds": ["2024-01-01"] * 100 + ["2024-01-02"] * 100,
                "v": [float(i % 10) for i in range(100)]
                + [float(i % 10) + 5 for i in range(100)],
            }
        )
    )
    out = drift_series(
        df, "ds", baseline=("2024-01-01", "2024-01-01"),
        current=("2024-01-02", "2024-01-02"), columns=["v"],
    ).toPandas()
    r = out.iloc[0]
    assert r["baseline_rows"] == 100 and r["current_rows"] == 100
    assert r["mean_shift"] == pytest.approx(5.0)
    # median shift is sketch-based: each side's p50 carries alpha=1% error
    assert r["median_shift"] == pytest.approx(5.0, abs=0.2)
    assert r["normalized_mean_shift"] > 1.0


def test_drift_distances_vs_numpy(spark):
    """JSD / PSI / Hellinger over DDSketch bucket histograms must match a
    numpy recomputation over the same buckets (the formulas, not the
    sketching, are under test) and behave: identical distributions -> ~0,
    disjoint distributions -> JSD ~ ln(2), Hellinger ~ 1."""
    import numpy as np

    from chronon_spark.operators.ddsketch import DEFAULT_ALPHA, gamma_of
    from chronon_spark.plans.summary import drift_distances

    rng = np.random.RandomState(4)
    base_v = rng.lognormal(3, 1, 4000)
    cur_v = rng.lognormal(3.4, 1.1, 4000)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "ds": ["2024-01-01"] * 4000 + ["2024-01-02"] * 4000,
                "v": np.concatenate([base_v, cur_v]),
            }
        )
    )
    out = drift_distances(
        df, "ds", baseline=("2024-01-01", "2024-01-01"),
        current=("2024-01-02", "2024-01-02"), columns=["v"],
    ).toPandas().iloc[0]

    # numpy recomputation over the same bucket ids
    import math

    lg = math.log(gamma_of(DEFAULT_ALPHA))

    def buckets(vals):
        b = np.ceil(np.log(np.abs(vals)) / lg).astype(np.int64)
        u, c = np.unique(b, return_counts=True)
        return dict(zip(u.tolist(), c.tolist()))

    hb, hc = buckets(base_v), buckets(cur_v)
    keys = sorted(set(hb) | set(hc))
    p = np.array([hb.get(k, 0) for k in keys], dtype=float); p /= p.sum()
    q = np.array([hc.get(k, 0) for k in keys], dtype=float); q /= q.sum()
    m = (p + q) / 2
    jsd = 0.5 * np.sum(np.where(p > 0, p * np.log(p / m, where=p > 0), 0)) + \
        0.5 * np.sum(np.where(q > 0, q * np.log(q / m, where=q > 0), 0))
    eps = 1e-6
    pe, qe = np.maximum(p, eps), np.maximum(q, eps)
    psi = np.sum((pe - qe) * np.log(pe / qe))
    hell = math.sqrt(max(0.0, 1.0 - np.sum(np.sqrt(p * q))))
    assert out["jsd"] == pytest.approx(jsd, rel=1e-9)
    assert out["psi"] == pytest.approx(psi, rel=1e-9)
    assert out["hellinger"] == pytest.approx(hell, rel=1e-9)
    assert out["baseline_rows"] == 4000 and out["current_rows"] == 4000

    # sanity: identical sides -> ~0 everywhere
    same = drift_distances(
        df.where("ds = '2024-01-01'").union(
            df.where("ds = '2024-01-01'").withColumn("ds", F.lit("2024-01-02"))
        ),
        "ds", ("2024-01-01", "2024-01-01"), ("2024-01-02", "2024-01-02"), ["v"],
    ).toPandas().iloc[0]
    assert abs(same["jsd"]) < 1e-12 and abs(same["psi"]) < 1e-12 and same["hellinger"] < 1e-6

    # disjoint supports -> maximal distances
    far = drift_distances(
        df.where("ds = '2024-01-01'").union(
            df.where("ds = '2024-01-01'")
            .withColumn("v", F.col("v") * 1e6)
            .withColumn("ds", F.lit("2024-01-02"))
        ),
        "ds", ("2024-01-01", "2024-01-01"), ("2024-01-02", "2024-01-02"), ["v"],
    ).toPandas().iloc[0]
    assert far["jsd"] == pytest.approx(math.log(2), rel=1e-6)
    assert far["hellinger"] == pytest.approx(1.0, rel=1e-6)


def test_edit_distance_pair_reference_cases():
    """Reference EditDistanceTest.scala:25-44, bit-for-bit."""
    from chronon_spark.plans.compare import _edit_distance_pair as ed

    assert sum(ed(None, None)) == 0
    assert sum(ed([], None)) == 0
    assert sum(ed(None, [])) == 0
    assert sum(ed([], [])) == 0
    assert sum(ed(["abc", "def"], None)) == 2
    assert sum(ed(["abc", "def"], [])) == 2
    assert sum(ed(["abc", "def"], ["abc", "def"])) == 0
    assert ed([3, 1], [4, 3, 1, 2])[1] == 2  # delete
    # 2 deletes from & 3 inserts into right - to make it like left
    assert ed([1, 2, 3, 4], [5, 6, 2]) == (3, 2)
    assert sum(ed(list("abc"), list("def"))) == 6
    assert sum(ed(list("abc"), list("dbf"))) == 4


def test_compare_job_sequence_metrics(spark):
    """Array-typed value columns get the reference sequenceMetrics
    (CompareMetrics.scala:85-101): edit-distance insert/delete medians,
    length medians, mismatch_length."""
    from chronon_spark.plans.compare import _edit_distance_pair

    rows = [
        (1, [1, 2, 3, 4], [5, 6, 2]),      # ed (3, 2); len 4 vs 3
        (2, [7, 8], [7, 8]),               # equal
        (3, None, [9, 9]),                 # left null
        (4, [1], None),                    # right null
        (5, [4, 3, 1, 2], [3, 1]),         # ed (0, ...) reversed case
    ]
    left = spark.createDataFrame(
        [(k, lv) for k, lv, _ in rows], "k int, seq array<int>"
    )
    right = spark.createDataFrame(
        [(k, rv) for k, _, rv in rows], "k int, seq array<int>"
    )
    _, metrics = compare_job(left, right, ["k"])
    m = {(r["column"], r["metric"]): r["value"] for r in metrics.collect()}
    # naive expectation over the joined rows (nulls flow into the UDF)
    eds = [_edit_distance_pair(lv, rv) for _, lv, rv in rows]
    inserts = sorted(e[0] for e in eds)
    deletes = sorted(e[1] for e in eds)
    assert m[("seq", "edit_insert_median")] == inserts[len(inserts) // 2]
    assert m[("seq", "edit_delete_median")] == deletes[len(deletes) // 2]
    assert m[("seq", "edit_total_max")] == max(a + b for a, b in eds)
    assert m[("seq", "mismatch_length")] == 2.0  # k=1 (4 vs 3), k=5 (4 vs 2)
    # exact percentile interpolates: left lens [1,2,4,4] -> 3.0, right [2,2,2,3] -> 2.0
    assert m[("seq", "left_length_median")] == 3.0
    assert m[("seq", "right_length_median")] == 2.0
    assert m[("seq", "mismatch")] == 2.0  # k=1 and k=5: both set, unequal


def test_edit_distance_pair_hypothesis():
    """Property: against a brute-force O(2^n) LCS on tiny alphabets —
    small alphabet maximizes repeated elements (the regime the
    prefix/suffix-strip + DP must get right, cf. the r3 BPE boundary
    bug class)."""
    from itertools import combinations

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from chronon_spark.plans.compare import _edit_distance_pair

    def brute_lcs(a, b):
        best = 0
        for r in range(len(a), 0, -1):
            for idx in combinations(range(len(a)), r):
                sub = [a[i] for i in idx]
                it = iter(b)
                if all(x in it for x in sub):
                    return r
        return best

    @given(
        st.lists(st.integers(0, 2), max_size=7),
        st.lists(st.integers(0, 2), max_size=7),
    )
    @settings(max_examples=200, deadline=None)
    def check(a, b):
        ins, dele = _edit_distance_pair(a, b)
        lcs = brute_lcs(a, b)
        assert ins == len(a) - lcs
        assert dele == len(b) - lcs

    check()


def test_summarize_inner_array_nullness(spark):
    """Reference NullnessCountersAggregatorTest (udafs/): element-level
    null counts for array columns via the aggregate() HOF — scalar
    columns report null inner metrics."""
    df = spark.createDataFrame(
        [
            ("d1", ["a", None, "c", None], 1.0),
            ("d1", [None, "b", "c", "d"], 2.0),
            ("d1", None, None),
            ("d1", ["e", "f", None, "h"], 4.0),
        ],
        "ds string, arr array<string>, v double",
    )
    out = summarize(df, "ds", ["arr", "v"]).toPandas().set_index("column")
    a = out.loc["arr"]
    # 4 inner nulls over 12 elements (the all-null ROW is outer null: not counted)
    assert a["inner_null_count"] == 4
    assert a["inner_null_rate"] == pytest.approx(4 / 12)
    assert a["null_count"] == 1  # the row-level null
    v = out.loc["v"]
    assert pd.isna(v["inner_null_count"]) and pd.isna(v["inner_null_rate"])
    assert v["mean"] == pytest.approx(7.0 / 3)


def test_compare_metrics_infers_types_for_direct_calls(spark):
    """compare_metrics without `types` infers them from the frame schema:
    an array column gets the sequence metrics instead of a failing
    double cast (r4 ADVICE #4)."""
    import pandas as pd

    from chronon_spark.plans.compare import compare_metrics

    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "k": [1, 2],
                "seq_left": [[1, 2, 3], [4, 5]],
                "seq_right": [[1, 2], [4, 5]],
                "x_left": [1.0, 2.0],
                "x_right": [1.0, 2.5],
            }
        )
    )
    out = compare_metrics(df, ["seq", "x"]).toPandas()
    metrics = set(zip(out["column"], out["metric"]))
    assert any(c == "seq" and "edit" in m for c, m in metrics) or any(
        c == "seq" and "length" in m for c, m in metrics
    ), sorted(metrics)
    assert ("x", "smape") in metrics
