"""CompareJob + Summarizer/drift equivalents (stats/CompareJob.scala,
stats/CompareBaseJob.scala, stats/drift/Summarizer.scala)."""

import pandas as pd
import pytest

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
    assert d1["p50"] == pytest.approx(2.0)
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
    assert r["median_shift"] == pytest.approx(5.0)
    assert r["normalized_mean_shift"] > 1.0
