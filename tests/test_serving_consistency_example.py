"""End-to-end lambda lifecycle example (examples/serving_consistency.py):
upload -> offline-Fetcher replay -> serving logs -> flatten ->
ConsistencyJob must report ZERO drift."""

import os
import sys

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
    ),
)


def test_serving_consistency_zero_drift(spark, tmp_path):
    from serving_consistency import run

    out = run(spark, str(tmp_path), verbose=False)
    assert out["mismatches"] == 0
    pdf = out["metrics"]
    # every served feature column was compared on every served day
    cols = set(pdf["column"]) if "column" in pdf else set(pdf.iloc[:, 1])
    assert {"f_srv_value_sum_7d", "f_srv_value_count", "f_srv_value_last", "ratio"} <= cols
    totals = pdf[pdf["metric"] == "total"]["value"]
    assert (totals > 0).all()
