"""The north-star deployment clause, literally: jobs run via
``spark-submit --py-files chronon_spark.zip`` (reference: how Chronon
ships its jars to the cluster; our unit is the zipped package).

A REAL spark-submit subprocess (the pyspark-bundled launcher), the
package shipped ONLY via --py-files (cwd is elsewhere), driving the
resumable join backfill through the CLI; re-run resumes with zero
recompute.
"""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pyspark
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = os.path.join(os.path.dirname(pyspark.__file__), "bin", "spark-submit")

CONF = '''
import os
from chronon_spark.api.types import (
    Aggregation, EventSource, GroupBy, Join, JoinPart, Operation, Query, Window,
)
from chronon_spark.sources.scan import millis_expr

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")

def _gb():
    return GroupBy(
        sources=(EventSource(
            table=f"{SF}/events.parquet",
            query=Query(selects={"user_id": "user_id",
                                 "value": "floor(value*100 + 0.5)"},
                        time_column=millis_expr("ts")),
        ),),
        key_columns=("user_id",),
        aggregations=(Aggregation("value", Operation.SUM, windows=(Window.days(7),)),),
        name="submit_gb",
    )

def get_join():
    left = EventSource(
        table=f"{SF}/events.parquet",
        query=Query(selects={"event_id": "event_id", "user_id": "user_id"},
                    time_column=millis_expr("ts")),
    )
    return Join(left=left, join_parts=(JoinPart(_gb()),), name="submit_join")
'''


@pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT), reason="pyspark spark-submit not found"
)
def test_spark_submit_pyfiles_backfill(tmp_path, sf_dir):
    zip_path = tmp_path / "chronon_spark.zip"
    with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
        pkg = os.path.join(REPO, "chronon_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    zf.write(full, os.path.relpath(full, REPO))
    (tmp_path / "conf.py").write_text(CONF)
    shutil.copy(os.path.join(REPO, "chronon_spark", "cli.py"),
                tmp_path / "cli_entry.py")
    out = tmp_path / "backfill_out"
    env = {**os.environ, "SPARK_GRAFT_TEST_SF": sf_dir,
           "PYSPARK_PYTHON": sys.executable,
           "PYSPARK_DRIVER_PYTHON": sys.executable}
    cmd = [
        SPARK_SUBMIT, "--master", "local[4]",
        "--py-files", str(zip_path), str(tmp_path / "cli_entry.py"),
        "backfill-join", "--conf", str(tmp_path / "conf.py"),
        "--output", str(out),
        "--start", "2024-01-05", "--end", "2024-01-08", "--step-days", "2",
    ]
    # cwd AWAY from the repo: the engine must come from the zip alone
    r = subprocess.run(cmd, cwd=tmp_path, env=env, capture_output=True,
                       text=True, timeout=420)
    assert r.returncode == 0, r.stderr[-3000:]
    line = [ln for ln in r.stdout.splitlines() if ln.startswith("{")][-1]
    res = json.loads(line)
    assert res["computed_ranges"] and res["skipped_partitions"] == 0
    assert os.path.isdir(out)
    # resume: identical invocation recomputes NOTHING
    r2 = subprocess.run(cmd, cwd=tmp_path, env=env, capture_output=True,
                        text=True, timeout=420)
    assert r2.returncode == 0, r2.stderr[-3000:]
    line2 = [ln for ln in r2.stdout.splitlines() if ln.startswith("{")][-1]
    res2 = json.loads(line2)
    assert res2["computed_ranges"] == []
    assert res2["skipped_partitions"] > 0
