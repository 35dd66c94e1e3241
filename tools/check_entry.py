"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` twin on DuckDB at sf0.01, then compares row count and an
order-insensitive value comparison (sorted by all columns). Usage:

    python tools/check_entry.py [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")

import duckdb
import pandas as pd

import __spark_entry__ as E

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return None
        return round(v, 6)
    if isinstance(v, (list, tuple)) or getattr(v, "ndim", 0) >= 1:
        return tuple(norm_cell(x) for x in v)  # list / numpy array
    if hasattr(v, "item"):  # numpy scalar
        return norm_cell(v.item())
    return v

def norm_df(df: pd.DataFrame) -> list:
    cols = sorted(df.columns)
    rows = [tuple(norm_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows, key=lambda r: tuple((x is None, str(type(x)), x) for x in r))


def main():
    argv = [a for a in sys.argv[1:] if a != "--time"]
    show_time = "--time" in sys.argv[1:]
    only = set(argv)
    from chronon_spark.session import build_session

    spark = build_session(master="local[8]", shuffle_partitions=8,
                          extra_conf={"spark.ui.enabled": "false",
                                      "spark.driver.memory": "6g"})
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    timings = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            print(f"[FAIL] {name}: spark error: {ex}")
            failures.append(name)
            continue
        spark_sec = time.time() - t0
        if name not in oracles:
            timings[name] = (spark_sec, 0.0)
            print(f"[rows-only] {name}: {len(got)} rows"
                  + (f"  [{spark_sec:.1f}s]" if show_time else ""))
            continue
        t1 = time.time()
        try:
            exp = con.sql(oracles[name]).df()
        except Exception as ex:
            print(f"[FAIL] {name}: oracle error: {ex}")
            failures.append(name)
            continue
        if len(got) != len(exp):
            print(f"[FAIL] {name}: rowcount spark={len(got)} duck={len(exp)}")
            failures.append(name)
            continue
        if sorted(got.columns) != sorted(exp.columns):
            print(f"[FAIL] {name}: cols spark={sorted(got.columns)} duck={sorted(exp.columns)}")
            failures.append(name)
            continue
        duck_sec = time.time() - t1
        timings[name] = (spark_sec, duck_sec)
        g, e = norm_df(got), norm_df(exp)
        if g == e:
            print(f"[OK]   {name}: {len(got)} rows"
                  + (f"  [spark {spark_sec:.1f}s + duck {duck_sec:.1f}s]" if show_time else ""))
        else:
            bad = sum(1 for a, b in zip(g, e) if a != b)
            print(f"[FAIL] {name}: {bad}/{len(g)} rows differ")
            for a, b in zip(g, e):
                if a != b:
                    print("  spark:", a)
                    print("  duck :", b)
                    break
            failures.append(name)
    if show_time and timings:
        total = sum(s + d for s, d in timings.values())
        print(f"\nTOTAL: {total:.1f}s over {len(timings)} queries; slowest:")
        for name, (s, d) in sorted(timings.items(), key=lambda kv: -(kv[1][0] + kv[1][1]))[:15]:
            print(f"  {name}: spark {s:.1f}s + duck {d:.1f}s")
    print("FAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
