"""Attribute a Spark job's wall time from its event log.

The round-4 scaling investigation (BASELINE.md addendum 6) needed
per-stage ground truth that `.explain()` cannot give: which stages
actually ran (AQE reuse or not), what each cost in executor-seconds at
different core counts, whether anything spilled, and how much of the
span had zero tasks in flight (driver time). This tool parses a Spark
event log (plain or rolling/zstd) and prints:

  - per-stage: wall, task count, executor-run seconds, GC, spill bytes,
    input rows, shuffle rows read/written — in submission order, so two
    runs of the same job diff line-by-line;
  - totals: executor-run-time sum (compare across core counts: equal
    work should cost equal executor-seconds — round 4 measured +25% at
    8 threads vs 2, which is how the host's DRAM ceiling was found),
    mean task concurrency vs cores, and zero-task driver time.

Usage:
    # run the job with event logging:
    #   spark.eventLog.enabled=true, spark.eventLog.dir=/tmp/evlog
    python tools/stage_profile.py /tmp/evlog [top_n]

Companion canaries for separating host from engine (bench.py):
`host_canary` (single-thread speed), `bandwidth_canary` (the socket's
own 2->8-process streaming-scaling ceiling).
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
from collections import defaultdict


def iter_lines(logdir: str):
    paths = sorted(glob.glob(os.path.join(logdir, "**", "events_*"), recursive=True))
    if not paths:  # single-file (non-rolling) event logs
        paths = sorted(
            p for p in glob.glob(os.path.join(logdir, "*")) if os.path.isfile(p)
        )
    for path in paths:
        if path.endswith(".zstd"):
            out = subprocess.run(["zstd", "-dc", path], capture_output=True, text=True)
            yield from out.stdout.splitlines()
        else:
            with open(path) as f:
                yield from f


def collect(logdir: str):
    stages: dict = defaultdict(
        lambda: {
            "tasks": 0, "run": 0, "gc": 0, "spill": 0,
            "in_rows": 0, "sr_rows": 0, "sw_rows": 0,
            "wall": None, "sub": None,
        }
    )
    tasks = []  # (launch, finish) for the concurrency timeline
    for line in iter_lines(logdir):
        try:
            ev = json.loads(line)
        except json.JSONDecodeError:
            continue
        kind = ev.get("Event")
        if kind == "SparkListenerTaskEnd":
            tm = ev.get("Task Metrics") or {}
            ti = ev.get("Task Info") or {}
            s = stages[ev["Stage ID"]]
            s["tasks"] += 1
            s["run"] += tm.get("Executor Run Time", 0)
            s["gc"] += tm.get("JVM GC Time", 0)
            s["spill"] += tm.get("Disk Bytes Spilled", 0) + tm.get("Memory Bytes Spilled", 0)
            s["in_rows"] += (tm.get("Input Metrics") or {}).get("Records Read", 0)
            s["sr_rows"] += (tm.get("Shuffle Read Metrics") or {}).get("Total Records Read", 0)
            s["sw_rows"] += (tm.get("Shuffle Write Metrics") or {}).get("Shuffle Records Written", 0)
            if ti.get("Launch Time") and ti.get("Finish Time"):
                tasks.append((ti["Launch Time"], ti["Finish Time"]))
        elif kind == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            s = stages[si["Stage ID"]]
            if si.get("Submission Time") and si.get("Completion Time"):
                s["wall"] = (si["Completion Time"] - si["Submission Time"]) / 1000.0
                s["sub"] = si["Submission Time"]
    return stages, tasks


def main() -> None:
    logdir = sys.argv[1]
    top = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    stages, tasks = collect(logdir)
    done = sorted(
        ((sid, v) for sid, v in stages.items() if v["wall"] is not None),
        key=lambda kv: kv[1]["sub"],
    )
    print(f"{'sid':>4} {'t+':>6} {'wall':>6} {'task':>5} {'run_s':>7} {'gc_s':>5} "
          f"{'spillMB':>8} {'in_rows':>10} {'shufR':>10} {'shufW':>10}")
    t0 = min(v["sub"] for _, v in done)
    rows = done if not top else sorted(done, key=lambda kv: -kv[1]["wall"])[:top]
    for sid, v in rows:
        print(f"{sid:>4} {(v['sub'] - t0) / 1000:>6.1f} {v['wall']:>6.1f} {v['tasks']:>5} "
              f"{v['run'] / 1000:>7.1f} {v['gc'] / 1000:>5.1f} {v['spill'] / 1e6:>8.0f} "
              f"{v['in_rows']:>10} {v['sr_rows']:>10} {v['sw_rows']:>10}")
    if not tasks:
        return
    lo = min(t[0] for t in tasks)
    hi = max(t[1] for t in tasks)
    span = (hi - lo) / 1000.0
    run = sum(v["run"] for _, v in done) / 1000.0
    gc = sum(v["gc"] for _, v in done) / 1000.0
    spill = sum(v["spill"] for _, v in done)
    # concurrency integral + zero-task gaps
    events = sorted([(t[0], 1) for t in tasks] + [(t[1], -1) for t in tasks])
    cur, last, idle, occ = 0, lo, 0.0, 0.0
    for ts, d in events:
        occ += cur * (ts - last)
        if cur == 0:
            idle += ts - last
        cur += d
        last = ts
    print(f"-- span {span:.1f}s | executor-run sum {run:.1f}s (gc {gc:.1f}s, "
          f"spill {spill / 1e6:.0f}MB) | mean concurrency {occ / (hi - lo):.2f} | "
          f"zero-task (driver) {idle / 1000:.1f}s = {100 * idle / (hi - lo):.0f}% of span")


if __name__ == "__main__":
    main()
