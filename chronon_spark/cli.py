"""spark-submit entry point.

Cluster usage (the north rule's deployment shape)::

    zip -r chronon_spark.zip chronon_spark
    spark-submit --py-files chronon_spark.zip \
        --master yarn --deploy-mode cluster \
        cli.py backfill-join --conf my_join.py --output s3a://bucket/features \
        --start 2024-01-01 --end 2024-03-31 --step-days 7

``--conf`` is a Python file defining ``get_join() -> Join`` (or
``get_group_by() -> GroupBy`` for groupby-snapshot). The job is resumable:
rerunning after a failure fills only missing ``ds`` partitions, and
per-partition lineage/metrics land in ``<output>__lineage``.

Local smoke: ``python -m chronon_spark.cli backfill-join ... --master local[8]``.
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import sys


def _load_conf(path: str):
    spec = importlib.util.spec_from_file_location("user_conf", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="chronon_spark")
    p.add_argument("--master", default=None, help="override master (default: from spark-submit)")
    sub = p.add_subparsers(dest="cmd", required=True)

    bj = sub.add_parser("backfill-join", help="resumable point-in-time join backfill")
    bj.add_argument("--conf", required=True, help="python file defining get_join()")
    bj.add_argument("--output", required=True)
    bj.add_argument("--start", required=True)
    bj.add_argument("--end", required=True)
    bj.add_argument("--step-days", type=int, default=30)
    bj.add_argument("--mode", choices=["sawtooth", "exact"], default="sawtooth")
    bj.add_argument("--prune-keys", action="store_true")
    bj.add_argument("--modular", action="store_true",
                    help="materialize source/part/merge as separate resumable tables")

    bs = sub.add_parser("backfill-groupby-snapshot", help="daily feature-table backfill")
    bs.add_argument("--conf", required=True, help="python file defining get_group_by()")
    bs.add_argument("--output", required=True)
    bs.add_argument("--start", required=True)
    bs.add_argument("--end", required=True)
    bs.add_argument("--step-days", type=int, default=30)

    up = sub.add_parser("upload-groupby", help="build the FinalBatchIr (KV upload) table")
    up.add_argument("--conf", required=True, help="python file defining get_group_by()")
    up.add_argument("--output", required=True)
    up.add_argument("--batch-end-ms", type=int, required=True)
    up.add_argument("--hop-ms", type=int, default=86_400_000)

    sq = sub.add_parser("staging-query", help="incremental macro-templated SQL fill")
    sq.add_argument("--sql-file", required=True)
    sq.add_argument("--output", required=True)
    sq.add_argument("--start", required=True)
    sq.add_argument("--end", required=True)
    sq.add_argument("--step-days", type=int, default=30)

    pl = sub.add_parser(
        "plan-join",
        help="emit the modular join's node DAG as JSON (reference "
        "planner.thrift node graph) — no Spark session needed",
    )
    pl.add_argument("--conf", required=True, help="python file defining get_join()")
    pl.add_argument("--output", required=True)

    rn = sub.add_parser(
        "run-node",
        help="execute ONE planned node in this process (reference "
        "batch/BatchNodeRunner.scala: one spark-submit per node, state "
        "handed off through the stage tables)",
    )
    rn.add_argument("--conf", required=True, help="python file defining get_join()")
    rn.add_argument("--output", required=True)
    rn.add_argument("--node-id", required=True)
    rn.add_argument("--start", required=True)
    rn.add_argument("--end", required=True)
    rn.add_argument("--step-days", type=int, default=30)
    rn.add_argument("--mode", choices=["sawtooth", "exact"], default="sawtooth")

    rp = sub.add_parser(
        "run-plan",
        help="orchestrate the full node DAG, one SUBPROCESS per node in "
        "dependency order (the external-scheduler deployment shape; "
        "failed reruns resume at partition granularity)",
    )
    rp.add_argument("--conf", required=True, help="python file defining get_join()")
    rp.add_argument("--output", required=True)
    rp.add_argument("--start", required=True)
    rp.add_argument("--end", required=True)
    rp.add_argument("--step-days", type=int, default=30)
    rp.add_argument("--mode", choices=["sawtooth", "exact"], default="sawtooth")

    cp = sub.add_parser(
        "compile",
        help="validate confs and write compiled JSON with column semantic "
        "hashes (reference cli/compile: parse_configs + conf_validator + "
        "column_hashing) — no Spark session needed",
    )
    cp.add_argument("--conf", required=True, help="python file defining GroupBy/Join objects")
    cp.add_argument("--out", required=True, help="output directory for compiled/ JSON")

    an = sub.add_parser(
        "analyze",
        help="derive a conf's output schema WITHOUT executing it + the "
        "CREATE TABLE DDL (reference Driver analyze / Analyzer.scala)",
    )
    an.add_argument("--conf", required=True,
                    help="python file defining get_join() or get_group_by()")
    an.add_argument("--table", default=None,
                    help="optional table name to render CREATE TABLE DDL for")

    lf = sub.add_parser(
        "log-flatten",
        help="flatten schema-versioned serving logs into the eval table "
        "(reference Driver log-flattener / LogFlattenerJob)",
    )
    lf.add_argument("--log-table", required=True)
    lf.add_argument("--schema-table", required=True)
    lf.add_argument("--output", required=True)
    lf.add_argument("--start", required=True)
    lf.add_argument("--end", required=True)
    lf.add_argument("--step-days", type=int, default=30)

    ct = sub.add_parser(
        "compare-tables",
        help="row-level diff metrics between two feature tables "
        "(reference Driver compare-join-query / CompareJob)",
    )
    ct.add_argument("--left-table", required=True)
    ct.add_argument("--right-table", required=True)
    ct.add_argument("--keys", required=True, help="comma-separated key columns")
    ct.add_argument("--output", required=True, help="metrics parquet path")
    ct.add_argument("--by-ds", action="store_true", help="group metrics per ds")

    cm = sub.add_parser(
        "consistency-metrics",
        help="offline re-join at logged points vs logged values "
        "(reference Driver consistency-metrics-compute / ConsistencyJob)",
    )
    cm.add_argument("--conf", required=True, help="python file defining get_join()")
    cm.add_argument("--logged-table", required=True,
                    help="flattened serving log (log-flatten output)")
    cm.add_argument("--output", required=True, help="metrics parquet path")
    cm.add_argument("--sample-percent", type=float, default=100.0)

    fe = sub.add_parser(
        "fetch",
        help="serve a Join for a requests table through the offline "
        "lambda read path (reference Driver fetch / FetcherCli; batch "
        "stand-in for the point-lookup service)",
    )
    fe.add_argument("--conf", required=True, help="python file defining get_join()")
    fe.add_argument("--requests", required=True,
                    help="parquet of request rows (left keys + ts)")
    fe.add_argument("--output", required=True)
    fe.add_argument("--batch-end-ms", type=int, required=True)
    fe.add_argument("--hop-ms", type=int, default=86_400_000)

    sm = sub.add_parser(
        "summarize",
        help="per-partition column summaries (+ optional KV upload) — "
        "reference Driver create-summary-dataset + summarize-and-upload",
    )
    sm.add_argument("--table", required=True)
    sm.add_argument("--output", required=True, help="summary parquet path")
    sm.add_argument("--partition-col", default="ds")
    sm.add_argument("--upload-table", default=None,
                    help="also upload as a bucketed KV summary dataset")

    sg = sub.add_parser(
        "streaming-groupby",
        help="drain a streaming source into tiled partial IRs "
        "(reference Driver group-by-streaming; availableNow trigger over "
        "a file-backed stream of decoded event rows — a broker topic "
        "plugs in through streaming/kafka.py unchanged)",
    )
    sg.add_argument("--conf", required=True, help="python file defining get_group_by()")
    sg.add_argument("--records-dir", required=True,
                    help="parquet dir of decoded event rows (keys + ts + inputs)")
    sg.add_argument("--checkpoint", required=True)
    sg.add_argument("--output", required=True, help="tile-IR parquet path")
    sg.add_argument("--hop-ms", type=int, default=None)

    mu = sub.add_parser(
        "metadata-upload",
        help="write enriched conf metadata JSON per conf "
        "(reference Driver metadata-upload; the KV store is a directory "
        "here - same group_bys/joins layout)",
    )
    mu.add_argument("--conf", required=True)
    mu.add_argument("--out", required=True)

    ck = sub.add_parser(
        "check-partitions",
        help="present/missing ds partitions of a table over a range "
        "(reference Driver check-partitions)",
    )
    ck.add_argument("--table", required=True)
    ck.add_argument("--start", required=True)
    ck.add_argument("--end", required=True)

    sh = sub.add_parser(
        "shell",
        help="interactive session with a conf pre-loaded (the reference's "
        "spark-shell-with-chronon convenience): `spark`, `conf`, and the "
        "engine modules are in scope",
    )
    sh.add_argument("--conf", help="optional conf module to pre-load")

    args = p.parse_args(argv)

    if args.cmd == "plan-join":
        from chronon_spark.plans.modular import plan_join_nodes

        join_conf = _load_conf(args.conf).get_join()
        print(json.dumps({"nodes": plan_join_nodes(join_conf, args.output)}))
        return 0

    if args.cmd == "run-plan":
        import subprocess

        from chronon_spark.plans.modular import plan_join_nodes

        join_conf = _load_conf(args.conf).get_join()
        nodes = plan_join_nodes(join_conf, args.output)
        for node in nodes:  # plan order is already topological
            cmd = [sys.executable, "-m", "chronon_spark.cli"]
            if args.master:
                cmd += ["--master", args.master]
            cmd += [
                "run-node",
                "--conf", args.conf, "--output", args.output,
                "--node-id", node["node_id"],
                "--start", args.start, "--end", args.end,
                "--step-days", str(args.step_days), "--mode", args.mode,
            ]
            proc = subprocess.run(cmd)
            if proc.returncode != 0:
                print(json.dumps({
                    "failed_node": node["node_id"],
                    "returncode": proc.returncode,
                    "resume": "rerun run-plan; completed partitions are skipped",
                }))
                return proc.returncode
        print(json.dumps({"nodes_run": [n["node_id"] for n in nodes],
                          "output": args.output}))
        return 0

    if args.cmd == "compile":
        from chronon_spark.api.compile import compile_confs
        from chronon_spark.api.types import GroupBy, Join

        mod = _load_conf(args.conf)
        objs = [v for v in vars(mod).values() if isinstance(v, (GroupBy, Join))]
        for getter in ("get_join", "get_group_by"):
            if hasattr(mod, getter):
                o = getattr(mod, getter)()
                if not any(o == x for x in objs):
                    objs.append(o)
        paths = compile_confs(objs, args.out)
        print(json.dumps({"compiled": paths}))
        return 0

    from chronon_spark.session import build_session
    from chronon_spark.plans.partition_range import PartitionRange

    spark = build_session(master=args.master or "local[*]")

    if args.cmd == "shell":
        import code

        import chronon_spark.api.types as types_mod
        from chronon_spark.operators.asof_join import compute_join_part, group_by_asof, join_asof

        ns = {
            "spark": spark,
            "types": types_mod,
            "join_asof": join_asof,
            "group_by_asof": group_by_asof,
            "compute_join_part": compute_join_part,
        }
        if args.conf:
            ns["conf"] = _load_conf(args.conf)
        banner = (
            "chronon_spark shell — in scope: spark, types, join_asof, "
            "group_by_asof, compute_join_part" + (", conf" if args.conf else "")
        )
        code.interact(banner=banner, local=ns)
        return 0

    if args.cmd == "upload-groupby":
        from chronon_spark.plans.upload import upload_group_by

        gb = _load_conf(args.conf).get_group_by()
        up_df = upload_group_by(spark, gb, args.batch_end_ms, args.hop_ms, args.output)
        print(json.dumps({"rows": up_df.count(), "output": args.output}))
        return 0

    if args.cmd == "analyze":
        from chronon_spark.plans.analyzer import (
            analyze_group_by,
            analyze_join,
            create_table_ddl,
        )

        mod = _load_conf(args.conf)
        if hasattr(mod, "get_join"):
            schema = analyze_join(spark, mod.get_join())
        else:
            schema = analyze_group_by(spark, mod.get_group_by())
        out = {"schema": {f.name: f.dataType.simpleString() for f in schema.fields}}
        if args.table:
            out["ddl"] = create_table_ddl(args.table, schema)
        print(json.dumps(out))
        return 0

    if args.cmd == "log-flatten":
        from chronon_spark.plans.log_flattener import log_flattener_job
        from chronon_spark.plans.partition_range import PartitionRange as PR

        res = log_flattener_job(
            spark, args.log_table, args.schema_table, args.output,
            PR(args.start, args.end), step_days=args.step_days,
        )
        print(json.dumps({
            "computed_ranges": [(s.start, s.end) for s in res.computed],
            "skipped_partitions": res.skipped_partitions,
        }))
        return 0

    if args.cmd == "compare-tables":
        from chronon_spark.plans.compare import compare_job
        from chronon_spark.sources.scan import load_table

        keys = [k.strip() for k in args.keys.split(",") if k.strip()]
        left = load_table(spark, args.left_table)
        right = load_table(spark, args.right_table)
        by = ["ds"] if args.by_ds and "ds" in left.columns else None
        _, metrics = compare_job(left, right, keys, by=by)
        metrics.write.mode("overwrite").parquet(args.output)
        rows = {(r["column"], r["metric"]): r["value"] for r in metrics.collect()
                if r["metric"] == "mismatch"}
        print(json.dumps({
            "output": args.output,
            "mismatches": {c: v for (c, _), v in rows.items() if v},
        }))
        return 0

    if args.cmd == "consistency-metrics":
        from chronon_spark.plans.consistency import consistency_job

        join_conf = _load_conf(args.conf).get_join()
        _, metrics = consistency_job(
            spark, join_conf, args.logged_table,
            sample_percent=args.sample_percent,
        )
        metrics.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"output": args.output,
                          "metric_rows": metrics.count()}))
        return 0

    if args.cmd == "fetch":
        from chronon_spark.plans.fetcher import fetch_join

        join_conf = _load_conf(args.conf).get_join()
        requests = spark.read.parquet(args.requests)
        out_df = fetch_join(
            spark, join_conf, requests, args.batch_end_ms, args.hop_ms
        )
        out_df.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"rows": out_df.count(), "output": args.output}))
        return 0

    if args.cmd == "summarize":
        from chronon_spark.plans.summary import (
            pack_summary_kv,
            summarize,
            upload_summaries,
        )
        from chronon_spark.sources.scan import load_table

        df = load_table(spark, args.table)
        summ = summarize(df, args.partition_col)
        summ.write.mode("overwrite").parquet(args.output)
        out = {"output": args.output, "rows": summ.count()}
        if args.upload_table:
            out["upload_table"] = upload_summaries(
                spark, pack_summary_kv(spark.read.parquet(args.output)),
                args.upload_table,
            )
        print(json.dumps(out))
        return 0

    if args.cmd == "streaming-groupby":
        from chronon_spark.streaming.stream_groupby import (
            run_available_now,
            stream_tile_aggregate,
        )

        gb = _load_conf(args.conf).get_group_by()
        schema = spark.read.parquet(args.records_dir).schema
        stream = spark.readStream.schema(schema).parquet(args.records_dir)
        tiles = run_available_now(
            stream_tile_aggregate(stream, gb, hop_ms=args.hop_ms),
            args.checkpoint,
            f"cli_stream_{gb.name}",
        )
        tiles.write.mode("overwrite").parquet(args.output)
        print(json.dumps({"tiles": tiles.count(), "output": args.output}))
        return 0

    if args.cmd == "metadata-upload":
        from chronon_spark.api.types import GroupBy, Join
        from chronon_spark.plans.exporter import export_metadata

        mod = _load_conf(args.conf)
        objs = [v for v in vars(mod).values() if isinstance(v, (GroupBy, Join))]
        for getter in ("get_join", "get_group_by"):
            if hasattr(mod, getter):
                o = getattr(mod, getter)()
                if not any(o == x for x in objs):
                    objs.append(o)
        written = export_metadata(spark, objs, args.out)
        print(json.dumps({"written": written}))
        return 0

    if args.cmd == "check-partitions":
        from chronon_spark.plans.backfill import existing_partitions
        from chronon_spark.plans.partition_range import (
            PartitionRange as PR,
            missing_ranges,
        )

        rng = PR(args.start, args.end)
        have = {
            ds for ds in existing_partitions(spark, args.table)
            if args.start <= ds <= args.end
        }
        missing = missing_ranges(rng, have)
        print(json.dumps({
            "present": sorted(have),
            "missing_ranges": [(m.start, m.end) for m in missing],
        }))
        return 0

    rng = PartitionRange(args.start, args.end)

    if args.cmd == "run-node":
        from chronon_spark.plans.modular import plan_join_nodes, run_join_node

        join_conf = _load_conf(args.conf).get_join()
        nodes = {n["node_id"]: n for n in plan_join_nodes(join_conf, args.output)}
        if args.node_id not in nodes:
            print(json.dumps({"error": f"unknown node {args.node_id}",
                              "known": sorted(nodes)}))
            return 2
        run_join_node(
            spark, join_conf, nodes[args.node_id], args.output, rng,
            step_days=args.step_days, mode=args.mode,
        )
        print(json.dumps({"node_run": args.node_id,
                          "output": nodes[args.node_id]["output"]}))
        return 0

    if args.cmd == "backfill-join":
        join_conf = _load_conf(args.conf).get_join()
        if args.modular:
            from chronon_spark.plans.modular import backfill_join_modular

            res = backfill_join_modular(
                spark, join_conf, args.output, rng,
                step_days=args.step_days, mode=args.mode,
            )
        else:
            from chronon_spark.plans.backfill_join import backfill_join

            res = backfill_join(
                spark, join_conf, args.output, rng,
                step_days=args.step_days, mode=args.mode, prune_keys=args.prune_keys,
            )
    elif args.cmd == "backfill-groupby-snapshot":
        from chronon_spark.operators.snapshot_groupby import snapshot_group_by
        from chronon_spark.plans.backfill import backfill

        gb = _load_conf(args.conf).get_group_by()

        def compute(s, r):
            return snapshot_group_by(s, gb, r.start, r.end)

        res = backfill(
            spark, compute, args.output, rng,
            step_days=args.step_days, job_name=f"groupby:{gb.name}", conf=gb,
        )
    else:  # staging-query
        from chronon_spark.operators.staging_query import backfill_staging_query

        sql = open(args.sql_file).read()
        res = backfill_staging_query(
            spark, sql, args.output, rng, step_days=args.step_days
        )

    print(
        json.dumps(
            {
                "computed_ranges": [(s.start, s.end) for s in res.computed],
                "skipped_partitions": res.skipped_partitions,
                "lineage_rows": res.lineage_rows,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
