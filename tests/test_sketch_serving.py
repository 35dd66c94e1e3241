"""Percentile serving over DDSketch IRs: the lambda read path must equal
the direct sketch over full history, and must be invariant to when the
sketch upload was last compacted."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.operators.ddsketch import quantiles_from_sketch, sketch_aggregate
from chronon_spark.plans.sketch_serving import (
    compact_sketch_upload,
    fetch_percentile_sketch,
    sketch_hop_irs,
)

DAY_MS = 86_400_000
T0 = 1_705_276_800_000  # 2024-01-15 midnight
T1 = T0 + 5 * DAY_MS
QS = [0.5, 0.9]


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) div 1000 AS ts",
        "CAST(value AS DOUBLE) AS value",
    )


def _live(ev):
    live_hop = int(ev.agg(F.max("ts")).first()[0]) // DAY_MS
    return live_hop, live_hop * DAY_MS


def _requests(ev, live_start):
    return ev.where(F.col("ts") >= live_start).select("user_id", "ts").distinct()


def _direct(ev, requests, min_ts=None):
    """Brute-force expected: per-request sketch over events with
    ts <= request ts (and >= min_ts when windowed)."""
    joined = requests.join(ev.withColumnRenamed("ts", "__ets"), on="user_id")
    joined = joined.where(F.col("__ets") <= F.col("ts"))
    if min_ts is not None:
        joined = joined.where(F.col("__ets") >= min_ts)
    ir = sketch_aggregate(joined, ["user_id", "ts"], "value")
    out = quantiles_from_sketch(ir, ["user_id", "ts"], QS)
    return requests.join(out, on=["user_id", "ts"], how="left")


def _compare(got, exp):
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    g = got.select(cols).orderBy("user_id", "ts").toPandas()
    e = exp.select(cols).orderBy("user_id", "ts").toPandas()
    assert len(g) == len(e) > 0
    import numpy as np

    for c in cols:
        if c.startswith("p"):
            assert np.allclose(
                g[c].astype(float).fillna(-1), e[c].astype(float).fillna(-1)
            ), c
        else:
            assert (g[c] == e[c]).all(), c


def test_unbounded_fetch_equals_direct(spark, sf_dir):
    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    irs = sketch_hop_irs(ev.where(F.col("ts") < live_start), ["user_id"], "value", DAY_MS)
    reqs = _requests(ev, live_start)
    got = fetch_percentile_sketch(
        spark, reqs, irs, ev, ["user_id"], "value", DAY_MS, QS, n_hops=None
    )
    _compare(got, _direct(ev, reqs))


def test_windowed_fetch_equals_direct(spark, sf_dir):
    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    n_hops = 7
    irs = sketch_hop_irs(ev.where(F.col("ts") < live_start), ["user_id"], "value", DAY_MS)
    reqs = _requests(ev, live_start)
    got = fetch_percentile_sketch(
        spark, reqs, irs, ev, ["user_id"], "value", DAY_MS, QS, n_hops=n_hops
    )
    _compare(got, _direct(ev, reqs, min_ts=(live_hop - n_hops) * DAY_MS))


def test_fetch_invariant_to_compaction(spark, sf_dir):
    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    upload_t0 = sketch_hop_irs(ev.where(F.col("ts") < T0), ["user_id"], "value", DAY_MS)
    tiles = sketch_hop_irs(
        ev.where((F.col("ts") >= T0) & (F.col("ts") < T1)), ["user_id"], "value", DAY_MS
    )
    compacted = compact_sketch_upload(
        upload_t0, tiles, ["user_id"], T0, T1, DAY_MS, tail_hops=30
    )
    remaining = sketch_hop_irs(
        ev.where((F.col("ts") >= T1) & (F.col("ts") < live_start)),
        ["user_id"], "value", DAY_MS,
    )
    irs = compacted.unionByName(remaining)
    reqs = _requests(ev, live_start)
    for n_hops in (7, None):
        got = fetch_percentile_sketch(
            spark, reqs, irs, ev, ["user_id"], "value", DAY_MS, QS, n_hops=n_hops
        )
        min_ts = None if n_hops is None else (live_hop - n_hops) * DAY_MS
        _compare(got, _direct(ev, reqs, min_ts=min_ts))


def test_streamed_sketch_tiles_serve(spark, sf_dir, tmp_path):
    """sketch_hop_irs is streaming-legal: the closed hops flow through a
    REAL streaming query into the idempotent KV upsert log, resolve to
    the exact batch tile rows, and the serve from streamed tiles equals
    the direct sketch — the same end-to-end pin as the main tiled path."""
    from chronon_spark.streaming.stream_groupby import (
        read_kv_table,
        run_untiled_upsert,
    )

    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    closed = ev.where((F.col("ts") >= T0) & (F.col("ts") < live_start))
    src, kv, ck = (str(tmp_path / d) for d in ("src", "kv", "ck"))
    closed.coalesce(2).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    q = run_untiled_upsert(
        sketch_hop_irs(stream, ["user_id"], "value", DAY_MS),
        ["user_id", "__hop", "bucket"],
        kv, ck,
    )
    q.awaitTermination()
    streamed = read_kv_table(spark, kv, ["user_id", "__hop", "bucket"])

    batch = sketch_hop_irs(closed, ["user_id"], "value", DAY_MS)
    _b = batch.orderBy("user_id", "__hop", "bucket").toPandas()
    _s = streamed.select(batch.columns).orderBy("user_id", "__hop", "bucket").toPandas()
    assert len(_b) == len(_s) > 0
    assert (_b.values == _s.values).all()

    irs = sketch_hop_irs(
        ev.where(F.col("ts") < T0), ["user_id"], "value", DAY_MS
    ).unionByName(streamed.select(batch.columns))
    reqs = _requests(ev, live_start)
    got = fetch_percentile_sketch(
        spark, reqs, irs, ev, ["user_id"], "value", DAY_MS, QS, n_hops=7
    )
    _compare(got, _direct(ev, reqs, min_ts=(live_hop - 7) * DAY_MS))


def test_collapse_boundary_and_guards(spark, sf_dir):
    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    upload_t0 = sketch_hop_irs(ev.where(F.col("ts") < T0), ["user_id"], "value", DAY_MS)
    tiles = sketch_hop_irs(
        ev.where((F.col("ts") >= T0) & (F.col("ts") < T1)), ["user_id"], "value", DAY_MS
    )
    # a tight tail collapses pre-tail hops but unbounded serving still sees
    # their mass through the collapsed row
    compacted = compact_sketch_upload(
        upload_t0, tiles, ["user_id"], T0, T1, DAY_MS, tail_hops=2
    )
    from chronon_spark.plans.upload import COLLAPSED_HOP

    hops = {r["__hop"] for r in compacted.select("__hop").distinct().collect()}
    assert COLLAPSED_HOP in hops
    assert all(h == COLLAPSED_HOP or h >= T1 // DAY_MS - 2 for h in hops)
    remaining = sketch_hop_irs(
        ev.where((F.col("ts") >= T1) & (F.col("ts") < live_start)),
        ["user_id"], "value", DAY_MS,
    )
    reqs = _requests(ev, live_start)
    got = fetch_percentile_sketch(
        spark, reqs, compacted.unionByName(remaining), ev,
        ["user_id"], "value", DAY_MS, QS, n_hops=None,
    )
    _compare(got, _direct(ev, reqs))

    with pytest.raises(ValueError, match="inside the old batch range"):
        compact_sketch_upload(
            sketch_hop_irs(
                ev.where(F.col("ts") < T0 - 2 * DAY_MS), ["user_id"], "value", DAY_MS
            ),
            tiles.unionByName(upload_t0),
            ["user_id"], T0, T1, DAY_MS, tail_hops=30,
        )
    with pytest.raises(ValueError, match="at/after the live hop|double count"):
        fetch_percentile_sketch(
            spark, reqs,
            sketch_hop_irs(ev, ["user_id"], "value", DAY_MS),  # includes live hop
            ev, ["user_id"], "value", DAY_MS, QS, n_hops=None,
        )
