"""K-list serving: the lambda read path's LAST_K / TOP_K lists must
equal a pure-Python per-request oracle, and must be invariant to when
the k-list upload was last compacted."""

import pytest
from pyspark.sql import functions as F

from chronon_spark.plans.klist_serving import (
    compact_klist_upload,
    fetch_klist,
    klist_hop_irs,
)

DAY_MS = 86_400_000
T0 = 1_705_276_800_000  # 2024-01-15 midnight
T1 = T0 + 5 * DAY_MS
K = 3


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) div 1000 AS ts",
        "CAST(floor(value*100 + 0.5) AS BIGINT) AS value",
    )


def _live(ev):
    live_hop = int(ev.agg(F.max("ts")).first()[0]) // DAY_MS
    return live_hop, live_hop * DAY_MS


def _py_expected(ev_pd, requests, mode, min_ts=None):
    """Pure-Python oracle: per request, the k-list over events with
    ts <= qts (and >= min_ts when windowed)."""
    out = {}
    for uid, qts in requests:
        rows = ev_pd[(ev_pd.user_id == uid) & (ev_pd.ts <= qts)]
        if min_ts is not None:
            rows = rows[rows.ts >= min_ts]
        rows = rows.dropna(subset=["value"])
        recs = list(zip(rows.ts.astype(int), rows.value.astype(int)))
        if mode == "last_k":
            recs.sort(key=lambda r: (-r[0], -r[1]))
        elif mode == "top_k":  # value desc, ts asc
            recs.sort(key=lambda r: (-r[1], r[0]))
        elif mode == "first_k":  # ts asc, value asc
            recs.sort(key=lambda r: (r[0], r[1]))
        elif mode == "bottom_k":  # value asc, ts asc
            recs.sort(key=lambda r: (r[1], r[0]))
        else:  # unique_top_k: DISTINCT values, largest first
            vals = sorted({v for _, v in recs}, reverse=True)
            out[(uid, qts)] = vals[:K] or None
            continue
        out[(uid, qts)] = [v for _, v in recs[:K]] or None
    return out


@pytest.mark.parametrize("mode", ["last_k", "top_k", "first_k", "bottom_k", "unique_top_k"])
def test_fetch_equals_python_oracle(spark, sf_dir, mode):
    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    irs = klist_hop_irs(
        ev.where(F.col("ts") < live_start), ["user_id"], "value", DAY_MS, K, mode
    )
    reqs = ev.where(F.col("ts") >= live_start).select("user_id", "ts").distinct()
    ev_pd = ev.toPandas()
    req_list = [(r["user_id"], r["ts"]) for r in reqs.collect()]

    for n_hops, min_ts in ((7, (live_hop - 7) * DAY_MS), (None, None)):
        got = fetch_klist(
            spark, reqs, irs, ev, ["user_id"], "value", DAY_MS, K,
            mode=mode, n_hops=n_hops,
        )
        exp = _py_expected(ev_pd, req_list, mode, min_ts)
        rows = got.collect()
        assert len(rows) == len(req_list) > 0
        for r in rows:
            want = exp[(r["user_id"], r["ts"])]
            have = list(r["values"]) if r["values"] is not None else None
            assert have == want, (mode, n_hops, r["user_id"], r["ts"], have, want)


@pytest.mark.parametrize("mode", ["top_k", "unique_top_k"])
def test_fetch_invariant_to_compaction(spark, sf_dir, mode):
    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    upload_t0 = klist_hop_irs(
        ev.where(F.col("ts") < T0), ["user_id"], "value", DAY_MS, K, mode
    )
    tiles = klist_hop_irs(
        ev.where((F.col("ts") >= T0) & (F.col("ts") < T1)),
        ["user_id"], "value", DAY_MS, K, mode,
    )
    compacted = compact_klist_upload(
        upload_t0, tiles, ["user_id"], T0, T1, DAY_MS, tail_hops=30, k=K,
        mode=mode,
    )
    remaining = klist_hop_irs(
        ev.where((F.col("ts") >= T1) & (F.col("ts") < live_start)),
        ["user_id"], "value", DAY_MS, K, mode,
    )
    reqs = ev.where(F.col("ts") >= live_start).select("user_id", "ts").distinct()
    ev_pd = ev.toPandas()
    req_list = [(r["user_id"], r["ts"]) for r in reqs.collect()]
    got = fetch_klist(
        spark, reqs, compacted.unionByName(remaining), ev,
        ["user_id"], "value", DAY_MS, K, mode=mode, n_hops=None,
    )
    exp = _py_expected(ev_pd, req_list, mode)
    for r in got.collect():
        want = exp[(r["user_id"], r["ts"])]
        have = list(r["values"]) if r["values"] is not None else None
        assert have == want, (r["user_id"], r["ts"], have, want)


def test_guards(spark, sf_dir):
    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    upload_t0 = klist_hop_irs(
        ev.where(F.col("ts") < T0), ["user_id"], "value", DAY_MS, K
    )
    tiles_all = klist_hop_irs(ev, ["user_id"], "value", DAY_MS, K)
    with pytest.raises(ValueError, match="inside the old batch range"):
        compact_klist_upload(
            upload_t0, tiles_all, ["user_id"], T0, T1, DAY_MS, tail_hops=30, k=K
        )
    reqs = ev.where(F.col("ts") >= live_start).select("user_id", "ts").distinct()
    with pytest.raises(ValueError, match="at/after the live hop"):
        fetch_klist(
            spark, reqs, tiles_all, ev, ["user_id"], "value", DAY_MS, K
        )
    with pytest.raises(ValueError, match="mode must be one of"):
        klist_hop_irs(ev, ["user_id"], "value", DAY_MS, K, mode="median_k")


def test_streamed_klist_tiles_via_foreachbatch_merge(spark, sf_dir, tmp_path):
    """Streaming production of k-list tiles (the module's production
    note): foreachBatch merges each micro-batch's per-hop k-lists into
    the stored tiles with the SAME semilattice merge — exact even under
    truncation (top-k of a union == top-k of per-part top-ks), so a hop
    straddling micro-batches loses nothing. Final tiles == batch
    klist_hop_irs; serving from them is exact."""
    import os

    from chronon_spark.plans.klist_serving import _merge

    mode = "top_k"
    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    closed = ev.where((F.col("ts") >= T0) & (F.col("ts") < live_start))
    src, ck, state_dir = (str(tmp_path / d) for d in ("src", "ck", "tiles"))
    closed.repartition(3).write.mode("overwrite").parquet(src)

    versions = []

    def upsert(batch_df, batch_id):
        irs_b = klist_hop_irs(batch_df, ["user_id"], "value", DAY_MS, K, mode)
        if versions:
            cur = batch_df.sparkSession.read.parquet(versions[-1])
            irs_b = (
                cur.unionByName(irs_b)
                .groupBy("user_id", "__hop")
                .agg(_merge(F.collect_list("entries"), K).alias("entries"))
            )
        out = os.path.join(state_dir, f"v{batch_id}")
        irs_b.write.mode("overwrite").parquet(out)
        versions.append(out)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(versions) >= 2

    streamed = spark.read.parquet(versions[-1])
    batch = klist_hop_irs(closed, ["user_id"], "value", DAY_MS, K, mode)
    b = batch.orderBy("user_id", "__hop").toPandas()
    s = streamed.select(batch.columns).orderBy("user_id", "__hop").toPandas()
    assert len(b) == len(s) > 0
    assert b["entries"].map(list).equals(s["entries"].map(list))

    irs = klist_hop_irs(
        ev.where(F.col("ts") < T0), ["user_id"], "value", DAY_MS, K, mode
    ).unionByName(streamed.select(batch.columns))
    reqs = ev.where(F.col("ts") >= live_start).select("user_id", "ts").distinct()
    got = fetch_klist(
        spark, reqs, irs, ev, ["user_id"], "value", DAY_MS, K,
        mode=mode, n_hops=7,
    )
    ev_pd = ev.toPandas()
    req_list = [(r["user_id"], r["ts"]) for r in reqs.collect()]
    exp = _py_expected(ev_pd, req_list, mode, min_ts=(live_hop - 7) * DAY_MS)
    for r in got.collect():
        have = list(r["values"]) if r["values"] is not None else None
        assert have == exp[(r["user_id"], r["ts"])]


def test_string_valued_first_k_bottom_k(spark):
    """first_k/bottom_k are generic over orderable value types (the
    reference's BottomK[T: Ordering]): string values rank correctly with
    no arithmetic negation (r4 ADVICE #1)."""
    import pandas as pd

    rows = [
        (1, T0 + i * 1000, w)
        for i, w in enumerate(["pear", "apple", "fig", "date", "kiwi", "plum"])
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "word"])
    )
    live_hop, live_start = _live(ev)
    irs = klist_hop_irs(
        ev.where(F.col("ts") < live_start), ["user_id"], "word", DAY_MS,
        K, mode="bottom_k",
    )
    req = spark.createDataFrame(
        pd.DataFrame({"user_id": [1], "ts": [T0 + 10_000]})
    )
    got = fetch_klist(
        spark, req, irs, ev, ["user_id"], "word", DAY_MS, K, mode="bottom_k"
    ).collect()[0]["values"]
    assert got == ["apple", "date", "fig"]  # lexicographic bottom-3
    irs_first = klist_hop_irs(
        ev.where(F.col("ts") < live_start), ["user_id"], "word", DAY_MS,
        K, mode="first_k",
    )
    got_first = fetch_klist(
        spark, req, irs_first, ev, ["user_id"], "word",
        DAY_MS, K, mode="first_k",
    ).collect()[0]["values"]
    assert got_first == ["pear", "apple", "fig"]  # earliest-3 by ts
