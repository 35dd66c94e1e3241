"""Frequency top-k serving: with m >= the distinct-item count nothing
truncates, so the lambda read path must equal the EXACT per-request
frequency top-k; with small m the algebra must still be deterministic
across parallelism."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from chronon_spark.plans.freq_serving import (
    compact_freq_upload,
    fetch_freq_topk,
    freq_hop_irs,
)

DAY_MS = 86_400_000
T0 = 1_705_276_800_000
T1 = T0 + 5 * DAY_MS
K = 3
M_BIG = 64  # >= distinct event_type values: no truncation anywhere


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) div 1000 AS ts",
        "event_type",
    )


def _live(ev):
    live_hop = int(ev.agg(F.max("ts")).first()[0]) // DAY_MS
    return live_hop, live_hop * DAY_MS


def _py_expected(ev_pd, requests, min_ts=None):
    out = {}
    for uid, qts in requests:
        rows = ev_pd[(ev_pd.user_id == uid) & (ev_pd.ts <= qts)]
        if min_ts is not None:
            rows = rows[rows.ts >= min_ts]
        c = Counter(rows.event_type.dropna())
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
        out[(uid, qts)] = [i for i, _ in ranked[:K]] or None
    return out


def test_fetch_equals_exact_topk(spark, sf_dir):
    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    irs = freq_hop_irs(
        ev.where(F.col("ts") < live_start), ["user_id"], "event_type", DAY_MS, M_BIG
    )
    reqs = ev.where(F.col("ts") >= live_start).select("user_id", "ts").distinct()
    ev_pd = ev.toPandas()
    req_list = [(r["user_id"], r["ts"]) for r in reqs.collect()]
    for n_hops, min_ts in ((7, (live_hop - 7) * DAY_MS), (None, None)):
        got = fetch_freq_topk(
            spark, reqs, irs, ev, ["user_id"], "event_type", DAY_MS, K,
            m=M_BIG, n_hops=n_hops,
        )
        exp = _py_expected(ev_pd, req_list, min_ts)
        rows = got.collect()
        assert len(rows) == len(req_list) > 0
        for r in rows:
            have = list(r["top_items"]) if r["top_items"] is not None else None
            assert have == exp[(r["user_id"], r["ts"])], (n_hops, r)


def test_compaction_invariance_when_untruncated(spark, sf_dir):
    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    upload_t0 = freq_hop_irs(
        ev.where(F.col("ts") < T0), ["user_id"], "event_type", DAY_MS, M_BIG
    )
    tiles = freq_hop_irs(
        ev.where((F.col("ts") >= T0) & (F.col("ts") < T1)),
        ["user_id"], "event_type", DAY_MS, M_BIG,
    )
    compacted = compact_freq_upload(
        upload_t0, tiles, ["user_id"], T0, T1, DAY_MS, tail_hops=30, m=M_BIG
    )
    remaining = freq_hop_irs(
        ev.where((F.col("ts") >= T1) & (F.col("ts") < live_start)),
        ["user_id"], "event_type", DAY_MS, M_BIG,
    )
    reqs = ev.where(F.col("ts") >= live_start).select("user_id", "ts").distinct()
    got = fetch_freq_topk(
        spark, reqs, compacted.unionByName(remaining), ev,
        ["user_id"], "event_type", DAY_MS, K, m=M_BIG, n_hops=None,
    )
    ev_pd = ev.toPandas()
    exp = _py_expected(ev_pd, [(r["user_id"], r["ts"]) for r in reqs.collect()])
    for r in got.collect():
        have = list(r["top_items"]) if r["top_items"] is not None else None
        assert have == exp[(r["user_id"], r["ts"])], r


def test_small_m_parallelism_invariant(spark, sf_dir):
    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    reqs = ev.where(F.col("ts") >= live_start).select("user_id", "ts").distinct()

    def run(parts):
        irs = freq_hop_irs(
            ev.repartition(parts).where(F.col("ts") < live_start),
            ["user_id"], "event_type", DAY_MS, m=2,
        )
        got = fetch_freq_topk(
            spark, reqs, irs, ev, ["user_id"], "event_type", DAY_MS, K,
            m=2, n_hops=7,
        )
        return sorted(
            (r["user_id"], r["ts"], tuple(r["top_items"] or ()))
            for r in got.collect()
        )

    assert run(3) == run(17)


def test_guards(spark, sf_dir):
    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    upload_t0 = freq_hop_irs(
        ev.where(F.col("ts") < T0), ["user_id"], "event_type", DAY_MS, M_BIG
    )
    tiles_all = freq_hop_irs(ev, ["user_id"], "event_type", DAY_MS, M_BIG)
    with pytest.raises(ValueError, match="inside the old batch range"):
        compact_freq_upload(
            upload_t0, tiles_all, ["user_id"], T0, T1, DAY_MS, tail_hops=30, m=M_BIG
        )
    reqs = ev.where(F.col("ts") >= live_start).select("user_id", "ts").distinct()
    with pytest.raises(ValueError, match="at/after the live hop"):
        fetch_freq_topk(
            spark, reqs, tiles_all, ev, ["user_id"], "event_type", DAY_MS, K
        )


def test_fetch_histogram_exact_map(spark, sf_dir):
    """HISTOGRAM on the serving path: unbounded-m map fetch == exact
    per-request value counts (batch kernel HISTOGRAM semantics), both
    windowed and unbounded."""
    from chronon_spark.plans.freq_serving import fetch_histogram

    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    irs = freq_hop_irs(
        ev.where(F.col("ts") < live_start), ["user_id"], "event_type",
        DAY_MS, M_BIG,
    )
    reqs = ev.where(F.col("ts") >= live_start).select("user_id", "ts").distinct()
    ev_pd = ev.toPandas()
    req_list = [(r["user_id"], r["ts"]) for r in reqs.collect()]
    for n_hops, min_ts in ((7, (live_hop - 7) * DAY_MS), (None, None)):
        got = fetch_histogram(
            spark, reqs, irs, ev, ["user_id"], "event_type", DAY_MS,
            n_hops=n_hops,
        )
        rows = got.collect()
        assert len(rows) == len(req_list) > 0
        for r in rows:
            sub = ev_pd[(ev_pd.user_id == r["user_id"]) & (ev_pd.ts <= r["ts"])]
            if min_ts is not None:
                sub = sub[sub.ts >= min_ts]
            exp = dict(Counter(sub.event_type.dropna()))
            have = dict(r["histogram"]) if r["histogram"] is not None else None
            assert have == (exp or None), (r["user_id"], r["ts"], have, exp)


def test_streamed_freq_tiles_via_foreachbatch_merge(spark, sf_dir, tmp_path):
    """The module's production note, executed: item-IR tiles are built by
    a REAL streaming query whose foreachBatch MERGES each micro-batch's
    per-hop count lists into the stored tiles (SUM per item — exact in
    the untruncated regime even when one hop's events straddle
    micro-batches). Final tiles == batch freq_hop_irs; a serve from them
    equals the direct computation."""
    import os

    from chronon_spark.plans.freq_serving import _remerge, fetch_freq_topk

    ev = _events(spark, sf_dir)
    live_hop, live_start = _live(ev)
    closed = ev.where((F.col("ts") >= T0) & (F.col("ts") < live_start))
    src = str(tmp_path / "src")
    ck = str(tmp_path / "ck")
    state_dir = str(tmp_path / "tiles")
    closed.repartition(3).write.mode("overwrite").parquet(src)

    versions = []

    def upsert(batch_df, batch_id):
        irs_b = freq_hop_irs(batch_df, ["user_id"], "event_type", DAY_MS, M_BIG)
        if versions:
            cur = batch_df.sparkSession.read.parquet(versions[-1])
            irs_b = _remerge(
                cur.unionByName(irs_b).select("user_id", "__hop", "entries"),
                ["user_id", "__hop"],
                M_BIG,
            )
        out = os.path.join(state_dir, f"v{batch_id}")
        irs_b.write.mode("overwrite").parquet(out)
        versions.append(out)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)  # force multiple micro-batches
        .parquet(src)
    )
    q = (
        stream.writeStream.foreachBatch(upsert)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert len(versions) >= 2  # hops really straddled micro-batches

    streamed = spark.read.parquet(versions[-1])
    batch = freq_hop_irs(closed, ["user_id"], "event_type", DAY_MS, M_BIG)
    b = batch.orderBy("user_id", "__hop").toPandas()
    s = streamed.select(batch.columns).orderBy("user_id", "__hop").toPandas()
    assert len(b) == len(s) > 0
    assert (b["user_id"].values == s["user_id"].values).all()
    assert b["entries"].map(list).equals(s["entries"].map(list))

    # and the serve over (pre-T0 irs ∪ streamed tiles) is exact
    irs = freq_hop_irs(
        ev.where(F.col("ts") < T0), ["user_id"], "event_type", DAY_MS, M_BIG
    ).unionByName(streamed.select(batch.columns))
    reqs = ev.where(F.col("ts") >= live_start).select("user_id", "ts").distinct()
    got = fetch_freq_topk(
        spark, reqs, irs, ev, ["user_id"], "event_type", DAY_MS, K,
        m=M_BIG, n_hops=7,
    )
    ev_pd = ev.toPandas()
    req_list = [(r["user_id"], r["ts"]) for r in reqs.collect()]
    exp = _py_expected(ev_pd, req_list, min_ts=(live_hop - 7) * DAY_MS)
    for r in got.collect():
        have = list(r["top_items"]) if r["top_items"] is not None else None
        assert have == exp[(r["user_id"], r["ts"])]
