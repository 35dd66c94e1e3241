"""Tile compaction: folding closed streaming tiles into the batch IR
table must equal recomputing the upload from raw events — IR algebra
only, and the serving read path must be invariant to when compaction
last ran.

Reference: the steady-state lambda topology (GroupByUpload batch rows ⊕
streamed tiles at fetch). The reference re-runs the batch upload over
raw events to advance the batch end; `plans.upload.compact_tiles`
advances it by merging the existing upload with the closed tiles —
`upload ⊕ tiles[T0,T1) ≡ upload_group_by(T1)` is exactly the IR
associativity the sawtooth kernel is built on (SURVEY.md §1.4).
"""

import pytest
from pyspark.sql import functions as F

from chronon_spark.api.types import (
    Aggregation,
    EventSource,
    GroupBy,
    Operation,
    Query,
    Window,
)
from chronon_spark.operators.asof_hopped import group_by_asof_hopped, hop_irs_for
from chronon_spark.plans.fetcher import fetch_group_by_tiled
from chronon_spark.plans.upload import compact_tiles, upload_group_by

DAY_MS = 86_400_000
T0 = 1_705_276_800_000  # 2024-01-15 midnight — mid-data old batch end
T1 = T0 + 5 * DAY_MS


def _gb(sf_dir):
    from chronon_spark.sources.scan import millis_expr

    src = EventSource(
        table=f"{sf_dir}/events.parquet",
        query=Query(
            selects={"user_id": "user_id", "value": "floor(value*100 + 0.5)"},
            time_column=millis_expr("ts"),
        ),
    )
    return GroupBy(
        sources=(src,),
        key_columns=("user_id",),
        aggregations=(
            Aggregation("value", Operation.SUM, windows=(Window.days(7),)),
            Aggregation("value", Operation.COUNT),  # unbounded -> collapsed
            Aggregation("value", Operation.AVERAGE),
            Aggregation("value", Operation.VARIANCE),
            Aggregation("value", Operation.LAST),
            Aggregation("value", Operation.UNIQUE_COUNT, windows=(Window.days(7),)),
        ),
        name="compaction_gb",
    )


def _events(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/events.parquet").selectExpr(
        "user_id",
        "unix_micros(CAST(ts AS TIMESTAMP)) div 1000 AS ts",
        "floor(value*100 + 0.5) AS value",
    )


def _tiles(spark, sf_dir, gb, lo_ms, hi_ms):
    ev = _events(spark, sf_dir).where(
        (F.col("ts") >= lo_ms) & (F.col("ts") < hi_ms)
    )
    return hop_irs_for(ev, gb, DAY_MS)


def _assert_ir_frames_equal(got, exp, key=("user_id", "__hop")):
    cols = sorted(got.columns)
    assert cols == sorted(exp.columns)
    g = got.select(cols).orderBy(*key).toPandas()
    e = exp.select(cols).orderBy(*key).toPandas()
    assert len(g) == len(e) > 0
    for c in cols:
        if c.startswith("i_set"):
            assert (
                g[c].map(lambda s: tuple(sorted(s)))
                == e[c].map(lambda s: tuple(sorted(s)))
            ).all(), c
        elif c.startswith("i_m2"):
            # two-stage shifted-moment merge vs one-stage: equal in real
            # arithmetic, allclose in floats
            import numpy as np

            assert np.allclose(
                g[c].astype(float).fillna(-1), e[c].astype(float).fillna(-1)
            ), c
        else:
            assert (g[c].fillna(-1) == e[c].fillna(-1)).all(), c


def test_compact_equals_recomputed_upload(spark, sf_dir):
    gb = _gb(sf_dir)
    upload_t0 = upload_group_by(spark, gb, T0, DAY_MS)
    tiles = _tiles(spark, sf_dir, gb, T0, T1)
    assert tiles.count() > 0
    got = compact_tiles(spark, gb, upload_t0, tiles, T0, T1, DAY_MS)
    exp = upload_group_by(spark, gb, T1, DAY_MS)
    _assert_ir_frames_equal(got, exp)


def test_compact_zero_tiles_same_end_is_identity(spark, sf_dir):
    gb = _gb(sf_dir)
    upload_t0 = upload_group_by(spark, gb, T0, DAY_MS)
    empty = _tiles(spark, sf_dir, gb, T0, T1).where(F.lit(False))
    got = compact_tiles(spark, gb, upload_t0, empty, T0, T0, DAY_MS)
    _assert_ir_frames_equal(got, upload_t0)


def test_compact_double_count_guards(spark, sf_dir):
    gb = _gb(sf_dir)
    upload_t0 = upload_group_by(spark, gb, T0, DAY_MS)
    inside = _tiles(spark, sf_dir, gb, T0 - 2 * DAY_MS, T1)
    with pytest.raises(ValueError, match="inside the old batch range"):
        compact_tiles(spark, gb, upload_t0, inside, T0, T1, DAY_MS)
    beyond = _tiles(spark, sf_dir, gb, T0, T1 + 2 * DAY_MS)
    with pytest.raises(ValueError, match="at/after the new batch end"):
        compact_tiles(spark, gb, upload_t0, beyond, T0, T1, DAY_MS)


def test_tiled_serve_invariant_to_compaction(spark, sf_dir):
    """Fetch results must not depend on when compaction last ran: serving
    from (compacted upload @T1, tiles [T1, live)) equals the direct
    sawtooth over full history — same pin as the uncompacted topology."""
    gb = _gb(sf_dir)
    ev = _events(spark, sf_dir)
    live_hop = int(ev.agg(F.max("ts")).first()[0]) // DAY_MS
    live_start = live_hop * DAY_MS

    upload_t0 = upload_group_by(spark, gb, T0, DAY_MS)
    closed_t0_t1 = _tiles(spark, sf_dir, gb, T0, T1)
    compacted = compact_tiles(spark, gb, upload_t0, closed_t0_t1, T0, T1, DAY_MS)

    remaining = _tiles(spark, sf_dir, gb, T1, live_start)
    requests = ev.where(F.col("ts") >= live_start).select("user_id", "ts").distinct()
    live_events = ev.where(F.col("ts") >= live_start)

    got = fetch_group_by_tiled(
        spark, gb, requests, T1, DAY_MS, compacted, remaining, live_events
    )
    exp = group_by_asof_hopped(spark, gb, requests, DAY_MS, events_df=ev)

    cols = sorted(got.columns)
    g = got.select(cols).orderBy("user_id", "ts").toPandas()
    e = exp.select(cols).orderBy("user_id", "ts").toPandas()
    assert len(g) == len(e) > 0
    for c in cols:
        if g[c].dtype == "float64":
            import numpy as np

            assert np.allclose(g[c].fillna(-1), e[c].fillna(-1)), c
        else:
            assert (g[c].fillna(-1) == e[c].fillna(-1)).all(), c
