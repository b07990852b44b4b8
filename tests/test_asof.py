"""Edge semantics of the union-window as-of join and banded range join."""

from __future__ import annotations

import pytest
import datetime as dt

from pyspark.sql import Row

from c_tran_data_pipeline_spark.operators.asof import asof_join, range_join_bands


def _ts(s):
    return dt.datetime(2024, 1, 1, 0, 0, s)


@pytest.mark.slow
def test_asof_strict_excludes_same_timestamp(spark):
    left = spark.createDataFrame(
        [Row(id=1, k=1, ts=_ts(10)), Row(id=2, k=1, ts=_ts(20)), Row(id=3, k=2, ts=_ts(5))]
    )
    right = spark.createDataFrame(
        [Row(k=1, ts=_ts(10), v=100.0), Row(k=1, ts=_ts(15), v=150.0)]
    )
    out = {r.id: r for r in asof_join(left, right, "k", "ts", "ts", ["v"], strict=True).collect()}
    assert out[1].asof_v is None  # same-ts right row invisible under strict
    assert out[2].asof_v == 150.0  # latest prior, not first
    assert out[3].asof_v is None  # no right rows for key 2 (left outer)


def test_asof_non_strict_includes_same_timestamp(spark):
    left = spark.createDataFrame([Row(id=1, k=1, ts=_ts(10))])
    right = spark.createDataFrame([Row(k=1, ts=_ts(10), v=100.0)])
    out = asof_join(left, right, "k", "ts", "ts", ["v"], strict=False).collect()[0]
    assert out.asof_v == 100.0


def test_range_join_band_boundaries(spark):
    # window 10s; right rows at +1s (in), +10s (boundary in), +11s (out),
    # 0s (excluded: strict >), and a cross-band pair (9s → 12s spans bands)
    left = spark.createDataFrame([Row(id=1, k=1, ts=_ts(0)), Row(id=2, k=1, ts=_ts(9))])
    right = spark.createDataFrame(
        [Row(rid=10, k=1, ts=_ts(0)), Row(rid=11, k=1, ts=_ts(1)),
         Row(rid=12, k=1, ts=_ts(10)), Row(rid=13, k=1, ts=_ts(11)),
         Row(rid=14, k=1, ts=_ts(12))]
    )
    out = range_join_bands(left, right, "k", "ts", "ts", window_seconds=10)
    pairs = {(r.id, r.r_rid) for r in out.collect()}
    assert pairs == {(1, 11), (1, 12), (2, 12), (2, 13), (2, 14)}


def test_asof_tolerance_nulls_stale_matches(spark):
    """merge_asof tolerance semantics: a prior right row beyond the
    lookback bound does NOT match; within the bound it does; and the
    bound applies to the LATEST prior row (no fallback to older rows)."""
    from datetime import datetime

    from c_tran_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "A", datetime(2020, 1, 1, 12, 0)), (2, "A", datetime(2020, 1, 3, 12, 0))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", datetime(2020, 1, 1, 11, 0), 100.0)], "k string, ts timestamp, v double"
    )
    out = {
        r["id"]: r["asof_v"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], tolerance_seconds=7200,
        ).collect()
    }
    assert out[1] == 100.0   # 1h old → within 2h tolerance
    assert out[2] is None    # 2 days old → nulled


def test_asof_forward_direction(spark):
    """direction='forward': nearest FUTURE right row, strict; tolerance
    bounds the lookahead."""
    from datetime import datetime

    from c_tran_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "A", datetime(2020, 1, 1, 12, 0)), (2, "A", datetime(2020, 1, 4, 12, 0))],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", datetime(2020, 1, 2, 12, 0), 100.0), ("A", datetime(2020, 1, 3, 12, 0), 200.0)],
        "k string, ts timestamp, v double",
    )
    fwd = {
        r["id"]: r["asof_v"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], direction="forward",
        ).collect()
    }
    assert fwd[1] == 100.0  # nearest future, not the later 200
    assert fwd[2] is None   # no future rows
    bounded = {
        r["id"]: r["asof_v"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], direction="forward", tolerance_seconds=3600,
        ).collect()
    }
    assert bounded[1] is None  # 1 day ahead > 1h lookahead bound


def test_asof_nearest_direction(spark):
    """direction='nearest': picks the temporally closer of prior/next,
    tie → backward (pandas precedence); tolerance bounds both sides."""
    from datetime import datetime

    from c_tran_data_pipeline_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [
            (1, "A", datetime(2020, 1, 2, 10, 0)),   # prior 1h ago, next 3h ahead → prior
            (2, "A", datetime(2020, 1, 2, 12, 30)),  # prior 3.5h, next 0.5h → next
            (3, "A", datetime(2020, 1, 2, 12, 0)),   # exactly between (3h/1h) → next
        ],
        "id int, k string, ts timestamp",
    )
    right = spark.createDataFrame(
        [("A", datetime(2020, 1, 2, 9, 0), 1.0), ("A", datetime(2020, 1, 2, 13, 0), 2.0)],
        "k string, ts timestamp, v double",
    )
    out = {
        r["id"]: r["asof_v"]
        for r in asof_join(
            left, right, on="k", left_ts="ts", right_ts="ts",
            value_cols=["v"], direction="nearest",
        ).collect()
    }
    assert out == {1: 1.0, 2: 2.0, 3: 2.0}
    # equidistant tie → backward
    tie = spark.createDataFrame([(9, "A", datetime(2020, 1, 2, 11, 0))], "id int, k string, ts timestamp")
    got = asof_join(tie, right, on="k", left_ts="ts", right_ts="ts",
                    value_cols=["v"], direction="nearest").collect()[0]
    assert got["asof_v"] == 1.0
    # tolerance nulls both directions when out of range
    far = asof_join(tie, right, on="k", left_ts="ts", right_ts="ts",
                    value_cols=["v"], direction="nearest", tolerance_seconds=60).collect()[0]
    assert far["asof_v"] is None


def test_kernel_smooth_hand_computed_and_isolated_point(spark):
    from datetime import datetime, timedelta

    from pyspark.sql import Row

    from c_tran_data_pipeline_spark.operators.asof import kernel_smooth

    W = 100  # seconds
    t0 = datetime(2024, 1, 1, 0, 0, 0)

    def at(s):
        return t0 + timedelta(seconds=s)

    rows = [
        Row(event_id=1, user_id=1, ts=at(0), value=10.0),
        Row(event_id=2, user_id=1, ts=at(50), value=20.0),   # 50 s from #1
        Row(event_id=3, user_id=1, ts=at(1000), value=99.0),  # isolated
        Row(event_id=4, user_id=2, ts=at(25), value=7.0),     # other series
    ]
    out = {
        r.event_id: r
        for r in kernel_smooth(
            spark.createDataFrame(rows), window_seconds=W
        ).collect()
    }
    # event 1: self weight W, neighbor #2 weight W-50s → (10·100+20·50)/150
    assert out[1].n_obs == 2
    assert abs(out[1].smoothed_value - (10 * 100 + 20 * 50) / 150) < 1e-6
    assert out[2].n_obs == 2
    # isolated point smooths to itself; series are independent
    assert out[3].n_obs == 1 and out[3].smoothed_value == 99.0
    assert out[4].n_obs == 1 and out[4].smoothed_value == 7.0
