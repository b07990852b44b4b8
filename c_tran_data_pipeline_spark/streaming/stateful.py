"""Custom stateful streaming operator (SURVEY.md §2.9 T7 extension):
per-trip live trip tracking with ``applyInPandasWithState``.

The reference accumulates per-trip state implicitly (its consumer buffers
a whole day's rows, then aggregates). A streaming engine needs explicit
keyed state: for each trip we keep (n readings, first/last event time,
distance proxy, speed aggregate) updated per micro-batch, and EMIT the
trip summary when the trip goes idle past a timeout — the streaming twin
of the "longest trip" report analysis (Project 4.pdf p10).

Scale shape: state is partitioned by trip_id across executors (the
shuffle Structured Streaming already does for stateful ops); each group's
state is O(1) — bounded aggregates, never buffered rows. State eviction
via ProcessingTimeTimeout mirrors the reference's idle-drain shutdown.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor

TRIP_SUMMARY_SCHEMA = T.StructType(
    [
        T.StructField("trip_id", T.IntegerType()),
        T.StructField("n_readings", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("max_speed", T.DoubleType()),
        T.StructField("sum_speed", T.DoubleType()),
        T.StructField("n_speed", T.LongType()),
        T.StructField("closed", T.BooleanType()),
    ]
)

# state tuple: (n, first_ts, last_ts, max_speed, sum_speed, n_speed)
STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("first_ts", T.TimestampType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("max_speed", T.DoubleType()),
        T.StructField("sum_speed", T.DoubleType()),
        T.StructField("n_speed", T.LongType()),
    ]
)


def _track_trip(
    key: tuple[Any, ...],
    batches: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Update per-trip running aggregates; emit a live row each batch and
    a final ``closed=True`` row when the trip times out (idle)."""
    (trip_id,) = key
    if state.hasTimedOut:
        n, first_ts, last_ts, mx, sm, ns = state.get
        state.remove()
        yield pd.DataFrame(
            [
                {
                    "trip_id": trip_id,
                    "n_readings": n,
                    "first_ts": first_ts,
                    "last_ts": last_ts,
                    "max_speed": mx,
                    "sum_speed": sm,
                    "n_speed": ns,
                    "closed": True,
                }
            ]
        )
        return

    n, first_ts, last_ts, mx, sm, ns = (
        state.get if state.exists else (0, None, None, None, 0.0, 0)
    )
    for pdf in batches:
        if pdf.empty:
            continue
        n += len(pdf)
        ts = pdf["tstamp"].dropna()
        if not ts.empty:
            first_ts = min(first_ts, ts.min()) if first_ts is not None else ts.min()
            last_ts = max(last_ts, ts.max()) if last_ts is not None else ts.max()
        speeds = pdf["speed"].dropna()
        if not speeds.empty:
            mx = max(mx, speeds.max()) if mx is not None else float(speeds.max())
            sm += float(speeds.sum())
            ns += len(speeds)
    state.update((n, first_ts, last_ts, mx, sm, ns))
    state.setTimeoutDuration(10_000)  # close trip after 10s idle (test scale)
    yield pd.DataFrame(
        [
            {
                "trip_id": trip_id,
                "n_readings": n,
                "first_ts": first_ts,
                "last_ts": last_ts,
                "max_speed": mx,
                "sum_speed": sm,
                "n_speed": ns,
                "closed": False,
            }
        ]
    )


def track_trips(crumbs: DataFrame) -> DataFrame:
    """Streaming per-trip tracker over conformed breadcrumbs
    (tstamp/speed/trip_id). Use on a streaming DataFrame:

        track_trips(conformed).writeStream.outputMode("update")...

    Emits one summary row per (trip, micro-batch) plus a closing row on
    idle timeout."""
    return (
        crumbs.select("trip_id", "tstamp", "speed")
        .groupBy("trip_id")
        .applyInPandasWithState(
            _track_trip,
            outputStructType=TRIP_SUMMARY_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


# ---------------------------------------------------------------------------
# Per-vehicle running stats via transformWithStateInPandas — the Spark 4
# arbitrary-state API (successor to applyInPandasWithState): typed state
# handles (ValueState/ListState/MapState), timers, and TTL live on a
# StatefulProcessorHandle, and state is served by the RocksDB state store
# (set spark.sql.streaming.stateStore.providerClass to
# RocksDBStateStoreProvider — required by transformWithState, and the
# right provider at 100 TB anyway: state spills to disk instead of
# executor heap). Same engine contract as track_trips: state partitions
# by key across executors, O(1) aggregates per key, never buffered rows.
# ---------------------------------------------------------------------------

VEHICLE_STATS_SCHEMA = T.StructType(
    [
        T.StructField("vehicle_id", T.IntegerType()),
        T.StructField("n_readings", T.LongType()),
        T.StructField("max_speed", T.DoubleType()),
        T.StructField("sum_speed", T.DoubleType()),
        T.StructField("n_speeding", T.LongType()),
    ]
)

_VEHICLE_STATE_DDL = "n BIGINT, max_speed DOUBLE, sum_speed DOUBLE, n_speeding BIGINT"


class VehicleStatsProcessor(StatefulProcessor):
    """StatefulProcessor: per-vehicle odometer — reading count, max/sum
    speed, count of speed > threshold readings (the reference's V4 bound
    re-used as a 'speeding' telemetry signal)."""

    def __init__(self, speeding_threshold: float = 70.0):
        self._threshold = speeding_threshold

    def init(self, handle) -> None:
        self._agg = handle.getValueState("agg", _VEHICLE_STATE_DDL)

    def handleInputRows(self, key, rows, timerValues):
        if self._agg.exists():
            n, mx, sm, nsp = self._agg.get()
        else:
            n, mx, sm, nsp = 0, float("-inf"), 0.0, 0
        for pdf in rows:
            speeds = pdf["speed"].dropna()
            n += len(pdf)
            if len(speeds):
                mx = max(mx, float(speeds.max()))
                sm += float(speeds.sum())
                nsp += int((speeds > self._threshold).sum())
        self._agg.update((n, mx, sm, nsp))
        yield pd.DataFrame(
            {
                "vehicle_id": [int(key[0])],
                "n_readings": [n],
                "max_speed": [None if mx == float("-inf") else mx],
                "sum_speed": [sm],
                "n_speeding": [nsp],
            }
        )

    def close(self) -> None:
        pass


def track_vehicle_stats(crumbs: DataFrame, speeding_threshold: float = 70.0) -> DataFrame:
    """Streaming per-vehicle stats over conformed breadcrumbs via
    transformWithStateInPandas. Requires the RocksDB state store:

        spark.conf.set("spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    """
    return (
        crumbs.select("vehicle_id", "speed")
        .groupBy("vehicle_id")
        .transformWithStateInPandas(
            statefulProcessor=VehicleStatsProcessor(speeding_threshold),
            outputStructType=VEHICLE_STATS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
