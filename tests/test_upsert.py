"""Upsert/merge operator semantics (SURVEY.md §2.2 K4-K5, §2.5 J2-J3)."""

from __future__ import annotations

from pyspark.sql import Row

from c_tran_data_pipeline_spark.operators.upsert import first_wins, insert_if_absent, merge_update


def test_insert_if_absent_first_writer_wins(spark):
    existing = spark.createDataFrame([Row(trip_id=1, route_id=10), Row(trip_id=2, route_id=20)])
    incoming = spark.createDataFrame(
        [Row(trip_id=2, route_id=99), Row(trip_id=3, route_id=30), Row(trip_id=3, route_id=31)]
    )
    out = {r.trip_id: r.route_id for r in insert_if_absent(existing, incoming, ["trip_id"]).collect()}
    assert out == {1: 10, 2: 20, 3: 30}  # 2 keeps old value; 3 inserts min-ordered row


def test_first_wins_deterministic(spark):
    df = spark.createDataFrame(
        [Row(k=1, seq=2, v="b"), Row(k=1, seq=1, v="a"), Row(k=2, seq=5, v="z")]
    )
    out = {r.k: r.v for r in first_wins(df, ["k"], ["seq"]).collect()}
    assert out == {1: "a", 2: "z"}


def test_merge_update_enriches_matched_only(spark):
    target = spark.createDataFrame(
        [Row(trip_id=1, route_id=0, direction="Out"), Row(trip_id=2, route_id=0, direction="Out")]
    )
    updates = spark.createDataFrame([Row(trip_id=1, route_id=65, direction="Back")])
    out = {r.trip_id: (r.route_id, r.direction) for r in
           merge_update(target, updates, ["trip_id"], ["route_id", "direction"]).collect()}
    assert out == {1: (65, "Back"), 2: (0, "Out")}  # K5: unmatched keeps placeholders
