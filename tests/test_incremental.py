"""Mergeable-aggregate invariants (operators/incremental.py): merging
any partition of the input into states must equal the one-shot
summarize, bit-exactly, regardless of split count or merge order."""

from __future__ import annotations

from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.incremental import (
    finalize,
    merge_states,
    summarize,
)
from c_tran_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_SMOKE

KEYS = ["user_id", "event_type"]


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_merge_of_splits_equals_full_summarize(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    full = finalize(summarize(ev, KEYS, "value"))
    parts = [ev.filter(F.col("event_id") % 3 == i) for i in range(3)]
    merged = finalize(merge_states([summarize(p, KEYS, "value") for p in parts], KEYS))
    assert _rows(merged) == _rows(full)


def test_merge_is_order_invariant_and_reentrant(spark):
    """States merge in any order, and a merged state is itself a valid
    input to a later merge (the daily-rollup chain)."""
    ev = load_table(spark, SF_SMOKE, "events")
    a = summarize(ev.filter("event_id % 3 = 0"), KEYS, "value")
    b = summarize(ev.filter("event_id % 3 = 1"), KEYS, "value")
    c = summarize(ev.filter("event_id % 3 = 2"), KEYS, "value")
    ab_then_c = merge_states([merge_states([a, b], KEYS), c], KEYS)
    c_then_ba = merge_states([c, merge_states([b, a], KEYS)], KEYS)
    assert _rows(finalize(ab_then_c)) == _rows(finalize(c_then_ba))


def test_empty_delta_is_identity(spark):
    ev = load_table(spark, SF_SMOKE, "events")
    base = summarize(ev, KEYS, "value")
    empty = summarize(ev.filter("event_id < 0"), KEYS, "value")
    assert _rows(finalize(merge_states([base, empty], KEYS))) == _rows(finalize(base))
