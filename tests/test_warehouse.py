"""Semantic pins for the warehouse pack (plans/warehouse_queries.py) and
the retrieval-metrics / char-entropy queries — invariants the oracle's
value-hash can't articulate (the oracle proves equality; these prove the
properties that make the answers RIGHT)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.plans import all_queries
from tests.conftest import SF_SMOKE


def _run(spark, name):
    return all_queries()[name].builder(spark, SF_SMOKE)


def test_scd2_versions_are_contiguous_and_single_current(spark):
    rows = _run(spark, "q_scd2_history").collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for user, hist in by_user.items():
        hist.sort(key=lambda r: r["version"])
        # versions are 1..n with no gaps
        assert [r["version"] for r in hist] == list(range(1, len(hist) + 1))
        # exactly one open (current) row, and it is the last version
        currents = [r for r in hist if r["is_current"]]
        assert len(currents) == 1 and currents[0]["version"] == len(hist)
        # validity windows chain: valid_to of v == valid_from of v+1,
        # so ranges tile the user's timeline with no overlap or gap
        for a, b in zip(hist, hist[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["valid_from"] < a["valid_to"]
        # consecutive versions really changed type (run-length property)
        for a, b in zip(hist, hist[1:]):
            assert a["event_type"] != b["event_type"]


def test_scd2_reconstructs_pointwise_state(spark):
    """Probing any event's timestamp against the history returns that
    event's type — the SCD2 contract (as-of correctness), checked for
    every event of a few users."""
    from c_tran_data_pipeline_spark.sources.readers import load_table

    hist = _run(spark, "q_scd2_history").collect()
    by_user: dict[int, list] = {}
    for r in hist:
        by_user.setdefault(r["user_id"], []).append(r)
    users = sorted(by_user)[:5]
    ev = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("user_id").isin(users))
        .select("user_id", "ts", "event_type")
        .collect()
    )
    assert ev
    for e in ev:
        matches = [
            h
            for h in by_user[e["user_id"]]
            if h["valid_from"] <= e["ts"]
            and (h["valid_to"] is None or e["ts"] < h["valid_to"])
        ]
        assert len(matches) == 1
        assert matches[0]["event_type"] == e["event_type"]


def test_min_cost_supplier_achieves_partwide_min(spark):
    """Every emitted (part, supplier) really achieves the part's minimum
    observed unit price, recomputed independently from lineitem."""
    from c_tran_data_pipeline_spark.sources.readers import load_table

    out = _run(spark, "q_min_cost_supplier").collect()
    assert out
    li = load_table(spark, SF_SMOKE, "lineitem").collect()
    best: dict[int, float] = {}
    for r in li:
        u = r["l_extendedprice"] / r["l_quantity"]
        k = r["l_partkey"]
        best[k] = u if k not in best else min(best[k], u)
    for r in out:
        assert r["unit_cost"] == best[r["p_partkey"]]
    # and every small part that appears in lineitem is covered
    p = load_table(spark, SF_SMOKE, "part").filter(F.col("p_size") <= 10).collect()
    small_with_lines = {r["p_partkey"] for r in p} & set(best)
    assert {r["p_partkey"] for r in out} == small_with_lines


def test_retrieval_metrics_bounds_and_consistency(spark):
    rows = _run(spark, "q_retrieval_metrics").collect()
    assert len(rows) == 20  # one row per query vector, hits or not
    for r in rows:
        assert 0 <= r["n_hits"] <= 3
        assert math.isclose(r["recall_at_3"], r["n_hits"] / 3.0)
        if r["n_hits"] > 0:
            assert 1.0 / 3.0 <= r["reciprocal_rank"] <= 1.0
        else:
            assert r["reciprocal_rank"] == 0.0
    # int8 quantization at 64 dims should retain most of the ranking
    mean_recall = sum(r["recall_at_3"] for r in rows) / len(rows)
    assert mean_recall >= 0.8, f"int8 recall@3 collapsed: {mean_recall}"


def test_char_entropy_matches_python_and_flags_repetition(spark):
    from collections import Counter

    from c_tran_data_pipeline_spark.sources.readers import load_table

    out = {r["doc_id"]: r for r in _run(spark, "q_char_entropy").collect()}
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text").collect()
    assert set(out) == {r["doc_id"] for r in docs}
    for r in docs[:50]:
        counts = Counter(r["text"])
        n = sum(counts.values())
        expect = sum(round(-(c / n) * math.log(c / n), 9) for c in counts.values())
        got = out[r["doc_id"]]
        assert math.isclose(got["char_entropy"], expect, abs_tol=1e-8)
        assert got["n_distinct_chars"] == len(counts)
    # a degenerate repeated-char doc scores (near) zero entropy — the signal
    probe = spark.createDataFrame([(1, "aaaaaaaaaaaa")], "doc_id long, text string")
    probe.createOrReplaceTempView("___t")
    chars = probe.select("doc_id", F.explode(F.split("text", "")).alias("ch")).filter(
        F.col("ch") != ""
    )
    freq = chars.groupBy("doc_id", "ch").count()
    assert freq.count() == 1  # single symbol → entropy 0 by construction
