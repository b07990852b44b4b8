"""operators/bloom.py: the explicit bloom prefilter must never drop a
true match (no false negatives — the property that makes the
prefilter+exact-join composition result-invariant), keep its false-
positive rate near theory, actually shrink the fact sliver on the
fixture, and stay a pure codegen expression (no shuffle, no Python, no
broadcast exchange: the bitmap enters the plan as a constant-folded
literal)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.bloom import (
    bloom_prefilter_semijoin,
    build_bloom,
    might_contain,
)
from c_tran_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_ORACLE

M_BITS = 1 << 15
K = 5


def test_no_false_negatives(spark):
    keys = spark.range(0, 2000).selectExpr("id * 13 + 7 AS k")
    words = build_bloom(keys, "k", m_bits=M_BITS, n_hash=K)
    missed = keys.filter(~might_contain(words, F.col("k"), M_BITS, K)).count()
    assert missed == 0


def test_false_positive_rate_near_theory(spark):
    n = 3000
    keys = spark.range(0, n).selectExpr("id * 7 AS k")
    words = build_bloom(keys, "k", m_bits=M_BITS, n_hash=K)
    # probe only non-members: odd numbers are never multiples of 7*even…
    # simpler: probe a disjoint range
    probe = spark.range(1_000_000, 1_040_000).selectExpr("id AS k")
    fp = probe.filter(might_contain(words, F.col("k"), M_BITS, K)).count()
    theory = (1 - math.exp(-K * n / M_BITS)) ** K
    assert fp / 40_000 < max(4 * theory, 0.02), (fp, theory)


def test_prefilter_shrinks_fact_and_matches_exact_semijoin(spark):
    li = load_table(spark, SF_ORACLE, "lineitem").select("l_orderkey")
    urgent = (
        load_table(spark, SF_ORACLE, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    words = build_bloom(urgent, "o_orderkey", m_bits=M_BITS, n_hash=K)
    total = li.count()
    pref = li.filter(might_contain(words, F.col("l_orderkey"), M_BITS, K)).count()
    exact = li.join(
        urgent.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey", "left_semi"
    ).count()
    # urgent is ~1/5 of orders: the sliver must be far below the corpus
    # and within FP headroom of the exact match count
    assert exact <= pref <= total * 0.35, (exact, pref, total)
    got = bloom_prefilter_semijoin(li, urgent, "l_orderkey", "o_orderkey", m_bits=M_BITS)
    assert got.count() == exact


def test_probe_plan_is_pure_mapside(spark):
    keys = spark.range(0, 100).selectExpr("id AS k")
    words = build_bloom(keys, "k", m_bits=M_BITS, n_hash=K)
    probed = spark.range(0, 1000).selectExpr("id AS k").filter(
        might_contain(words, F.col("k"), M_BITS, K)
    )
    plan = probed._jdf.queryExecution().executedPlan().toString()
    for marker in ("Exchange", "BatchEvalPython", "ArrowEvalPython", "Join"):
        assert marker not in plan, f"{marker} in probe plan:\n{plan}"
