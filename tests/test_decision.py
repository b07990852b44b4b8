"""Semantic pins for the decision-support + curation packs, beyond the
DuckDB parity the registry already enforces: the invariants here are the
ones a value-hash can't state (budget boundaries, vote determinism,
anti/semi-join set algebra)."""

from __future__ import annotations

from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.plans import all_queries
from c_tran_data_pipeline_spark.sources.readers import load_table

from tests.conftest import SF_SMOKE

SF = "/root/testdata/sf0.01"


def _run(spark, name, sf=SF):
    return all_queries()[name].builder(spark, sf)


def test_token_budget_cap_boundary(spark):
    """Every admitted doc's cumulative count is within budget, AND the
    first rejected doc per source would have exceeded it (the cap is
    tight, not merely sound)."""
    out = _run(spark, "q_token_budget_cap").collect()
    assert out and all(r["cum_tokens"] <= 700 for r in out)
    # tightness: per source, the next doc (by doc_id) after the last
    # admitted one must push the running sum past the budget
    docs = load_table(spark, SF, "documents")
    from c_tran_data_pipeline_spark.functions.text import token_count
    from pyspark.sql.window import Window

    w = Window.partitionBy("source").orderBy("doc_id")
    cum = (
        docs.select("doc_id", "source", token_count("text").alias("n"))
        .withColumn("cum", F.sum("n").over(w))
    )
    admitted = {(r["source"], r["doc_id"]) for r in out}
    rejected_first = (
        cum.filter(F.col("cum") > 700)
        .groupBy("source")
        .agg(F.min("cum").alias("first_over"))
        .collect()
    )
    for r in rejected_first:
        assert r["first_over"] > 700
    # no admitted doc sits after a rejected one within its source
    for r in cum.collect():
        if (r["source"], r["doc_id"]) in admitted:
            assert r["cum"] <= 700


def test_knn_label_votes_bounded_and_deterministic(spark):
    out1 = {(r["query_id"]): (r["pred_label"], r["votes"]) for r in _run(spark, "q_knn_label").collect()}
    out2 = {(r["query_id"]): (r["pred_label"], r["votes"]) for r in _run(spark, "q_knn_label").collect()}
    assert out1 == out2  # rerun-stable (ties broken deterministically)
    assert all(1 <= v <= 5 for _, v in out1.values())
    emb = load_table(spark, SF, "embeddings")
    n_queries = emb.filter(F.col("vec_id") < 50).count()
    assert len(out1) == n_queries  # exactly one prediction per query


def test_waiting_orders_sole_blame(spark):
    """Brute-force recheck on sf0.001: a counted (order, supplier) line
    must be the only returned supplier on a multi-supplier order."""
    li = load_table(spark, SF_SMOKE, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    rows = li.collect()
    by_order: dict[int, list] = {}
    for r in rows:
        by_order.setdefault(r["l_orderkey"], []).append(r)
    expect = 0
    for lines in by_order.values():
        supps = {r["l_suppkey"] for r in lines}
        r_supps = {r["l_suppkey"] for r in lines if r["l_returnflag"] == "R"}
        if len(supps) > 1 and len(r_supps) == 1:
            sole = next(iter(r_supps))
            expect += sum(
                1
                for r in lines
                if r["l_suppkey"] == sole and r["l_returnflag"] == "R"
                and len(supps - {sole}) > 0
            )
    got = (
        _run(spark, "q_waiting_orders", SF_SMOKE)
        .agg(F.sum("numwait").alias("s"))
        .collect()[0]["s"]
    )
    assert (got or 0) == expect


def test_prefix_dedup_partitions_docs(spark):
    """Groups partition the corpus: sizes sum to the doc count and every
    representative is a member of its own group."""
    out = _run(spark, "q_prefix_dedup")
    docs = load_table(spark, SF, "documents")
    total = docs.count()
    agg = out.agg(F.sum("n_docs").alias("s"), F.count(F.lit(1)).alias("g")).collect()[0]
    assert agg["s"] == total
    joined = (
        out.join(
            docs.select(F.md5(F.substring("text", 1, 256)).alias("prefix_key"), "doc_id"),
            ["prefix_key"],
        )
        .filter(F.col("keep_doc_id") == F.col("doc_id"))
        .count()
    )
    assert joined == agg["g"]  # each group's keeper exists in the group


def test_source_mix_shares_sum_to_one(spark):
    out = _run(spark, "q_source_mix_report").collect()
    assert abs(sum(r["token_share"] for r in out) - 1.0) < 1e-3
    assert all(r["total_tokens"] > 0 for r in out)
