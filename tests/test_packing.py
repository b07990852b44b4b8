"""Sequence-packing invariants (the oracle can't express the greedy
fold, so these ARE the correctness contract)."""

from __future__ import annotations

from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.packing import pack_sequences
from c_tran_data_pipeline_spark.sources.readers import load_table
from c_tran_data_pipeline_spark.functions.text import token_count
from tests.conftest import SF_ORACLE

MAX = 64


def _packs(spark, shards=8):
    docs = load_table(spark, SF_ORACLE, "documents")
    return pack_sequences(docs, max_tokens=MAX, shards=shards).collect()


def test_every_doc_packed_exactly_once(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    packs = _packs(spark)
    packed = [d for p in packs for d in p["doc_ids"]]
    assert len(packed) == len(set(packed)) == docs.count()


def test_budget_respected_except_oversized_singletons(spark):
    for p in _packs(spark):
        if p["total_tokens"] > MAX:
            assert p["overflow"] and p["n_docs"] == 1  # only oversized docs overflow
        else:
            assert not p["overflow"]


def test_token_totals_consistent(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    expected = docs.select(F.sum(token_count("text"))).first()[0]
    assert sum(p["total_tokens"] for p in _packs(spark)) == expected


def test_packing_deterministic_across_partitionings(spark):
    """Same packs whatever the input partitioning — shard membership
    hangs off doc_id alone, in-shard order is pinned by the sort."""
    docs = load_table(spark, SF_ORACLE, "documents")
    a = pack_sequences(docs, max_tokens=MAX, shards=8).collect()
    b = pack_sequences(docs.repartition(13), max_tokens=MAX, shards=8).collect()
    key = lambda p: (p["shard"], p["pack_seq"])
    assert sorted((key(p), tuple(p["doc_ids"])) for p in a) == sorted(
        (key(p), tuple(p["doc_ids"])) for p in b
    )


def test_greedy_first_fit_order(spark):
    """Within a shard, docs appear in doc_id order across consecutive
    packs (greedy never reorders)."""
    packs = [p for p in _packs(spark) if p["shard"] == 0]
    ordered = [d for p in sorted(packs, key=lambda p: p["pack_seq"]) for d in p["doc_ids"]]
    assert ordered == sorted(ordered)


def test_chunking_covers_every_token_with_overlap(spark):
    from c_tran_data_pipeline_spark.operators.packing import chunk_documents

    docs = load_table(spark, SF_ORACLE, "documents")
    chunks = chunk_documents(docs, chunk_size=64, stride=48)
    rows = chunks.collect()
    n_toks = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", token_count("text").alias("n")).collect()
    }
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(n_toks)
    for doc_id, ch in by_doc.items():
        ch.sort(key=lambda r: r["chunk_id"])
        n = max(n_toks[doc_id], 1)
        # starts advance by exactly the stride, from token 1
        assert [r["chunk_start"] for r in ch] == list(range(1, n + 1, 48))
        # full coverage: the union of [start, start+n_tokens-1] is [1, n]
        covered_to = 0
        for r in ch:
            assert r["chunk_start"] <= covered_to + 1  # no gap
            covered_to = max(covered_to, r["chunk_start"] + r["n_tokens"] - 1)
        assert covered_to == n
        # chunk size is exactly the clamped window
        for r in ch:
            assert r["n_tokens"] == min(64, n - r["chunk_start"] + 1)


def test_chunking_is_a_pure_projection(spark):
    """Zero shuffles: the plan must contain no Exchange."""
    from c_tran_data_pipeline_spark.operators.packing import chunk_documents

    docs = load_table(spark, SF_ORACLE, "documents")
    plan = chunk_documents(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
