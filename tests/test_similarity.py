"""Similarity-search behavior: exact top-k correctness on constructed
vectors; LSH recall floor against the exact baseline on the fixture."""

from __future__ import annotations

from pyspark.sql import Row

from c_tran_data_pipeline_spark.operators.similarity import ann_lsh_topk, cosine_topk


def test_cosine_topk_known_geometry(spark):
    vecs = spark.createDataFrame(
        [
            Row(vec_id=0, embedding=[1.0, 0.0, 0.0]),
            Row(vec_id=1, embedding=[0.9, 0.1, 0.0]),  # closest to 0
            Row(vec_id=2, embedding=[0.0, 1.0, 0.0]),  # orthogonal
            Row(vec_id=3, embedding=[-1.0, 0.0, 0.0]),  # opposite
        ]
    )
    out = cosine_topk(vecs, vecs.filter("vec_id = 0"), k=3).orderBy("rank").collect()
    assert [r.neighbor_id for r in out] == [1, 2, 3]
    assert out[0].cosine > 0.99 and out[2].cosine == -1.0


def test_lsh_topk_recall_floor(spark):
    """Multi-table LSH (4 planes × 8 tables) on the fixture vectors:
    neighbors sit at cosine ≈ 0.3-0.5 (θ ≈ 60-70°, p ≈ 0.61-0.67 per
    plane), so expected recall ≈ 1-(1-p⁴)⁸ ≈ 0.7-0.8. Assert a floor
    well above random bucketing."""
    from c_tran_data_pipeline_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter("vec_id < 30")
    exact = {(r.query_id, r.neighbor_id) for r in cosine_topk(emb, queries, k=3).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_lsh_topk(emb, queries, k=3, planes=4, tables=8).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, f"LSH recall@3 {recall:.2f} (single-table was ~0.0-0.18)"
