"""Oracle-checked similarity-search queries over ``embeddings``
(operators in operators/similarity.py).

Float policy: cosine is computed in float64 on both engines; the oracle
compares ranks (exact ints) plus cosine rounded to 4 decimals. With
64-dim random vectors, rank ties or 1e-4-boundary collisions between the
two engines' summation orders are measure-zero; the canonical comparator
rounds floats to 9 significant digits anyway.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.similarity import (
    ann_lsh_topk,
    cosine_topk,
    cosine_topk_arrow,
    embedding_neardup_pairs,
    hyperplane_lsh_buckets,
    ivf_topk,
)
from c_tran_data_pipeline_spark.plans.registry import query
from c_tran_data_pipeline_spark.sources.readers import load_table

_COS = "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"


@query(
    "q_ann_topk",
    f"""
    WITH scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_COS} AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        WHERE a.vec_id < 20
    ), ranked AS (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, rank, ROUND(cos, 4) AS cosine
    FROM ranked WHERE rank <= 3
    """,
    doc="Exact brute-force cosine top-3 for 20 query vectors: broadcast "
    "queries × corpus scan, JVM array-fold cosine, window top-k. The "
    "ground-truth baseline for the LSH path.",
    tags=("similarity", "topk"),
)
def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 20), k=3)


@query(
    "q_ann_topk_arrow",
    f"""
    WITH scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_COS} AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        WHERE a.vec_id < 20
    ), ranked AS (
        SELECT query_id, neighbor_id, cos,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored
    )
    SELECT query_id, neighbor_id, rank, ROUND(cos, 4) AS cosine
    FROM ranked WHERE rank <= 3
    """,
    doc="Same contract as q_ann_topk, BLAS physical strategy: Arrow-"
    "batched numpy GEMM per partition emitting local top-k, global "
    "window re-rank (shuffle O(k·queries·partitions), not O(corpus)) — "
    "the path that wins at production embedding widths. Same exact-SQL "
    "oracle as the JVM fold; tests additionally pin row-level equality "
    "between the two strategies.",
    tags=("similarity", "topk", "udf"),
)
def q_ann_topk_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk_arrow(emb, emb.filter(F.col("vec_id") < 20), k=3)


@query(
    "q_ann_neardup",
    f"""
    SELECT a.vec_id AS d1, b.vec_id AS d2, ROUND({_COS}, 4) AS cosine
    FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE {_COS} >= 0.4
    """,
    doc="Embedding-cosine near-dup pairs (threshold 0.4) — exact all-pairs "
    "baseline; the LSH-bucketed variant is q_ann_lsh_buckets + re-rank.",
    tags=("similarity", "dedup"),
)
def q_ann_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_neardup_pairs(load_table(spark, sf_dir, "embeddings"), threshold=0.4)


def _bucket_sql(planes: int = 8) -> str:
    """DuckDB twin of operators.similarity._bucket_expr."""
    terms = []
    for j in range(planes):
        sign = (
            f"CASE WHEN CAST('0x' || substr(md5(concat({j}, ',', i - 1)), 1, 15) AS BIGINT) % 2 = 0 "
            f"THEN 1.0 ELSE -1.0 END"
        )
        proj = (
            f"list_reduce(list_prepend(CAST(0 AS DOUBLE), "
            f"list_transform(CAST(embedding AS DOUBLE[]), (x, i) -> x * ({sign}))), "
            f"(acc, x) -> acc + x)"
        )
        terms.append(f"CASE WHEN ({proj}) > 0 THEN CAST({1 << j} AS BIGINT) ELSE 0 END")
    return " + ".join(terms)


@query(
    "q_ann_lsh_buckets",
    f"""
    SELECT vec_id, {_bucket_sql(8)} AS bucket
    FROM embeddings
    """,
    doc="Random-hyperplane (Charikar) LSH bucket ids: 8 md5-derived ±1 "
    "planes, bit = sign of projection. Deterministic, no stored plane "
    "matrix; the ANN candidate join keys on this bucket.",
    tags=("similarity",),
)
def q_ann_lsh_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return hyperplane_lsh_buckets(load_table(spark, sf_dir, "embeddings"), planes=8, dim=64).select(
        "vec_id", "bucket"
    )


@query(
    "q_ann_lsh_topk",
    None,  # approximate by construction; recall asserted vs exact in tests
    doc="LSH-bucketed approximate top-3: candidates share the query's "
    "bucket, exact cosine re-ranks. Rows-only driver check; "
    "tests/test_similarity.py measures recall against cosine_topk.",
    tags=("similarity", "topk"),
)
def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return ann_lsh_topk(emb, emb.filter(F.col("vec_id") < 20), k=3, planes=4, tables=8, dim=64)


@query(
    "q_ann_ivf_topk",
    None,  # approximate by construction; nprobe==nlist exactness + recall in tests
    doc="IVF approximate top-3 (FAISS IndexIVFFlat shape): deterministic "
    "LSH-seeded k-means coarse quantizer (nlist=16 cells, 2 Lloyd steps), "
    "queries probe their 4 nearest cells, exact cosine re-ranks. Rows-only "
    "driver check; tests/test_similarity.py pins nprobe==nlist == exact "
    "brute force and measures recall at nprobe=4.",
    tags=("similarity", "topk"),
)
def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    # iters=1: one Lloyd refinement gives recall ~0.5 at nprobe=4/16 on
    # the fixture while saving a full corpus pass per extra iteration.
    emb = load_table(spark, sf_dir, "embeddings")
    return ivf_topk(emb, emb.filter(F.col("vec_id") < 20), k=3, nlist=16, nprobe=4, iters=1, dim=64)
