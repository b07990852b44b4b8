"""Training-sequence assembly queries: vocabulary building (oracle-
checked) and fixed-budget sequence packing (rows-only; invariants pinned
in tests/test_packing.py — no-overflow, exactly-once doc coverage,
partitioning-independent determinism)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.functions.text import words
from c_tran_data_pipeline_spark.operators.packing import pack_sequences
from c_tran_data_pipeline_spark.plans.registry import query
from c_tran_data_pipeline_spark.sources.readers import load_table


@query(
    "q_vocab_topk",
    r"""
    SELECT token, n_occurrences, n_docs FROM (
        SELECT token,
               COUNT(*) AS n_occurrences,
               COUNT(DISTINCT doc_id) AS n_docs
        FROM (
            SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
            FROM documents
        )
        GROUP BY token
    )
    ORDER BY n_occurrences DESC, token
    LIMIT 100
    """,
    doc="Vocabulary building: explode whitespace tokens, count total + "
    "document frequency, top-100 (count desc, token asc). The "
    "tokenize→count→truncate pass every tokenizer training run starts "
    "with; partial-aggregated explode, one shuffle on token, "
    "TakeOrderedAndProject top-k (no global sort).",
    tags=("text", "vocab", "topk"),
)
def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(words("text")).alias("token"))
    return (
        toks.groupBy("token")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.countDistinct("doc_id").alias("n_docs"),
        )
        .orderBy(F.col("n_occurrences").desc(), F.col("token").asc())
        .limit(100)
    )


@query(
    "q_pack_sequences",
    None,  # imperative greedy fold — invariants pinned in tests/test_packing.py
    doc="operators/packing.py: greedy first-fit sequence packing of "
    "token counts into a 512-token budget across 16 deterministic hash "
    "shards; Arrow-batched grouped-map over (doc_id, n_tokens) pairs "
    "only — text never crosses into Python.",
    tags=("packing", "udf"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return pack_sequences(d, max_tokens=512, shards=16)
