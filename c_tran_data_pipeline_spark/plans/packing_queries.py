"""Training-sequence assembly queries: vocabulary building (oracle-
checked) and fixed-budget sequence packing (rows-only; invariants pinned
in tests/test_packing.py — no-overflow, exactly-once doc coverage,
partitioning-independent determinism)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.functions.text import words
from c_tran_data_pipeline_spark.operators.packing import chunk_documents, pack_sequences
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
    r"""
    WITH RECURSIVE counted AS (
        SELECT doc_id,
               CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
               CAST('0x' || substr(md5('pack:' || CAST(doc_id AS VARCHAR)), 1, 15)
                    AS BIGINT) % 16 AS shard
        FROM documents
    ),
    idxd AS (
        SELECT shard, doc_id, n_tokens,
               ROW_NUMBER() OVER (PARTITION BY shard ORDER BY doc_id) AS idx
        FROM counted
    ),
    -- the greedy fold replayed one doc per shard per level: a new pack
    -- opens exactly when the running total would overflow a non-empty
    -- pack (oversized singletons land ALONE in a pack with overflow
    -- marked), matching operators/packing.pack_sequences line for line
    rec AS (
        SELECT shard, 0::BIGINT AS idx, CAST(NULL AS BIGINT) AS doc_id,
               CAST(NULL AS BIGINT) AS n_tokens, 0::BIGINT AS pack_seq,
               0::BIGINT AS cur_tok
        FROM (SELECT DISTINCT shard FROM idxd)
        UNION ALL
        SELECT r.shard, r.idx + 1, d.doc_id, d.n_tokens,
               CASE WHEN r.cur_tok > 0 AND r.cur_tok + d.n_tokens > 512
                    THEN r.pack_seq + 1 ELSE r.pack_seq END,
               CASE WHEN r.cur_tok > 0 AND r.cur_tok + d.n_tokens > 512
                    THEN d.n_tokens ELSE r.cur_tok + d.n_tokens END
        FROM rec r JOIN idxd d ON d.shard = r.shard AND d.idx = r.idx + 1
    )
    SELECT shard, CAST(pack_seq AS INT) AS pack_seq,
           string_agg(doc_id, ',' ORDER BY idx) AS doc_ids_csv,
           CAST(COUNT(*) AS INT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           (SUM(n_tokens) > 512) AS overflow
    FROM rec WHERE idx >= 1
    GROUP BY shard, pack_seq
    """,
    doc="operators/packing.py: greedy first-fit sequence packing of "
    "token counts into a 512-token budget across 16 deterministic hash "
    "shards; Arrow-batched grouped-map over (doc_id, n_tokens) pairs "
    "only — text never crosses into Python. The gate projection "
    "serializes doc_ids to a comma-joined string (the library operator "
    "keeps array<long>): external comparators sort rows column-wise and "
    "can't order list cells. EXACT oracle since r7: the greedy fold "
    "replays as a recursive CTE advancing one doc per shard per level "
    "(depth = max docs/shard; the reset-on-overflow running total has "
    "no closed window form) — verified pack-for-pack at sf0.01 AND "
    "sf0.1.",
    tags=("packing", "udf"),
)
def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    packed = pack_sequences(d, max_tokens=512, shards=16)
    return packed.select(
        "shard",
        "pack_seq",
        F.concat_ws(",", F.transform("doc_ids", lambda x: x.cast("string"))).alias("doc_ids_csv"),
        "n_docs",
        "total_tokens",
        "overflow",
    )


@query(
    "q_chunk_documents",
    r"""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS words
        FROM documents
    ),
    starts AS (
        SELECT doc_id, words,
               unnest(generate_series(1, greatest(len(words), 1), 48)) AS s
        FROM w
    )
    SELECT doc_id,
           CAST((s - 1) / 48 AS BIGINT) AS chunk_id,
           s AS chunk_start,
           CAST(len(words[s:s+63]) AS BIGINT) AS n_tokens,
           md5(array_to_string(words[s:s+63], ' ')) AS chunk_hash
    FROM starts
    """,
    doc="operators/packing.py chunk_documents: sliding context-window "
    "chunking (64-token chunks every 48 tokens → 16-token overlap), the "
    "tokenize→window step before packing. Pure split+sequence+explode+"
    "slice projection — zero shuffle, codegen end-to-end; chunks leave "
    "as md5 fingerprints so text never fans out.",
    tags=("packing", "text"),
)
def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return chunk_documents(d, chunk_size=64, stride=48)


@query(
    "q_tfidf_top_terms",
    r"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split_regex(trim(text), '\s+')) AS token
        FROM documents
    ),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY doc_id, token),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks GROUP BY token),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT doc_id, token, ROUND(tf * ln(n_docs * 1.0 / df), 6) AS tfidf
    FROM (
        SELECT tf.doc_id, tf.token,
               ROW_NUMBER() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY tf * ln(n_docs * 1.0 / df) DESC, tf.token
               ) AS rn,
               tf.tf, df.df, n.n_docs
        FROM tf JOIN df USING (token) CROSS JOIN n
    ) WHERE rn <= 3
    """,
    doc="TF-IDF featurization: term frequency per doc × ln(N/df), top-3 "
    "terms per doc (tfidf desc, token asc). One explode, then df is a "
    "WINDOW count over the tf table (tf rows are distinct (doc,token) "
    "pairs, so count over partitionBy(token) IS the document frequency) "
    "— no join and no O(vocabulary) broadcast; the full-vocab df table "
    "is corpus-sized and must never be a broadcast build side. Shuffles: "
    "tf agg, token window, doc window — same count as the join form, "
    "scale-safe shape.",
    tags=("text", "vocab", "topk"),
)
def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar; at scale a cheap metadata count
    toks = d.select("doc_id", F.explode(words("text")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    # tf has exactly one row per (doc_id, token), so a count over the
    # token partition IS count(distinct doc_id) — df without a join, and
    # without broadcasting the O(vocabulary) df table.
    wdf = Window.partitionBy("token")
    scored = tf.select(
        "doc_id",
        "token",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.count(F.lit(1)).over(wdf))).alias(
            "__tfidf"
        ),
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("__tfidf").desc(), F.col("token").asc())
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "token", F.round("__tfidf", 6).alias("tfidf"))
    )
