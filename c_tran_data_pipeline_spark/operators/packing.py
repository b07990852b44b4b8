"""Sequence packing: assemble documents into fixed-token-budget training
sequences — the last mile of an LLM data pipeline (maximize tokens per
sequence, minimize padding).

Global optimal bin-packing is inherently sequential, so the scalable
shape is shard-then-pack (exactly what production packers do): documents
are hash-bucketed into shards, each shard packs independently with a
deterministic greedy first-fit over doc_id order, and pack ids are
(shard, seq) pairs — embarrassingly parallel, one shuffle, reproducible
on any cluster size (bucket membership depends only on doc_id, never on
partitioning).

The in-shard packer is a Pandas grouped-map (applyInPandas): genuinely
imperative accumulate-and-cut logic, the documented escape hatch for
semantics Spark's operators can't express. Arrow moves (doc_id,
n_tokens) pairs only — text NEVER enters Python.

Oversized documents (> budget alone) get a single-doc pack (truncation
is the caller's policy decision, flagged via ``overflow``).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from c_tran_data_pipeline_spark.functions.text import md5_long, token_count

def chunk_documents(
    docs: DataFrame,
    chunk_size: int = 64,
    stride: int = 48,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """Context-window chunking — the step BEFORE packing: split each
    document's token stream into fixed-size chunks every ``stride``
    tokens (stride < chunk_size ⇒ consecutive chunks overlap by
    chunk_size - stride, the sliding-window scheme tokenizer pipelines
    use so no span is ever cut without context). Emits one row per
    (doc, chunk): chunk_id, start token ordinal (1-based), the chunk's
    token count (< chunk_size only on the tail), and md5 of the
    space-rejoined chunk so downstream dedup/verification never carries
    chunk text.

    Scale shape: split + sequence + explode + slice — a pure per-row
    projection pipeline, zero shuffle, stays in codegen end-to-end. The
    fan-out factor is ~n_tokens/stride; Spark's explode streams it, so
    no row ever materializes the full chunk list."""
    if chunk_size < 1 or stride < 1:
        raise ValueError("chunk_documents: chunk_size and stride must be >= 1")
    w = F.split(F.trim(F.col(text)), r"\s+")
    starts = F.explode(
        F.sequence(F.lit(1), F.greatest(F.array_size("__w"), F.lit(1)), F.lit(stride))
    )
    chunk = F.slice(F.col("__w"), F.col("s"), chunk_size)
    return (
        docs.select(F.col(key), w.alias("__w"))
        .select(F.col(key), F.col("__w"), starts.alias("s"))
        .select(
            F.col(key),
            ((F.col("s") - 1) / stride).cast("long").alias("chunk_id"),
            F.col("s").alias("chunk_start"),
            F.array_size(chunk).cast("long").alias("n_tokens"),
            F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
        )
    )


PACK_SCHEMA = T.StructType(
    [
        T.StructField("shard", T.LongType()),
        T.StructField("pack_seq", T.LongType()),
        T.StructField("doc_ids", T.ArrayType(T.LongType())),
        T.StructField("n_docs", T.IntegerType()),
        T.StructField("total_tokens", T.LongType()),
        T.StructField("overflow", T.BooleanType()),
    ]
)


def pack_sequences(
    docs: DataFrame,
    max_tokens: int = 2048,
    shards: int = 64,
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(shard, pack_seq, doc_ids, n_docs, total_tokens, overflow) —
    greedy first-fit packing of whitespace-token counts within
    deterministic hash shards. total_tokens ≤ max_tokens unless the pack
    is a single oversized doc (overflow=true)."""
    counted = docs.select(
        F.col(key).alias("doc_id"),
        token_count(text).cast("long").alias("n_tokens"),
        F.pmod(md5_long(F.col(key).cast("string"), F.lit("pack")), F.lit(shards)).alias("shard"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard = int(pdf["shard"].iloc[0])
        out, cur_ids, cur_tok = [], [], 0
        for doc_id, n in zip(pdf["doc_id"], pdf["n_tokens"]):
            n = int(n)
            if cur_ids and cur_tok + n > max_tokens:
                out.append((shard, len(out), cur_ids, len(cur_ids), cur_tok, cur_tok > max_tokens))
                cur_ids, cur_tok = [], 0
            cur_ids.append(int(doc_id))
            cur_tok += n
        if cur_ids:
            out.append((shard, len(out), cur_ids, len(cur_ids), cur_tok, cur_tok > max_tokens))
        return pd.DataFrame(out, columns=[f.name for f in PACK_SCHEMA.fields])

    return counted.groupBy("shard").applyInPandas(pack, PACK_SCHEMA)
