"""Streaming semantic-dedup ingest: the round-5 incremental SemDeDup
operator (operators/similarity.py) driven by Structured Streaming —
the shape a 100 TB embedding pipeline actually runs: new vectors arrive
as micro-batches, each batch dedups against the PERSISTED
centroid/representative store in O(batch), and the store grows
append-only by the kept rows between batches.

Composition, not new machinery:

- source: any streaming DataFrame of (vec_id, embedding) — tests drive
  a file stream with ``maxFilesPerTrigger=1`` so multi-batch sequencing
  is real; production points the same plan at Kafka.
- per batch (``foreachBatch``): read the committed store, run
  ``incremental_semantic_dedup`` (assignment via centroid literals —
  zero training jobs), append the batch's keep-flag verdicts to the
  flags ledger, and COMMIT the kept rows as a NEW GENERATION under the
  store (``append_semantic_store`` — the operators/pq.py index-append
  recipe): per-batch store I/O is O(kept batch rows) — the committed
  corpus is never rewritten, unlike the pre-r9 whole-store swap whose
  write cost grew with the corpus. Readers open only sidecar-listed
  generations, so a torn append (crash before the atomic sidecar
  replace) is invisible and reclaimed by the replay's overwrite of the
  same deterministic ``gen-b<batch_id>`` directory; centroids are
  FROZEN across appends, the invariant incremental == full depends on.
- delivery: at-least-once with an idempotent effect — a REPLAYED batch
  re-dedups vectors whose copies are already stored, every row pairs
  with its own stored copy (component anchored by a representative),
  every keep flag comes back False, and the generation append is
  skipped entirely (empty delta). The flags ledger records the replay
  verdicts as no-op rows; dedup state never double-grows (pinned in
  tests/test_semantic_ingest.py).

Reference parity: the reference's consumers poll, validate, and
append-if-absent into Postgres (``topic_consumer.py:215-285``); this is
the same loop shape with the validation step replaced by
embedding-space dedup against persisted state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def semantic_ingest_stream(
    spark: SparkSession,
    new_vectors: DataFrame,
    store_path: str,
    flags_path: str,
    checkpoint: str,
    threshold: float = 0.9,
    nprobe: int = 2,
) -> StreamingQuery:
    """Start the availableNow ingest: dedup every micro-batch of
    ``new_vectors`` (streaming (vec_id, embedding)) against the
    committed store at ``store_path``, append verdicts to
    ``flags_path``, and commit the kept rows as generation
    ``gen-b<batch_id>``."""
    from c_tran_data_pipeline_spark.operators.similarity import (
        _as_double,
        append_semantic_store,
        incremental_semantic_dedup,
        read_semantic_store,
    )
    from c_tran_data_pipeline_spark.session import persist_once_owned

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        reps, cents, _meta = read_semantic_store(spark, store_path)
        flags, _updated = incremental_semantic_dedup(
            batch_df, reps, cents, threshold=threshold, nprobe=nprobe
        )
        # Batch-sized pin: the ledger write and the delta join both
        # consume flags, whose lineage holds the per-cell GEMM and the
        # iterative component loop — without it the second consumer
        # re-runs the whole dedup.
        flags, owned = persist_once_owned(flags)
        try:
            flags.write.mode("append").parquet(flags_path)
            # The store delta comes from the BATCH, not from `_updated`
            # (store ∪ kept): subtracting the store back out would
            # rescan the corpus per batch. The flags already carry each
            # kept row's assigned cell, so the delta is one batch-sized
            # join; the same _as_double cast the operator stores keeps
            # the generation's schema bit-identical to a base build.
            delta = batch_df.join(
                flags.filter(F.col("keep")).select("vec_id", "cell"), "vec_id"
            ).select(
                "vec_id", "cell", _as_double(F.col("embedding")).alias("embedding")
            )
            # Replay: every keep flag is False (each row pairs with its
            # own stored copy), the delta is empty, and the append —
            # including the sidecar bump — is skipped, so state never
            # double-grows.
            if delta.take(1):
                append_semantic_store(delta, store_path, f"gen-b{batch_id:06d}")
        finally:
            if owned:
                flags.unpersist()

    return (
        new_vectors.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
