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
  flags ledger, and COMMIT the grown store by the tmp-directory +
  swap recipe (write to ``<store>.build-<pid>``, which still READS the
  old committed directory — never overwrite a directory a lazy plan is
  reading — then rename-aside + rename-in + delete-aside, so SOME
  committed store survives a crash at every point; the sidecar-last
  marker inside makes a torn swap refuse to load rather than serve
  half a store, and the next run promotes the aside copy back).
- delivery: at-least-once with an idempotent effect — a REPLAYED batch
  re-dedups vectors whose copies are already stored, every row pairs
  with its own stored copy (component anchored by a representative),
  every keep flag comes back False, and the store append is empty. The
  flags ledger records the replay verdicts as no-op rows; dedup state
  never double-grows (pinned in tests/test_semantic_ingest.py).

Reference parity: the reference's consumers poll, validate, and
append-if-absent into Postgres (``topic_consumer.py:215-285``); this is
the same loop shape with the validation step replaced by
embedding-space dedup against persisted state.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
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
    ``flags_path``, and swap the grown store between batches."""
    from c_tran_data_pipeline_spark.operators.similarity import (
        incremental_semantic_dedup,
        read_semantic_store,
        write_semantic_store,
    )

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        # Crash recovery: a failure between the swap's two renames leaves
        # only the aside copy — promote it back before reading. (If BOTH
        # exist, the committed path wins and the aside is a stale leftover
        # cleaned at the next swap.)
        old = f"{store_path}.old"
        if not os.path.exists(store_path) and os.path.exists(old):
            os.rename(old, store_path)
        reps, cents, meta = read_semantic_store(spark, store_path)
        flags, updated = incremental_semantic_dedup(
            batch_df, reps, cents, threshold=threshold, nprobe=nprobe
        )
        flags.write.mode("append").parquet(flags_path)
        # Build the next store version while the old one is still the
        # committed read source, then swap whole (sidecar-last commit
        # inside write_semantic_store + directory rename here). The old
        # store is renamed ASIDE first — never rmtree'd before the new
        # one is in place — so a crash at any point leaves a committed
        # store on disk: before the aside-rename the old path is live;
        # between the two renames the .old copy survives for manual
        # (or next-run) restore; only after the new store is committed
        # does the aside copy get deleted.
        tmp = f"{store_path}.build-{os.getpid()}-{batch_id}"
        write_semantic_store(updated, cents, tmp, meta=meta)
        old = f"{store_path}.old"
        shutil.rmtree(old, ignore_errors=True)  # stale aside from a prior crash
        if os.path.exists(store_path):
            os.rename(store_path, old)
        os.rename(tmp, store_path)
        shutil.rmtree(old, ignore_errors=True)

    return (
        new_vectors.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
