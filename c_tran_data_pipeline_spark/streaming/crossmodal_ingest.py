"""Streaming cross-modal dedup ingest: paired (image, caption)
micro-batches dedup against BOTH persisted stores — the image
(id, h, band, slice) table and the caption-string table — in one
transaction per batch (VERDICT r8 #8), the LAION-crawl daily-ingest
shape: new pairs arrive, only their payloads decode, and each batch's
joint verdicts land next to a store grown by exactly the new assets.

Composition, not new machinery:

- source: any streaming DataFrame of (asset_id, payload, caption) —
  tests drive a file stream with ``maxFilesPerTrigger=1`` so
  multi-batch sequencing is real; production points the same plan at
  Kafka (sources/kafka.py decodes the message envelope).
- per batch (``foreachBatch``): read the committed combined store, run
  ``crossmodal_incremental_neardup`` (operators/multimodal.py — O(new)
  decode+hash, (band, slice) probe join, caption Jaccard only on the
  LSH candidate set), write the batch's verdicts, then COMMIT the
  grown store by the tmp-directory + swap recipe proven by
  streaming/semantic_ingest.py (build aside, sidecar-last marker,
  rename-aside + rename-in + delete-aside — SOME committed store
  survives a crash at every point, and a torn swap refuses to load
  rather than serving half a store).
- "one transaction": both modality tables live under ONE store
  directory (``slices/`` + ``captions/``) committed by ONE sidecar and
  swapped by ONE rename — there is no observable state where the image
  index has absorbed a batch but the caption table hasn't.
- delivery: at-least-once with an idempotent effect. Verdicts write to
  a DETERMINISTIC per-batch directory (``batch=<id>``) with overwrite
  semantics, and the batch's contribution to each store is derived
  from a base that first ANTI-JOINS the committed store on the batch's
  asset_ids — so a REPLAYED batch (crash before the checkpoint commit,
  whether or not the store swap landed) recomputes the SAME verdict
  rows over the SAME effective corpus and re-commits a store identical
  to the one it already built: state never double-grows (pinned in
  tests/test_crossmodal_ingest.py).

Reference parity: the reference's consumers poll, validate, and
append-if-absent into Postgres (``topic_consumer.py:215-285``); this is
the same loop shape with the validation step replaced by joint
image+caption dedup against persisted state.
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

_SIDECAR = "_crossmodal_store.json"


def write_crossmodal_store(
    slices: DataFrame, captions: DataFrame, path: str, meta: dict | None = None
) -> None:
    """Persist both modality tables under one directory with ONE commit
    marker: ``slices/`` (the ahash_band_slices layout, ~bands 20-byte
    rows per asset), ``captions/`` (asset_id, caption — strings, never
    pixels), then the JSON sidecar LAST. A crash mid-write leaves
    parquet without the sidecar and read_crossmodal_store refuses it —
    the torn write is invisible, not half-served."""
    slices.select("id", "h", "band", "slice").write.mode("overwrite").parquet(
        os.path.join(path, "slices")
    )
    captions.select("asset_id", "caption").write.mode("overwrite").parquet(
        os.path.join(path, "captions")
    )
    with open(os.path.join(path, _SIDECAR), "w") as f:
        json.dump({"meta": meta or {}}, f)


def read_crossmodal_store(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame, dict]:
    """Load a committed store → (slices, captions, meta); raises on a
    torn/uncommitted write (parquet without the sidecar)."""
    sidecar = os.path.join(path, _SIDECAR)
    try:
        with open(sidecar) as f:
            rec = json.load(f)
    except (OSError, ValueError) as e:
        raise ValueError(
            f"crossmodal store at {path} is uncommitted or torn (no readable sidecar)"
        ) from e
    return (
        spark.read.parquet(os.path.join(path, "slices")),
        spark.read.parquet(os.path.join(path, "captions")),
        rec.get("meta", {}),
    )


def crossmodal_ingest_stream(
    spark: SparkSession,
    new_pairs: DataFrame,
    store_path: str,
    verdicts_path: str,
    checkpoint: str,
    codec: str = "fake",
    max_ham: int = 3,
    bands: int = 4,
    ngram: int = 3,
    joint_num: int = 1,
    joint_den: int = 2,
    max_slice_factor: int | None = 8,
) -> StreamingQuery:
    """Start the availableNow ingest: joint-dedup every micro-batch of
    ``new_pairs`` (streaming (asset_id, payload, caption)) against the
    committed combined store at ``store_path``, write the batch's
    verdicts to ``verdicts_path/batch=<id>``, and swap the grown store
    between batches."""
    from c_tran_data_pipeline_spark.operators.multimodal import (
        crossmodal_incremental_neardup,
    )
    from c_tran_data_pipeline_spark.session import persist_once_owned

    def process(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        # Crash recovery: a failure between the swap's two renames leaves
        # only the aside copy — promote it back before reading. (If BOTH
        # exist, the committed path wins and the aside is a stale
        # leftover cleaned at the next swap.)
        old = f"{store_path}.old"
        if not os.path.exists(store_path) and os.path.exists(old):
            os.rename(old, store_path)
        slices, captions, meta = read_crossmodal_store(spark, store_path)
        # Replay determinism: subtract the batch's own ids from the base
        # BEFORE probing. First delivery: no-op (the store can't contain
        # them yet). Replay after a committed swap: restores exactly the
        # pre-batch corpus, so the verdicts recompute bit-for-bit and
        # the rebuilt store equals the one already committed — the
        # effective state converges whichever side of the swap the
        # crash fell on. (The batch is the bounded side — broadcast the
        # id list under both anti-joins.)
        batch, owned = persist_once_owned(batch_df)
        try:
            ids = F.broadcast(batch.select(F.col("asset_id").alias("id")).distinct())
            base_slices = slices.join(ids, "id", "left_anti")
            base_caps = captions.join(
                ids.select(F.col("id").alias("asset_id")), "asset_id", "left_anti"
            )
            verdicts, up_slices, up_caps = crossmodal_incremental_neardup(
                batch,
                base_slices,
                base_caps,
                codec=codec,
                max_ham=max_ham,
                bands=bands,
                ngram=ngram,
                joint_num=joint_num,
                joint_den=joint_den,
                max_slice_factor=max_slice_factor,
            )
            # Verdicts FIRST, to a deterministic per-batch dir with
            # overwrite semantics: a replay rewrites the same rows in
            # place instead of appending duplicates.
            verdicts.write.mode("overwrite").parquet(
                f"{verdicts_path}/batch={batch_id}"
            )
            # Then the store swap (semantic_ingest.py recipe): build the
            # next version while the old one is still the committed read
            # source; rename-aside + rename-in + delete-aside so a
            # committed store exists at every crash point.
            tmp = f"{store_path}.build-{os.getpid()}-{batch_id}"
            write_crossmodal_store(up_slices, up_caps, tmp, meta=meta)
            shutil.rmtree(old, ignore_errors=True)  # stale aside from a prior crash
            if os.path.exists(store_path):
                os.rename(store_path, old)
            os.rename(tmp, store_path)
            shutil.rmtree(old, ignore_errors=True)
        finally:
            if owned:
                batch.unpersist()

    return (
        new_pairs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
