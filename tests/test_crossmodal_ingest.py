"""Streaming cross-modal dedup ingest (streaming/crossmodal_ingest.py):
multi-batch sequencing (batch B's image twins of batch-A assets must be
caught, proving both stores grew BETWEEN micro-batches), exact
incremental == batch verdict equivalence per batch, at-least-once
replay idempotence (stores never double-grow, verdicts rewrite
identically), the generation-append commit's crash windows (a torn
append is invisible until the sidecar bump and reclaimed by replay),
and the torn-write refusal."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.multimodal import (
    ahash_band_slices,
    crossmodal_joint_neardup,
    image_ahash,
    make_fake_image,
)
from c_tran_data_pipeline_spark.streaming.crossmodal_ingest import (
    crossmodal_ingest_stream,
    read_crossmodal_store,
    write_crossmodal_store,
)

PAIR_SCHEMA = "asset_id long, payload binary, caption string"



pytestmark = pytest.mark.slow  # long E2E/property sweep: excluded from the time-budgeted default profile (pytest.ini); the full-suite gate still runs it


def _rows(ids_seeds_caps):
    return [
        (aid, make_fake_image(24, 16, 1, seed=seed), cap)
        for aid, seed, cap in ids_seeds_caps
    ]


@pytest.fixture()
def staged(spark, tmp_path):
    base = spark.createDataFrame(
        _rows(
            [(i, i, f"stored caption number {i} describing the photo") for i in range(20)]
        ),
        PAIR_SCHEMA,
    )
    store = str(tmp_path / "store")
    write_crossmodal_store(
        ahash_band_slices(image_ahash(base, codec="fake")),
        base.select("asset_id", "caption"),
        store,
        meta={"v": 1},
    )
    # batch A: fresh assets + image-twins of STORED assets — one with the
    # SAME caption (joint_dup) and one with a fresh caption (image-only dup)
    batch_a = _rows(
        [(100 + i, 1000 + i, f"fresh caption number {i} about something new") for i in range(5)]
        + [
            (110, 0, "stored caption number 0 describing the photo"),
            (111, 1, "a completely different caption for the same photo"),
        ]
    )
    # batch B: fresh assets + an image-twin of a BATCH-A asset (only
    # catchable if the store grew between micro-batches) + one more
    # stored-twin
    batch_b = _rows(
        [(200 + i, 2000 + i, f"later caption number {i} about another scene") for i in range(3)]
        + [
            (210, 1000, "fresh caption number 0 about something new"),
            (211, 2, "yet another unrelated caption entirely here"),
        ]
    )
    inp = str(tmp_path / "incoming")
    spark.createDataFrame(batch_a, PAIR_SCHEMA).coalesce(1).write.parquet(f"{inp}/batch=a")
    spark.createDataFrame(batch_b, PAIR_SCHEMA).coalesce(1).write.parquet(f"{inp}/batch=b")
    return store, inp, str(tmp_path), base, batch_a, batch_b


def _run(spark, store, inp, root, tag):
    stream = (
        spark.readStream.schema(PAIR_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/batch=*")
    )
    q = crossmodal_ingest_stream(
        spark, stream, store, f"{root}/verdicts_{tag}", f"{root}/ckpt_{tag}"
    )
    q.awaitTermination(180)
    return spark.read.parquet(f"{root}/verdicts_{tag}")


def _verdict_set(df):
    return {
        (r["a1"], r["a2"], r["hamming"], r["caption_jaccard"], r["joint_dup"])
        for r in df.collect()
    }


def test_multi_batch_joint_dedup_matches_batch_operator(spark, staged):
    store, inp, root, base, batch_a, batch_b = staged
    verdicts = _verdict_set(_run(spark, store, inp, root, "main"))

    # cross-batch: batch B's twin of a batch-A asset was caught at
    # hamming 0 with an identical caption — the store grew between
    # micro-batches in BOTH modalities
    hit = {(v[0], v[1]): v for v in verdicts}
    assert hit[(100, 210)][2] == 0 and hit[(100, 210)][4] is True
    # stored-twin with the stored caption: joint dup
    assert hit[(0, 110)][2] == 0 and hit[(0, 110)][4] is True
    # stored-twin with a diverging caption: image dup, NOT a joint dup —
    # the pair LAION-style cleaning keeps
    assert hit[(1, 111)][2] == 0 and hit[(1, 111)][4] is False

    # exact per-batch equivalence: the stream's verdicts are bit-for-bit
    # the rows the BATCH operator adds per ingest step
    def batch_pairs(df):
        return _verdict_set(crossmodal_joint_neardup(df))

    a_df = spark.createDataFrame(batch_a, PAIR_SCHEMA)
    b_df = spark.createDataFrame(batch_b, PAIR_SCHEMA)
    p0 = batch_pairs(base)
    p1 = batch_pairs(base.unionByName(a_df))
    p2 = batch_pairs(base.unionByName(a_df).unionByName(b_df))
    assert verdicts == (p1 - p0) | (p2 - p1)

    # final store indexes exactly base ∪ A ∪ B in both modalities
    slices, captions, meta, gens = read_crossmodal_store(spark, store)
    all_ids = {r[0] for r in batch_a + batch_b} | {
        r["asset_id"] for r in base.select("asset_id").collect()
    }
    assert {r["id"] for r in slices.select("id").distinct().collect()} == all_ids
    assert {r["asset_id"] for r in captions.select("asset_id").collect()} == all_ids
    assert captions.count() == len(all_ids)  # no duplicate caption rows
    assert meta == {"v": 1}  # metadata survives every append
    # O(batch) commits: one generation per ingested batch, base intact
    assert gens == ["gen-base", "gen-b000000", "gen-b000001"]


def test_replay_is_idempotent(spark, staged):
    """Re-processing already-ingested batches (a fresh checkpoint over
    the same files — the at-least-once worst case) recomputes the SAME
    verdicts over the SAME effective corpus and grows neither store."""
    store, inp, root, *_ = staged
    first = _verdict_set(_run(spark, store, inp, root, "first"))
    slices0, caps0, _, gens0 = read_crossmodal_store(spark, store)
    s0 = {tuple(r) for r in slices0.collect()}
    c0 = {tuple(r) for r in caps0.collect()}
    replay = _verdict_set(_run(spark, store, inp, root, "replay"))
    slices1, caps1, _, gens1 = read_crossmodal_store(spark, store)
    assert {tuple(r) for r in slices1.collect()} == s0  # no double growth
    assert {tuple(r) for r in caps1.collect()} == c0
    assert gens1 == gens0  # replay rewrites generations, never adds
    assert replay == first  # verdicts rewrite identically


def test_torn_append_is_invisible_and_reclaimed(spark, staged):
    """The crash window between the generation write and the sidecar
    bump: the generation directory exists on disk but is UNLISTED —
    readers must not see its rows, and a replay must reclaim it
    (overwrite + commit) rather than double-append."""
    import json

    store, inp, root, base, batch_a, batch_b = staged
    _run(spark, store, inp, root, "pre")
    sidecar = os.path.join(store, "_crossmodal_store.json")
    rec = json.load(open(sidecar))
    committed = rec["generations"]
    # simulate the crash: un-list every batch generation (their dirs stay)
    rec["generations"] = ["gen-base"]
    with open(sidecar, "w") as f:
        json.dump(rec, f)
    slices, captions, _, gens = read_crossmodal_store(spark, store)
    base_ids = {r["asset_id"] for r in base.select("asset_id").collect()}
    assert gens == ["gen-base"]
    # unlisted generations are invisible: only base rows load
    assert {r["id"] for r in slices.select("id").distinct().collect()} == base_ids
    # replay reclaims: same generations re-land, full state committed
    verdicts = _run(spark, store, inp, root, "reclaim")
    assert verdicts.count() > 0
    slices2, _, _, gens2 = read_crossmodal_store(spark, store)
    assert gens2 == committed
    assert {r["id"] for r in slices2.select("id").distinct().collect()} == base_ids | {
        r[0] for r in batch_a + batch_b
    }


def test_torn_store_refuses(spark, tmp_path, staged):
    """Parquet without the sidecar (a crash mid-write of the combined
    store) must refuse to load — half a store is never served."""
    store, *_ = staged
    shutil.copytree(store, str(tmp_path / "torn"))
    os.remove(str(tmp_path / "torn" / "_crossmodal_store.json"))
    with pytest.raises(ValueError, match="uncommitted or torn"):
        read_crossmodal_store(spark, str(tmp_path / "torn"))
