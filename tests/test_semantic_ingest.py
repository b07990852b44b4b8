"""Streaming incremental SemDeDup: multi-batch sequencing (batch B must
see the store AS GROWN BY batch A), per-batch twin recovery, and
at-least-once replay idempotence (re-processing a batch never
double-grows the store)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.pq import deterministic_sample
from c_tran_data_pipeline_spark.operators.similarity import (
    build_semantic_store,
    read_semantic_store,
    write_semantic_store,
)
from c_tran_data_pipeline_spark.streaming.semantic_ingest import semantic_ingest_stream

SF = "/root/testdata/sf0.001"
VEC_SCHEMA = "vec_id long, embedding array<double>"


def _twin(df, offset):
    return df.select(
        (F.col("vec_id") + offset).alias("vec_id"),
        F.expr("transform(embedding, (x, i) -> x + 0.001 * ((i % 3) - 1))").alias(
            "embedding"
        ),
    )


@pytest.fixture()
def staged(spark, tmp_path):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = emb.filter(F.col("vec_id") % 10 < 8)
    reps, cents = build_semantic_store(
        base, threshold=0.9, nlist=8, iters=2, dim=64, nprobe=2,
        train_df=deterministic_sample(base, mod=4),
    )
    store = str(tmp_path / "store")
    write_semantic_store(reps, cents, store, meta={"v": 1})

    fresh = emb.filter(F.col("vec_id") % 10 >= 8)  # ids ..8/..9, NOT stored
    # batch A: 30 fresh vectors + twins of STORED docs
    a_fresh = fresh.filter(F.col("vec_id") % 10 == 8).limit(30)
    a_twins = _twin(base.filter(F.col("vec_id") % 40 == 0), 1_000_000)
    batch_a = a_fresh.unionByName(a_twins)
    # batch B: other fresh vectors + twins of BATCH-A-KEPT fresh docs —
    # only catchable if the store grew between micro-batches
    b_fresh = fresh.filter(F.col("vec_id") % 10 == 9).limit(30)
    b_twins = _twin(a_fresh, 2_000_000)
    batch_b = b_fresh.unionByName(b_twins)

    inp = str(tmp_path / "incoming")
    batch_a.coalesce(1).write.parquet(f"{inp}/batch=a")
    batch_b.coalesce(1).write.parquet(f"{inp}/batch=b")
    return store, inp, str(tmp_path), batch_a, batch_b, reps


def _run(spark, store, inp, root, tag):
    stream = (
        spark.readStream.schema(VEC_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{inp}/batch=*")
    )
    q = semantic_ingest_stream(
        spark, stream, store, f"{root}/flags_{tag}", f"{root}/ckpt_{tag}",
        threshold=0.9, nprobe=2,
    )
    q.awaitTermination(180)
    return spark.read.parquet(f"{root}/flags_{tag}")


@pytest.mark.slow
def test_multi_batch_ingest_and_cross_batch_dedup(spark, staged):
    store, inp, root, batch_a, batch_b, reps0 = staged
    flags = _run(spark, store, inp, root, "main")
    out = {r["vec_id"]: r for r in flags.collect()}
    assert len(out) == batch_a.count() + batch_b.count()
    # every twin of a STORED doc dropped against its parent
    for k in [r["vec_id"] for r in out.values() if 1_000_000 <= r["vec_id"] < 2_000_000]:
        assert out[k]["keep"] is False and out[k]["component"] == k - 1_000_000
    # every batch-B twin of a batch-A doc dropped — proves the store
    # grew BETWEEN micro-batches (batch A's kept rows became reps)
    b_twin_ids = [r["vec_id"] for r in out.values() if r["vec_id"] >= 2_000_000]
    assert b_twin_ids
    for k in b_twin_ids:
        assert out[k]["keep"] is False, k
        assert out[k]["component"] == k - 2_000_000
    # final store = initial reps + exactly the kept batch rows
    reps1, _, _ = read_semantic_store(spark, store)
    kept = {k for k, r in out.items() if r["keep"]}
    init = {r["vec_id"] for r in reps0.select("vec_id").collect()}
    assert {r["vec_id"] for r in reps1.select("vec_id").collect()} == init | kept


@pytest.mark.slow
def test_replay_is_idempotent(spark, staged, tmp_path):
    """Re-processing already-ingested vectors (a fresh checkpoint over
    the same files — the at-least-once worst case) flags every row as a
    duplicate of its own stored copy and grows the store by nothing."""
    store, inp, root, batch_a, batch_b, _ = staged
    _run(spark, store, inp, root, "first")
    before = {r["vec_id"] for r in read_semantic_store(spark, store)[0].select("vec_id").collect()}
    replay = _run(spark, store, inp, root, "replay")
    after = {r["vec_id"] for r in read_semantic_store(spark, store)[0].select("vec_id").collect()}
    assert after == before  # no double growth
    # every replayed row that was KEPT first time now reports dup-of-self
    rep = {r["vec_id"]: r for r in replay.collect()}
    for k, r in rep.items():
        if k in before:
            assert r["keep"] is False and r["component"] == k


@pytest.mark.slow
def test_torn_append_is_invisible_and_reclaimed(spark, staged):
    """The generation-append crash window: a crash between the
    generation write and the atomic sidecar replace leaves an UNLISTED
    directory — readers must not see its rows, and a replay must
    reclaim it (overwrite + commit) rather than double-append."""
    import json
    import os

    store, inp, root, batch_a, batch_b, reps0 = staged
    flags = _run(spark, store, inp, root, "pre")
    assert flags.count() == batch_a.count() + batch_b.count()
    sidecar = os.path.join(store, "_semantic_store.json")
    rec = json.load(open(sidecar))
    committed = rec["generations"]
    assert committed[0] == "gen-base" and len(committed) == 3  # one gen per batch
    # simulate the crash: un-list the batch generations (dirs stay)
    rec["generations"] = ["gen-base"]
    with open(sidecar, "w") as f:
        json.dump(rec, f)
    reps, _, _ = read_semantic_store(spark, store)
    base_ids = {r["vec_id"] for r in reps0.select("vec_id").collect()}
    # unlisted generations are invisible: only the base reps load
    assert {r["vec_id"] for r in reps.select("vec_id").collect()} == base_ids
    # replay reclaims: the same generations re-land, full state committed
    _run(spark, store, inp, root, "reclaim")
    assert json.load(open(sidecar))["generations"] == committed
    reps2, _, _ = read_semantic_store(spark, store)
    kept = {r["vec_id"]: r for r in flags.collect()}
    assert {r["vec_id"] for r in reps2.select("vec_id").collect()} == base_ids | {
        k for k, r in kept.items() if r["keep"]
    }


@pytest.mark.slow
def test_probe_prunes_every_generation(spark, staged):
    """The probed-cell read stays a parquet PartitionFilter in EVERY
    generation's scan — the union-of-generations layout must not cost
    the store its pruning."""
    store, inp, root, *_ = staged
    _run(spark, store, inp, root, "prune")
    reps, _, _ = read_semantic_store(spark, store)
    probe = reps.filter(F.col("cell").isin([0, 1]))
    probe.collect()
    plan = probe._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan" in l]
    assert len(scans) == 3  # gen-base + one per ingested batch
    for line in scans:
        assert "PartitionFilters" in line and "cell" in line.split("PartitionFilters")[1][:60], line


def test_legacy_flat_store_still_reads(spark, staged, tmp_path):
    """Pre-generation stores (reps partitioned at the root, sidecar
    without a generations list) keep reading — the compat contract the
    IVF-PQ layout migration set."""
    import json
    import os

    _store, _inp, _root, _a, _b, reps0 = staged
    legacy = str(tmp_path / "legacy")
    reps0.write.partitionBy("cell").parquet(legacy)
    with open(os.path.join(legacy, "_semantic_store.json"), "w") as f:
        json.dump({"centroids": [[0, [0.0] * 64]], "meta": {"v": 0}}, f)
    reps, cents, meta = read_semantic_store(spark, legacy)
    assert reps.count() == reps0.count()
    assert cents == [(0, [0.0] * 64)] and meta == {"v": 0}


@pytest.mark.slow
def test_checkpoint_prevents_reprocessing(spark, staged):
    """The exactly-once-effect lever the replay test deliberately
    bypassed: a second availableNow run over the SAME checkpoint sees
    no new files, processes zero batches, and leaves both the flags
    ledger and the store untouched."""
    store, inp, root, _, _, _ = staged
    flags1 = _run(spark, store, inp, root, "ckpt").count()
    store1 = {r["vec_id"] for r in read_semantic_store(spark, store)[0].select("vec_id").collect()}
    flags2 = _run(spark, store, inp, root, "ckpt").count()  # same tag = same checkpoint
    store2 = {r["vec_id"] for r in read_semantic_store(spark, store)[0].select("vec_id").collect()}
    assert flags2 == flags1  # ledger unchanged — nothing re-appended
    assert store2 == store1
