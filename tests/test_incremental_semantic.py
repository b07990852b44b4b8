"""Incremental SemDeDup vs the full-corpus operator: the persisted
store round-trips, every planted twin of a stored representative is
caught, batch-incremental keep flags equal full-corpus semantic_dedup
on the planted fixture, and a stored representative stays canonical
even when a new duplicate has a smaller id."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.pq import deterministic_sample
from c_tran_data_pipeline_spark.operators.similarity import (
    build_semantic_store,
    incremental_semantic_dedup,
    read_semantic_store,
    semantic_dedup,
    write_semantic_store,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus_parts(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    base = emb.filter(F.col("vec_id") % 10 < 8)
    twins = base.filter(F.col("vec_id") % 20 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.expr("transform(embedding, (x, i) -> x + 0.001 * ((i % 3) - 1))").alias(
            "embedding"
        ),
    )
    new_batch = emb.filter(F.col("vec_id") % 10 >= 8).unionByName(twins)
    return emb, base, twins, new_batch


@pytest.fixture(scope="module")
def store(corpus_parts, tmp_path_factory, spark):
    _, base, _, _ = corpus_parts
    reps, cents = build_semantic_store(
        base, threshold=0.9, nlist=8, iters=2, dim=64, nprobe=2,
        train_df=deterministic_sample(base, mod=4),
    )
    path = str(tmp_path_factory.mktemp("semstore") / "store")
    write_semantic_store(reps, cents, path, meta={"threshold": 0.9})
    return path, cents


def test_store_roundtrip_and_torn_sidecar(spark, store, tmp_path):
    path, cents = store
    reps, cents2, meta = read_semantic_store(spark, path)
    assert cents2 == cents and meta == {"threshold": 0.9}
    assert set(reps.columns) == {"vec_id", "cell", "embedding"}
    assert reps.count() > 0
    # parquet without sidecar = uncommitted → refuse
    reps.write.partitionBy("cell").parquet(str(tmp_path / "torn"))
    with pytest.raises(ValueError, match="uncommitted or torn"):
        read_semantic_store(spark, str(tmp_path / "torn"))


def test_planted_twins_all_caught_and_full_equivalence(spark, corpus_parts, store):
    """Every ±0.001 twin of a STORED doc is flagged dup with the stored
    doc as its component — and the whole batch's keep flags equal the
    full-corpus semantic_dedup (same centroids) restricted to the new
    rows: the incremental == batch exactness claim on this fixture."""
    emb, base, twins, new_batch = corpus_parts
    path, cents = store
    reps, cents2, _ = read_semantic_store(spark, path)
    flags, updated = incremental_semantic_dedup(
        new_batch, reps, cents2, threshold=0.9, nprobe=2
    )
    out = {r["vec_id"]: r for r in flags.collect()}
    planted = {k for k in out if k >= 1_000_000}
    assert len(planted) == twins.count()
    stored_ids = {r["vec_id"] for r in reps.select("vec_id").collect()}
    for k in planted:
        # the twin's source doc survived the base dedup (it IS stored)
        assert k - 1_000_000 in stored_ids
        assert out[k]["keep"] is False
        assert out[k]["component"] == k - 1_000_000
    # batch-incremental == full-corpus, restricted to the new batch
    # (corpus built as emb ∪ twins — row-identical to base ∪ new_batch)
    full = semantic_dedup(
        emb.unionByName(twins), threshold=0.9, nlist=8, iters=2, dim=64,
        centroids=cents,
    )
    fo = {r["vec_id"]: r for r in full.collect() if r["vec_id"] in out}
    assert {k: bool(v["keep"]) for k, v in out.items()} == {
        k: bool(v["keep"]) for k, v in fo.items()
    }
    # store growth is exactly the kept new rows, append-only
    kept_new = {k for k, v in out.items() if v["keep"]}
    updated_ids = {r["vec_id"] for r in updated.select("vec_id").collect()}
    assert updated_ids == stored_ids | kept_new


def test_stored_rep_stays_canonical_when_new_id_is_smaller(spark):
    """A new duplicate with a SMALLER id than the stored representative
    still drops — the store rep is canonical whatever the id order."""
    v = [1.0] + [0.0] * 7
    other = [0.0] * 7 + [1.0]
    reps = spark.createDataFrame(
        [(100, 0, v), (200, 0, other)], "vec_id long, cell int, embedding array<double>"
    )
    cents = [(0, [0.0] * 8)]  # single cell: everything blocks together
    new = spark.createDataFrame(
        [(5, v), (7, other), (9, [0.0, 1.0] + [0.0] * 6)],
        "vec_id long, embedding array<double>",
    )
    flags, updated = incremental_semantic_dedup(new, reps, cents, threshold=0.99)
    out = {r["vec_id"]: r for r in flags.collect()}
    assert out[5]["keep"] is False  # dup of stored 100 though 5 < 100
    assert out[7]["keep"] is False  # dup of stored 200 though 7 < 200
    assert out[9]["keep"] is True and out[9]["component"] is None
    assert {r["vec_id"] for r in updated.collect()} == {100, 200, 9}


def test_new_new_duplicates_within_batch(spark):
    """Two new docs duplicating each other (no store match): min id
    keeps, the other drops — the semantic_dedup contract."""
    reps = spark.createDataFrame(
        [(50, 0, [0.0] * 7 + [1.0])], "vec_id long, cell int, embedding array<double>"
    )
    cents = [(0, [0.0] * 8)]
    w = [1.0, 1.0] + [0.0] * 6
    new = spark.createDataFrame(
        [(11, w), (12, w)], "vec_id long, embedding array<double>"
    )
    flags, _ = incremental_semantic_dedup(new, reps, cents, threshold=0.99)
    out = {r["vec_id"]: r for r in flags.collect()}
    assert out[11]["keep"] is True and out[11]["component"] == 11
    assert out[12]["keep"] is False and out[12]["component"] == 11
