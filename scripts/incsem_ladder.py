"""Incremental-SemDeDup ladder: cost of deduping a FIXED-size new batch
against stores built from 1×/4×/16× corpora — turning the O(new)
claim into data. If per-batch cost scaled with the CORPUS (the full
semantic_dedup rerun shape), the rungs would grow ~16×; the incremental
path should stay near-flat, paying only the batch assignment + the
touched-cell GEMMs (cell occupancy is held ~constant by growing nlist
with the corpus, exactly the knob the operator documents).

Corpora are deterministic synthetic unit-ish vectors (md5-derived, 64-d);
every 10th base vector gets a ±0.001 twin planted in the new batch, and
the run asserts 100% of those twins are caught at every rung (recall
does not decay as the store grows). Run:
``python scripts/incsem_ladder.py`` (~3 min on local[32]); paste the
table into SCALE.md.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

BATCH = 500  # fixed new-batch size across all rungs
DIM = 64


def synth_vecs(spark: SparkSession, n: int, tag: str) -> DataFrame:
    """n deterministic 64-d vectors: component k of vector i is derived
    from md5(tag:i:k) mapped into [-1, 1] — reproducible across runs,
    no RNG state."""
    return spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            f"transform(sequence(0, {DIM - 1}), k ->"
            f" (CAST(conv(substr(md5(concat('{tag}:', id, ':', k)), 1, 8), 16, 10)"
            f"  AS DOUBLE) / 2147483648.0) - 1.0)"
        ).alias("embedding"),
    )


def main() -> None:
    from c_tran_data_pipeline_spark.operators.pq import deterministic_sample
    from c_tran_data_pipeline_spark.operators.similarity import (
        build_semantic_store,
        incremental_semantic_dedup,
    )
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark()
    print(f"| store size | nlist | build s | batch={BATCH} dedup s | twins caught |")
    print("|---|---|---|---|---|")
    for base_n, nlist in [(10_000, 16), (40_000, 32), (160_000, 64)]:
        base = synth_vecs(spark, base_n, "base")
        t0 = time.monotonic()
        reps, cents = build_semantic_store(
            base, threshold=0.95, nlist=nlist, iters=2, dim=DIM, nprobe=2,
            train_df=deterministic_sample(base, mod=8),
        )
        reps = reps.persist()
        n_reps = reps.count()  # materialize: the store is ON DISK in production
        t_build = time.monotonic() - t0

        fresh = synth_vecs(spark, BATCH - BATCH // 10, f"new{base_n}").select(
            (F.col("vec_id") + 10_000_000).alias("vec_id"), "embedding"
        )
        twins = base.filter(F.col("vec_id") % (base_n // (BATCH // 10)) == 0).limit(
            BATCH // 10
        ).select(
            (F.col("vec_id") + 20_000_000).alias("vec_id"),
            F.expr(
                "transform(embedding, (x, i) -> x + 0.0001 * ((i % 3) - 1))"
            ).alias("embedding"),
        )
        new_batch = fresh.unionByName(twins)
        n_twins = twins.count()

        t0 = time.monotonic()
        flags, _updated = incremental_semantic_dedup(
            new_batch, reps, cents, threshold=0.95, nprobe=2
        )
        rows = flags.collect()
        t_batch = time.monotonic() - t0
        caught = sum(
            1 for r in rows if r["vec_id"] >= 20_000_000 and not r["keep"]
        )
        reps.unpersist()
        print(
            f"| {base_n:,} ({n_reps:,} reps) | {nlist} | {t_build:.1f} "
            f"| {t_batch:.1f} | {caught}/{n_twins} |"
        )
        assert caught == n_twins, f"twin recall decayed at store size {base_n}"


if __name__ == "__main__":
    main()
