"""Quantizer-training ladder: wall-time of the bounded-sample
driver-side IVF trainer (operators/similarity._kmeans_rows) across a
16× synthetic corpus ladder — the round-6 claim "training cost is
scale-free because the sample is capped" turned into data. Run:
``python scripts/train_ladder.py`` (~2 min on local[32]); paste the
table into SCALE.md.

The trainer's only distributed work is ONE hash-order top-k
(limit 256·nlist) over the corpus; everything after is numpy on
≤ 256·nlist rows. So the expected curve is: near-flat in corpus rows
(the top-k scan is cheap and column-pruned), constant numpy time, and
centroids that STOP CHANGING once the corpus exceeds the cap only if
the hash-order sample stabilizes (it does not have to — the top-k keeps
re-ranking as rows are added; determinism is per-corpus, not
append-stable, which is why persisted stores pin their centroids).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from c_tran_data_pipeline_spark.operators.similarity import _kmeans_rows
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark()
    dim, nlist = 64, 16
    print("| corpus rows | train s (bounded-sample driver Lloyd) | centroids |")
    print("|---|---|---|")
    for n in (100_000, 400_000, 1_600_000):
        # synthetic embeddings: 64 deterministic hash-derived dims/row
        emb = spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(
                *[
                    (F.pmod(F.xxhash64(F.col("id") + F.lit(d * 1_000_003)), F.lit(1000)) / 500.0 - 1.0)
                    for d in range(dim)
                ]
            ).alias("embedding"),
        )
        t0 = time.monotonic()
        cents = _kmeans_rows(emb, nlist=nlist, iters=2, key="vec_id", vec="embedding", dim=dim)
        t = time.monotonic() - t0
        print(f"| {n:,} | {t:.1f} | {len(cents)} |")


if __name__ == "__main__":
    main()
