"""Incremental cross-modal ingest ladder: cost of joint-deduping a
FIXED-size (image, caption) batch against stores indexed from 1×/4×/16×
corpora — turning the O(new)-decode claim into data. The expensive term
in media dedup is the DECODE: a batch-rerun shape re-decodes the whole
corpus every day (rungs would grow ~16×); the incremental path decodes
only the batch and probes the persisted 20-byte-row slice table, so
per-batch wall should grow only with the (band, slice) probe join's
store scan — shallow, and zero media bytes. (On a cluster, persist the
store bucketed by (band, slice) — sinks/bucketed.py — and the probe
co-locates with no shuffle on the stored side at all.)

Corpora are deterministic fake-codec images with md5-DERIVED pixels
(the registered crossmodal fixtures' recipe — `make_fake_image`'s
affine position pattern folds every seed onto ~64 distinct aHashes,
which makes the whole corpus one degenerate near-dup family and the
quadratic pair volume GENUINE; md5 pixels give the uniform hash
distribution a diverse photo corpus has) with word-captions; every
rung's batch plants 50 exact image twins of stored assets — half with
the stored caption (joint dups), half with fresh captions (image-only
dups) — and the run asserts every twin is caught with the right
verdict at every rung (recall does not decay as the store grows). Run:
``python scripts/crossmodal_ingest_ladder.py`` (~4 min on local[32]);
paste the table into SCALE.md.
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
TWINS = 50  # planted image twins per batch (25 joint + 25 image-only)
PAIR_SCHEMA = "asset_id long, payload binary, caption string"


def fake_img(seed: int, w: int = 24, h: int = 16) -> bytes:
    """Fake-codec payload with md5-derived pixels: uniform over the
    aHash space (verified: 3000/3000 distinct hashes, zero ≤3-bit
    sample collisions), so near-dup pairs exist only where planted."""
    import hashlib

    from c_tran_data_pipeline_spark.operators.multimodal import _pack_header

    need = w * h
    body = b"".join(
        hashlib.md5(f"{seed}:{k}".encode()).digest() for k in range((need + 15) // 16)
    )
    return _pack_header(w, h, 1) + body[:need]


def synth_pairs(spark: SparkSession, n: int, id_off: int, seed_off: int) -> DataFrame:
    """n deterministic (asset_id, payload, caption) rows; captions are
    distinct word strings. Built executor-side via the same mapInPandas
    path the decode uses — payload bytes never transit the driver."""

    def gen(it):
        import pandas as pd

        for pdf in it:
            ids = pdf["id"].tolist()
            yield pd.DataFrame(
                {
                    "asset_id": [id_off + i for i in ids],
                    "payload": [fake_img(seed_off + i) for i in ids],
                    "caption": [
                        f"caption number {seed_off + i} describing scene {i % 97}"
                        for i in ids
                    ],
                }
            )

    return spark.range(n).repartition(32).mapInPandas(gen, PAIR_SCHEMA)


def main() -> None:
    from c_tran_data_pipeline_spark.operators.multimodal import (
        ahash_band_slices,
        crossmodal_incremental_neardup,
        image_ahash,
    )
    from c_tran_data_pipeline_spark.session import get_spark

    import tempfile

    spark = get_spark()
    print(f"| store assets | index build s | batch={BATCH} joint dedup s | twins caught | verdicts |")
    print("|---|---|---|---|---|")
    tmp = tempfile.mkdtemp(prefix="crossmodal_ladder_")
    for base_n in (10_000, 40_000, 160_000):
        base = synth_pairs(spark, base_n, id_off=0, seed_off=0)
        t0 = time.monotonic()
        # The store is ON DISK in production (write_crossmodal_store's
        # layout) — materialize both modality tables to parquet so the
        # per-batch timing prices the probe, not a fixture re-synthesis.
        ahash_band_slices(image_ahash(base, codec="fake")).write.mode(
            "overwrite"
        ).parquet(f"{tmp}/slices_{base_n}")
        base.select("asset_id", "caption").write.mode("overwrite").parquet(
            f"{tmp}/captions_{base_n}"
        )
        t_build = time.monotonic() - t0
        slices = spark.read.parquet(f"{tmp}/slices_{base_n}")
        captions = spark.read.parquet(f"{tmp}/captions_{base_n}")

        # batch: fresh pairs + TWINS exact image twins of stored assets
        # (same seed ⇒ hamming 0); even twins reuse the STORED caption
        # (joint dup), odd twins get a fresh caption (image-only dup)
        stride = base_n // TWINS
        fresh = synth_pairs(
            spark, BATCH - TWINS, id_off=10_000_000, seed_off=1_000_000 + base_n
        )
        twins = [
            (
                20_000_000 + k,
                k * stride,  # seed of the stored asset it twins
                (
                    f"caption number {k * stride} describing scene {(k * stride) % 97}"
                    if k % 2 == 0
                    else f"completely fresh caption about twin {k} instead"
                ),
            )
            for k in range(TWINS)
        ]
        twin_df = spark.createDataFrame(
            [(a, fake_img(s), c) for a, s, c in twins],
            PAIR_SCHEMA,
        )
        batch = fresh.unionByName(twin_df)

        t0 = time.monotonic()
        verdicts, _, _ = crossmodal_incremental_neardup(
            batch, slices, captions, codec="fake"
        )
        rows = verdicts.collect()
        t_dedup = time.monotonic() - t0

        hit = {(r["a1"], r["a2"]): r for r in rows}
        caught = 0
        for a, s, _c in twins:
            # stored asset_id == its seed here; canonical pair order is
            # (least, greatest) = (stored_id, twin_id)
            r = hit.get((s, a))
            if r is not None and r["hamming"] == 0:
                k = a - 20_000_000
                assert r["joint_dup"] is (k % 2 == 0), (a, r)
                caught += 1
        assert caught == TWINS, f"only {caught}/{TWINS} twins caught at {base_n}"
        print(
            f"| {base_n:,} | {t_build:.2f} | {t_dedup:.2f} | {caught}/{TWINS} | {len(rows)} |"
        )


if __name__ == "__main__":
    main()
