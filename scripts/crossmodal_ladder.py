"""Cross-modal pair-curation scale ladder: wall time + candidate/pair
accounting for ``operators/multimodal.py::crossmodal_joint_neardup``
across a 16× synthetic (image, caption) corpus — the measurement behind
the claim that with a corpus-proportional photo-family space the
LAION-style joint dedup stays LINEAR (candidates come from banded aHash
equi-joins over family-sized buckets; captions ship only for the
LSH-bounded candidate set).

Corpora are synthesized deterministically in-engine: captions from the
scripts/scale_ladder.py document family (10-100 tokens, 31-word
vocabulary, md5-derived choices) and 8×8 md5-pixel images whose family
id is doc_id % (n/5) — every family holds ~5 docs at every rung, with
every third doc carrying the one-pixel-perturbed near-dup sibling — so
the true joint structure scales exactly linearly and the per-rung
assert can check it: same-family pairs ≈ n/5 · C(5,2)-ish, and measured
output pairs / docs must stay within a fixed band across rungs.

Run: ``python scripts/crossmodal_ladder.py`` (~3-5 min on local[32]);
paste the table into SCALE.md's round-8 section.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from collections.abc import Iterator  # noqa: E402

import pandas as pd  # noqa: E402

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

VOCAB = [f"w{i}" for i in range(31)]


def synth_pairs(spark: SparkSession, n: int, degenerate_frac: float = 0.0) -> DataFrame:
    """n deterministic (image, caption) rows: captions 10-100 tokens over
    the 31-word vocabulary; images 8×8 md5-pixel bodies with family
    id = doc_id % (n//5) and a +40-on-pixel-0 perturbed sibling class
    for every third doc (the q_pair_curation_crossmodal fixture at
    ladder scale).

    ``degenerate_frac``: that fraction of docs instead carry a FLAT
    (constant-gray) thumbnail — every flat image aHashes to 0 regardless
    of gray level, so they all collapse into ONE (band, slice) cell per
    band: the planted hot-slice skew the mean-relative cap
    (ahash_neardup_pairs max_slice_factor) exists to bound. Without the
    cap that cell alone emits (frac·n)²/2 candidates."""
    import hashlib
    import struct

    vocab_lit = "array(" + ",".join(f"'{w}'" for w in VOCAB) + ")"
    caps = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, "
            f"10 + cast(cast(conv(substr(md5(concat('X', id)), 1, 8), 16, 10) as bigint) % 91 as int)), "
            f"j -> element_at({vocab_lit}, 1 + cast(cast(conv(substr(md5(concat(id, '@', j)), 1, 8), 16, 10) as bigint) % 31 as int))))"
        ).alias("caption"),
    )
    m = max(n // 5, 1)
    header = struct.pack("<4sHHH", b"FAKE", 8, 8, 1)

    degen_mod = int(1 / degenerate_frac) if degenerate_frac else 0

    def add_images(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = []
            for i in pdf["asset_id"]:
                if degen_mod and int(i) % degen_mod == degen_mod - 1:
                    payloads.append(header + bytes([int(i) % 256] * 64))
                    continue
                fam, pert = int(i) % m, int(i) % 3 == 0
                body = bytearray()
                for blk in range(4):
                    body += hashlib.md5(f"img:{fam}:{blk}".encode()).digest()
                if pert:
                    body[0] = (body[0] + 40) % 256
                payloads.append(header + bytes(body))
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "payload": payloads, "caption": pdf["caption"]}
            )

    return caps.repartition(64).mapInPandas(
        add_images, "asset_id long, payload binary, caption string"
    )


def main() -> None:
    from c_tran_data_pipeline_spark.operators.multimodal import crossmodal_joint_neardup
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("crossmodal-ladder")
    rows = []
    for n in (100_000, 400_000, 1_600_000):
        pairs = synth_pairs(spark, n)
        t0 = time.perf_counter()
        out = crossmodal_joint_neardup(pairs, codec="fake", max_ham=3, bands=4)
        agg = out.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum(F.when(F.col("hamming") == 0, 1).otherwise(0)).alias("exact_img"),
            F.sum(F.col("joint_dup").cast("int")).alias("joint"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        per_doc = agg["pairs"] / n
        rows.append((n, agg["pairs"], agg["exact_img"], agg["joint"], per_doc, wall))
        print(
            f"docs={n:>9,} pairs={agg['pairs']:>9,} exact_img={agg['exact_img']:>9,} "
            f"joint={agg['joint']:>6,} pairs/doc={per_doc:.3f} wall={wall:.1f}s",
            flush=True,
        )
    # linearity assert: pairs/doc must stay within a fixed band across a
    # 16× rung span (quadratic behavior would blow this up 16×)
    ratios = [r[4] for r in rows]
    assert max(ratios) / min(ratios) < 1.5, f"pairs/doc drifted: {ratios}"
    print("OK: pairs/doc stable across 16x ->", [round(r, 3) for r in ratios])

    # Degenerate rungs (VERDICT r8 #2): 10% of docs are flat thumbnails
    # that ALL aHash to 0 — one hot cell per band. Uncapped, that cell
    # alone emits (0.1n)²/2 candidates (1.28e10 at the top rung, a dead
    # cluster); with the default mean-relative cap the plan must stay
    # LINEAR and the clean pairs/doc band must hold.
    drows = []
    for n in (100_000, 400_000, 1_600_000):
        pairs = synth_pairs(spark, n, degenerate_frac=0.1)
        t0 = time.perf_counter()
        out = crossmodal_joint_neardup(pairs, codec="fake", max_ham=3, bands=4)
        agg = out.agg(
            F.count(F.lit(1)).alias("pairs"),
            F.sum(F.col("joint_dup").cast("int")).alias("joint"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        per_doc = agg["pairs"] / n
        drows.append((n, agg["pairs"], agg["joint"], per_doc, wall))
        print(
            f"degen10% docs={n:>9,} pairs={agg['pairs']:>9,} joint={agg['joint']:>6,} "
            f"pairs/doc={per_doc:.3f} wall={wall:.1f}s",
            flush=True,
        )
    dratios = [r[3] for r in drows]
    assert max(dratios) / min(dratios) < 1.5, f"degenerate pairs/doc drifted: {dratios}"
    print("OK: capped degenerate rungs stay linear ->", [round(r, 3) for r in dratios])


if __name__ == "__main__":
    main()
