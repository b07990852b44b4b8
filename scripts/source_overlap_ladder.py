"""Cross-source overlap scale ladder: wall time and join-volume
accounting for the `q_source_overlap` plan shape (distinct
(source, gram-fingerprint) table → fingerprint equi-join → pair
aggregate) across a 16× synthetic corpus — the measurement behind the
claim that the pair join is bounded by sources² per shared gram, never
by docs².

Corpora are synthesized deterministically in-engine (the
scripts/linededup_ladder.py document family: 10-100 tokens over a
31-word vocabulary, md5-derived choices) and split round-robin across
20 sources; the tiny vocabulary makes 5-grams COLLIDE across sources
heavily — the worst case for this operator — so the measured scaling
already includes hot shared grams.

The checkable invariant at every rung: the per-pair shared counts and
the output pair count are bounded by sources·(sources-1)/2 = 190, and
total candidate rows (pre-aggregate) equal Σ_gram k_g·(k_g-1)/2 with
k_g ≤ 20 — independently recomputed from the fingerprint table.

Run: ``python scripts/source_overlap_ladder.py`` (~2-4 min on
local[32]); paste the table into SCALE.md's round-7 section.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import functions as F  # noqa: E402

from scripts.linededup_ladder import synth_documents  # noqa: E402

N_SOURCES = 20


def main() -> None:
    from c_tran_data_pipeline_spark.functions.text import md5_long, shingles
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("source-overlap-ladder")
    rows = []
    for n in (100_000, 400_000, 1_600_000):
        docs = (
            synth_documents(spark, n, dup_every=n + 1)  # no planted dups here
            .select(
                F.concat(F.lit("src"), (F.col("doc_id") % N_SOURCES).cast("string")).alias("source"),
                "text",
            )
            .persist()
        )
        n_docs = docs.count()
        t0 = time.perf_counter()
        fp = (
            docs.select("source", F.explode(shingles("text", 5)).alias("g"))
            .select("source", md5_long(F.col("g")).alias("h"))
            .distinct()
        ).persist()
        sizes = fp.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
        a, b = fp.alias("a"), fp.alias("b")
        pairs = (
            a.join(b, on="h")
            .filter(F.col("a.source") < F.col("b.source"))
            .groupBy(F.col("a.source").alias("s1"), F.col("b.source").alias("s2"))
            .agg(F.count(F.lit(1)).alias("n_shared"))
        )
        out = pairs.collect()
        wall = time.perf_counter() - t0
        # independent candidate-volume accounting from the gram side:
        # Σ_g k_g(k_g-1)/2 over per-gram source counts k_g (≤ N_SOURCES)
        vol = (
            fp.groupBy("h").agg(F.count(F.lit(1)).alias("k"))
            .agg(F.sum(F.expr("k * (k - 1) / 2")).alias("cand"),
                 F.max("k").alias("max_k"),
                 F.count(F.lit(1)).alias("distinct_grams"))
            .collect()[0]
        )
        n_fp = fp.count()
        fp.unpersist()
        docs.unpersist()
        row = {
            "n_docs": n_docs,
            "distinct_source_grams": n_fp,
            "distinct_grams": int(vol.distinct_grams),
            "candidate_rows": int(vol.cand),
            "max_sources_per_gram": int(vol.max_k),
            "out_pairs": len(out),
            "sum_shared": int(sum(r.n_shared for r in out)),
            "wall_s": round(wall, 2),
        }
        assert row["out_pairs"] <= N_SOURCES * (N_SOURCES - 1) // 2
        assert row["sum_shared"] == row["candidate_rows"]
        assert row["max_sources_per_gram"] <= N_SOURCES
        rows.append(row)
        print(json.dumps(row))
    print(json.dumps({"ladder": rows}))


if __name__ == "__main__":
    main()
