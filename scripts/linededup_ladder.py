"""Line-dedup scale ladder: wall time and removal accounting for
``operators/dedup.py::dedup_lines`` across a 16× synthetic corpus — the
measurement behind the claim that segment-grain dedup is the CHEAP
first pass (one segment-grain shuffle pair) a corpus pipeline runs
before the shingle-index span cut.

Corpora are synthesized deterministically in-engine (the
scripts/scale_ladder.py document family: 10-100 tokens over a 31-word
vocabulary, md5-derived choices), with every 25th doc an exact FULL
duplicate of an earlier doc — so every aligned segment of a planted dup
must be removed, an exactly checkable invariant at every rung.

Run: ``python scripts/linededup_ladder.py`` (~2-4 min on local[32]);
paste the table into SCALE.md's round-6 section.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

VOCAB = [f"w{i}" for i in range(31)]


def synth_documents(spark: SparkSession, n: int, dup_every: int = 25) -> DataFrame:
    """n deterministic docs of 10-100 tokens over a 31-word vocabulary,
    plus an exact FULL duplicate for every ``dup_every``-th doc (id
    offset by n) — aligned-segment-identical, so line dedup must remove
    every one of the copy's segments."""
    vocab_lit = "array(" + ",".join(f"'{w}'" for w in VOCAB) + ")"
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            f"concat_ws(' ', transform(sequence(1, "
            f"10 + cast(cast(conv(substr(md5(concat('L', id)), 1, 8), 16, 10) as bigint) % 91 as int)), "
            f"j -> element_at({vocab_lit}, 1 + cast(cast(conv(substr(md5(concat(id, '#', j)), 1, 8), 16, 10) as bigint) % 31 as int))))"
        ).alias("text"),
    )
    dups = base.filter(F.col("doc_id") % dup_every == 0).select(
        (F.col("doc_id") + n).alias("doc_id"), "text"
    )
    return base.unionAll(dups)


def main() -> None:
    from c_tran_data_pipeline_spark.operators.dedup import dedup_lines
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("linededup-ladder")
    rows = []
    for n in (100_000, 400_000, 1_600_000):
        docs = synth_documents(spark, n).persist()
        n_docs = docs.count()  # materialize before timing the operator
        t0 = time.perf_counter()
        agg = dedup_lines(docs, seg_words=10).agg(
            F.sum("n_segments").alias("segs"),
            F.sum("n_kept_segments").alias("kept"),
            F.sum((F.col("n_kept_segments") == 0).cast("long")).alias("fully_removed"),
        ).collect()[0]
        wall = time.perf_counter() - t0
        n_dups = n // 25  # planted full copies (ids n, n+25, ...)
        row = {
            "n_docs": n_docs,
            "segments": int(agg.segs),
            "kept": int(agg.kept),
            "removed_frac": round(1 - agg.kept / agg.segs, 4),
            "planted_full_dups": n_dups,
            "fully_removed_docs": int(agg.fully_removed),
            "wall_s": round(wall, 2),
        }
        # every planted copy is aligned-identical to its source: all its
        # segments lose first-wins, so it must land in fully_removed
        # (natural cross-doc segment collisions can only ADD to the count)
        assert row["fully_removed_docs"] >= n_dups, row
        rows.append(row)
        print(json.dumps(row))
        docs.unpersist()
    print(json.dumps({"ladder": rows}))


if __name__ == "__main__":
    main()
