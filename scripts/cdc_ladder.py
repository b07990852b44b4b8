"""CDC chunking ladder: chunk-length distribution, shift-robustness, and
wall-time across a 16× corpus ladder — turning q_cdc_chunks' two claims
(geometric ~8-word chunks; boundaries re-align after an insertion, which
fixed-offset chunking cannot do) from argument into data.

Corpora are synthesized deterministically in-engine (md5-derived word
picks over a 301-word vocabulary, 60-260 words per doc); every 25th doc
gets a SHIFTED twin (one word prepended). For each rung we measure, for
the same twin set, the fraction of the parent's chunks recovered
verbatim by (a) content-defined boundaries and (b) fixed 8-word offset
chunking. Run: ``python scripts/cdc_ladder.py`` (~2 min on local[32]);
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


def synth_docs(spark: SparkSession, n: int, plant_every: int = 25) -> DataFrame:
    """n deterministic docs (60-260 words over a 301-word vocab) plus a
    one-word-prepended twin for every ``plant_every``-th id."""
    base = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.expr(
            "concat_ws(' ', transform(sequence(1,"
            " 60 + cast(conv(substr(md5(concat('len:', id)), 1, 8), 16, 10) as bigint) % 201),"
            " i -> concat('w', cast(cast(conv(substr(md5(concat(id, ':', i)), 1, 8), 16, 10)"
            " as bigint) % 301 as string))))"
        ).alias("text"),
    )
    twins = base.filter(F.col("doc_id") % plant_every == 0).select(
        (F.col("doc_id") + n).alias("doc_id"),
        F.concat(F.lit("INSERTED "), F.col("text")).alias("text"),
    )
    return base.unionAll(twins)


def chunk_hashes(df: DataFrame, fixed: bool) -> DataFrame:
    """(doc_id, chunk_hash) under content-defined or fixed-offset
    8-word chunking — the same expressions q_cdc_chunks uses."""
    base = df.select("doc_id", F.split(F.trim("text"), r"\s+").alias("tk")).filter(
        F.array_size("tk") >= 1
    )
    if fixed:
        chunks = F.filter(
            F.transform(
                F.sequence(F.lit(0), F.floor((F.array_size("tk") - 1) / F.lit(8)).cast("int")),
                lambda j: F.concat_ws(" ", F.slice(F.col("tk"), j * 8 + 1, 8)),
            ),
            lambda c: c != "",
        )
        wb = base
    else:
        bpos = F.filter(
            F.sequence(F.lit(1), F.array_size("tk")),
            lambda i: F.substring(F.md5(F.element_at(F.col("tk"), i)), 32, 1).isin("0", "8"),
        )
        wb = base.select("doc_id", "tk", bpos.alias("bpos"))
        start = lambda j: (  # noqa: E731
            F.when(j == 1, F.lit(1)).otherwise(
                F.element_at(F.col("bpos"), (j - 1).cast("int")) + 1
            )
        )
        end = lambda j: (  # noqa: E731
            F.when(j <= F.array_size("bpos"), F.element_at(F.col("bpos"), j.cast("int")))
            .otherwise(F.array_size("tk"))
        )
        chunks = F.filter(
            F.transform(
                F.sequence(F.lit(1), F.array_size("bpos") + 1),
                lambda j: F.concat_ws(
                    " ",
                    F.slice(F.col("tk"), start(j), F.greatest(end(j) - start(j) + 1, F.lit(0))),
                ),
            ),
            lambda c: c != "",
        )
    return wb.select("doc_id", F.explode(chunks).alias("chunk")).select(
        "doc_id", F.md5("chunk").alias("chunk_hash")
    )


def realign_fraction(g: DataFrame, n: int) -> float:
    """Of the twins' chunks, the fraction also present in the parent."""
    twins = g.filter(F.col("doc_id") >= n).select(
        (F.col("doc_id") - n).alias("parent"), "chunk_hash"
    )
    parents = g.filter(F.col("doc_id") < n).select(
        F.col("doc_id").alias("parent"), "chunk_hash"
    )
    total = twins.count()
    hit = twins.join(parents, ["parent", "chunk_hash"], "left_semi").count()
    return hit / total


def main() -> None:
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("cdc-ladder")
    spark.sparkContext.setLogLevel("ERROR")
    print(f"{'n_docs':>8} {'chunks':>9} {'mean_len':>8} {'cdc_realign':>11} "
          f"{'fixed_realign':>13} {'wall_s':>7}")
    for n in (2_000, 8_000, 32_000):
        docs = synth_docs(spark, n).localCheckpoint(eager=True)
        t0 = time.time()
        g = chunk_hashes(docs, fixed=False).localCheckpoint(eager=True)
        n_chunks = g.count()
        wall = time.time() - t0
        n_words = docs.select(
            F.sum(F.array_size(F.split(F.trim("text"), r"\s+")))
        ).collect()[0][0]
        cdc_re = realign_fraction(g, n)
        fixed_re = realign_fraction(chunk_hashes(docs, fixed=True), n)
        print(
            f"{n:>8} {n_chunks:>9} {n_words / n_chunks:>8.2f} "
            f"{cdc_re:>11.4f} {fixed_re:>13.4f} {wall:>7.2f}"
        )


if __name__ == "__main__":
    main()
