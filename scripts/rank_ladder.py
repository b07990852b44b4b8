"""Global-rank ladder: wall-time and plan shape of operators/rank.py
global_rank across a 16× synthetic row ladder, against the
single-partition window form — turning the round-5 "no corpus through
one task" claim into data. Run: ``python scripts/rank_ladder.py``
(~3 min on local[32]); paste the table into SCALE.md.

The single-partition window is expected to WIN at tiny scale (its one
sort has no boundary-sampling job, no bucket exchange) and lose its
lead as rows grow — the crossover is the point: the scale-safe form's
cost is ~flat-per-row while the one-task sort serializes.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from pyspark.sql import SparkSession, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402


def main() -> None:
    from c_tran_data_pipeline_spark.operators.rank import global_rank
    from c_tran_data_pipeline_spark.session import get_spark

    spark: SparkSession = get_spark()
    print("| rows | single-partition window s | global_rank s | plans agree |")
    print("|---|---|---|---|")
    for n in (1_000_000, 4_000_000, 16_000_000):
        df = spark.range(n).select(
            F.col("id"), (F.xxhash64("id") % 1_000_003).alias("k")
        )
        t0 = time.monotonic()
        w = Window.orderBy("k", "id")
        sp = (
            df.select("id", F.row_number().over(w).alias("rn"))
            .agg(F.sum(F.col("rn").cast("bigint")).alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()[0]
        )
        t_sp = time.monotonic() - t0
        t0 = time.monotonic()
        gr = (
            global_rank(df, ["k", "id"], rank_col="rn")
            .agg(F.sum("rn").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()[0]
        )
        t_gr = time.monotonic() - t0
        # both must produce the full 1..n rank set: Σ = n(n+1)/2
        expect = n * (n + 1) // 2
        ok = sp["s"] == gr["s"] == expect and sp["c"] == gr["c"] == n
        print(f"| {n:,} | {t_sp:.1f} | {t_gr:.1f} | {ok} |")
        assert ok, (n, sp, gr, expect)


if __name__ == "__main__":
    main()
