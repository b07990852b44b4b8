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
    from c_tran_data_pipeline_spark.operators.rank import global_rank, range_bounds
    from c_tran_data_pipeline_spark.session import get_spark

    spark: SparkSession = get_spark()
    skip_sp_above = 20_000_000  # the one-task sort at 64M is minutes of
    # serialized wall-time that proves nothing new — the 16M rung
    # already shows the divergence; pass RANK_LADDER_FULL=1 to force it.
    import os

    full = bool(os.environ.get("RANK_LADDER_FULL"))
    print("| rows | single-partition window s | global_rank s | plans agree |")
    print("|---|---|---|---|")
    for n in (1_000_000, 4_000_000, 16_000_000, 64_000_000):
        df = spark.range(n).select(
            F.col("id"), (F.xxhash64("id") % 1_000_003).alias("k")
        )
        expect = n * (n + 1) // 2
        if n <= skip_sp_above or full:
            t0 = time.monotonic()
            w = Window.orderBy("k", "id")
            sp = (
                df.select("id", F.row_number().over(w).alias("rn"))
                .agg(F.sum(F.col("rn").cast("bigint")).alias("s"), F.count(F.lit(1)).alias("c"))
                .collect()[0]
            )
            t_sp = f"{time.monotonic() - t0:.1f}"
            ok_sp = sp["s"] == expect and sp["c"] == n
        else:
            t_sp, ok_sp = "(skipped)", True
        t0 = time.monotonic()
        gr = (
            global_rank(df, ["k", "id"], rank_col="rn")
            .agg(F.sum("rn").alias("s"), F.count(F.lit(1)).alias("c"))
            .collect()[0]
        )
        t_gr = time.monotonic() - t0
        # both must produce the full 1..n rank set: Σ = n(n+1)/2
        ok = ok_sp and gr["s"] == expect and gr["c"] == n
        print(f"| {n:,} | {t_sp} | {t_gr:.1f} | {ok} |")
        assert ok, (n, gr, expect)

    # range_bounds driver-state probe at the knob a 100 TB deployment
    # turns: partitions=4096 over the 64M-row frame. Driver state is
    # (partitions-1) de-duplicated float64 boundaries per order column —
    # 8 B x 4095 = 32 KiB — plus approxQuantile's transient GK summary;
    # RSS delta bounds both.
    import resource

    df = spark.range(64_000_000).select(
        F.col("id"), (F.xxhash64("id") % 1_000_003).alias("k")
    )
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    t0 = time.monotonic()
    (b,) = range_bounds(df, ["k"], partitions=4096)
    t_b = time.monotonic() - t0
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    import sys as _sys

    print(
        f"range_bounds(partitions=4096, 64M rows): {len(b)} boundaries, "
        f"{_sys.getsizeof(b) + 8 * len(b)} list bytes, {t_b:.1f} s, "
        f"driver maxrss delta {max(0, rss1 - rss0)} KiB"
    )


if __name__ == "__main__":
    main()
