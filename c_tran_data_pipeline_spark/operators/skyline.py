"""2-D skyline (Pareto frontier) — the classic multi-criteria OLAP
operator (Börzsönyi et al., ICDE 2001): rows not dominated by any other
row, where ``a`` dominates ``b`` iff a is ≥ b on BOTH axes and > on at
least one.

Reference parity: the C-Tran reference has no skyline operator — this is
north-star surface for curation workloads (pick documents Pareto-optimal
on quality × freshness; pick checkpoints optimal on loss × throughput).

The naive form is a quadratic NOT EXISTS self-join — fine for a 15k-row
oracle, fatal at 100 TB. The plan here is the standard grid-prune +
sort-scan decomposition, expressed declaratively:

1. ``distinct`` on the two axes (identical points never dominate each
   other; dedup also shrinks everything downstream).
2. **Grid prune** (the scale stage): bucket x into ``ceil(range/width)``
   cells, aggregate max(y) per bucket (one partial-aggregated shuffle of
   |buckets| rows), take the running max over STRICTLY higher buckets
   (a window over the tiny bucket table), broadcast it back. A point
   with a strictly-higher-bucket max-y ≥ its own y is dominated by some
   point with strictly greater x — drop it. This is a full linear scan
   + a bytes-sized broadcast; survivors are O(|buckets| + |skyline|)
   for non-adversarial distributions.
3. **Exact sort-scan** on the survivors: order by (x desc, y desc); a
   point is dominated iff max(y) over the preceding rows ≥ its y
   (preceding ⟺ strictly greater x, or equal x with strictly greater
   y — exactly the dominators, given step-1 dedup). One bounded
   single-partition window — the same O(n log n) sweep a single-node
   skyline would run, but over the pruned candidate set only.

Determinism: no arithmetic beyond floor(x/width) bucketing — the result
is a subset of the input rows, so values hash-match any engine that
agrees on comparison order (total order on both axes, no NaN/NULL —
callers filter those).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def skyline_2d(df: DataFrame, x: str, y: str, bucket_width: float | Column = 1000.0) -> DataFrame:
    """Pareto-maximal distinct (x, y) pairs of ``df`` (maximize both).

    ``bucket_width`` controls the grid-prune granularity on x: pick it
    so range(x)/width lands in the hundreds-to-thousands — the bucket
    table must stay broadcastable (it is aggregated, so correctness
    never depends on the choice, only prune effectiveness).

    Rows with NULL in either axis are dropped (NULL has no place in a
    dominance order).
    """
    pts = (
        df.select(F.col(x).alias("x"), F.col(y).alias("y"))
        .filter(F.col(x).isNotNull() & F.col(y).isNotNull())
        .distinct()
    )
    from c_tran_data_pipeline_spark.operators.rank import global_cummax

    b = pts.withColumn("__b", F.floor(F.col("x") / bucket_width))
    # max(y) over buckets STRICTLY above each bucket: every x there is
    # strictly greater than any x here (floor monotonicity), so
    # __hi >= y proves a dominator exists. The strictly-preceding running
    # max under desc(__b) goes through global_cummax (r8): the bucket
    # table is bytes-sized, but routing it through the range-partitioned
    # sweep removes the last unpartitioned WindowExec from this plan —
    # "strictly preceding" ⟺ strictly higher buckets because __b is
    # unique post-aggregation.
    bagg = b.groupBy("__b").agg(F.max("y").alias("__bymax"))
    brun = global_cummax(
        bagg, [F.desc("__b")], "__bymax", "__hi", inclusive=False
    ).select("__b", "__hi")
    cand = (
        b.join(F.broadcast(brun), "__b")
        .filter(F.col("__hi").isNull() | (F.col("__hi") < F.col("y")))
        .select("x", "y")
    )
    # Exact sweep: preceding rows under (x desc, y desc) are precisely
    # the potential dominators of the current row (ties on BOTH axes
    # were removed by distinct, so "preceding" is never an equal point).
    # The strictly-preceding running max is operators/rank.py's
    # global_cummax — range-partitioned, so even an adversarial
    # distribution that defeats the grid prune never funnels the
    # candidate set through one task.
    from c_tran_data_pipeline_spark.operators.rank import global_cummax

    swept = global_cummax(
        cand, [F.desc("x"), F.desc("y")], "y", "__pmax", inclusive=False
    )
    return (
        swept.filter(F.col("__pmax").isNull() | (F.col("__pmax") < F.col("y")))
        .select("x", "y")
    )
