"""Distributed statistical moments from EXACT power sums.

Built-in ``stddev``/``corr`` stream Welford/co-moment updates whose
float result depends on fold order — fine for dashboards, but this
repo's contract is bit-reproducible results under ANY partitioning
(registry float policy). So moments are derived the textbook way
instead: aggregate the power sums Σx, Σx², Σy, Σy², Σxy in EXACT
DECIMAL (associative, partial-aggregated, one shuffle of |groups|
rows), convert each exact sum to double once, and evaluate

    var_x  = (n·Σx² − (Σx)²) / (n·(n−1))          (sample)
    corr   = (n·Σxy − Σx·Σy) / √(n·Σx²−(Σx)²) · √(n·Σy²−(Σy)²)

as per-group scalar arithmetic — deterministic IEEE ops on identical
operands in every engine. The classic caveat against this formula
(catastrophic cancellation in floating-point accumulation) does not
apply: the sums themselves are exact; only the final subtraction is
float, same as any other derivation from true moments.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def group_moments(
    df: DataFrame,
    group: str,
    x: str,
    y: str,
    x_decimal: str = "decimal(12,2)",
    y_decimal: str = "decimal(12,0)",
) -> DataFrame:
    """Per-group n / mean / sample-stddev of ``x`` and Pearson corr(x,y),
    bit-reproducible via exact-DECIMAL power sums. The decimal types must
    cover each column's true precision (defaults: 2-decimal telemetry
    values × integer time index); squares/products widen automatically
    and must stay ≤ 38 digits at the target row count."""
    xd = F.col(x).cast(x_decimal)
    yd = F.col(y).cast(y_decimal)
    agg = df.groupBy(group).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xd).cast("double").alias("__sx"),
        F.sum(xd * xd).cast("double").alias("__sxx"),
        F.sum(yd).cast("double").alias("__sy"),
        F.sum(yd * yd).cast("double").alias("__syy"),
        F.sum(xd * yd).cast("double").alias("__sxy"),
    )
    n = F.col("n").cast("double")
    vx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    vy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    cov = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    return agg.select(
        group,
        "n",
        F.round(F.col("__sx") / n, 6).alias(f"mean_{x}"),
        F.round(F.sqrt(vx / (n * (n - F.lit(1.0)))), 6).alias(f"stddev_{x}"),
        F.round(cov / (F.sqrt(vx) * F.sqrt(vy)), 6).alias(f"corr_{x}_{y}"),
    )
