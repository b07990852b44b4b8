"""Distributed full-batch logistic regression for document-quality
classification — the GPT-3/LLaMA-style learned quality filter (Brown et
al. 2020 Appendix A; Touvron et al. 2023 §2): positives from a curated
slice, negatives from the crawl, a linear model over cheap text
features, scores used to filter or importance-sample the corpus. The
reference pipeline has no learned component; this belongs to the
LLM-training-data extension surface (SURVEY.md §6).

Design for 100 TB:
- Each GD iteration is ONE aggregate job over a cached narrow
  projection (features + label only): the gradient of the logistic
  loss, sum_i (sigmoid(w.x_i) - y_i) * x_i, is a width-(d+2)
  partial-first reduction — map-side combine does almost all the work,
  the final exchange carries ONE row per partition. No shuffle at data
  grain, no driver-side row iteration; driver state is the weight
  vector (d+1 doubles).
- Determinism (the property the goldens pin): per-row gradient and
  loss contributions are ROUNDED to 12 dp and summed as exact
  DECIMAL(27,12), so partial-aggregation order — partition count,
  speculative retries, AQE coalescing — cannot move the result by even
  one bit. The weight trajectory is a pure function of the data.
  (An unrounded double sum would drift ~1e-13 per reshuffle and the
  drift COMPOUNDS through the weight updates across iterations.)
- At real scale the same aggregate runs mini-batched (TABLESAMPLE per
  iteration) or feeds L-BFGS with the identical gradient contract;
  full-batch GD is chosen here because its trajectory is exactly
  replayable for the cross-implementation tests.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: Fixed-point grain for per-row contributions. 12 dp keeps three
#: orders of magnitude below any meaningful gradient signal while
#: leaving 15 integer digits of headroom in DECIMAL(27,12) — a sum of
#: 1e12 rows of |contribution| <= 100 cannot overflow.
_GRAIN = "decimal(27,12)"

#: Sigmoid output clamp: keeps log() finite for extreme logits without
#: affecting any realistically-scaled feature (|z| < 27 is unclamped).
_EPS = 1e-12


def standardize(df: DataFrame, cols: list[str]) -> tuple[DataFrame, dict[str, tuple[float, float]]]:
    """Z-score ``cols`` using one exact-decimal moment aggregate.

    Means/variances come from DECIMAL sums of per-row values rounded to
    the 12-dp grain, so the standardization constants (and therefore
    everything trained downstream) are partition-order independent.
    Returns (standardized df, {col: (mean, std)}); zero-variance
    columns pass through unscaled (std treated as 1).
    """
    aggs = []
    for c in cols:
        x = F.col(c).cast("double")
        aggs.append(F.sum(F.round(x, 12).cast(_GRAIN)).alias(f"__s1_{c}"))
        aggs.append(F.sum(F.round(x * x, 12).cast(_GRAIN)).alias(f"__s2_{c}"))
    aggs.append(F.count(F.lit(1)).alias("__n"))
    row = df.agg(*aggs).first()
    n = row["__n"]
    stats: dict[str, tuple[float, float]] = {}
    out = df
    for c in cols:
        mu = float(row[f"__s1_{c}"]) / n
        var = max(float(row[f"__s2_{c}"]) / n - mu * mu, 0.0)
        sd = var**0.5 or 1.0
        stats[c] = (mu, sd)
        out = out.withColumn(c, (F.col(c).cast("double") - F.lit(mu)) / F.lit(sd))
    return out, stats


def _sigmoid(z: Column) -> Column:
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-z))


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 12,
    lr: float = 1.0,
) -> list[dict]:
    """Train logistic regression by full-batch gradient descent.

    ``df`` should be a cached narrow projection (features + label).
    Returns the per-iteration trajectory: a list of dicts
    ``{iteration, loss, weights: {feature: w, "__bias__": b}}`` where
    ``loss`` is the mean log-loss of the weights ENTERING the iteration
    (so iteration 1 records the null-model loss) and ``weights`` are
    the values AFTER that iteration's update. Deterministic bit-for-bit
    across partitionings (see module docstring).
    """
    if iters <= 0:
        raise ValueError(f"iters must be positive, got {iters}")
    n = df.count()
    if n == 0:
        raise ValueError("cannot train on an empty DataFrame")
    d = len(feature_cols)
    w = [0.0] * d
    b = 0.0
    y = F.col(label_col).cast("double")
    trajectory: list[dict] = []
    for it in range(1, iters + 1):
        z = F.lit(b)
        for j, c in enumerate(feature_cols):
            z = z + F.lit(w[j]) * F.col(c)
        p = _sigmoid(z)
        pc = F.least(F.greatest(p, F.lit(_EPS)), F.lit(1.0 - _EPS))
        err = p - y
        aggs = [
            F.sum(F.round(err * F.col(c), 12).cast(_GRAIN)).alias(f"__g{j}")
            for j, c in enumerate(feature_cols)
        ]
        aggs.append(F.sum(F.round(err, 12).cast(_GRAIN)).alias("__gb"))
        aggs.append(
            F.sum(
                F.round(-(y * F.log(pc) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - pc)), 12).cast(
                    _GRAIN
                )
            ).alias("__loss")
        )
        row = df.agg(*aggs).first()
        loss = float(row["__loss"]) / n
        for j in range(d):
            w[j] -= lr * float(row[f"__g{j}"]) / n
        b -= lr * float(row["__gb"]) / n
        trajectory.append(
            {
                "iteration": it,
                "loss": loss,
                "weights": {**{feature_cols[j]: w[j] for j in range(d)}, "__bias__": b},
            }
        )
    return trajectory
