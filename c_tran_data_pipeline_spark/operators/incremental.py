"""Mergeable aggregate states: incremental materialized-view
maintenance. At 100 TB you never re-aggregate the historical corpus to
absorb a day's delta — you keep PARTIAL states (count, exact sum, min,
max: all associative+commutative) and merge the delta's states in, the
same algebra Spark's own partial aggregation uses map-side and the
streaming engine uses across micro-batches.

``summarize`` builds the state table for a batch; ``merge_states``
folds any number of state tables (historical + deltas) into one by
union + re-aggregate — one shuffle over |keys| rows, never over raw
events. AVG is derived at read time (sum/count) because AVG itself is
not mergeable. Sums carry exact DECIMAL so merged-vs-recomputed
equality is bit-stable regardless of merge order or partitioning.

The invariant the oracle pins: merge(summarize(A), summarize(B)) ==
summarize(A ∪ B), exactly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# (state column, per-row source expression builder, merge aggregate)
_STATE_SUM_DECIMAL = "decimal(30,6)"


def summarize(df: DataFrame, keys: list[str], value: str) -> DataFrame:
    """Per-key mergeable state for one measure column: count, exact
    DECIMAL sum, min, max. One partial-aggregated shuffle on the keys."""
    v = F.col(value)
    return df.groupBy(*keys).agg(
        F.count(v).alias("n"),
        F.sum(v.cast(_STATE_SUM_DECIMAL)).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
    )


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Fold state tables into one: union + re-aggregate with each
    component's merge function (count→sum, sum→sum, min→min, max→max).
    Cost is one shuffle over Σ|state rows| — independent of how many
    raw events each state summarizes, which is the entire point."""
    unioned = reduce(DataFrame.unionByName, states)
    return unioned.groupBy(*keys).agg(
        F.sum("n").alias("n"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
    )


def finalize(state: DataFrame) -> DataFrame:
    """Read-time view over a state table: derive the non-mergeable
    aggregates (mean) from the mergeable ones."""
    return state.select(
        *[c for c in state.columns if c not in ("n", "sum_v", "min_v", "max_v")],
        F.col("n"),
        F.col("sum_v").cast("double").alias("sum_value"),
        F.round(F.col("sum_v").cast("double") / F.col("n"), 6).alias("avg_value"),
        F.col("min_v").alias("min_value"),
        F.col("max_v").alias("max_value"),
    )


def snapshot_diff(
    old: DataFrame, new: DataFrame, keys: list[str], compare_cols: list[str]
) -> DataFrame:
    """Table reconciliation between two snapshots: one row per key whose
    state differs, tagged ``added`` / ``removed`` / ``changed`` — the
    CDC-derivation / migration-audit primitive (what changed between
    yesterday's and today's table, or between a source and its copy).

    ONE full outer join on the keys carrying only keys + compared
    columns (project before the join — the shuffle is audit-width, not
    row-width); classification is pure column logic on null-ness and
    null-safe inequality (eqNullSafe, so NULL→value transitions count
    as changes instead of vanishing under SQL null semantics). Values
    compare natively — no row-hash — so float formatting differences
    can't fake a diff. At 100 TB both sides shuffle once on the same
    key; with both snapshots bucketed on the key (sinks/bucketed.py)
    the join co-locates and the diff is exchange-free.

    Contract: ``keys`` must identify rows uniquely within each snapshot
    (the usual table-key invariant) — duplicate keys would make the
    outer join multiply rows and double-count diffs; run the snapshots
    through exact dedup first if that isn't guaranteed."""
    # Presence is tracked with a literal marker per side: with a full
    # outer join the keys coalesce and an absent side's columns are all
    # NULL, so a never-null sentinel is the unambiguous "this side had a
    # row" signal even when every compared column is legitimately NULL.
    o = old.select(
        *keys, F.lit(1).alias("__in_old"), *[F.col(c).alias(f"__o_{c}") for c in compare_cols]
    )
    n = new.select(
        *keys, F.lit(1).alias("__in_new"), *[F.col(c).alias(f"__n_{c}") for c in compare_cols]
    )
    j = o.join(n, on=keys, how="full")
    neq = F.lit(False)
    for c in compare_cols:
        neq = neq | ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}"))
    change = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(neq, F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*keys, "change")
    )
