"""Shuffle-free evaluate-once fence for expensive derived columns.

Why this exists: Spark's FilterExec intentionally skips common-
subexpression elimination (short-circuit evaluation makes it unsound in
general), and Catalyst's PushDownPredicate + CollapseProject rewrite

    project(expensive_expr AS c) → filter(p(c))

into a filter whose condition contains one full COPY of expensive_expr
per reference. Measured on q_conform_validate at sf0.1: the V1-V5
conjunctive filter expands to FIVE copies of
``VariantExpressionEvalUtils.parseJson(props)`` per row — 2.65 s vs
0.36 s with a fence (the whole plan's compute is 0.03 s; the rest was
re-parsing). The reference pipeline never hits this because it
materializes the conformed rows into Postgres before querying them.

Two fence flavors, by cost at scale:

- :func:`eval_once` — a Generate barrier: pack the row into a struct,
  ``explode(array(struct(...)))``, unpack. Predicates cannot push
  through a Generate whose output they reference, and CollapseProject
  cannot merge across it, so the projection below evaluates each
  column exactly once (ProjectExec DOES do subexpression elimination).
  NO exchange: partitioning and ordering are preserved, cost is one
  extra struct pack/unpack per row. This is the default — at 100 TB a
  fence that shuffles the whole table to avoid re-parsing would trade
  a CPU problem for a network one.
- ``df.repartition(n)`` — the exchange fence. Strictly stronger
  isolation (a real pipeline breaker) and locally slightly faster
  (0.36 s vs 0.73 s at sf0.1, where a 32-thread shuffle is nearly
  free), but it moves every byte. Use only when the next operator
  needs the shuffle anyway.

The trade-off: any fence blocks predicate pushdown to the scan. Fence
AFTER cheap pushable predicates (physical-column filters that can prune
parquet row groups) and BEFORE filters on expensive derived values
(variant/JSON extraction, regex, date parsing) — or, as here, when every
filtered column is derived and nothing was pushable to begin with.

Works under Structured Streaming (Generate is a stateless narrow op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def eval_once(df: DataFrame) -> DataFrame:
    """Force every column of ``df`` to be evaluated exactly once before
    downstream filters/projections reference it. Shuffle-free; preserves
    row order and partitioning; schema is unchanged."""
    cols = df.columns
    return df.select(F.explode(F.array(F.struct(*cols))).alias("__row")).select("__row.*")
