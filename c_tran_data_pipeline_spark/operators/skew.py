"""Skew-mitigation join operators.

AQE's skew-join splitting (session.py turns it on) handles MOST skew by
splitting oversized shuffle partitions at runtime — that is the first
line of defense and needs no code. Salting is the explicit fallback for
the cases AQE can't fix: a single join key so hot that even a split
partition re-concentrates on one reducer (AQE splits the big side's
partition but every split still matches the same small-side rows), or a
skewed aggregation (AQE skew handling only applies to joins).

``salted_join``: fan the hot keys out across ``salt`` sub-keys. The big
(skewed) side gets a deterministic salt derived from the whole row; the
small side is exploded ``salt``× so every (key, salt) bucket can match.
Result is EXACTLY the plain equi-join (oracle-checked by
q_skew_salted_join) — only the shuffle distribution changes: a key with
N rows lands on ``salt`` reducers with ~N/salt rows each, at the price
of replicating the small side ``salt``×.

``salted_agg_count``: two-phase aggregation for skewed group-bys —
partial agg on (key, salt), final agg on key. The partial shuffle
spreads hot keys over ``salt`` reducers; the final shuffle moves only
``salt`` pre-aggregated rows per key. (Spark's map-side partial
aggregation already does this per-partition; explicit salting matters
when the partial results themselves are too hot, e.g. high-cardinality
payloads per key such as collect_list.)

Reference context: the reference never joins at scale (its fact⋈dim join
runs in Postgres, tsvscript.py:29) — this operator exists for the 100 TB
path where e.g. a null-heavy or default-valued foreign key would melt a
reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side's hot keys fanned out over ``salt``
    sub-keys. Deterministic: the salt is a hash of the big side's full
    row, not a random draw, so replays/retries produce identical plans
    and results.

    Only inner/left(semi/anti) joins are result-invariant under salting
    — each big row carries exactly one salt. right/full would emit every
    unmatched small row ``salt`` times (it exists once per sub-key), so
    those are rejected rather than silently wrong."""
    if how not in ("inner", "left", "leftouter", "left_outer", "semi", "leftsemi",
                   "left_semi", "anti", "leftanti", "left_anti"):
        raise ValueError(f"salted_join: '{how}' join is not salt-invariant (use inner/left/semi/anti)")
    bsalt = F.pmod(F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(salt)).alias("__salt")
    b = big.select("*", bsalt)
    s = small.select(
        "*", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(salt)])).alias("__salt")
    )
    return b.join(s, keys + ["__salt"], how).drop("__salt")


def salted_agg_count(df: DataFrame, keys: list[str], salt: int = 16) -> DataFrame:
    """count(*) per key via (key, salt) partial + key final aggregation.
    Same result as ``df.groupBy(keys).count()``; the intermediate
    shuffle key space is ``salt``× wider, so one hot key cannot pin a
    single reducer."""
    salted = df.select(
        *keys, F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt)).alias("__salt")
    )
    partial = salted.groupBy(*keys, "__salt").agg(F.count(F.lit(1)).alias("__c"))
    return partial.groupBy(*keys).agg(F.sum("__c").alias("count"))
