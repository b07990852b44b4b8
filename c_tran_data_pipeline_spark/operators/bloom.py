"""Explicit bloom-filter runtime prefilter, built entirely from native
Column expressions.

Why this exists next to Spark's own injected runtime filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``, pinned in
tests/test_scale.py::test_runtime_bloom_filter_prunes_fact_scan): the
optimizer injection only fires inside a join that survives its cost
heuristics. An *explicit* bloom is the portable form of the same 100 TB
lever — usable ahead of any downstream operator (a pre-shuffle filter, a
sink, an exchange to another engine), with a guaranteed-compact build
side when the key set itself is too large to broadcast raw.

Construction (build side, one aggregation):

    key --xxhash64(seed_i, key)--> k bit positions in [0, m)
        --(word_idx = pos >> 6, mask = 1 << (pos & 63))-->
    groupBy(word_idx).agg(bit_or(mask))   -- <= m/64 rows

The m/64 aggregated words are collected to the driver (BOUNDED: the
bitmap size is a build *parameter* — m/64 int64s, e.g. 4 KiB at
m=2^18 — independent of corpus row count, same contract as the PQ
codebooks in operators/pq.py) and re-enter the probe plan as one array
literal, so the probe is a pure map-side filter: no shuffle, no
broadcast exchange, whole-stage codegen.

``might_contain`` can return false positives (rate ~= (1-e^{-kn/m})^k),
never false negatives; ``bloom_prefilter_semijoin`` therefore follows
the prefilter with the exact join, which only ever sees the surviving
sliver of the fact table. Reference context: the reference joins its
full fact table in Postgres (tsvscript.py:29) where selective-dim
pruning is the planner's problem; at 100 TB the prefilter is what keeps
the fact shuffle proportional to the match set, not the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["build_bloom", "might_contain", "bloom_prefilter_semijoin"]


def _positions(key: Column, n_hash: int, m_bits: int) -> list[Column]:
    """k independent bit positions: xxhash64 seeded by the hash index.
    m_bits is a power of two so the modulo is a bit-mask (stays in
    codegen as a single AND)."""
    assert m_bits & (m_bits - 1) == 0, "m_bits must be a power of two"
    return [
        F.xxhash64(F.lit(i), key).bitwiseAND(F.lit(m_bits - 1))
        for i in range(n_hash)
    ]


def build_bloom(keys: DataFrame, key_col: str, m_bits: int = 1 << 18, n_hash: int = 5) -> list[int]:
    """Aggregate the key column into an m_bits-wide bloom bitmap and
    return it as a dense list of m_bits/64 int64 words (driver-bounded
    by construction — see module doc)."""
    pos = F.explode(F.array(*_positions(F.col(key_col), n_hash, m_bits))).alias("pos")
    words = (
        keys.select(pos)
        .select(
            F.shiftright("pos", 6).alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("mask"),
        )
        .groupBy("word_idx")
        .agg(F.expr("bit_or(mask)").alias("word"))
        .collect()
    )
    dense = [0] * (m_bits // 64)
    for r in words:
        dense[r["word_idx"]] = r["word"]
    return dense


def might_contain(words: list[int], key: Column, m_bits: int, n_hash: int = 5) -> Column:
    """Probe predicate over the literal bitmap: true iff all k bits are
    set. Pure expression — constant-folded array literal + element_at,
    no join, no Python."""
    arr = F.lit(words)
    cond = None
    for pos in _positions(key, n_hash, m_bits):
        word = F.element_at(arr, F.shiftright(pos, 6).cast("int") + 1)
        # (1 << (pos & 63)) & word != 0 — shift amount is a Column, so go
        # through call_function (the F.shiftleft wrapper only takes ints)
        mask = F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int"))
        hit = word.bitwiseAND(mask) != 0
        cond = hit if cond is None else (cond & hit)
    return cond


def bloom_prefilter_semijoin(
    fact: DataFrame,
    keys: DataFrame,
    fact_key: str,
    build_key: str,
    m_bits: int = 1 << 18,
    n_hash: int = 5,
) -> DataFrame:
    """Fact rows whose key appears in ``keys``: bloom prefilter (map-side,
    no shuffle) followed by the exact semi join that removes the false
    positives — result-identical to the plain semi join, but the shuffle
    only carries the prefiltered sliver."""
    words = build_bloom(keys, build_key, m_bits=m_bits, n_hash=n_hash)
    pref = fact.filter(might_contain(words, F.col(fact_key), m_bits, n_hash))
    return pref.join(
        keys.select(F.col(build_key).alias(fact_key)).distinct(), on=fact_key, how="left_semi"
    )
