"""Query registry: every operator from SURVEY.md §2 (+ north-star
extensions) registered as a named (Spark builder, DuckDB oracle SQL) pair.

The driver runs each builder at sf=0.01 and compares against the oracle SQL
(row-count + schema + order-insensitive value hash), so:

- every computed column is aliased identically on both sides;
- float aggregates are made bit-stable across engines by summing in exact
  DECIMAL and casting the result to DOUBLE (associativity-proof), or by
  rounding where the quantity is a per-row IEEE op (deterministic);
- timestamps compare exactly because the Spark session is pinned to UTC.

Oracles marked ``None`` are genuinely non-SQL-expressible (streaming,
probabilistic LSH banding) — the driver records a weaker rows-only check
and the pytest suite carries the real assertion.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # ANSI SQL for DuckDB over the same parquet views
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}


def register(spec: QuerySpec) -> QuerySpec:
    if spec.name in _REGISTRY:
        raise ValueError(f"duplicate query name: {spec.name}")
    _REGISTRY[spec.name] = spec
    return spec


def query(name: str, oracle: str | None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator form: @query("q_x", "SELECT ...")."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        register(QuerySpec(name=name, builder=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags))
        return fn

    return deco


# Names the external correctness gate should evaluate FIRST, in this
# order. The gate records rows for exactly the first 50 names of
# ``all_queries()`` ordering per round (a hard cap or time budget), so
# dict ordering decides which queries get hard evidence each round.
# Round 3 closed the never-gated backlog; from round 4 on the list
# ROTATES STALE EVIDENCE (VERDICT.md r3 item 3): each round gates the
# 50 queries whose latest driver row is oldest, with new registrations
# (evidence-free by construction) leading.
_GATE_FIRST: tuple[str, ...] = (
    # ROUND-7 ROTATION (VERDICT.md r6 item 6). Order: (a) q_audio_mfcc —
    # the r6 hard-ERR row, now long-format and driver-hashable — plus the
    # five queries CONVERTED to exact oracles this round (their hash
    # evidence is new by construction: q_quality_classifier /
    # q_classifier_filter via the recursive-CTE training replay,
    # q_ann_lsh_topk / q_ann_neardup_lsh via the literal sign-matrix
    # banding twins, q_mmr_rerank via the greedy recursive CTE); then
    # (b) every remaining rows-only query (their driver evidence is
    # row-counts by design — refresh the counts each round); then (c)
    # the stalest exact-oracle rows (the r02 cohort) to fill the 50-row
    # budget. The whole registry is ALSO re-verified each session by
    # full oracle-CLI sweeps (VERIFICATION.md).
    # round-7 registrations (evidence-free by construction, lead):
    "q_hard_negatives",
    "q_hard_negatives_lsh",
    "q_source_overlap",
    "q_audio_mfcc",
    "q_quality_classifier",
    "q_classifier_filter",
    "q_ann_lsh_topk",
    "q_mmr_rerank",
    "q_ann_neardup_lsh",
    "q_ann_ivf_search",
    "q_ann_ivf_topk",
    "q_ann_ivfpq_build",
    "q_ann_ivfpq_search",
    "q_ann_ivfpq_topk",
    "q_ann_pq_search",
    "q_ann_pq_topk",
    "q_approx_distinct",
    "q_approx_percentiles",
    "q_audio_dsp",
    "q_audio_features",
    "q_bpe_merges",
    "q_bpe_token_counts",
    "q_frame_sample",
    "q_hll_vocab_union",
    "q_image_ahash_neardup",
    "q_image_phash_neardup",
    "q_incremental_semantic_dedup",
    "q_multimodal_features",
    "q_pack_sequences",
    "q_pca_project",
    "q_semantic_dedup",
    "q_tokenizer_fertility",
    "q_dedup_containment",
    "q_dedup_simhash",
    "q_dow_profile",
    "q_funnel_steps",
    "q_fuzzy_pairs",
    "q_group_moments",
    "q_hotspot_grid",
    "q_hybrid_search",
    "q_incremental_agg",
    "q_kernel_smooth",
    "q_label_centroids",
    "q_length_histogram",
    "q_lm_score",
    "q_longest_sessions",
    "q_mad_outliers",
    "q_order_priority_semijoin",
    "q_payload_chunks",
    "q_pii_scrub",
)


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that register their specs.
    from c_tran_data_pipeline_spark.plans import (  # noqa: F401
        analytics,
        curation_queries,
        decision_queries,
        dedup_queries,
        graph_queries,
        multimodal_queries,
        olap_queries,
        packing_queries,
        parity,
        scale_queries,
        similarity_queries,
        text_queries,
        warehouse_queries,
    )

    front = [n for n in _GATE_FIRST if n in _REGISTRY]
    rest = [n for n in _REGISTRY if n not in _GATE_FIRST]
    return {n: _REGISTRY[n] for n in [*front, *rest]}
