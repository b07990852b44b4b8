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
    # ROUND-6 ROTATION (VERDICT.md r5 item 6: "Round 6's 50 rows should
    # be the 50 oldest-evidence queries"). Order: any round-6
    # registrations lead (evidence-free by construction, prepend at the
    # marker), then the 17 queries whose ONLY driver row is r01 (four
    # rounds stale), then the oldest r02 cohort (alphabetical) fills the
    # 50-row budget — q_hotspot_grid and q_kernel_smooth (the r5 bench
    # drifts) land inside the fold. The 17 remaining r02 names plus the
    # r03 cohort rotate in round 7. The whole registry is ALSO
    # re-verified each session by full oracle-CLI sweeps (VERIFICATION.md);
    # driver rows are the belt-and-suspenders layer being rotated.
    # -- ROUND6_NEW_MARKER --
    "q_dedup_lines",
    "q_image_phash_neardup",
    "q_tokenizer_fertility",
    "q_audio_mfcc",
    "q_kanon_audit",
    "q_hll_vocab_union",
    "q_ltv_recursive",
    "q_dp_counts",
    "q_classifier_filter",
    "q_quality_classifier",
    "q_ccnet_buckets",
    "q_late_shipment_priority",
    "q_dominant_supplier",
    "q_audio_dsp",
    "q_length_bucket_padding",
    "q_dsir_resample",
    "q_dsir_weights",
    # r01-only evidence (stale since round 1):
    "q_antijoin_absent",
    "q_approx_percentiles",
    "q_asof_nearest_purchase",
    "q_asof_next_purchase",
    "q_breadcrumb_conform",
    "q_conform_validate",
    "q_distinct_tuples",
    "q_enrich_merge",
    "q_first_wins_dedup",
    "q_flagship_hotspot",
    "q_flagship_hotspot_pm",
    "q_percentiles",
    "q_region_revenue",
    "q_running_total",
    "q_set_ops_cohorts",
    "q_tfidf_top_terms",
    "q_vocab_topk",
    # oldest r02 cohort (alphabetical):
    "q_ann_ivf_topk",
    "q_ann_lsh_buckets",
    "q_ann_lsh_topk",
    "q_ann_mrl_topk",
    "q_ann_neardup",
    "q_ann_neardup_lsh",
    "q_ann_pq_topk",
    "q_ann_topk",
    "q_ann_topk_arrow",
    "q_ann_topk_int8",
    "q_boilerplate_scrub",
    "q_chunk_documents",
    "q_cohort_retention",
    "q_dataset_fingerprint",
    "q_decontaminate",
    "q_decontaminate_semantic",
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
    "q_pack_sequences",
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
