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
# Round-3 closed the never-gated backlog (all 144 queries have a row);
# from round 4 on the list ROTATES STALE EVIDENCE per VERDICT.md r3
# item 3: this round's new registrations lead (evidence-free by
# construction), then every query whose only driver row is from r01
# (44 — code has changed since), then the oldest r02 rows prioritizing
# queries whose plan changed this round (q_hybrid_search's hot-token
# threshold). Rolling this forward each round keeps every query's
# evidence ≤ 2 rounds old.
#
# Round-5 gate budget (50 rows): the ten round-4 registrations that
# rolled past round 4's budget LEAD (VERDICT r4 item 3), then the
# round-5 registrations (no prior evidence by construction), then the
# oldest stale cohort (r01-only evidence) fills the remainder. The
# whole registry is ALSO re-verified every session by full oracle-CLI
# sweeps at sf0.01 (twice, back-to-back — flake check) and sf0.1,
# recorded in VERIFICATION.md; driver rows are the belt-and-suspenders
# layer being rotated. ROUND-6 ROTATION: new r6 registrations first,
# then the remaining r01 cohort below the 50-row fold, then the r02
# cohort.
_GATE_FIRST: tuple[str, ...] = (
    # ROUND-5 ORDER. 1) The ten round-4 registrations that rolled past
    # the 50-row gate budget (never driver-gated; verified by oracle-CLI
    # runs at both SFs in VERIFICATION.md and by the r4 judge) — they
    # LEAD, per VERDICT.md r4 item 3:
    "q_khop_reach",
    "q_random_walk",
    "q_cms_heavy_hitters",
    "q_pagerank",
    "q_dedup_canonical",
    "q_bloom_prefilter_join",
    "q_phrase_search",
    "q_constraint_audit",
    "q_interpolate_linear",
    "q_bm25_rank_pruned",
    # 2) round-5 registrations (no prior evidence by construction):
    # (prepend new names here as they are registered)
    "q_incremental_semantic_dedup",
    "q_dedup_span_cut",
    "q_lorenz_curve",
    "q_bpe_merges",
    "q_bpe_token_counts",
    "q_forecast_revenue",
    "q_market_share",
    "q_product_profit",
    "q_returned_revenue",
    "q_variant_props",
    "q_lm_mix_weights",
    "q_feature_hashing",
    "q_lm_heldout",
    # -- ROUND5_NEW_MARKER --
    # 3) r01-only evidence (stale 4 rounds): the driver's 50-row budget
    #    covers the 10 above + the first ~40 of these; the remainder
    #    plus the r02/r04 cohorts rotate next round. Every name below
    #    is ALSO re-verified by oracle-CLI/pytest runs each session —
    #    driver rows are the belt-and-suspenders layer being rotated.
    "q_window_hourly",
    "q_profile_events",
    "q_text_tokens",
    "q_text_langid",
    "q_text_quality",
    "q_text_fingerprint",
    "q_train_split",
    "q_stratified_sample",
    "q_domain_cap",
    "q_corpus_prep",
    "q_corpus_prep_neardup",
    "q_incremental_ingest",
    "q_dedup_exact",
    "q_dedup_ngram_jaccard",
    "q_dedup_minhash_sig",
    "q_dedup_minhash_lsh",
    "q_dedup_clusters",
    "q_dedup_simhash_pairs",
    "q_binary_meta",
    "q_multimodal_features",
    "q_asof_prev_purchase",
    "q_asof_tolerance",
    "q_range_join_follows",
    "q_rollup_pricing",
    "q_cube_order_matrix",
    "q_grouping_sets_shipping",
    "q_approx_distinct",
    "q_set_ops_cohorts",
    "q_percentiles",
    "q_approx_percentiles",
    "q_running_total",
    "q_asof_next_purchase",
    "q_region_revenue",
    "q_asof_nearest_purchase",
    "q_vocab_topk",
    "q_tfidf_top_terms",
    "q_flagship_hotspot",
    "q_flagship_hotspot_pm",
    "q_conform_validate",
    "q_breadcrumb_conform",
    "q_distinct_tuples",
    "q_first_wins_dedup",
    "q_antijoin_absent",
    "q_enrich_merge",
    # 4) round-4 driver-gated names (freshest evidence, r04 rows):
    "q_lm_score_kn",
    "q_lsh_quality",
    "q_dataset_card",
    "q_incremental_cdc",
    "q_survival_curve",
    "q_semantic_dedup",
    "q_cdc_chunks",
    "q_linkage_score",
    "q_quantile_norm",
    "q_source_jsd",
    "q_mann_whitney",
    "q_cramers_v",
    "q_conversion_latency",
    "q_dup_span_fraction",
    "q_yoy_growth",
    "q_modal_priority",
    "q_interarrival_stats",
    "q_user_entropy",
    "q_session_ngrams",
    "q_chi2_independence",
    "q_rfm_segments",
    "q_ks_test",
    "q_large_orders",
    "q_top_supplier_share",
    "q_clustering_coeff",
    "q_repeated_ngrams",
    "q_zipf_fit",
    "q_autocorr_daily",
    "q_theilsen_trend",
    "q_trimmed_mean",
    "q_attribution",
    "q_pca_project",
    "q_assoc_rules",
    "q_cusum_changepoint",
    "q_image_ahash_neardup",
    "q_sssp_weighted",
    "q_corr_matrix",
    "q_degree_assortativity",
    "q_dedup_prefix_filter",
    "q_benford_audit",
    "q_seasonal_index",
    "q_kcore",
    "q_event_transitions",
    "q_sorted_neighborhood",
    "q_region_trend",
    "q_label_prop",
    "q_skyline_orders",
    "q_mmr_rerank",
    "q_hits",
    "q_triangle_count",
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
