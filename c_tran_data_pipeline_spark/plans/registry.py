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
    # ROUND-9 ROTATION (VERDICT.md r8 item 1). Order: (a) the two NEW r9
    # registrations (evidence-free by construction) — the end-to-end
    # cross-modal corpus-prep flagship and the incremental IVF-PQ index
    # append; then (b) the three queries whose PHYSICAL PLANS changed
    # this round (the hot-slice cap is live in the perceptual-hash
    # banding family and replayed in their oracles — values are
    # hash-verified unchanged at both SFs in this repo's sweeps, but
    # fresh driver rows close the loop); then (c) the FULL r03 cohort —
    # all 19 exact queries whose latest driver evidence is round 3 —
    # then (d) the alphabetically-first 26 of the r04 cohort to fill the
    # 50-row budget. tests/test_evidence_freshness.py makes this
    # rotation debt a RED TEST: any exact query whose latest committed
    # CORRECTNESS row is >5 rounds old must be in this round's gate.
    # (a) round-9 registrations:
    "q_corpus_prep_crossmodal",
    "q_ann_ivfpq_append",
    # (b) round-9 plan changes (hot-slice cap, VERDICT r8 #2):
    "q_pair_curation_crossmodal",
    "q_incremental_image_neardup",
    "q_crossmodal_clusters",
    # (c) the full r03-stale cohort:
    "q_debounce_events",
    "q_debounce_heartbeat",
    "q_disjunctive_revenue",
    "q_fk_orphans",
    "q_important_stock",
    "q_incremental_neardup",
    "q_min_cost_supplier",
    "q_minhash_estimate",
    "q_moving_average_24h",
    "q_neardup_degree",
    "q_negative_samples",
    "q_promo_revenue",
    "q_retrieval_metrics",
    "q_rolling_actives",
    "q_scd2_history",
    "q_session_overlap",
    "q_table_diff",
    "q_table_stats",
    "q_volume_shipping",
    # (d) oldest r04 names, alphabetical, filling the 50-row budget:
    "q_assoc_rules",
    "q_attribution",
    "q_autocorr_daily",
    "q_benford_audit",
    "q_cdc_chunks",
    "q_clustering_coeff",
    "q_conversion_latency",
    "q_corr_matrix",
    "q_cusum_changepoint",
    "q_dataset_card",
    "q_dedup_prefix_filter",
    "q_degree_assortativity",
    "q_dup_span_fraction",
    "q_event_transitions",
    "q_hits",
    "q_incremental_cdc",
    "q_interarrival_stats",
    "q_kcore",
    "q_ks_test",
    "q_label_prop",
    "q_large_orders",
    "q_linkage_score",
    "q_lm_score_kn",
    "q_lsh_quality",
    "q_mann_whitney",
    "q_modal_priority",
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
