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
# Refreshed for round 3 per VERDICT.md next-round item 1: exactly the
# 35 queries with NO row in CORRECTNESS_r01 ∪ r02 lead, followed by
# this round's new registrations (also evidence-free); positions past
# that fall to already-proven queries. Registry growth is deliberately
# throttled (< 15 new queries/round) until this backlog clears, so
# round 3 closes the every-query-has-a-row invariant.
_GATE_FIRST: tuple[str, ...] = (
    # never-gated backlog (r01 ∪ r02 have no row for these 35):
    "q_customer_order_distribution",
    "q_brand_supplier_counts",
    "q_waiting_orders",
    "q_idle_customers",
    "q_knn_label",
    "q_source_mix_report",
    "q_prefix_dedup",
    "q_token_budget_cap",
    "q_rolling_actives",
    "q_neardup_degree",
    "q_incremental_neardup",
    "q_quality_topp",
    "q_table_stats",
    "q_negative_samples",
    "q_psi_drift",
    "q_global_shuffle_shards",
    "q_min_cost_supplier",
    "q_scd2_history",
    "q_text_normalize",
    "q_frame_sample",
    "q_retrieval_metrics",
    "q_char_entropy",
    "q_volume_shipping",
    "q_promo_revenue",
    "q_disjunctive_revenue",
    "q_temperature_sample",
    "q_important_stock",
    "q_moving_average_24h",
    "q_ann_ivfpq_topk",
    "q_debounce_events",
    "q_stop_tokens",
    "q_langid_confusion",
    "q_session_overlap",
    "q_minhash_estimate",
    "q_bigram_pmi",
    # round-3 registrations — no prior evidence by construction:
    "q_debounce_heartbeat",
    "q_fk_orphans",
    "q_ann_ivfpq_build",
    "q_ann_ivfpq_search",
    "q_table_diff",
    "q_bm25_rank",
    "q_bpe_merge_candidates",
    "q_span_corruption",
    "q_grouped_kfold",
    "q_source_gini",
    "q_ann_pq_search",
    "q_ann_ivf_search",
    "q_audio_features",
)


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect modules that register their specs.
    from c_tran_data_pipeline_spark.plans import (  # noqa: F401
        analytics,
        curation_queries,
        decision_queries,
        dedup_queries,
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
