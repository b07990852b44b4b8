"""OLAP pack behavior not covered by the SQL oracle: the HLL++
approximate-distinct estimate must sit within its error bound of the
exact count (the oracle can't compare engine-specific sketches)."""

from __future__ import annotations

from c_tran_data_pipeline_spark.plans.olap_queries import q_approx_distinct
from tests.conftest import SF_ORACLE, SF_SMOKE


def test_approx_distinct_error_bound(spark):
    rows = q_approx_distinct(spark, SF_SMOKE).collect()
    assert rows, "no event_type groups"
    for r in rows:
        # HLL++ with rsd=0.01; allow 3 standard deviations plus integer slack.
        tol = max(3, int(r.exact_users * 0.03))
        assert abs(r.approx_users - r.exact_users) <= tol, (
            f"{r.event_type}: approx {r.approx_users} vs exact {r.exact_users}"
        )


def test_approx_percentiles_within_rank_error(spark):
    """percentile_approx(accuracy=10000) vs exact percentiles: the GK
    sketch guarantees rank error ≤ n/accuracy; with n≈2k per group the
    returned value must sit within a few neighboring order statistics —
    assert the coarse value bound |approx-exact| small relative to the
    group's value spread."""
    from c_tran_data_pipeline_spark.plans.registry import all_queries

    q = all_queries()
    exact = {r["event_type"]: r for r in q["q_percentiles"].builder(spark, SF_ORACLE).collect()}
    approx = {r["event_type"]: r for r in q["q_approx_percentiles"].builder(spark, SF_ORACLE).collect()}
    assert set(exact) == set(approx)
    for et, e in exact.items():
        a = approx[et]
        spread = max(e["p75"] - e["p25"], 1e-9)
        for p in ("p25", "p50", "p75"):
            assert abs(a[p] - e[p]) <= 0.1 * spread + 1e-6, (et, p, a[p], e[p])
