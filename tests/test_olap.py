"""OLAP pack behavior not covered by the SQL oracle: the HLL++
approximate-distinct estimate must sit within its error bound of the
exact count (the oracle can't compare engine-specific sketches)."""

from __future__ import annotations

from c_tran_data_pipeline_spark.plans.olap_queries import q_approx_distinct
from tests.conftest import SF_SMOKE


def test_approx_distinct_error_bound(spark):
    rows = q_approx_distinct(spark, SF_SMOKE).collect()
    assert rows, "no event_type groups"
    for r in rows:
        # HLL++ with rsd=0.01; allow 3 standard deviations plus integer slack.
        tol = max(3, int(r.exact_users * 0.03))
        assert abs(r.approx_users - r.exact_users) <= tol, (
            f"{r.event_type}: approx {r.approx_users} vs exact {r.exact_users}"
        )
