"""Every registered query with an oracle must match DuckDB exactly at
sf0.001 (fast); the driver re-checks at sf0.01. This is the same compare
the driver's correctness gate runs: row count + column names +
order-insensitive canonical values."""

from __future__ import annotations

import pytest

from c_tran_data_pipeline_spark.oracle import compare_query
from c_tran_data_pipeline_spark.plans import all_queries

from tests.conftest import SF_SMOKE


def _names():
    return sorted(all_queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    r = compare_query(spark, name, SF_SMOKE)
    assert r.ok, r.detail


def test_every_rows_only_query_names_its_real_assertion():
    """A rows-only registration cannot land without naming its pytest
    proof: the driver's `no_oracle` rows are row-count smoke checks, so
    ROWS_ONLY_EVIDENCE (rendered into QUERIES.md) is the map from each
    oracle-less query to the assertion that actually verifies it."""
    from c_tran_data_pipeline_spark.oracle import ROWS_ONLY_EVIDENCE

    rows_only = {n for n, s in all_queries().items() if not s.oracle}
    missing = rows_only - set(ROWS_ONLY_EVIDENCE)
    stale = set(ROWS_ONLY_EVIDENCE) - rows_only
    assert not missing, f"rows-only queries without named evidence: {sorted(missing)}"
    assert not stale, f"evidence entries for unregistered queries: {sorted(stale)}"
    # every cited test file must exist
    import re
    from pathlib import Path

    for name, ev in ROWS_ONLY_EVIDENCE.items():
        for path in set(re.findall(r"tests/\w+\.py", ev)):
            assert Path("/root/repo", path).exists(), f"{name}: {path} missing"
