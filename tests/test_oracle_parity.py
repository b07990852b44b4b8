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
