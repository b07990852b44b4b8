"""Full-output golden pins for four rows-only registered queries — the
multimodal golden treatment (EVERY sf0.01 row vs a committed file)
applied to the round-4 stragglers. Invariant tests catch broken
properties; a full-row golden also catches silently shifted VALUES
(a changed centroid seed, a flipped component, a dropped pair).

Float cells compare with |Δ| ≤ 1e-6 (partial-sum jitter across
partitionings is ≤ 1e-8 per the dedicated invariance tests); ids,
ranks, flags, and hammings compare exactly. PCA projections are
sign-canonicalized first (eigenvector sign is arbitrary). Regenerate
deliberately with scripts/gen_goldens.py."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from tests.conftest import SF_ORACLE
from tests.golden_utils import SORT_KEYS, assert_rows_match, canonical_rows


@pytest.mark.parametrize("name", sorted(SORT_KEYS))
def test_rows_only_query_matches_golden(spark, name):
    from c_tran_data_pipeline_spark.plans import all_queries

    p = Path(__file__).parent / "goldens" / f"{name}_sf0.01.json"
    with open(p) as f:
        golden = json.load(f)
    df = all_queries()[name].builder(spark, SF_ORACLE)
    assert list(df.columns) == golden["columns"]
    rows = canonical_rows(name, list(df.columns), [list(r) for r in df.collect()])
    assert_rows_match(golden["rows"], rows, golden["columns"])
