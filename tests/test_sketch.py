"""operators/sketch.py count-min sketch: the grid must equal a
pure-Python replay of the same hash literals (the property the exact
SQL oracle of q_cms_heavy_hitters rests on), estimates must dominate
exact counts (collisions only ADD), and the error must respect the
εN bound on a skewed corpus."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.sketch import (
    CMS_A,
    CMS_B,
    CMS_P,
    build_cms,
    cms_estimate,
)

W, D = 64, 4  # small width so collisions are guaranteed in the tests


def _py_bucket(x, i, width):
    return ((x % CMS_P) * CMS_A[i] + CMS_B[i]) % CMS_P % width


def _py_grid(keys, width, depth):
    grid = {}
    for x in keys:
        for i in range(depth):
            c = (i, _py_bucket(x, i, width))
            grid[c] = grid.get(c, 0) + 1
    return grid


def _zipf_keys(n=4000, domain=300, seed=13):
    rng = random.Random(seed)
    # Zipf-ish: key k drawn with weight 1/(k+1)
    weights = [1.0 / (k + 1) for k in range(domain)]
    return rng.choices(range(domain), weights=weights, k=n)


def test_grid_matches_python_replay(spark):
    keys = _zipf_keys()
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    got = {
        (r["row"], r["bucket"]): r["n"]
        for r in build_cms(df, "user_id", width=W, depth=D).collect()
    }
    assert got == _py_grid(keys, W, D)


def test_estimate_dominates_exact_and_meets_bound(spark):
    keys = _zipf_keys()
    df = spark.createDataFrame([(k,) for k in keys], "user_id long")
    grid = build_cms(df, "user_id", width=W, depth=D)
    est = {
        r["user_id"]: r["est"]
        for r in cms_estimate(df.distinct(), grid, "user_id", width=W, depth=D).collect()
    }
    exact = {}
    for k in keys:
        exact[k] = exact.get(k, 0) + 1
    # replay expectation: est is exactly min over the replayed counters
    py = _py_grid(keys, W, D)
    for k, x in exact.items():
        want = min(py[(i, _py_bucket(k, i, W))] for i in range(D))
        assert est[k] == want
        assert est[k] >= x  # over-count only
    # CMS bound: err ≤ e/w · N with prob 1-e^-d per item; assert the
    # MEDIAN error is inside the bound (deterministic fixture, no flake)
    errs = sorted(est[k] - x for k, x in exact.items())
    n = len(keys)
    assert errs[len(errs) // 2] <= (2.718281828 / W) * n


def test_null_keys_skipped(spark):
    df = spark.createDataFrame([(1,), (None,), (1,), (None,)], "user_id long")
    grid = build_cms(df, "user_id", width=W, depth=D)
    assert grid.agg(F.sum("n")).collect()[0][0] == 2 * D  # only the two 1s
