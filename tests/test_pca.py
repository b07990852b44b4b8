"""operators/pca.py: the distributed Gram-aggregate PCA against a
full-matrix numpy replay, partition invariance (the one-pass partial
sums must not depend on layout beyond float tolerance), and the
spectral contracts (orthonormal components, variance-ordered)."""

from __future__ import annotations

import numpy as np

from c_tran_data_pipeline_spark.operators.pca import (
    pca_components,
    pca_project,
    pca_stats,
)


def _toy(spark, n=200, d=16, seed=3, n_parts=None):
    rng = np.random.RandomState(seed)
    # anisotropic cloud: two dominant directions with known variance order
    base = rng.randn(n, d)
    base[:, 0] *= 6.0
    base[:, 1] *= 3.0
    base += rng.randn(d) * 2.0  # nonzero mean exercises centering
    rows = [(i, base[i].astype("float32").tolist()) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    x = np.stack([np.asarray(v, dtype=np.float64) for _, v in rows])
    return (df.repartition(n_parts) if n_parts else df), x


def test_gram_stats_exact_shapes(spark):
    df, x = _toy(spark, n=60, d=8)
    n, s, g = pca_stats(df)
    assert n == 60
    np.testing.assert_allclose(s, x.sum(axis=0), rtol=1e-12)
    np.testing.assert_allclose(g, x.T @ x, rtol=1e-12)


def test_projection_matches_numpy_replay(spark):
    df, x = _toy(spark)
    got = {r.vec_id: (r.pc1, r.pc2) for r in pca_project(df).collect()}
    mean = x.mean(axis=0)
    cov = (x - mean).T @ (x - mean) / x.shape[0]
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:2]
    comps = evecs[:, order].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    want = (x - mean) @ comps.T
    for i in range(x.shape[0]):
        np.testing.assert_allclose(got[i], want[i], atol=1e-8)


def test_partition_invariant(spark):
    df, _ = _toy(spark)
    a = {r.vec_id: (r.pc1, r.pc2) for r in pca_project(df).collect()}
    df7, _ = _toy(spark, n_parts=7)
    b = {r.vec_id: (r.pc1, r.pc2) for r in pca_project(df7).collect()}
    for i in a:
        np.testing.assert_allclose(a[i], b[i], atol=1e-8)


def test_components_orthonormal_and_variance_ordered(spark):
    df, x = _toy(spark)
    comps, evals, mean = pca_components(df, k=3)
    np.testing.assert_allclose(comps @ comps.T, np.eye(3), atol=1e-9)
    assert evals[0] >= evals[1] >= evals[2] > 0
    # planted anisotropy: pc1 variance clearly dominates
    assert evals[0] > 2 * evals[1]
    np.testing.assert_allclose(mean, x.mean(axis=0), rtol=1e-10)
