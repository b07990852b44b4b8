"""Distributed PCA over an embedding column — the one-pass
Gram-aggregate recipe that scales to any corpus size.

The d×d covariance of n d-dimensional vectors is a SUM of per-row outer
products: one Arrow-batched pass computes per-partition partials
(count, Σx, ΣxxT as numpy in-memory matmuls), a keyed aggregate merges
them, and only the d(d+1)+1 merged statistics reach the driver — for
d=64 that is ~4 KB of driver state regardless of whether the corpus is
500 rows or 100 TB (the bounded-driver-state rule: same class as PQ
codebooks and IVF centroid tables). The d×d eigendecomposition then
runs driver-side in numpy (64×64 — microseconds) and the top-k
components re-enter the cluster as broadcast literals for the
projection pass.

Float caveat, stated honestly: partial Gram sums are IEEE reductions
whose low bits depend on partition layout, so PCA outputs are
tolerance-stable, not hash-stable — the registered query is rows-only
with pytest pins against a full-matrix numpy replay (the
q_ann_lsh_topk evidence discipline), unlike the DECIMAL-exact
sufficient-statistic queries (q_region_trend, q_corr_matrix) whose
scalar statistics admit exact transport.

Reference parity: no counterpart in the C-Tran reference (tabular
ETL); north-star surface for embedding-curation workloads (whitening,
redundancy probes, cheap 2-D corpus maps).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("i", T.IntegerType()),
        T.StructField("j", T.IntegerType()),
        T.StructField("val", T.DoubleType()),
    ]
)


def _gram_partials(vec_col: str):
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = None
        g = None
        for pdf in it:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            g = x.T @ x if g is None else g + x.T @ x
        if n == 0:
            yield pd.DataFrame(
                {
                    "i": np.array([], dtype="int32"),
                    "j": np.array([], dtype="int32"),
                    "val": np.array([], dtype="float64"),
                }
            )
            return
        d = s.shape[0]
        ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        # cell keys: (-1,-1) = count, (-2, j) = Σx_j, (i>=0, j) = Gram
        yield pd.DataFrame(
            {
                "i": np.concatenate(([-1], np.full(d, -2), ii.ravel())).astype("int32"),
                "j": np.concatenate(([-1], np.arange(d), jj.ravel())).astype("int32"),
                "val": np.concatenate(([float(n)], s, g.ravel())),
            }
        )

    return batches


def pca_stats(vecs: DataFrame, vec_col: str = "embedding") -> tuple[int, np.ndarray, np.ndarray]:
    """One distributed pass → (n, Σx, ΣxxT) merged on the cluster (keyed
    sum over (i, j) cells), with only d(d+1)+1 doubles collected."""
    partials = vecs.select(vec_col).mapInPandas(_gram_partials(vec_col), _PARTIAL_SCHEMA)
    merged = partials.groupBy("i", "j").agg(F.sum("val").alias("val")).collect()
    cells = {(r["i"], r["j"]): r["val"] for r in merged}
    n = int(cells.pop((-1, -1)))
    d = 1 + max(j for (i, j) in cells if i >= 0)
    s = np.array([cells[(-2, j)] for j in range(d)])
    g = np.array([[cells[(i, j)] for j in range(d)] for i in range(d)])
    return n, s, g


def pca_components(
    vecs: DataFrame, vec_col: str = "embedding", k: int = 2, center: bool = True
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(components [k×d], eigenvalues [k], mean [d]): top-k principal
    axes from the driver-side eigh of the d×d covariance (bounded
    driver state). Deterministic sign: each component's
    largest-|entry| coordinate is made positive."""
    n, s, g = pca_stats(vecs, vec_col)
    mean = s / n
    cov = g / n - (np.outer(mean, mean) if center else 0.0)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T
    for c in comps:
        if c[np.argmax(np.abs(c))] < 0:
            c *= -1.0
    return comps, evals[order], mean


def pca_project(
    vecs: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 2,
    center: bool = True,
) -> DataFrame:
    """(id, pc1..pck): project every vector onto the top-k principal
    axes. Two cluster passes total — one for the Gram statistics, one
    Arrow-batched numpy projection with the k×d component matrix
    shipped as a closure broadcast — and nothing corpus-sized ever
    nears the driver."""
    comps, _evals, mean = pca_components(vecs, vec_col, k, center)
    mu = mean if center else np.zeros_like(mean)
    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType())]
        + [T.StructField(f"pc{i + 1}", T.DoubleType()) for i in range(k)]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            x = np.stack(pdf[vec_col].to_numpy()).astype(np.float64) - mu
            p = x @ comps.T
            out = {id_col: pdf[id_col]}
            for i in range(k):
                out[f"pc{i + 1}"] = p[:, i]
            yield pd.DataFrame(out)

    return vecs.select(id_col, vec_col).mapInPandas(batches, out_schema)
