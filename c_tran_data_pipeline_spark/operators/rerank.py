"""Diversified retrieval rerank — greedy Maximal Marginal Relevance
(Carbonell & Goldstein, SIGIR 1998) over an ANN candidate set.

Reference parity: the C-Tran reference has no retrieval surface — this
is north-star surface for RAG / training-data curation: after candidate
generation, pick a top-k that trades relevance against redundancy
(λ·rel(d) − (1−λ)·max_sim(d, already-picked)), so near-duplicate
passages don't crowd out coverage.

Scale shape: the greedy loop is inherently sequential in k but only
WITHIN one query's candidate list — which is bounded (the ANN stage's
top-N, ~tens of rows). So the operator is an Arrow-batched
``applyInPandas`` grouped by query: each group does an N×N cosine matrix
+ k argmax sweeps in numpy (microseconds at N≤100), and groups
parallelize embarrassingly across queries/executors. The expensive,
corpus-sized part stays in the ANN candidate generator (equi-join
shapes, see operators/similarity.py) — MMR never touches the corpus.

Determinism: candidates are sorted by id inside each group before the
numpy pass, ties in the argmax resolve to the first (= smallest id),
and float64 arithmetic is fixed-order within a group — the output is
independent of partition layout (pinned in tests/test_rerank.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def mmr_rerank(
    candidates: DataFrame,
    k: int = 5,
    lam: float = 0.7,
    query_col: str = "query_id",
    id_col: str = "neighbor_id",
    rel_col: str = "relevance",
    vec_col: str = "embedding",
) -> DataFrame:
    """(query_id, neighbor_id, mmr_rank, mmr_score): greedy MMR top-k
    per query over ``candidates`` (one row per (query, candidate), with
    the candidate's embedding attached).

    mmr_score = λ·relevance − (1−λ)·max cosine to previously selected
    (0 for the first pick). Selection order IS the rank.

    Note the diversity penalty CLAMPS AT ZERO: the running maximum
    starts at 0.0, so a candidate whose similarity to every selected
    item is negative is scored as if orthogonal (λ·relevance), never
    REWARDED for anti-similarity. This is deliberate (an anti-similar
    outlier shouldn't outrank a more relevant orthogonal one) and is
    replicated by the registered query's DuckDB oracle
    (plans/similarity_queries.py _MMR_ORACLE: greatest(0.0, ...)).
    """
    import pandas as pd  # noqa: F401 — imported for the UDF closure

    out_schema = (
        f"{query_col} long, {id_col} long, mmr_rank int, mmr_score double"
    )

    def _pick(pdf):
        import numpy as np
        import pandas as pd

        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
        norms = np.sqrt((v * v).sum(axis=1))
        norms[norms == 0.0] = 1.0
        sim = (v @ v.T) / np.outer(norms, norms)
        rel = pdf[rel_col].to_numpy(dtype=np.float64)
        ids = pdf[id_col].to_numpy()
        n = len(pdf)
        avail = np.ones(n, dtype=bool)
        maxsim = np.zeros(n, dtype=np.float64)
        picked_ids, picked_scores = [], []
        for _ in range(min(k, n)):
            score = np.where(avail, lam * rel - (1.0 - lam) * maxsim, -np.inf)
            best = int(np.argmax(score))  # ties → first → smallest id
            picked_ids.append(ids[best])
            picked_scores.append(float(score[best]))
            avail[best] = False
            maxsim = np.maximum(maxsim, sim[:, best])
        return pd.DataFrame(
            {
                query_col: pdf[query_col].iloc[0],
                id_col: picked_ids,
                "mmr_rank": range(1, len(picked_ids) + 1),
                "mmr_score": picked_scores,
            }
        )

    return candidates.groupBy(query_col).applyInPandas(_pick, out_schema)
