"""operators/rerank.py mmr_rerank: greedy MMR vs a pure-python replay,
the diversity property it exists to provide, and partition invariance."""

from __future__ import annotations

import math
import random


def _python_mmr(cands, k, lam):
    """cands: list of (qid, nid, rel, vec). Returns per-qid greedy trace
    [(nid, rank, score)] — plain-python floats, independent fold order
    from the numpy path (scores compared with tolerance, ids exactly)."""

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a)) or 1.0
        nb = math.sqrt(sum(x * x for x in b)) or 1.0
        return d / (na * nb)

    out = {}
    by_q = {}
    for qid, nid, rel, vec in cands:
        by_q.setdefault(qid, []).append((nid, rel, vec))
    for qid, rows in by_q.items():
        rows = sorted(rows)
        maxsim = {nid: 0.0 for nid, _, _ in rows}
        avail = {nid for nid, _, _ in rows}
        trace = []
        for r in range(1, min(k, len(rows)) + 1):
            best, best_score = None, -float("inf")
            for nid, rel, vec in rows:  # id order → first-wins ties
                if nid not in avail:
                    continue
                s = lam * rel - (1.0 - lam) * maxsim[nid]
                if s > best_score:
                    best, best_score, best_vec = nid, s, vec
            trace.append((best, r, best_score))
            avail.discard(best)
            for nid, _, vec in rows:
                maxsim[nid] = max(maxsim[nid], cos(vec, best_vec))
        out[qid] = trace
    return out


def _mk_cands(rng, n_q=4, n_c=12, dim=8):
    rows = []
    for q in range(n_q):
        for c in range(n_c):
            vec = [rng.uniform(-1, 1) for _ in range(dim)]
            rows.append((q, q * 100 + c, rng.uniform(0, 1), vec))
    return rows


def test_mmr_matches_python_replay(spark):
    from c_tran_data_pipeline_spark.operators.rerank import mmr_rerank

    rng = random.Random(41)
    rows = _mk_cands(rng)
    df = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, relevance double, embedding array<double>"
    )
    got = mmr_rerank(df, k=5, lam=0.7).collect()
    expect = _python_mmr(rows, k=5, lam=0.7)
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["mmr_rank"], r["mmr_score"])
        )
    assert set(by_q) == set(expect)
    for q in expect:
        trace = sorted(by_q[q], key=lambda t: t[1])
        assert [t[0] for t in trace] == [t[0] for t in expect[q]]
        for (nid, rk, s), (_, _, es) in zip(trace, expect[q]):
            assert abs(s - es) < 1e-9, (q, nid, rk, s, es)


def test_mmr_diversity_property(spark):
    from c_tran_data_pipeline_spark.operators.rerank import mmr_rerank

    # 3 near-identical high-relevance candidates vs 1 orthogonal,
    # slightly less relevant one: plain top-2-by-relevance takes two
    # clones; MMR must take one clone then the orthogonal candidate.
    rows = [
        (1, 10, 0.99, [1.0, 0.0, 0.0]),
        (1, 11, 0.98, [0.999, 0.01, 0.0]),
        (1, 12, 0.97, [0.998, 0.02, 0.0]),
        (1, 20, 0.80, [0.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, relevance double, embedding array<double>"
    )
    got = sorted(
        (r["mmr_rank"], r["neighbor_id"]) for r in mmr_rerank(df, k=2, lam=0.7).collect()
    )
    assert got == [(1, 10), (2, 20)]


def test_mmr_partition_invariant(spark):
    from c_tran_data_pipeline_spark.operators.rerank import mmr_rerank

    rng = random.Random(42)
    rows = _mk_cands(rng, n_q=6, n_c=20)
    schema = "query_id long, neighbor_id long, relevance double, embedding array<double>"
    a = sorted(
        map(tuple, mmr_rerank(spark.createDataFrame(rows, schema).repartition(2), k=5).collect())
    )
    b = sorted(
        map(tuple, mmr_rerank(spark.createDataFrame(rows, schema).repartition(31), k=5).collect())
    )
    assert a == b
    assert len(a) == 6 * 5


def test_mmr_k_exceeds_group(spark):
    from c_tran_data_pipeline_spark.operators.rerank import mmr_rerank

    rows = [(1, 10, 0.9, [1.0, 0.0]), (1, 11, 0.5, [0.0, 1.0])]
    df = spark.createDataFrame(
        rows, "query_id long, neighbor_id long, relevance double, embedding array<double>"
    )
    got = mmr_rerank(df, k=5).collect()
    assert len(got) == 2  # returns the whole group, ranked
