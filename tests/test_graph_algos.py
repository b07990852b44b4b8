"""operators/graph.py triangles / khop_distances / random_walks: each
algorithm against a brute-force pure-Python reference on handcrafted and
pseudo-random graphs, plus the determinism properties the exact oracles
rely on (partition-layout invariance, walk reproducibility)."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.graph import (
    WALK_MOD,
    khop_distances,
    random_walks,
    triangles,
)


def _edges_df(spark, pairs, n_parts=None):
    df = spark.createDataFrame(list(pairs), "a long, b long")
    return df.repartition(n_parts) if n_parts else df


def _brute_triangles(pairs):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    counts = {}
    for x, y, z in itertools.combinations(sorted(adj), 3):
        if y in adj[x] and z in adj[x] and z in adj[y]:
            for n in (x, y, z):
                counts[n] = counts.get(n, 0) + 1
    return counts


def test_triangles_k4_plus_tail(spark):
    # K4 (every node in C(3,2)=3 triangles) + a dangling path that adds none
    k4 = list(itertools.combinations([1, 2, 3, 4], 2))
    pairs = k4 + [(4, 5), (5, 6)]
    got = {r["node"]: r["n_triangles"] for r in triangles(_edges_df(spark, pairs)).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangles_matches_brute_force_random(spark):
    rng = random.Random(7)
    nodes = range(30)
    pairs = sorted(
        {tuple(sorted(p)) for p in itertools.combinations(nodes, 2) if rng.random() < 0.2}
    )
    want = _brute_triangles(pairs)
    got = {r["node"]: r["n_triangles"] for r in triangles(_edges_df(spark, pairs)).collect()}
    assert got == want


def test_triangles_partition_invariant(spark):
    rng = random.Random(11)
    pairs = sorted(
        {tuple(sorted(p)) for p in itertools.combinations(range(25), 2) if rng.random() < 0.25}
    )
    a = sorted(map(tuple, triangles(_edges_df(spark, pairs, 2)).collect()))
    b = sorted(map(tuple, triangles(_edges_df(spark, pairs, 17)).collect()))
    assert a == b


def _brute_bfs(pairs, seeds, max_hops):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    dist = {s: 0 for s in seeds}
    frontier = set(seeds)
    for h in range(1, max_hops + 1):
        frontier = {v for u in frontier for v in adj.get(u, ())}
        for v in frontier:
            dist.setdefault(v, h)
    return dist


def test_khop_chain_and_isolated_seed(spark):
    # chain 1-2-3-4-5-6, seed {1, 99} (99 isolated): dists 0,1,2,3 then cut
    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
    seeds = spark.createDataFrame([(1,), (99,)], "node long")
    got = {
        r["node"]: r["dist"]
        for r in khop_distances(_edges_df(spark, pairs), seeds, max_hops=3).collect()
    }
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 99: 0}


def test_khop_matches_brute_force_random(spark):
    rng = random.Random(3)
    pairs = sorted(
        {tuple(sorted(p)) for p in itertools.combinations(range(40), 2) if rng.random() < 0.08}
    )
    seeds = [0, 1, 2]
    want = _brute_bfs(pairs, seeds, 3)
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {
        r["node"]: r["dist"]
        for r in khop_distances(_edges_df(spark, pairs), sdf, max_hops=3).collect()
    }
    assert got == want


def _brute_walks(pairs, seeds, steps):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    rows = set()
    for w in seeds:
        cur = w
        rows.add((w, 0, w))
        for s in range(1, steps + 1):
            nbs = adj.get(cur)
            if not nbs:
                break
            cur = min(nbs, key=lambda nb: ((((cur % WALK_MOD) * 31 + s) * 31 + nb % WALK_MOD) % WALK_MOD, nb))
            rows.add((w, s, cur))
    return rows


def test_random_walks_match_python_replay(spark):
    rng = random.Random(5)
    pairs = sorted(
        {tuple(sorted(p)) for p in itertools.combinations(range(25), 2) if rng.random() < 0.15}
    )
    seeds = [0, 3, 7, 24]
    sdf = spark.createDataFrame([(s,) for s in seeds], "node long")
    got = {
        (r["walker"], r["step"], r["node"])
        for r in random_walks(_edges_df(spark, pairs), sdf, steps=3).collect()
    }
    assert got == _brute_walks(pairs, seeds, 3)


def test_random_walks_steps_are_edges_and_deterministic(spark):
    rng = random.Random(9)
    pairs = sorted(
        {tuple(sorted(p)) for p in itertools.combinations(range(30), 2) if rng.random() < 0.1}
    )
    eset = {tuple(sorted(p)) for p in pairs}
    sdf = spark.createDataFrame([(s,) for s in range(10)], "node long")
    a = sorted(
        map(tuple, random_walks(_edges_df(spark, pairs, 3), sdf, steps=3).collect())
    )
    b = sorted(
        map(tuple, random_walks(_edges_df(spark, pairs, 13), sdf, steps=3).collect())
    )
    assert a == b  # partition-layout invariant
    by_walker = {}
    for walker, step, node in a:
        by_walker.setdefault(walker, {})[step] = node
    for walker, path in by_walker.items():
        assert path[0] == walker
        for s in range(1, max(path) + 1):
            assert tuple(sorted((path[s - 1], path[s]))) in eset  # real edges


def _brute_hits(edges, iters=2):
    hubs = sorted({a for a, _ in edges})
    hub = {h: 1.0 for h in hubs}
    auth = {}
    for _ in range(iters):
        auth = {}
        for a, b in edges:
            auth[b] = auth.get(b, 0.0) + hub[a]
        t = sum(auth.values())
        auth = {k: v / t for k, v in auth.items()}
        hub = {}
        for a, b in edges:
            hub[a] = hub.get(a, 0.0) + auth[b]
        t = sum(hub.values())
        hub = {k: v / t for k, v in hub.items()}
    return hub, auth


def test_hits_matches_python_replay(spark):
    from c_tran_data_pipeline_spark.operators.graph import hits

    rng = random.Random(21)
    edges = sorted({(rng.randrange(8), 100 + rng.randrange(12)) for _ in range(40)})
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {(r["node"], r["kind"]): r["score"] for r in hits(df, iters=2).collect()}
    hub, auth = _brute_hits(edges)
    assert set(got) == {(n, "hub") for n in hub} | {(n, "authority") for n in auth}
    for n, s in hub.items():
        assert abs(got[(n, "hub")] - s) < 1e-9
    for n, s in auth.items():
        assert abs(got[(n, "authority")] - s) < 1e-9
    # L1 normalization: each side sums to 1
    assert abs(sum(v for (n, k), v in got.items() if k == "hub") - 1.0) < 1e-9


def test_hits_partition_invariant_bitwise(spark):
    from c_tran_data_pipeline_spark.operators.graph import hits

    rng = random.Random(22)
    edges = sorted({(rng.randrange(20), 100 + rng.randrange(30)) for _ in range(200)})
    a = sorted(map(tuple, hits(spark.createDataFrame(edges, "src long, dst long").repartition(2), iters=2).collect()))
    b = sorted(map(tuple, hits(spark.createDataFrame(edges, "src long, dst long").repartition(23), iters=2).collect()))
    assert a == b  # DECIMAL contribution sums: bit-equal across layouts


def _brute_lpa(edges, iters=2):
    nbrs = {}
    for a, b in edges:
        nbrs.setdefault(a, []).append(b)
        nbrs.setdefault(b, []).append(a)
    lab = {n: n for n in nbrs}
    for _ in range(iters):
        new = {}
        for n, ns in nbrs.items():
            cnt = {}
            for m in ns:
                cnt[lab[m]] = cnt.get(lab[m], 0) + 1
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            new[n] = best[0]
        lab = new
    return lab


def test_label_propagation_matches_python_replay(spark):
    from c_tran_data_pipeline_spark.operators.graph import label_propagation

    rng = random.Random(31)
    edges = sorted({tuple(sorted(rng.sample(range(40), 2))) for _ in range(120)})
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["community"] for r in label_propagation(df, iters=2).collect()}
    assert got == _brute_lpa(edges)


def test_label_propagation_two_cliques_converge(spark):
    from c_tran_data_pipeline_spark.operators.graph import label_propagation

    # two 5-cliques joined by one bridge edge: each clique must collapse
    # to a single community (its min node id) and stay distinct
    c1 = list(itertools.combinations(range(5), 2))
    c2 = list(itertools.combinations(range(10, 15), 2))
    edges = c1 + c2 + [(4, 10)]
    df = spark.createDataFrame(edges, "a long, b long")
    got = {r["node"]: r["community"] for r in label_propagation(df, iters=3).collect()}
    assert got == _brute_lpa(edges, iters=3)
    assert len({got[n] for n in range(5)}) == 1
    assert len({got[n] for n in range(10, 15)}) == 1
    assert got[0] != got[12]


def test_label_propagation_partition_invariant(spark):
    from c_tran_data_pipeline_spark.operators.graph import label_propagation

    rng = random.Random(32)
    edges = sorted({tuple(sorted(rng.sample(range(60), 2))) for _ in range(200)})
    a = sorted(map(tuple, label_propagation(
        spark.createDataFrame(edges, "a long, b long").repartition(2), iters=2).collect()))
    b = sorted(map(tuple, label_propagation(
        spark.createDataFrame(edges, "a long, b long").repartition(17), iters=2).collect()))
    assert a == b


# --------------------------------------------------------------------------
# kcore
# --------------------------------------------------------------------------


def _brute_kcore(pairs, k, peels):
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    for _ in range(peels):
        drop = {u for u in alive if sum(1 for v in adj[u] if v in alive) < k}
        alive -= drop
    return {u: sum(1 for v in adj[u] if v in alive) for u in alive}


def test_kcore_cascade_handcrafted(spark):
    from c_tran_data_pipeline_spark.operators.graph import kcore

    # K4 core {1,2,3,4} + a chain 4-5-6 that peels in CASCADE: 6 falls
    # round 1 (deg 1 < 2), which drops 5 to deg 1 → falls round 2.
    pairs = list(itertools.combinations([1, 2, 3, 4], 2)) + [(4, 5), (5, 6)]
    got = {r["node"]: r["deg"] for r in kcore(_edges_df(spark, pairs), k=2, peels=3).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    # one peel is NOT enough: node 5 still present after round 1
    got1 = {r["node"]: r["deg"] for r in kcore(_edges_df(spark, pairs), k=2, peels=1).collect()}
    assert 5 in got1 and 6 not in got1


def test_kcore_matches_brute_force_random(spark):
    from c_tran_data_pipeline_spark.operators.graph import kcore

    rng = random.Random(13)
    pairs = sorted(
        {tuple(sorted(p)) for p in itertools.combinations(range(40), 2) if rng.random() < 0.15}
    )
    for k, peels in ((3, 1), (3, 4), (4, 4)):
        want = _brute_kcore(pairs, k, peels)
        got = {
            r["node"]: r["deg"]
            for r in kcore(_edges_df(spark, pairs, n_parts=7), k=k, peels=peels).collect()
        }
        assert got == want, (k, peels)


def test_kcore_fixpoint_stable(spark):
    from c_tran_data_pipeline_spark.operators.graph import kcore

    # once at fixpoint, extra peels change nothing
    rng = random.Random(17)
    pairs = sorted(
        {tuple(sorted(p)) for p in itertools.combinations(range(25), 2) if rng.random() < 0.3}
    )
    a = sorted(map(tuple, kcore(_edges_df(spark, pairs), k=5, peels=8).collect()))
    b = sorted(map(tuple, kcore(_edges_df(spark, pairs), k=5, peels=12).collect()))
    assert a == b and len(a) > 0


# --------------------------------------------------------------------------
# bounded Bellman-Ford SSSP
# --------------------------------------------------------------------------


def _brute_sssp(wedges, seeds, rounds):
    # wedges: directed (u, v, w)
    dist = {s: 0 for s in seeds}
    for _ in range(rounds):
        nxt = dict(dist)
        for u, v, w in wedges:
            if u in dist and dist[u] + w < nxt.get(v, float("inf")):
                nxt[v] = dist[u] + w
        dist = nxt
    return dist


def test_sssp_weighted_vs_hops_divergence(spark):
    from c_tran_data_pipeline_spark.operators.graph import sssp_bounded

    # 1→2→3 costs 1+1=2; direct 1→3 costs 5: weighted picks the 2-hop path
    wedges = [(1, 2, 1), (2, 3, 1), (1, 3, 5)]
    df = spark.createDataFrame(wedges, "u long, v long, w long")
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.dist for r in sssp_bounded(df, seeds, rounds=3).collect()}
    assert got == {1: 0, 2: 1, 3: 2}
    got1 = {r.node: r.dist for r in sssp_bounded(df, seeds, rounds=1).collect()}
    assert got1[3] == 5  # one round can't relax through node 2 yet


def test_sssp_matches_brute_force_random(spark):
    import random

    from c_tran_data_pipeline_spark.operators.graph import sssp_bounded

    rng = random.Random(41)
    wedges = []
    for u in range(30):
        for v in range(30):
            if u != v and rng.random() < 0.1:
                wedges.append((u, v, rng.randint(1, 9)))
    seeds_l = [0, 7]
    df = spark.createDataFrame(wedges, "u long, v long, w long").repartition(5)
    seeds = spark.createDataFrame([(s,) for s in seeds_l], "node long")
    for rounds in (1, 3):
        want = _brute_sssp(wedges, seeds_l, rounds)
        got = {r.node: r.dist for r in sssp_bounded(df, seeds, rounds=rounds).collect()}
        assert got == want, rounds


def test_degree_assortativity_known_sign(spark):
    """Star graph: hub degree n, leaves degree 1 → every edge joins the
    extremes → strongly NEGATIVE assortativity; replay the exact value
    with numpy corrcoef."""
    import tempfile

    import numpy as np

    # build via the registered query's building blocks on a synthetic warehouse
    from c_tran_data_pipeline_spark.plans.graph_queries import q_degree_assortativity

    # orders/lineitem fixture: one urgent order per star edge (hub part 0, leaf i)
    orders, lis = [], []
    for i in range(1, 9):
        orders.append((i, 1, "O", 1.0, None, "1-URGENT"))
        lis.append((i, 0))
        lis.append((i, i))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.parquet(f"{d}/orders.parquet")
        spark.createDataFrame(lis, "l_orderkey long, l_partkey long").write.parquet(
            f"{d}/lineitem.parquet"
        )
        row = q_degree_assortativity(spark, d).collect()[0]
    # sym directed pairs: (8,1) ×8 and (1,8) ×8
    du = np.array([8] * 8 + [1] * 8, dtype=float)
    dv = np.array([1] * 8 + [8] * 8, dtype=float)
    want = float(np.corrcoef(du, dv)[0, 1])
    assert row.n_directed_edges == 16
    assert abs(row.assortativity - round(want, 12)) < 1e-9
    assert row.assortativity < -0.99


def test_clustering_coeff_triangle_plus_tail(spark):
    """Co-purchase graph planted as K3 (parts 1,2,3 in one urgent order)
    plus a pendant edge 3-4: triangle corners 1 and 2 score 1.0, the
    apex 3 scores 2*1/(3*2) = 1/3, and the degree-1 pendant 4 drops."""
    import datetime as dt
    import tempfile

    from c_tran_data_pipeline_spark.plans.graph_queries import q_clustering_coeff

    t = dt.datetime(1995, 1, 1)

    def line(ok, part):
        return (ok, part, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", t)

    li = [line(1, 1), line(1, 2), line(1, 3), line(2, 3), line(2, 4)]
    orders = [(1, 1, "O", 1.0, t, "1-URGENT"), (2, 1, "O", 1.0, t, "1-URGENT")]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            li,
            "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
            "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
            "l_returnflag string, l_linestatus string, l_shipdate timestamp",
        ).write.parquet(f"{d}/lineitem.parquet")
        spark.createDataFrame(
            orders,
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
        ).write.parquet(f"{d}/orders.parquet")
        out = {
            r.node: (r.degree, r.n_triangles, r.clustering_coeff)
            for r in q_clustering_coeff(spark, d).collect()
        }
    assert out[1] == (2, 1, 1.0)
    assert out[2] == (2, 1, 1.0)
    assert out[3] == (3, 1, round(1.0 / 3.0, 12))
    assert 4 not in out  # degree-1: coefficient undefined, excluded
