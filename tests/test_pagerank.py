"""q_pagerank (plans/scale_queries.py): the unrolled DataFrame fixpoint
must reproduce the textbook iteration exactly (numpy reference on a
handcrafted graph), conserve probability mass (no dangling nodes by
construction), and be shuffle-order-invariant (the DECIMAL contribution
sums are the repo's float policy applied to an iterative algorithm —
re-running under a different partition count must be bit-identical)."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F


def _tiny_fixture(spark, d):
    # urgent orders 1..3 by customers 1,1,2; lineitems map them to
    # suppliers 10,20,10 → bipartite graph c1-{s10,s20}, c2-{s10}
    orders = spark.createDataFrame(
        [(1, 1, "1-URGENT"), (2, 1, "1-URGENT"), (3, 2, "1-URGENT"), (4, 3, "5-LOW")],
        "o_orderkey long, o_custkey long, o_orderpriority string",
    )
    li = spark.createDataFrame(
        [(1, 10), (2, 20), (3, 10), (4, 30)], "l_orderkey long, l_suppkey long"
    )
    orders.write.parquet(f"{d}/orders.parquet")
    li.write.parquet(f"{d}/lineitem.parquet")


def _numpy_pagerank():
    # nodes: c:1, c:2, s:10, s:20 ; undirected edges c1-s10, c1-s20, c2-s10
    import numpy as np

    nodes = ["c:1", "c:2", "s:10", "s:20"]
    edges = [("c:1", "s:10"), ("c:1", "s:20"), ("c:2", "s:10")]
    adj = {n: [] for n in nodes}
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    r = {n: 1.0 / len(nodes) for n in nodes}
    for _ in range(3):
        nxt = {}
        for v in nodes:
            mass = sum(0.85 * r[u] / len(adj[u]) for u in adj[v])
            nxt[v] = 0.15 / len(nodes) + mass
        r = nxt
    return r


def test_pagerank_matches_reference_and_conserves_mass(spark):
    from c_tran_data_pipeline_spark.plans.scale_queries import q_pagerank

    with tempfile.TemporaryDirectory() as d:
        _tiny_fixture(spark, d)
        got = {r["node"]: r["rank"] for r in q_pagerank(spark, d).collect()}
    ref = _numpy_pagerank()
    assert set(got) == set(ref)
    for n, v in ref.items():
        assert abs(got[n] - v) < 1e-9, (n, got[n], v)
    # no dangling nodes ⇒ total mass stays 1
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # degree ordering: c:1 (deg 2) outranks c:2 (deg 1), s:10 outranks s:20
    assert got["c:1"] > got["c:2"] and got["s:10"] > got["s:20"]


def test_pagerank_partition_invariant(spark):
    from c_tran_data_pipeline_spark.plans.scale_queries import q_pagerank

    old = spark.conf.get("spark.sql.shuffle.partitions")
    with tempfile.TemporaryDirectory() as d:
        _tiny_fixture(spark, d)
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            a = sorted(map(tuple, q_pagerank(spark, d).collect()))
            spark.conf.set("spark.sql.shuffle.partitions", "3")
            b = sorted(map(tuple, q_pagerank(spark, d).collect()))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b  # bit-identical across shuffle layouts (DECIMAL sums)


def test_pagerank_checkpoint_path_identical(spark):
    """checkpoint_every only truncates lineage — results must be
    bit-identical to the pure-lineage run."""
    from c_tran_data_pipeline_spark.operators.graph import pagerank

    edges0 = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")], "src string, dst string"
    )
    edges = edges0.union(
        edges0.selectExpr("dst as src", "src as dst")
    ).distinct()
    plain = sorted(map(tuple, pagerank(edges, iters=4).collect()))
    ckpt = sorted(map(tuple, pagerank(edges, iters=4, checkpoint_every=2).collect()))
    assert plain == ckpt
