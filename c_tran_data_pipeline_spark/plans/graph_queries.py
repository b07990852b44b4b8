"""Graph-analytics queries over the part co-purchase graph — triangle
counting, BFS reachability, deterministic random-walk sampling.

The graph: parts are nodes; an undirected edge joins two parts that
appear in the same URGENT order (the customer↔supplier trade graph used
by q_pagerank is bipartite, hence triangle-free — co-purchase is the
fixture's natural unipartite graph, ~23k edges at sf0.01). Each query
carries a full exact SQL oracle: the algorithms are deterministic by
construction (degree-ordered orientation, min-distance BFS, hash-argmin
walks), so the driver hash-match proves the iterative/one-shot Spark
plans equal the unrolled SQL on every round.

Reference parity: the C-Tran reference has no graph operators (its
breadcrumb pipeline is tabular end-to-end; SURVEY.md §2) — this module
is north-star surface for curation workloads (dedup-cluster audits,
walk-based corpus sampling, link-structure quality signals).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.graph import (
    WALK_MOD,
    khop_distances,
    random_walks,
    triangles,
)
from c_tran_data_pipeline_spark.plans.registry import query
from c_tran_data_pipeline_spark.sources.readers import load_table

# Shared oracle CTE: distinct co-purchase pairs (a < b) within urgent
# orders. The urgent filter keeps the per-order pair blow-up bounded
# (TPC-H orders have ≤7 lines, so pairs-per-order ≤ 21 — the self-join
# is linear in lineitem, not quadratic).
_EDGES_CTE = """
    e0 AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        JOIN orders o
          ON o.o_orderkey = a.l_orderkey AND o.o_orderpriority = '1-URGENT'
    )
"""


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct (a, b), a < b: parts co-purchased in an urgent order.
    One shuffle on l_orderkey feeds both the urgent semi-join and the
    within-order self-join (co-partitioned — Spark reuses the
    exchange), then one distinct keyed by the pair."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    lu = li.join(urgent, li.l_orderkey == urgent.o_orderkey, "left_semi")
    x, y = lu.alias("x"), lu.alias("y")
    return (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(F.col("x.l_partkey").alias("a"), F.col("y.l_partkey").alias("b"))
        .distinct()
    )


@query(
    "q_triangle_count",
    f"""
    WITH {_EDGES_CTE},
    deg AS (
        SELECT node, COUNT(*) AS deg
        FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
        GROUP BY 1
    ),
    ok AS (SELECT node, deg * 1000000000 + node AS okey FROM deg),
    eo AS (
        SELECT CASE WHEN ka.okey < kb.okey THEN e0.a ELSE e0.b END AS src,
               CASE WHEN ka.okey < kb.okey THEN e0.b ELSE e0.a END AS dst,
               greatest(ka.okey, kb.okey) AS dkey
        FROM e0
        JOIN ok ka ON ka.node = e0.a
        JOIN ok kb ON kb.node = e0.b
    ),
    wedge AS (
        SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
        FROM eo e1 JOIN eo e2 ON e1.src = e2.src AND e1.dkey < e2.dkey
    ),
    tri AS (
        SELECT x, y, z FROM wedge
        WHERE EXISTS (SELECT 1 FROM eo WHERE eo.src = wedge.y AND eo.dst = wedge.z)
    ),
    m AS (SELECT unnest([x, y, z]) AS node FROM tri)
    SELECT node, COUNT(*) AS n_triangles FROM m GROUP BY node
    """,
    doc="Per-node triangle counts over the co-purchase graph — the local "
    "clustering signal behind community/quality scoring. Spark plan is "
    "compact-forward with DEGREE-ORDERED orientation: every edge points "
    "(deg,id)-upward, so each triangle is generated once as a wedge at "
    "its smallest vertex + one closing-edge semi-join, and — the scale "
    "property — oriented out-degree is O(√m) even at power-law hubs "
    "(hub edges point INTO the hub), bounding the wedge join at "
    "O(m^1.5) total instead of Σdeg² exploding on the hottest key. "
    "Exact oracle: orientation, wedge join and closing semi-join are "
    "pure integer relational algebra — the SQL twin is the same "
    "dataflow unrolled, and counts hash-match bit-for-bit.",
    tags=("graph", "agg"),
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return triangles(_copurchase_edges(spark, sf_dir))


@query(
    "q_khop_reach",
    f"""
    WITH {_EDGES_CTE},
    seeds AS (SELECT DISTINCT p_partkey AS node FROM part WHERE p_size = 50),
    sym AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b AS u, a AS v FROM e0),
    d1 AS (SELECT DISTINCT sym.v AS node FROM sym JOIN seeds ON sym.u = seeds.node),
    d2 AS (SELECT DISTINCT sym.v AS node FROM sym JOIN d1 ON sym.u = d1.node),
    d3 AS (SELECT DISTINCT sym.v AS node FROM sym JOIN d2 ON sym.u = d2.node),
    lv AS (
        SELECT node, 0 AS dist FROM seeds
        UNION ALL SELECT node, 1 FROM d1
        UNION ALL SELECT node, 2 FROM d2
        UNION ALL SELECT node, 3 FROM d3
    )
    SELECT node, MIN(dist) AS dist FROM lv GROUP BY node
    """,
    doc="Minimum hop distance (≤3) from a seed set (parts of size 50) "
    "over the co-purchase graph — level-synchronous BFS as a DataFrame "
    "loop: each hop is ONE frontier⋈edges equi-join + distinct, so the "
    "per-round shuffle is bounded by |V| (node set), never by path "
    "count; dist = min level across the unioned frontiers, matching "
    "the unrolled SQL oracle exactly. The k-hop-neighborhood shape "
    "behind contamination blast-radius checks and GNN neighborhood "
    "sampling. At scale each frontier would localCheckpoint (the "
    "pagerank/connected_components lineage pattern, documented there); "
    "3 unrolled hops keep the lineage trivially shallow.",
    tags=("graph", "iterative"),
)
def q_khop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    seeds = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 50)
        .select(F.col("p_partkey").alias("node"))
    )
    return khop_distances(_copurchase_edges(spark, sf_dir), seeds, max_hops=3)


def _walk_step_sql(prev: str, step: int) -> str:
    """One unrolled hash-argmin walk step (SQL twin of the loop body in
    operators.graph.random_walks — identical literals and tie-break)."""
    p = WALK_MOD
    return f"""
    SELECT walker, cur FROM (
        SELECT {prev}.walker, sym.v AS cur,
               ROW_NUMBER() OVER (
                   PARTITION BY {prev}.walker
                   ORDER BY ((({prev}.cur % {p}) * 31 + {step}) * 31
                             + sym.v % {p}) % {p} ASC,
                            sym.v ASC) AS rn
        FROM {prev} JOIN sym ON sym.u = {prev}.cur
    ) WHERE rn = 1
    """


@query(
    "q_random_walk",
    f"""
    WITH {_EDGES_CTE},
    seeds AS (SELECT DISTINCT p_partkey AS node FROM part WHERE p_size = 1),
    sym AS (
        SELECT DISTINCT u, v FROM (
            SELECT a AS u, b AS v FROM e0
            UNION ALL SELECT b AS u, a AS v FROM e0)
    ),
    s0 AS (SELECT node AS walker, node AS cur FROM seeds),
    s1 AS ({_walk_step_sql("s0", 1)}),
    s2 AS ({_walk_step_sql("s1", 2)}),
    s3 AS ({_walk_step_sql("s2", 3)})
    SELECT walker, 0 AS step, cur AS node FROM s0
    UNION ALL SELECT walker, 1, cur FROM s1
    UNION ALL SELECT walker, 2, cur FROM s2
    UNION ALL SELECT walker, 3, cur FROM s3
    """,
    doc="Fixed-length (3-step) DETERMINISTIC pseudo-random walks from "
    "seed parts (p_size=1) over the co-purchase graph: each step moves "
    "to the neighbor minimizing a portable integer hash of (current "
    "node, step, neighbor) — node2vec-style corpus sampling made "
    "reproducible across engines, partitionings and reruns (the "
    "auditability property curation pipelines need; a seeded RNG "
    "cannot hash-match an oracle, a hash-argmin can). Each step is one "
    "equi-join on the frontier + a per-walker row_number argmin — no "
    "global sort, no driver loop state beyond the unrolled step count. "
    "Walk hash: (((cur%P)·31+s)·31+nb%P)%P, P=1000003 prime — every "
    "intermediate ≪ 2^63 in both engines (DuckDB overflow errors, so "
    "mod-first is load-bearing).",
    tags=("graph", "sample", "iterative"),
)
def q_random_walk(spark: SparkSession, sf_dir: str) -> DataFrame:
    seeds = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 1)
        .select(F.col("p_partkey").alias("node"))
    )
    return random_walks(_copurchase_edges(spark, sf_dir), seeds, steps=3)


_TRADE_CTE = """
    e0 AS (
        SELECT DISTINCT 'c:' || o_custkey AS src, 's:' || l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderpriority = '1-URGENT'
    )
"""


def _hits_iter_sql(prev_hub: str, i: int) -> str:
    """One unrolled HITS iteration (SQL twin of operators.graph.hits —
    same DECIMAL casts, same division order)."""
    return f"""
    a{i}r AS (
        SELECT e0.dst AS node, SUM(CAST({prev_hub}.score AS DECIMAL(38,18))) AS raw
        FROM e0 JOIN {prev_hub} ON {prev_hub}.node = e0.src
        GROUP BY e0.dst
    ),
    a{i} AS (
        SELECT node, CAST(raw AS DOUBLE)
               / CAST((SELECT SUM(raw) FROM a{i}r) AS DOUBLE) AS score
        FROM a{i}r
    ),
    h{i}r AS (
        SELECT e0.src AS node, SUM(CAST(a{i}.score AS DECIMAL(38,18))) AS raw
        FROM e0 JOIN a{i} ON a{i}.node = e0.dst
        GROUP BY e0.src
    ),
    h{i} AS (
        SELECT node, CAST(raw AS DOUBLE)
               / CAST((SELECT SUM(raw) FROM h{i}r) AS DOUBLE) AS score
        FROM h{i}r
    )"""


@query(
    "q_hits",
    f"""
    WITH {_TRADE_CTE},
    h0 AS (SELECT DISTINCT src AS node, CAST(1.0 AS DOUBLE) AS score FROM e0),
    {_hits_iter_sql("h0", 1)},
    {_hits_iter_sql("h1", 2)}
    SELECT node, 'hub' AS kind, ROUND(score, 12) AS score FROM h2
    UNION ALL
    SELECT node, 'authority' AS kind, ROUND(score, 12) AS score FROM a2
    """,
    doc="Kleinberg HITS (2 unrolled iterations) over the DIRECTED "
    "customer→supplier trade graph of urgent orders: hub scores flow "
    "along edges to authorities and back, L1-normalized each "
    "half-step. The second iterative-fixpoint-with-exact-oracle shape "
    "next to q_pagerank, exercising the other classic link-analysis "
    "recurrence (mutually recursive scores + per-step normalization "
    "against a 1-row broadcast scalar, rather than PageRank's "
    "teleport). Float policy: per-edge contributions summed in "
    "DECIMAL(38,18) (associativity-proof), normalization total is an "
    "exact DECIMAL scalar, one IEEE division per row — L1 instead of "
    "the textbook L2 keeps every score rational so the fixpoint "
    "hash-matches bit-for-bit (identical ranking either way; "
    "operators/graph.py hits docstring). Per half-step: one |E| "
    "contribution shuffle + a keyed agg + a scalar broadcast — the "
    "distributed HITS shape.",
    tags=("graph", "iterative"),
)
def q_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.graph import hits

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    e0 = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .join(li, orders.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c:"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s:"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
        # consumed by all four half-step joins — materialize the
        # orders⋈lineitem derivation once (q_pagerank pattern; lazy,
        # the first half-step's normalization scan materializes it)
        .localCheckpoint(eager=False)
    )
    out = hits(e0, iters=2)
    return out.select("node", "kind", F.round("score", 12).alias("score"))


def _kcore_peel_sql(prev: str, i: int, k: int) -> str:
    """One unrolled k-core peel (SQL twin of the loop body in
    operators.graph.kcore — same degree threshold, same semi-joins)."""
    return f"""
    k{i} AS (
        SELECT u FROM (SELECT u, COUNT(*) AS deg FROM {prev} GROUP BY u)
        WHERE deg >= {k}
    ),
    s{i} AS (
        SELECT s.u, s.v FROM {prev} s
        WHERE s.u IN (SELECT u FROM k{i}) AND s.v IN (SELECT u FROM k{i})
    )"""


@query(
    "q_kcore",
    f"""
    WITH {_EDGES_CTE},
    s0 AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b AS u, a AS v FROM e0),
    {_kcore_peel_sql("s0", 1, 12)},
    {_kcore_peel_sql("s1", 2, 12)},
    {_kcore_peel_sql("s2", 3, 12)},
    {_kcore_peel_sql("s3", 4, 12)}
    SELECT u AS node, COUNT(*) AS deg FROM s4 GROUP BY u
    """,
    doc="12-core of the co-purchase graph: 4 unrolled peel rounds, each "
    "dropping every node with current degree < 12 plus its edges, then "
    "the surviving nodes with their in-core degrees. The peel CASCADES "
    "— removing the fringe lowers its neighbors' degrees below k in "
    "later rounds (measured fixpoint depth 3 at sf0.001 / 4 at sf0.01, "
    "so peels=4 IS the true 12-core at both gate SFs) — which is why "
    "one degree filter is not enough and the oracle must unroll the "
    "iteration. Per round one |2E| degree shuffle + two node-keyed "
    "semi-joins; the dense-core-vs-sparse-fringe split behind "
    "collaboration-graph curation and spam/fringe pruning. Fixed round "
    "count keeps the SQL twin exact; the operator docstring covers "
    "converge-to-fixpoint usage.",
    tags=("graph", "iterative"),
)
def q_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.graph import kcore

    edges = _copurchase_edges(spark, sf_dir)
    return kcore(edges, k=12, peels=4)


def _lpa_iter_sql(prev: str, i: int) -> str:
    """One unrolled LPA iteration (SQL twin of
    operators.graph.label_propagation — same counts, same tie-break)."""
    return f"""
    c{i} AS (
        SELECT sym.u AS node, {prev}.community, COUNT(*) AS n
        FROM sym JOIN {prev} ON {prev}.node = sym.v
        GROUP BY sym.u, {prev}.community
    ),
    l{i} AS (
        SELECT node, community FROM (
            SELECT node, community,
                   ROW_NUMBER() OVER (PARTITION BY node
                                      ORDER BY n DESC, community ASC) AS rn
            FROM c{i}
        ) WHERE rn = 1
    )"""


@query(
    "q_label_prop",
    f"""
    WITH {_EDGES_CTE},
    sym AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b AS u, a AS v FROM e0),
    l0 AS (SELECT DISTINCT u AS node, u AS community FROM sym),
    {_lpa_iter_sql("l0", 1)},
    {_lpa_iter_sql("l1", 2)}
    SELECT node, community FROM l2
    """,
    doc="Community detection via synchronous majority label propagation "
    "(Raghavan et al. 2007), 2 unrolled iterations over the undirected "
    "co-purchase graph: every node starts as its own community, then "
    "repeatedly adopts its neighbors' most frequent label, ties to the "
    "smallest — the deterministic variant of LPA, so the result is an "
    "exact integer fixpoint (no floats, no randomness) and the driver "
    "hash-match proves the iterative Spark plan equals the unrolled SQL. "
    "The third iterative-graph shape next to q_pagerank (scored "
    "diffusion) and q_hits (mutually recursive normalization): here "
    "state is CATEGORICAL — per-iteration (node, label) exact counts + "
    "a per-node argmax window, both keyed on node, no global ordering. "
    "Per iteration: one |2E| hash join+shuffle and one partitioned "
    "window — linear in edges at any scale; the curation use is "
    "dedup-cluster / domain-community discovery over link graphs.",
    tags=("graph", "iterative"),
)
def q_label_prop(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.graph import label_propagation

    # consumed by both per-iteration joins — materialize the
    # orders⋈lineitem derivation once (q_pagerank pattern)
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint(eager=True)
    return label_propagation(edges, iters=2)


_WEDGES_CTE = """
    ew0 AS (
        SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b, a.l_orderkey AS ok
        FROM lineitem a
        JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        JOIN orders o
          ON o.o_orderkey = a.l_orderkey AND o.o_orderpriority = '1-URGENT'
    ),
    ew AS (SELECT a, b, COUNT(*) AS w FROM ew0 GROUP BY a, b)
"""


def _sssp_round_sql(prev: str, i: int) -> str:
    """One unrolled Bellman-Ford relaxation (SQL twin of the loop body
    in operators.graph.sssp_bounded — same min, same sum)."""
    return f"""
    r{i} AS (
        SELECT node, MIN(dist) AS dist FROM (
            SELECT node, dist FROM {prev}
            UNION ALL
            SELECT symw.v AS node, {prev}.dist + symw.w
            FROM {prev} JOIN symw ON symw.u = {prev}.node
        ) GROUP BY node
    )"""


@query(
    "q_sssp_weighted",
    f"""
    WITH {_WEDGES_CTE},
    symw AS (
        SELECT a AS u, b AS v, w FROM ew
        UNION ALL SELECT b AS u, a AS v, w FROM ew
    ),
    r0 AS (
        SELECT DISTINCT p_partkey AS node, 0 AS dist
        FROM part WHERE p_size = 50
    ),
    {_sssp_round_sql("r0", 1)},
    {_sssp_round_sql("r1", 2)},
    {_sssp_round_sql("r2", 3)}
    SELECT node, dist FROM r3
    """,
    doc="Weighted single-source-set shortest paths (3 unrolled "
    "Bellman-Ford relaxation rounds) over the co-purchase graph, edge "
    "weight = co-purchase multiplicity (# urgent orders containing the "
    "pair): min cumulative weight from the p_size=50 seed set — the "
    "weighted counterpart to q_khop_reach's hop-count BFS (same seeds, "
    "so the two results exhibit the hop-vs-weight divergence). Each "
    "round is one frontier⋈edges equi-join + a per-node MIN — state is "
    "O(V) (node, dist) rows, never path-enumerating; integer weights "
    "keep every distance exact, which is what lets a fixed-round "
    "Bellman-Ford prefix hash-match an unrolled SQL oracle. Full SSSP "
    "= |V|−1 rounds with periodic localCheckpoint (pagerank pattern); "
    "bounded rounds is also the honest production form for blast-"
    "radius / influence-cost queries at 100 TB.",
    tags=("graph", "iterative"),
)
def q_sssp_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.graph import sssp_bounded

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    lu = li.join(urgent, li.l_orderkey == urgent.o_orderkey, "left_semi")
    x, y = lu.alias("x"), lu.alias("y")
    ew = (
        x.join(
            y,
            (F.col("x.l_orderkey") == F.col("y.l_orderkey"))
            & (F.col("x.l_partkey") < F.col("y.l_partkey")),
        )
        .select(
            F.col("x.l_partkey").alias("a"),
            F.col("y.l_partkey").alias("b"),
            F.col("x.l_orderkey").alias("ok"),
        )
        .distinct()
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    symw = ew.select(
        F.col("a").alias("u"), F.col("b").alias("v"), "w"
    ).unionByName(ew.select(F.col("b").alias("u"), F.col("a").alias("v"), "w"))
    # consumed by all three relaxation joins — materialize once
    symw = symw.localCheckpoint(eager=True)
    seeds = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_size") == 50)
        .select(F.col("p_partkey").alias("node"))
    )
    return sssp_bounded(symw, seeds, rounds=3)


@query(
    "q_degree_assortativity",
    f"""
    WITH {_EDGES_CTE},
    deg AS (
        SELECT node, COUNT(*) AS deg
        FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
        GROUP BY 1
    ),
    sym AS (SELECT a AS u, b AS v FROM e0 UNION ALL SELECT b AS u, a AS v FROM e0),
    j AS (
        SELECT da.deg AS du, db.deg AS dv
        FROM sym JOIN deg da ON da.node = sym.u JOIN deg db ON db.node = sym.v
    ),
    s AS (
        SELECT COUNT(*) AS n,
               CAST(SUM(du) AS DOUBLE) AS s1, CAST(SUM(dv) AS DOUBLE) AS s2,
               CAST(SUM(du * du) AS DOUBLE) AS s11,
               CAST(SUM(dv * dv) AS DOUBLE) AS s22,
               CAST(SUM(du * dv) AS DOUBLE) AS s12
        FROM j
    )
    SELECT n AS n_directed_edges,
           ROUND((CAST(n AS DOUBLE) * s12 - s1 * s2)
                 / sqrt((CAST(n AS DOUBLE) * s11 - s1 * s1)
                        * (CAST(n AS DOUBLE) * s22 - s2 * s2)), 12) AS assortativity
    FROM s
    """,
    doc="Degree assortativity (Newman 2002) of the co-purchase graph: "
    "Pearson correlation between endpoint degrees over all directed "
    "edge instances — positive means hubs link hubs (social-network "
    "shape), negative means hubs link the fringe (web/biology shape); "
    "the one-number structural fingerprint used to sanity-check link "
    "graphs before walk sampling or dedup clustering. All sufficient "
    "statistics are exact INTEGER sums (degrees are ints — no decimal "
    "casts needed at fixture scale; swap to DECIMAL(38,0) sums beyond "
    "2^53 edge-degree mass), one degree agg + two node-keyed joins + "
    "one global 1-row aggregate; the correlation is a fixed-shape "
    "scalar expression rounded to 12 (q_corr_matrix policy).",
    tags=("graph", "agg", "stats"),
)
def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    e0 = _copurchase_edges(spark, sf_dir)
    deg = (
        e0.select(F.col("a").alias("node"))
        .unionByName(e0.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    sym = e0.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        e0.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    j = (
        sym.join(deg.select(F.col("node").alias("u"), F.col("deg").alias("du")), "u")
        .join(deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")), "v")
        .select("du", "dv")
    )
    s = j.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("du").cast("double").alias("s1"),
        F.sum("dv").cast("double").alias("s2"),
        F.sum(F.col("du") * F.col("du")).cast("double").alias("s11"),
        F.sum(F.col("dv") * F.col("dv")).cast("double").alias("s22"),
        F.sum(F.col("du") * F.col("dv")).cast("double").alias("s12"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        F.col("n").alias("n_directed_edges"),
        F.round(
            (nd * F.col("s12") - F.col("s1") * F.col("s2"))
            / F.sqrt(
                (nd * F.col("s11") - F.col("s1") * F.col("s1"))
                * (nd * F.col("s22") - F.col("s2") * F.col("s2"))
            ),
            12,
        ).alias("assortativity"),
    )


@query(
    "q_clustering_coeff",
    f"""
    WITH {_EDGES_CTE},
    deg AS (
        SELECT node, COUNT(*) AS deg
        FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
        GROUP BY 1
    ),
    ok AS (SELECT node, deg * 1000000000 + node AS okey FROM deg),
    eo AS (
        SELECT CASE WHEN ka.okey < kb.okey THEN e0.a ELSE e0.b END AS src,
               CASE WHEN ka.okey < kb.okey THEN e0.b ELSE e0.a END AS dst,
               greatest(ka.okey, kb.okey) AS dkey
        FROM e0
        JOIN ok ka ON ka.node = e0.a
        JOIN ok kb ON kb.node = e0.b
    ),
    wedge AS (
        SELECT e1.src AS x, e1.dst AS y, e2.dst AS z
        FROM eo e1 JOIN eo e2 ON e1.src = e2.src AND e1.dkey < e2.dkey
    ),
    tri AS (
        SELECT x, y, z FROM wedge
        WHERE EXISTS (SELECT 1 FROM eo WHERE eo.src = wedge.y AND eo.dst = wedge.z)
    ),
    m AS (SELECT unnest([x, y, z]) AS node FROM tri),
    nt AS (SELECT node, COUNT(*) AS n_triangles FROM m GROUP BY node)
    SELECT deg.node AS node, deg.deg AS degree,
           CAST(COALESCE(nt.n_triangles, 0) AS BIGINT) AS n_triangles,
           ROUND(2.0 * CAST(COALESCE(nt.n_triangles, 0) AS DOUBLE)
                 / (CAST(deg.deg AS DOUBLE) * CAST(deg.deg - 1 AS DOUBLE)), 12)
               AS clustering_coeff
    FROM deg LEFT JOIN nt ON nt.node = deg.node
    WHERE deg.deg >= 2
    """,
    doc="Local clustering coefficient per node: 2·triangles/(deg·(deg−1)) "
    "over the co-purchase graph — 'how much of my neighborhood knows "
    "each other', the community-density signal behind link-quality "
    "scoring and spam-subgraph detection (a link farm has sky-high "
    "degree but near-zero closure; organic communities close their "
    "wedges). Composes the two existing exact legs — the degree-"
    "ordered-orientation triangle counter (q_triangle_count's O(m^1.5) "
    "wedge join, reused verbatim) and the degree table its orientation "
    "already computes (Spark reuses that exchange) — with one LEFT "
    "join (triangle-free nodes score 0, kept: they're the signal) and "
    "ONE fixed-shape IEEE expression over exact integers, rounded 12. "
    "Nodes of degree < 2 have no defined coefficient and drop.",
    tags=("graph", "agg", "stats"),
)
def q_clustering_coeff(spark: SparkSession, sf_dir: str) -> DataFrame:
    e0 = _copurchase_edges(spark, sf_dir)
    deg = (
        e0.select(F.col("a").alias("node"))
        .unionByName(e0.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    nt = triangles(e0)
    return (
        deg.filter(F.col("deg") >= 2)
        .join(nt, "node", "left")
        .select(
            "node",
            F.col("deg").alias("degree"),
            F.coalesce(F.col("n_triangles"), F.lit(0)).cast("bigint").alias("n_triangles"),
            F.round(
                F.lit(2.0)
                * F.coalesce(F.col("n_triangles"), F.lit(0)).cast("double")
                / (F.col("deg").cast("double") * (F.col("deg") - 1).cast("double")),
                12,
            ).alias("clustering_coeff"),
        )
    )
