"""Connected components over a pair list — the cluster-merge step that
completes every near-dup pipeline.

LSH/Jaccard stages emit PAIRS (a~b, b~c); deduplication needs CLUSTERS
({a,b,c} keeps one representative). Pair-pruning alone (keep d1<d2)
under-deletes: it would keep b if (a,b) and (b,c) were pruned through
different representatives. The closure is a connected-components
computation.

Spark-first shape: iterative min-label propagation as a DataFrame loop —
each round is one shuffle (neighbor-min groupBy + label join); labels
converge in O(component diameter) rounds, and near-dup clusters are
shallow (pairs come from shared buckets, so diameters are small — single
digits even at web scale). Each round ``localCheckpoint``s the labels:
truncating the lineage is what keeps round N's plan O(1) instead of
re-deriving rounds 1..N-1 (and re-reading the corpus) every iteration.

For adversarial graphs (long chains) the alternating large-star/
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce") converges in O(log n) rounds with the same per-round
primitives; min-propagation is the right default for dedup workloads
and keeps the loop body one join + one agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str = "d1", dst: str = "d2", max_iter: int = 25
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    component = min node id reachable — deterministic cluster
    representative. Undirected; converges when a full round changes no
    label (checked per round, one count on the changed set).

    Raises RuntimeError if ``max_iter`` rounds pass without convergence
    (a component with diameter > max_iter would otherwise return WRONG
    labels silently — the min propagates one hop per round). Dedup
    graphs converge in single digits; raise ``max_iter`` for
    long-chain graphs, or switch to large-star/small-star."""
    if max_iter < 1:
        raise ValueError("connected_components: max_iter must be >= 1")
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    sym = sym.distinct().localCheckpoint(eager=True)
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("component", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.b == labels.node)
            .groupBy("a")
            .agg(F.min("component").alias("neighbor_component"))
        )
        # lazy checkpoint: the convergence count below is the action that
        # materializes it, so each round runs ONE job (an eager checkpoint
        # would spend a second full job just to cache before counting)
        proposed = (
            labels.join(neighbor_min, labels.node == neighbor_min.a, "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce("neighbor_component", F.col("component")),
                ).alias("component"),
                (F.col("neighbor_component") < F.col("component")).alias("__changed"),
            )
        ).localCheckpoint(eager=False)
        n_changed = proposed.filter(F.col("__changed")).count()
        labels = proposed.drop("__changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: not converged after {max_iter} rounds "
        f"({n_changed} labels still changing) — raise max_iter"
    )


def connected_components_star(
    edges: DataFrame, src: str = "d1", dst: str = "d2", max_iter: int = 50
) -> DataFrame:
    """(node, component) via alternating large-star/small-star (Kiveris
    et al., "Connected Components in MapReduce and Beyond", SoCC'14):
    converges in O(log² n) rounds regardless of component DIAMETER, so it
    handles the adversarial long-chain graphs where one-hop-per-round
    min-propagation needs diameter rounds. Same per-round primitives
    (one groupBy + one join per star op); prefer ``connected_components``
    for dedup graphs (shallow components, fewer rounds, simpler loop).

    large-star(u): every neighbor v > u re-points to min(N(u) ∪ {u});
    small-star(u): every neighbor v ≤ u (and u itself) re-points to the
    min among them. Both strictly reduce total edge weight until the
    graph is a forest of stars rooted at component minima."""
    if max_iter < 1:
        raise ValueError("connected_components_star: max_iter must be >= 1")

    def _large(e: DataFrame) -> DataFrame:
        m = e.groupBy("u").agg(F.min("v").alias("mv")).select(
            "u", F.least("mv", "u").alias("m")
        )
        return (
            e.filter(F.col("v") > F.col("u"))
            .join(m, "u")
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )

    def _small(e: DataFrame) -> DataFrame:
        low = e.filter(F.col("v") <= F.col("u"))
        m = low.groupBy("u").agg(F.min("v").alias("m"))
        re_pointed = (
            low.join(m, "u")
            .filter(F.col("v") != F.col("m"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
        )
        self_edge = m.select(F.col("u"), F.col("m").alias("v"))
        return re_pointed.unionByName(self_edge)

    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        # symmetrize before each star op: both ops read full neighborhoods
        sym = e.unionByName(e.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
        after_large = _large(sym).distinct()
        sym2 = after_large.unionByName(
            after_large.select(F.col("v").alias("u"), F.col("u").alias("v"))
        ).distinct()
        new_e = _small(sym2).filter(F.col("u") != F.col("v")).distinct().localCheckpoint(eager=True)
        changed = new_e.exceptAll(e).limit(1).count() + e.exceptAll(new_e).limit(1).count()
        e = new_e
        if changed == 0:
            # stars: every edge points child → component min
            members = e.select(F.col("u").alias("node"), F.col("v").alias("component"))
            roots = e.select(F.col("v").alias("node")).distinct().withColumn(
                "component", F.col("node")
            )
            return members.unionByName(roots).distinct()
    raise RuntimeError(
        f"connected_components_star: not converged after {max_iter} rounds"
    )


def dedup_clusters(
    pairs: DataFrame,
    src: str = "d1",
    dst: str = "d2",
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Near-dup clusters from candidate pairs: every clustered doc with
    its representative (cluster min) — downstream keeps rows where
    doc_id == component (or anti-joins the rest away).

    Candidate-pair graphs are tiny relative to the corpus (LSH emits
    pairs only where buckets collide), so when the pair list fits the
    ``local_threshold`` bound it is solved with a driver-side union-find
    instead of the iterative star loop: identical labels (component =
    min member), but ONE job instead of diameter-many shuffle rounds —
    the same "finish the small frontier locally" cutover Pregel systems
    use. The collect is bounded driver state by construction (ids only,
    ≤ threshold rows — the codebook/probed-cell class, not a corpus
    collect). Graphs above the bound run the distributed
    min-propagation loop unchanged; pass ``local_threshold=0`` to force
    it."""
    if local_threshold:
        # ONE bounded job decides AND delivers: collect at most
        # threshold+1 pair rows (limit short-circuits the scan, so
        # graphs far above the bound never pay a full materialization).
        # If the bound holds, the collected rows ARE the union-find
        # input — small graphs pay a single job instead of the former
        # probe-then-collect double scan (measured ~0.9 s on
        # q_dedup_clusters at sf0.1).
        narrow = pairs.select(F.col(src), F.col(dst))
        # localCheckpoint BEFORE collect: truncating the lineage keeps
        # Catalyst's union constraint rewriter out of the collect path —
        # Spark 4.1.2's UnionBase.rewriteConstraints throws
        # NoSuchElementException on some self-referencing union + Arrow
        # grouped-map lineages when the bounded pair list is collected
        # directly (hit via semantic_dedup). The checkpointed frame is
        # ≤ threshold+1 rows, so materializing it is the probe itself.
        rows = narrow.limit(local_threshold + 1).localCheckpoint(eager=True).collect()
        if len(rows) <= local_threshold:
            return _local_components_rows(
                pairs.sparkSession, rows, dict(narrow.dtypes)[src]
            )
    return connected_components(pairs, src=src, dst=dst).select(
        F.col("node").alias("doc_id"), "component"
    )


def _local_components_rows(spark, rows, id_type: str) -> DataFrame:
    """Driver union-find over a bounded, already-collected pair list;
    returns (doc_id, component=min member) with the source id type."""
    import pyspark.sql.types as T

    parent: dict = {}

    def find(x):
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    for row in rows:
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[rb] = ra
    members: dict = {}
    for node in parent:
        members.setdefault(find(node), []).append(node)
    out = []
    for group in members.values():
        rep = min(group)
        out.extend((n, rep) for n in group)
    schema = T.StructType.fromDDL(f"doc_id {id_type}, component {id_type}")
    return spark.createDataFrame(out, schema)


def pagerank(
    edges: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
    teleport: float = 0.15,
    checkpoint_every: int = 0,
) -> DataFrame:
    """(node, rank) after ``iters`` synchronous PageRank iterations over
    a DIRECTED edge list (src, dst) — pass both directions for an
    undirected graph, which also guarantees no dangling mass. Each
    iteration is join(rank ⋈ edges ⋈ out-degree) → per-dst aggregate.
    ``teleport`` is a SEPARATE literal rather than 1-damping because
    IEEE 1.0-0.85 = 0.15000000000000002, which would diverge from an
    oracle that writes the literal 0.15 — pass both explicitly.
    per-edge contributions are cast to DECIMAL(38,18) before the sum so
    the fixpoint is bit-identical across shuffle layouts and engines
    (the repo's float policy; q_pagerank carries the exact unrolled SQL
    oracle). Lineage grows linearly in ``iters`` — set
    ``checkpoint_every`` (e.g. 5) to localCheckpoint the rank relation
    periodically for long runs, same pattern as connected_components.
    Nodes with no in-edges (impossible for symmetrized input) would
    drop out; dangling out-mass is NOT redistributed — symmetrize or
    pre-filter accordingly."""
    nodes = edges.select(F.col("src").alias("node")).unionByName(
        edges.select(F.col("dst").alias("node"))
    ).distinct()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    n = nodes.count()  # scalar literal; bounded driver state (node count)
    pr = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    # src_deg is consumed by EVERY iteration's join. Without the pin the
    # round-9 before-plan re-derived AND re-shuffled the edges⋈degree
    # subtree once per iteration (20 Exchanges, no ReusedExchange at
    # iters=3). Repartition by the join key FIRST, then a lazy
    # localCheckpoint: the LogicalRDD keeps its HashPartitioning(src),
    # so every iteration's join shuffles only the O(V) rank side — the
    # O(E) side moves over the network exactly once for the whole run
    # (guide §2.4/§3.3; caching the edge relation is the standard
    # iterative-graph trade, cf. GraphX). Lazy: iteration 1's job is
    # the first consumer and materializes it — an eager barrier here
    # would just serialize the same work.
    src_deg = (
        edges.join(deg, "src")
        .select("src", "dst", "outdeg")
        .repartition("src")
        .localCheckpoint(eager=False)
    )
    for i in range(iters):
        pr = (
            pr.join(src_deg, pr.node == src_deg.src)
            .select(
                F.col("dst"),
                ((F.lit(damping) * F.col("rank")) / F.col("outdeg"))
                .cast("decimal(38,18)")
                .alias("contrib"),
            )
            .groupBy("dst")
            .agg(
                (F.lit(teleport / n) + F.sum("contrib").cast("double")).alias("rank")
            )
            .withColumnRenamed("dst", "node")
        )
        if checkpoint_every and (i + 1) % checkpoint_every == 0 and i + 1 < iters:
            pr = pr.localCheckpoint(eager=True)
    return pr


def triangles(edges: DataFrame, src: str = "a", dst: str = "b") -> DataFrame:
    """(node, n_triangles) for every node in ≥1 triangle of an UNDIRECTED
    edge list (unique pairs, no self-loops; orientation of the input
    pair does not matter).

    Degree-ordered orientation (compact-forward): each edge points from
    the (degree, id)-smaller endpoint to the larger, so every triangle
    is generated exactly once as wedge (x→y, x→z) + closing edge (y→z),
    and — the 100 TB property — the oriented out-degree is O(√m) even
    at power-law hubs (a hub's edges point INTO it), which bounds the
    wedge join to Σ outdeg² = O(m^1.5) instead of Σ deg² blowing up on
    the hottest key. Orientation key = deg·1e9 + node (node ids must be
    non-negative and < 1e9 — true for every fixture key domain; swap in
    a struct comparison for wider domains).

    One shuffle for degrees, one self-equi-join on the wedge apex, one
    semi-join against the closing edge, one explode+agg for the
    per-node attribution — all key-partitioned, no driver state."""
    e0 = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    deg = (
        e0.select(F.col("a").alias("node"))
        .unionByName(e0.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ok = deg.select(
        "node", (F.col("deg") * F.lit(1000000000) + F.col("node")).alias("okey")
    )
    eo = (
        e0.join(ok.select(F.col("node").alias("a"), F.col("okey").alias("ka")), "a")
        .join(ok.select(F.col("node").alias("b"), F.col("okey").alias("kb")), "b")
        .select(
            F.when(F.col("ka") < F.col("kb"), F.col("a")).otherwise(F.col("b")).alias("src"),
            F.when(F.col("ka") < F.col("kb"), F.col("b")).otherwise(F.col("a")).alias("dst"),
            F.greatest("ka", "kb").alias("dkey"),
        )
        # eo is mentioned THREE times below (both wedge sides + the
        # closing semi-join); un-pinned, each mention inlines the whole
        # degree+orientation subtree and the plan grows multiplicatively
        # (round-9 audit: 154 Exchanges in q_triangle_count's static
        # plan). Lazy checkpoint: computed once, O(m) rows, every
        # mention reads the materialized RDD.
        .localCheckpoint(eager=False)
    )
    wedge = (
        eo.select(F.col("src").alias("x"), F.col("dst").alias("y"), F.col("dkey").alias("k1"))
        .join(
            eo.select(F.col("src").alias("x"), F.col("dst").alias("z"), F.col("dkey").alias("k2")),
            "x",
        )
        .filter(F.col("k1") < F.col("k2"))
        .select("x", "y", "z")
    )
    tri = wedge.join(
        eo.select(F.col("src").alias("y"), F.col("dst").alias("z")), ["y", "z"], "left_semi"
    )
    return (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )


def khop_distances(
    edges: DataFrame,
    seeds: DataFrame,
    max_hops: int = 3,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """(node, dist): minimum hop distance (≤ max_hops) from the seed set
    over an UNDIRECTED edge list — level-synchronous BFS as DataFrame
    ops. Each hop is one equi-join frontier⋈edges + distinct (frontier
    bounded by |V|, never path-count), and dist = MIN level at which a
    node appears across the unioned levels, which matches the unrolled
    SQL oracle exactly. ``seeds`` needs a ``node`` column; seeds not in
    the graph still report dist 0."""
    sym = edges.select(F.col(src).alias("u"), F.col(dst).alias("v")).unionByName(
        edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
    )
    level = seeds.select("node").distinct()
    levels = [level.select("node", F.lit(0).alias("dist"))]
    for h in range(1, max_hops + 1):
        level = (
            level.join(sym, level.node == sym.u)
            .select(F.col("v").alias("node"))
            .distinct()
        )
        levels.append(level.select("node", F.lit(h).alias("dist")))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out.groupBy("node").agg(F.min("dist").alias("dist"))


#: modulus for the portable walk hash — prime, small enough that every
#: intermediate ((x%P)*31 + s)*31 + y%P stays far below 2^63 in BOTH
#: engines (DuckDB BIGINT overflow is an ERROR, not a wrap).
WALK_MOD = 1000003


def random_walks(
    edges: DataFrame,
    seeds: DataFrame,
    steps: int = 3,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """(walker, step, node) paths of fixed length from each seed over an
    UNDIRECTED edge list — DETERMINISTIC pseudo-random walks: step s
    moves to the neighbor minimizing the portable hash
    ``(((cur % P)·31 + s)·31 + (nb % P)) % P`` (ties → smaller neighbor
    id), so the sample is reproducible across engines, partitionings and
    reruns — the property that makes walk-based dataset curation
    (node2vec-style corpus sampling, graph train/test splits) auditable.
    Each step is one equi-join on the current node + one per-walker
    argmin (row_number window keyed by walker — no global sort).
    Walkers at isolated seeds emit only their step-0 row (symmetrized
    edges: any reached node has ≥1 neighbor, so no mid-walk death)."""
    from pyspark.sql.window import Window

    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    cur = seeds.select(F.col("node").alias("walker")).distinct().select(
        "walker", F.col("walker").alias("cur")
    )
    out = cur.select("walker", F.lit(0).alias("step"), F.col("cur").alias("node"))
    p = F.lit(WALK_MOD)
    for s in range(1, steps + 1):
        nb = cur.join(sym, cur.cur == sym.u).select(
            "walker",
            F.col("v").alias("nb"),
            ((((F.col("cur") % p) * 31 + F.lit(s)) * 31 + F.col("v") % p) % p).alias(
                "h"
            ),
        )
        w = Window.partitionBy("walker").orderBy(F.col("h").asc(), F.col("nb").asc())
        cur = (
            nb.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .select("walker", F.col("nb").alias("cur"))
        )
        out = out.unionByName(
            cur.select("walker", F.lit(s).alias("step"), F.col("cur").alias("node"))
        )
    return out


def hits(edges: DataFrame, iters: int = 2) -> DataFrame:
    """(node, kind, score): Kleinberg HITS hubs-and-authorities after
    ``iters`` synchronous iterations over a DIRECTED edge list
    (src = hub side, dst = authority side; on the bipartite trade graph
    the sides never mix, on a general graph every node gets both roles).

    Each half-step is join(score ⋈ edges) → per-endpoint aggregate —
    the pagerank shuffle shape — followed by L1 normalization (divide
    by the exact total). L1 instead of the textbook L2: rankings are
    identical (positive scale factor), but L1 keeps every number
    RATIONAL — per-edge contributions are cast to DECIMAL(38,18) before
    the sums, the total is an exact DECIMAL scalar, and the one IEEE
    division per row is deterministic — so the fixpoint hash-matches an
    unrolled SQL oracle bit-for-bit (the q_pagerank float policy; an L2
    norm's sqrt would also be deterministic but drags every score
    irrational for no ranking benefit). The normalization scalar
    re-enters as a 1-row broadcast.

    Each half-step's raw aggregate is localCheckpoint'ed LAZILY: it is
    referenced TWICE — once as the normalization total, once as the
    numerator — and feeds the next half-step's join, so without the
    checkpoint the logical tree doubles per half-step (2^(2·iters)
    plan replication; the round-4 explain audit measured 134 exchanges
    at iters=2 vs 10 with checkpoints). The plan truncates to a
    LogicalRDD whether or not the checkpoint is eager, so eager's extra
    blocking driver barrier per half-step bought nothing: lazily, the
    normalization broadcast is the first consumer and materializes the
    RDD as part of work already scheduled (round-9 census: 36 jobs ->
    single digits for the same computation). The materialized state is
    |nodes| rows per half-step — the same O(V) a synchronous HITS keeps
    anywhere."""
    hub = (
        edges.select("src").distinct().select(F.col("src").alias("node"), F.lit(1.0).alias("score"))
    )
    auth = None
    for _ in range(iters):
        a_raw = (
            edges.join(hub, edges.src == hub.node)
            .select("dst", F.col("score").cast("decimal(38,18)").alias("__c"))
            .groupBy("dst")
            .agg(F.sum("__c").alias("__raw"))
            .localCheckpoint(eager=False)
        )
        a_tot = a_raw.agg(F.sum("__raw").alias("__t"))
        auth = a_raw.crossJoin(F.broadcast(a_tot)).select(
            F.col("dst").alias("node"),
            (F.col("__raw").cast("double") / F.col("__t").cast("double")).alias("score"),
        )
        h_raw = (
            edges.join(auth, edges.dst == auth.node)
            .select("src", F.col("score").cast("decimal(38,18)").alias("__c"))
            .groupBy("src")
            .agg(F.sum("__c").alias("__raw"))
            .localCheckpoint(eager=False)
        )
        h_tot = h_raw.agg(F.sum("__raw").alias("__t"))
        hub = h_raw.crossJoin(F.broadcast(h_tot)).select(
            F.col("src").alias("node"),
            (F.col("__raw").cast("double") / F.col("__t").cast("double")).alias("score"),
        )
    return hub.select("node", F.lit("hub").alias("kind"), "score").unionByName(
        auth.select("node", F.lit("authority").alias("kind"), "score")
    )


def sssp_bounded(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 3,
    src: str = "u",
    dst: str = "v",
    weight: str = "w",
) -> DataFrame:
    """(node, dist): minimum path WEIGHT from the seed set reachable in
    ≤ ``rounds`` relaxation rounds — Bellman-Ford with a fixed round
    count over a DIRECTED weighted edge list (symmetrize for
    undirected). Round i+1: dist(v) = min(dist(v), min over edges
    (u,v) of dist(u)+w) — one frontier⋈edges equi-join + a per-node
    min aggregate, the khop_distances shape with weights. With integer
    weights every distance is an exact integer, so the fixed-round
    result matches an unrolled SQL oracle bit-for-bit (the q_khop /
    q_kcore discipline: bounded rounds = SQL-expressible; run more
    rounds for longer-diameter reachability — |V|−1 rounds is the full
    SSSP fixpoint). Per-round state is (node, dist) — O(V) rows; at
    scale, localCheckpoint periodically (pagerank pattern). Negative
    weights are accepted by the recurrence but the bounded-round
    result is then only the ≤-rounds-hop optimum, as for any
    Bellman-Ford prefix."""
    dist = seeds.select("node").distinct().select("node", F.lit(0).alias("dist"))
    # Every relaxation round joins the frontier against e — pin it once
    # (lazy; round 1 materializes it) instead of re-deriving the edge
    # list per round, and key it by the join side so only the O(V)
    # frontier shuffles per round (pagerank pattern, guide §2.4).
    e = (
        edges.select(
            F.col(src).alias("__u"), F.col(dst).alias("__v"), F.col(weight).alias("__w")
        )
        .repartition("__u")
        .localCheckpoint(eager=False)
    )
    for _ in range(rounds):
        relaxed = (
            dist.join(e, dist.node == e.__u)
            .select(F.col("__v").alias("node"), (F.col("dist") + F.col("__w")).alias("dist"))
        )
        dist = (
            dist.unionByName(relaxed)
            .groupBy("node")
            .agg(F.min("dist").alias("dist"))
        )
    return dist


def kcore(
    edges: DataFrame, k: int = 12, peels: int = 4, src: str = "a", dst: str = "b"
) -> DataFrame:
    """(node, deg): the subgraph surviving ``peels`` rounds of k-core
    peeling of an UNDIRECTED edge list, with each node's degree inside
    that subgraph. Each round drops every node whose current degree is
    < k and the edges touching it; the true k-core is the fixpoint
    (graph unchanged by a further round), reached when a round drops
    nothing. ``peels`` is FIXED, not converge-detected, so the result
    is exactly expressible as an unrolled SQL oracle; pick peels ≥ the
    fixpoint depth for the graph at hand (q_kcore pins 4, past the
    measured fixpoint at both gate SFs).

    Per round: one degree aggregate (|2E| shuffle keyed on node) + two
    semi-joins filtering the edge list to surviving endpoints — all
    equi-joins on node, no global ordering, no driver state. The edge
    relation is localCheckpoint'ed each round: it is consumed three
    times per round (degree agg + both semi-joins) and feeds the next
    round, so the un-checkpointed logical tree triples per round (3^p
    scans — the q_hits lineage lesson). Degeneracy ordering / exact
    coreness per node would iterate k upward with the same loop body;
    the single-k form is the corpus-curation shape (keep the dense
    collaboration core, drop the sparse fringe)."""
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    for _ in range(peels):
        keep = (
            sym.groupBy("u")
            .agg(F.count(F.lit(1)).alias("__deg"))
            .filter(F.col("__deg") >= k)
            .select("u")
        )
        # Lazy checkpoints: the plan is truncated to a LogicalRDD either
        # way (bounding the 3^p scan blow-up the docstring describes),
        # and within the single final action the DAG scheduler computes
        # each checkpointed RDD once and caches it — the p eager driver
        # barriers bought nothing (round-9 census: 29 jobs -> single
        # digits for the same shuffles).
        sym = (
            sym.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint(eager=False)
        )
    return sym.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).select(
        F.col("u").alias("node"), "deg"
    )


def label_propagation(
    edges: DataFrame, iters: int = 2, src: str = "a", dst: str = "b"
) -> DataFrame:
    """(node, community): synchronous majority label propagation
    (Raghavan et al. 2007) after ``iters`` iterations over an UNDIRECTED
    edge list (each input pair is symmetrized; no self-loops needed).

    Init: every node labels itself. Each iteration, every node adopts
    the most frequent label among its NEIGHBORS, ties broken by the
    smallest label — the deterministic variant of the usual
    random-tie-break LPA, so the fixpoint is reproducible and
    SQL-expressible (exact integer counts, integer labels: no floats
    anywhere). Per iteration: one |2E| join+shuffle to count
    (node, neighbor_label) pairs, then a per-node window to pick the
    argmax — both keyed on node, no global ordering, no driver state.
    Lineage grows linearly in iters (pagerank pattern: localCheckpoint
    the labels periodically for long runs)."""
    from pyspark.sql.window import Window

    # sym is consumed by the label init and by every iteration's join —
    # pin it once (lazy; the first consumer materializes it) keyed by
    # the join side, so each iteration shuffles only the O(V) label
    # relation (pagerank pattern, guide §2.4).
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .unionByName(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .repartition("v")
        .localCheckpoint(eager=False)
    )
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn(
        "community", F.col("node")
    )
    pick = Window.partitionBy("node").orderBy(F.desc("__n"), F.asc("community"))
    for _ in range(iters):
        labels = (
            sym.join(labels, sym.v == labels.node)
            .select(F.col("u").alias("node"), "community")
            .groupBy("node", "community")
            .agg(F.count(F.lit(1)).alias("__n"))
            .withColumn("__rn", F.row_number().over(pick))
            .filter(F.col("__rn") == 1)
            .select("node", "community")
        )
    return labels
