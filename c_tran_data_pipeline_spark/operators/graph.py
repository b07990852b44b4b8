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
        ).localCheckpoint(eager=True)
        n_changed = proposed.filter(F.col("__changed")).count()
        labels = proposed.drop("__changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components: not converged after {max_iter} rounds "
        f"({n_changed} labels still changing) — raise max_iter"
    )


def dedup_clusters(pairs: DataFrame, src: str = "d1", dst: str = "d2") -> DataFrame:
    """Near-dup clusters from candidate pairs: every clustered doc with
    its representative (cluster min) — downstream keeps rows where
    doc_id == component (or anti-joins the rest away)."""
    return connected_components(pairs, src=src, dst=dst).select(
        F.col("node").alias("doc_id"), "component"
    )
