"""Scale-engineering queries: skew mitigation proved equivalent to the
plain operators it replaces (the whole point of salting is that ONLY the
shuffle distribution changes — the oracle pins result equality).

Reference context: the reference's single join and group-by run inside
Postgres on one node (tsvscript.py:29) where skew is invisible; at
100 TB a hot join/group key pins one reducer. These queries exercise
operators/skew.py against the plain-SQL oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.skew import salted_agg_count, salted_join
from c_tran_data_pipeline_spark.plans.registry import query
from c_tran_data_pipeline_spark.sources.readers import load_table


@query(
    "q_skew_salted_join",
    """
    SELECT p_brand,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DOUBLE) AS sum_qty
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
    doc="operators/skew.py salted_join: lineitem⋈part fanned over 16 "
    "salts, then per-brand rollup. Oracle is the PLAIN join — salting "
    "must be result-invariant. Sum in exact DECIMAL for cross-engine "
    "float stability.",
    tags=("scale", "join", "skew"),
)
def q_skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    part = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_brand"
    )
    joined = salted_join(li, part, keys=["l_partkey"], salt=16)
    return joined.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("l_quantity").cast("decimal(20,4)")).cast("double").alias("sum_qty"),
    )


@query(
    "q_skew_salted_agg",
    "SELECT user_id, COUNT(*) AS count FROM events GROUP BY user_id",
    doc="operators/skew.py salted_agg_count: two-phase (key,salt)→key "
    "count on events.user_id; oracle is the plain GROUP BY.",
    tags=("scale", "agg", "skew"),
)
def q_skew_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id")
    return salted_agg_count(e, keys=["user_id"], salt=16)


@query(
    "q_incremental_agg",
    """
    SELECT user_id, event_type,
           COUNT(value) AS n,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS sum_value,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) / COUNT(value), 6)
               AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY user_id, event_type
    """,
    doc="Incremental materialized-view maintenance (operators/"
    "incremental.py): the Spark side summarizes the 'historical' 80% and "
    "the 'delta' 20% of events SEPARATELY (event_id % 5 split), then "
    "merges the two state tables — count/sum/min/max are associative, so "
    "the merge shuffles |keys| state rows, never raw events. The oracle "
    "is the FULL recompute over all events: merged-incremental == "
    "recomputed, bit-exact, because sums carry exact DECIMAL (merge "
    "order can't perturb them) and AVG derives at read time from "
    "mergeable parts. This is how a 100 TB rollup absorbs a daily "
    "delta without rescanning history.",
    tags=("scale", "agg", "incremental"),
)
def q_incremental_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.incremental import (
        finalize,
        merge_states,
        summarize,
    )

    ev = load_table(spark, sf_dir, "events")
    history = ev.filter(F.col("event_id") % 5 != 0)
    delta = ev.filter(F.col("event_id") % 5 == 0)
    keys = ["user_id", "event_type"]
    merged = merge_states(
        [summarize(history, keys, "value"), summarize(delta, keys, "value")], keys
    )
    return finalize(merged)


def _zorder_oracle() -> str:
    from c_tran_data_pipeline_spark.operators.layout import zorder_sql

    return f"""
    WITH cells AS (
        SELECT event_id, user_id AS x_cell,
               epoch_us(ts) // 86400000000 AS y_cell
        FROM events
    )
    SELECT event_id, x_cell, y_cell, {zorder_sql("x_cell", "y_cell", 16)} AS zkey
    FROM cells
    """


@query(
    "q_zorder_cells",
    _zorder_oracle(),
    doc="Morton (Z-order) clustering key over (user_id, event-day) — "
    "operators/layout.py. Interleaving both dimensions' bits into one "
    "sort key is what makes a range-partitioned + sorted write prune "
    "BOTH tenant and time bounding-box predicates from parquet min/max "
    "stats (the Delta OPTIMIZE ZORDER BY technique as plain Spark). "
    "Pure unrolled shift/mask integer math — whole-stage codegen, no "
    "UDF, exact cross-engine oracle; zorder_layout then range-"
    "partitions + sorts on this key (tests pin tile contiguity and a "
    "python-reference roundtrip).",
    tags=("scale", "layout"),
)
def q_zorder_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.layout import zorder_key_expr

    e = load_table(spark, sf_dir, "events")
    cells = e.select(
        "event_id",
        F.col("user_id").alias("x_cell"),
        F.floor(F.unix_micros("ts") / F.lit(86_400_000_000)).alias("y_cell"),
    )
    return cells.withColumn("zkey", zorder_key_expr("x_cell", "y_cell", 16))


@query(
    "q_dataset_fingerprint",
    """
    WITH h AS (
        SELECT source,
               CAST('0x' || substr(md5(concat_ws('␟',
                    coalesce(CAST(doc_id AS VARCHAR), '␀'),
                    coalesce(text, '␀'),
                    coalesce(lang, '␀'))), 1, 15) AS BIGINT) AS __h
        FROM documents
    )
    SELECT source, COUNT(*) AS n_rows, bit_xor(__h) AS xor_digest,
           CAST(SUM(CAST(__h AS DECIMAL(38,0))) AS VARCHAR) AS sum_digest
    FROM h GROUP BY source
    """,
    doc="Per-source dataset fingerprint (operators/curation.py "
    "dataset_fingerprint): commutative multiset digests — BIT_XOR plus "
    "an AdHash-style exact-DECIMAL sum of per-row 60-bit hashes, with "
    "row counts. Equal triples ⇒ same multiset of rows: the one-scan, "
    "partial-aggregated answer to 'is this the dataset we trained on?' "
    "across reruns, migrations, and engine versions; digests fold "
    "incrementally for union/append without rescanning history.",
    tags=("scale", "curation", "agg"),
)
def q_dataset_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.curation import dataset_fingerprint

    docs = load_table(spark, sf_dir, "documents")
    return dataset_fingerprint(docs, cols=["doc_id", "text", "lang"], group="source")


@query(
    "q_bloom_prefilter_join",
    """
    SELECT CAST(year(o_orderdate) AS INT) AS order_year,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28, 8))) AS DOUBLE)
               AS revenue
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
    doc="operators/bloom.py explicit runtime prefilter: urgent-order keys "
    "aggregated into a 2^15-bit bloom bitmap (one agg; m/64 int64 words "
    "of driver state, a build PARAMETER independent of corpus size) that "
    "re-enters the lineitem scan as a constant-folded map-side predicate "
    "— the fact shuffle then carries only the ~1/5 sliver + <1% false "
    "positives, and the exact join removes those. Oracle is the PLAIN "
    "join: the bloom is result-invariant by construction. Complements "
    "the optimizer-injected bloom pinned in test_scale.py (that one only "
    "fires inside join cost heuristics; this form is portable to any "
    "downstream operator). Revenue summed in exact DECIMAL.",
    tags=("scale", "join", "bloom"),
)
def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.bloom import (
        build_bloom,
        might_contain,
    )

    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    m_bits = 1 << 15
    words = build_bloom(urgent.select("o_orderkey"), "o_orderkey", m_bits=m_bits)
    pref = li.filter(might_contain(words, F.col("l_orderkey"), m_bits))
    joined = pref.join(urgent, pref.l_orderkey == urgent.o_orderkey)
    return joined.groupBy(
        F.year("o_orderdate").alias("order_year")
    ).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum((F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(28,8)"))
        .cast("double")
        .alias("revenue"),
    )


def _pagerank_iter_sql(prev: str) -> str:
    """One unrolled PageRank iteration (SQL twin of the loop body in
    q_pagerank): teleport + damped, degree-normalized neighbor mass,
    summed in exact DECIMAL so the result is shuffle-order-proof."""
    return f"""
    SELECT e.dst AS node,
           CAST(0.15 AS DOUBLE) / (SELECT n FROM n) +
           CAST(SUM(CAST((CAST(0.85 AS DOUBLE) * p.rank) / d.outdeg
                         AS DECIMAL(38,18))) AS DOUBLE) AS rank
    FROM {prev} p
    JOIN edges e ON p.node = e.src
    JOIN deg d ON d.node = p.node
    GROUP BY e.dst
    """


_PAGERANK_SQL = f"""
    WITH e0 AS (
        SELECT DISTINCT 'c:' || o_custkey AS src, 's:' || l_suppkey AS dst
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderpriority = '1-URGENT'
    ),
    edges AS (SELECT src, dst FROM e0 UNION SELECT dst AS src, src AS dst FROM e0),
    nodes AS (SELECT DISTINCT src AS node FROM edges),
    deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM edges GROUP BY src),
    n AS (SELECT COUNT(*) AS n FROM nodes),
    pr0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM n) AS rank FROM nodes),
    pr1 AS ({_pagerank_iter_sql("pr0")}),
    pr2 AS ({_pagerank_iter_sql("pr1")}),
    pr3 AS ({_pagerank_iter_sql("pr2")})
    SELECT node, ROUND(rank, 12) AS rank FROM pr3
"""


@query(
    "q_pagerank",
    _PAGERANK_SQL,
    doc="PageRank (3 unrolled iterations, d=0.85) over the undirected "
    "customer↔supplier trade graph of urgent orders — the iterative-"
    "algorithm-on-DataFrames shape, with an EXACT SQL oracle: each "
    "iteration is join(rank, edges)⋈degree → per-dst sum, and the "
    "neighbor-mass sum is cast to DECIMAL(38,18) per contribution so "
    "the total is associativity-proof across shuffle orders/engines "
    "(the repo's float policy applied to an iterative fixpoint; "
    "teleport and init are per-row IEEE on literals). Node ids are "
    "namespaced ('c:'/'s:'). Bidirectional edges ⇒ no dangling mass. "
    "Scale: per iteration one shuffle of |E| contributions + an agg "
    "keyed by node — the canonical distributed PageRank; at real scale "
    "the loop would checkpoint each pr_i (lineage growth is linear in "
    "iterations here and documented, not a correctness issue).",
    tags=("scale", "graph", "iterative"),
)
def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.graph import pagerank

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
    )
    edges = e0.union(e0.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).distinct()
    # Materialize the edge list once: pagerank()'s node-count plus each
    # of the 3 iterations would otherwise re-derive the orders⋈lineitem
    # join + double distinct through lineage (measured 3.7 → 3.0 s at
    # sf0.1). Same truncation pattern as connected_components.
    edges = edges.localCheckpoint(eager=True)
    pr = pagerank(edges, iters=3, damping=0.85, teleport=0.15)
    return pr.select("node", F.round("rank", 12).alias("rank"))


def _cms_probe_sql(src: str) -> str:
    """Per-item (row, bucket) probes — SQL twin of the explode in
    operators.sketch (same CMS_A/CMS_B/CMS_P literals, same order)."""
    from c_tran_data_pipeline_spark.operators.sketch import CMS_A, CMS_B, CMS_P

    rows = " UNION ALL ".join(
        f"SELECT user_id, {i} AS row, "
        f"((user_id % {CMS_P}) * {CMS_A[i]} + {CMS_B[i]}) % {CMS_P} % 1024 AS bucket "
        f"FROM {src}"
        for i in range(4)
    )
    return rows


@query(
    "q_cms_heavy_hitters",
    f"""
    WITH ev AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
    cells AS ({_cms_probe_sql("ev")}),
    grid AS (SELECT row, bucket, COUNT(*) AS n FROM cells GROUP BY 1, 2),
    items AS (SELECT DISTINCT user_id FROM ev),
    probes AS ({_cms_probe_sql("items")}),
    est AS (
        SELECT probes.user_id, MIN(COALESCE(grid.n, 0)) AS est
        FROM probes
        LEFT JOIN grid ON grid.row = probes.row AND grid.bucket = probes.bucket
        GROUP BY 1
    ),
    exact AS (SELECT user_id, COUNT(*) AS n_exact FROM ev GROUP BY 1),
    r AS (
        SELECT e.user_id, e.est, x.n_exact,
               ROW_NUMBER() OVER (ORDER BY e.est DESC, e.user_id ASC) AS rank
        FROM est e JOIN exact x ON e.user_id = x.user_id
    )
    SELECT user_id, est, n_exact, rank FROM r WHERE rank <= 20
    """,
    doc="Count-min-sketch heavy hitters over events.user_id (d=4, "
    "w=1024 — at sf0.1 the 1500-user domain EXCEEDS the width, so "
    "collisions are real and the est ≥ exact over-count property is "
    "exercised, not vacuous): the grid build is ONE partial-first "
    "aggregate (each event projects its 4 (row,bucket) cells via a "
    "codegen'd array+explode; map-side combine collapses to ≤4096 "
    "counters per partition before a single exchange), the finished "
    "grid re-enters as a BROADCAST bounded by sketch GEOMETRY (d·w "
    "rows, independent of data volume — the point of sketching), and "
    "the top-20 ranks estimates with the exact counts joined alongside "
    "for the audit. All hashing is portable integer arithmetic "
    "(mod-first so DuckDB's erroring BIGINT overflow can't trigger), "
    "so the oracle rebuilds the grid bit-for-bit — a sketch with an "
    "EXACT cross-engine oracle. operators/sketch.py; "
    "tests/test_sketch.py pins est ≥ exact and a pure-Python grid "
    "replay.",
    tags=("scale", "sketch", "agg"),
)
def q_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from c_tran_data_pipeline_spark.operators.sketch import build_cms, cms_estimate

    ev = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id").isNotNull())
        .select("user_id")
    )
    grid = build_cms(ev, "user_id", width=1024, depth=4)
    items = ev.distinct()
    est = cms_estimate(items, grid, "user_id", width=1024, depth=4)
    exact = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_exact"))
    w = Window.orderBy(F.col("est").desc(), F.col("user_id").asc())
    return (
        est.join(exact, "user_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 20)
        .select("user_id", "est", "n_exact", "rank")
    )
