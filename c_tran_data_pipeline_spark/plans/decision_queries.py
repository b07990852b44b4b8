"""Decision-support pack #2: the classic correlated-subquery shapes —
EXISTS semi-join, NOT-EXISTS anti self-join, scalar-subquery filter,
outer-join count distribution, NOT-IN exclusion — each adapted to the
fixture schema (which lacks ``l_commitdate``/``partsupp``/``c_phone``,
so the queries keep the SHAPE on the columns that exist), plus a kNN
majority-vote classifier composing the similarity operators.

Every query has an exact DuckDB oracle. Scale notes per query: the
decorrelated plans below are the ones Catalyst produces for the
equivalent SQL — semi/anti hash joins keyed on the correlation column,
never per-row subquery execution, so each survives a 100x fact growth
with one shuffle per correlation key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c_tran_data_pipeline_spark.operators.similarity import cosine_topk
from c_tran_data_pipeline_spark.plans.registry import query
from c_tran_data_pipeline_spark.sources.readers import load_table


@query(
    "q_order_priority_semijoin",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate < TIMESTAMP '1996-04-01'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4-shape EXISTS decorrelation: one-quarter order slice "
    "semi-joined against returned lineitems, counted by priority. "
    "Spark plan: date filter prunes orders at the scan, returnflag "
    "filter prunes lineitem at the scan, LEFT SEMI hash join on "
    "l_orderkey (no duplication however many lines match), then a "
    "5-group partial-first agg. One shuffle pair on the join key; "
    "at 100 TB the quarter filter is the row-killer and it is pushed.",
    tags=("olap", "semijoin", "subquery"),
)
def q_order_priority_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    sliced = o.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    hit = sliced.join(returned, sliced.o_orderkey == returned.l_orderkey, "left_semi")
    return hit.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@query(
    "q_customer_order_distribution",
    """
    WITH per_cust AS (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderstatus <> 'F'
        GROUP BY c_custkey
    )
    SELECT c_count, COUNT(*) AS custdist
    FROM per_cust
    GROUP BY c_count
    """,
    doc="TPC-H Q13-shape outer-join count distribution: orders-per-"
    "customer histogram that keeps zero-order customers (the LEFT OUTER "
    "+ COUNT(col) null-skip semantics the engine hadn't pinned). Spark "
    "plan: status filter pushed into the orders scan BEFORE the outer "
    "join (legal because it is on the preserved side's join condition, "
    "expressed as a pre-filter), hash outer join on custkey, two "
    "partial-first aggs. The second agg groups on ~tens of distinct "
    "counts — partial aggregation collapses it map-side, so the last "
    "shuffle is KBs regardless of customer count.",
    tags=("olap", "outer-join", "agg"),
)
def q_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    open_orders = o.filter(F.col("o_orderstatus") != "F").select("o_custkey", "o_orderkey")
    per_cust = (
        c.select("c_custkey")
        .join(open_orders, c.c_custkey == open_orders.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q_brand_supplier_counts",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_size <= 25
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
    doc="TPC-H Q16-shape NOT-IN exclusion + grouped COUNT DISTINCT "
    "(partsupp stands in as lineitem x part). Spark plan: the NOT IN "
    "decorrelates to a broadcast LEFT ANTI join against the (tiny, "
    "filtered) bad-supplier set — no shuffle for the exclusion; part "
    "side is filtered on p_size at the scan then broadcast; COUNT "
    "DISTINCT expands to a two-phase agg (dedup on (brand,size,supp), "
    "then count) — both phases partial-first. NULL-semantics note: "
    "NOT IN over a null-free subquery == anti join; s_suppkey is the "
    "PK so the rewrite is exact.",
    tags=("olap", "antijoin", "distinct"),
)
def q_brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    bad = s.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    small = p.filter(F.col("p_size") <= 25).select("p_partkey", "p_brand", "p_size")
    kept = li.select("l_partkey", "l_suppkey").join(
        F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti"
    )
    return (
        kept.join(F.broadcast(small), kept.l_partkey == small.p_partkey)
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q_waiting_orders",
    """
    WITH r AS (SELECT l_orderkey, l_suppkey FROM lineitem WHERE l_returnflag = 'R')
    SELECT s_name, COUNT(*) AS numwait
    FROM r l1 JOIN supplier ON s_suppkey = l1.l_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM r l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    """,
    doc="TPC-H Q21-shape sole-blame self-join: lines a supplier got "
    "returned, on multi-supplier orders where NO other supplier's line "
    "was returned (l_returnflag stands in for the missing "
    "receipt-vs-commit lateness). Spark plan: both correlated "
    "subqueries decorrelate to hash semi/anti joins keyed on "
    "l_orderkey with the <> residual as a post-probe condition — the "
    "three lineitem legs co-shuffle on the same key, so AQE coalesces "
    "them into one exchange lineage; supplier dim broadcasts. The "
    "per-order fan-out is bounded by lines-per-order (7), not corpus "
    "size, so the self-join never goes quadratic.",
    tags=("olap", "antijoin", "semijoin", "self-join"),
)
def q_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    r = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l1 = r
    l2 = li.select(
        F.col("l_orderkey").alias("k2"), F.col("l_suppkey").alias("s2")
    )
    l3 = r.select(F.col("l_orderkey").alias("k3"), F.col("l_suppkey").alias("s3"))
    cand = l1.join(
        l2, (l1.l_orderkey == l2.k2) & (l1.l_suppkey != l2.s2), "left_semi"
    )
    sole = cand.join(
        l3, (cand.l_orderkey == l3.k3) & (cand.l_suppkey != l3.s3), "left_anti"
    )
    named = sole.join(F.broadcast(s), sole.l_suppkey == s.s_suppkey)
    return named.groupBy("s_name").agg(F.count(F.lit(1)).alias("numwait"))


@query(
    "q_idle_customers",
    """
    SELECT c_nationkey, COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(28, 8))) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28, 8))) AS DOUBLE) / COUNT(*)
            FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey
                        AND o_orderdate >= TIMESTAMP '1999-01-01')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22-shape: above-average-balance customers with no "
    "RECENT orders (every fixture customer has some order, so the "
    "lapse cutoff keeps the anti-join non-vacuous), grouped by nation "
    "(nationkey stands in for the phone country code). The scalar "
    "subquery's mean is computed as an exact "
    "DECIMAL sum cast to DOUBLE then divided — identical IEEE result "
    "in both engines, so the > boundary cannot flip cross-engine. "
    "Spark plan: the scalar is a 1-row agg broadcast via crossJoin "
    "(no collect; stays a ReusedExchange if referenced twice), the "
    "NOT EXISTS is a hash anti join on custkey — orders is projected "
    "to the join key only, so the anti probe ships 8 bytes/row.",
    tags=("olap", "subquery", "antijoin"),
)
def q_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(
            (
                F.sum(F.col("c_acctbal").cast("decimal(28,8)")).cast("double")
                / F.count(F.lit(1))
            ).alias("__ab")
        )
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(F.col("c_acctbal") > F.col("__ab"))
    recent = o.filter(
        F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
    ).select("o_custkey")
    idle = rich.join(recent, rich.c_custkey == F.col("o_custkey"), "left_anti")
    return idle.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("numcust"),
        F.sum(F.col("c_acctbal").cast("decimal(28,8)")).cast("double").alias("totacctbal"),
    )


_COS = "list_cosine_similarity(CAST(a.embedding AS DOUBLE[]), CAST(b.embedding AS DOUBLE[]))"


@query(
    "q_knn_label",
    f"""
    WITH scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               {_COS} AS cos
        FROM embeddings a JOIN embeddings b ON a.vec_id != b.vec_id
        WHERE a.vec_id < 50
    ), ranked AS (
        SELECT query_id, neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cos DESC, neighbor_id ASC) AS rank
        FROM scored
    ), votes AS (
        SELECT r.query_id, e.label, COUNT(*) AS votes
        FROM ranked r JOIN embeddings e ON e.vec_id = r.neighbor_id
        WHERE r.rank <= 5
        GROUP BY 1, 2
    )
    SELECT query_id, label AS pred_label, votes FROM (
        SELECT query_id, label, votes,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY votes DESC, label ASC) AS rn
        FROM votes)
    WHERE rn = 1
    """,
    doc="kNN majority-vote classification (similarity search applied to "
    "labeling): top-5 cosine neighbors per query vector (self "
    "excluded), neighbor labels tallied, majority wins with "
    "deterministic ties (votes DESC, label ASC). Composes cosine_topk "
    "(broadcast queries x one corpus scan) with a label join that "
    "BROADCASTS THE TOP-K SIDE (bounded by |queries|·k) against a "
    "streamed O(corpus) label map — ids only, never vectors. The "
    "50-query slice bounds the broadcast; for full-corpus "
    "labeling at scale swap the exact leg for ivf_topk/ann_lsh_topk "
    "(same output contract), which is why the vote stage joins on ids "
    "rather than carrying labels through the ranking.",
    tags=("similarity", "topk", "classify"),
)
def q_knn_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    topk = cosine_topk(emb, emb.filter(F.col("vec_id") < 50), k=5)
    labels = emb.select(F.col("vec_id").alias("neighbor_id"), "label")
    # Broadcast the TOP-K side: it is bounded by |queries|·k (250 rows
    # here) regardless of corpus size, while the label map is O(corpus).
    # Broadcasting the label map would ship the whole corpus's
    # (vec_id,label) pairs to every executor — the scale-killer at 100×.
    votes = (
        F.broadcast(topk).join(labels, "neighbor_id")
        .groupBy("query_id", "label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("votes").desc(), F.col("label").asc())
    return (
        votes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("query_id", F.col("label").alias("pred_label"), "votes")
    )
