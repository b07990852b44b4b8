"""Warehouse-dimension pack: the TPC-H Q2 min-cost-per-group correlated
subquery shape, and an SCD Type-2 dimension-history build — the two
classic "versioned dimension" workloads a lakehouse engine must express
declaratively.

Both carry exact DuckDB oracles. Float policy: the only float math here
is a per-row IEEE division plus MIN folds — both are order-independent
and bit-identical across engines, so no DECIMAL detour is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c_tran_data_pipeline_spark.plans.registry import query
from c_tran_data_pipeline_spark.sources.readers import load_table


@query(
    "q_min_cost_supplier",
    """
    WITH ps AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        GROUP BY l_partkey, l_suppkey
    ), best AS (
        SELECT ps.*, MIN(unit_cost) OVER (PARTITION BY l_partkey) AS min_cost
        FROM ps
    )
    SELECT p_partkey, p_brand, s_name, unit_cost
    FROM best
    JOIN part ON p_partkey = l_partkey
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE p_size <= 10 AND unit_cost = min_cost
    """,
    doc="TPC-H Q2-shape min-cost supplier (lineitem stands in for "
    "partsupp): per small part, the supplier(s) whose best observed "
    "unit price is the partwide minimum — the correlated MIN subquery "
    "decorrelated. Spark plan: the part filter broadcasts and prunes "
    "lineitem BEFORE the cost aggregation (the oracle aggregates "
    "everything then filters — equal results, but at 100 TB the "
    "pre-join is the row-killer); per-(part,supplier) MIN is one "
    "partial-first agg, and the partwide minimum is a WINDOW over the "
    "agg output — partitioned on a prefix of the agg keys, so it adds "
    "one exchange of |ps| rows, not a second agg + self-join. Ties "
    "keep every achieving supplier (deterministic set). Unit cost is "
    "a per-row IEEE divide + MIN folds: bit-identical cross-engine, "
    "so the = min_cost boundary cannot flip.",
    tags=("olap", "subquery", "window", "join"),
)
def q_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    small = p.filter(F.col("p_size") <= 10).select("p_partkey", "p_brand")
    ps = (
        li.select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("__unit"),
        )
        .join(F.broadcast(small), F.col("l_partkey") == small.p_partkey)
        .groupBy("l_partkey", "l_suppkey", "p_partkey", "p_brand")
        .agg(F.min("__unit").alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = ps.withColumn("__min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("__min_cost")
    )
    return best.join(F.broadcast(s), best.l_suppkey == s.s_suppkey).select(
        "p_partkey", "p_brand", "s_name", "unit_cost"
    )


@query(
    "q_scd2_history",
    """
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ), changes AS (
        SELECT user_id, event_type, ts AS valid_from, event_id
        FROM ordered
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) AS valid_to,
           ROW_NUMBER() OVER (PARTITION BY user_id
                              ORDER BY valid_from, event_id) AS version,
           LEAD(valid_from) OVER (PARTITION BY user_id
                                  ORDER BY valid_from, event_id) IS NULL AS is_current
    FROM changes
    """,
    doc="SCD Type-2 dimension history built from a change stream: each "
    "run of equal event_type per user collapses to one versioned row "
    "with [valid_from, valid_to) validity, a per-user version number, "
    "and an is_current flag on the open row — the MERGE-free way to "
    "materialize a slowly-changing dimension from raw events. Spark "
    "plan: both window passes partition on user_id, so the change "
    "detection (LAG) and the validity stitching (LEAD/ROW_NUMBER "
    "share one window frame) reuse a single hash exchange — the "
    "filter between them only shrinks partitions, never moves rows. "
    "Ordering is (ts, event_id) — a total order, so versioning is "
    "deterministic under any partitioning; at 100 TB the state per "
    "user is its change count, not its event count.",
    tags=("olap", "window", "scd", "incremental"),
)
def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_scan = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        ev.select("user_id", "event_type", "ts", "event_id")
        .withColumn("__prev", F.lag("event_type").over(w_scan))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col("event_type")))
        .select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    )
    w_ver = Window.partitionBy("user_id").orderBy("valid_from", "event_id")
    return changes.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_ver).alias("valid_to"),
        F.row_number().over(w_ver).alias("version"),
        F.lead("valid_from").over(w_ver).isNull().alias("is_current"),
    )


@query(
    "q_table_diff",
    """
    WITH old_snap AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice
        FROM orders WHERE o_orderkey % 10 != 7
    ),
    new_snap AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 13 = 0
                    THEN ROUND(o_totalprice * 1.1, 2) ELSE o_totalprice END
                   AS o_totalprice
        FROM orders WHERE o_orderkey % 17 != 3
    )
    SELECT COALESCE(o.o_orderkey, n.o_orderkey) AS o_orderkey,
           CASE WHEN o.o_orderkey IS NULL THEN 'added'
                WHEN n.o_orderkey IS NULL THEN 'removed'
                WHEN o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
                  OR o.o_totalprice IS DISTINCT FROM n.o_totalprice
                THEN 'changed' END AS change
    FROM old_snap o FULL JOIN new_snap n USING (o_orderkey)
    WHERE (o.o_orderkey IS NULL OR n.o_orderkey IS NULL
           OR o.o_orderstatus IS DISTINCT FROM n.o_orderstatus
           OR o.o_totalprice IS DISTINCT FROM n.o_totalprice)
    """,
    doc="Snapshot reconciliation (operators/incremental.py "
    "snapshot_diff): added / removed / changed keys between two table "
    "states — the CDC-derivation and migration-audit primitive (the "
    "set-based answer to 'what did today's load change', and the "
    "verifier you run after any copy/backfill). The two snapshots here "
    "derive deterministically from orders (old drops keys ≡7 mod 10; "
    "new drops ≡3 mod 17 and bumps prices of keys ≡0 mod 13 — so all "
    "three classes occur). ONE full outer join on the key carrying "
    "only compared columns; presence = literal sentinels (outer-join "
    "keys coalesce, and compared columns can be legitimately NULL); "
    "changes detected with null-safe inequality on NATIVE values — no "
    "row hashing, so cross-engine float formatting can't fake a diff. "
    "At scale both sides bucket on the key and the join co-locates.",
    tags=("warehouse", "join", "cdc", "report"),
)
def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.incremental import snapshot_diff

    orders = load_table(spark, sf_dir, "orders")
    old = orders.filter(F.col("o_orderkey") % 10 != 7).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = orders.filter(F.col("o_orderkey") % 17 != 3).select(
        "o_orderkey",
        "o_orderstatus",
        F.when(
            F.col("o_orderkey") % 13 == 0, F.round(F.col("o_totalprice") * 1.1, 2)
        )
        .otherwise(F.col("o_totalprice"))
        .alias("o_totalprice"),
    )
    return snapshot_diff(old, new, ["o_orderkey"], ["o_orderstatus", "o_totalprice"])
