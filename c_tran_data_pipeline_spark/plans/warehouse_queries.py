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
