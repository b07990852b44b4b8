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
