"""Bucketed parquet tables: pre-shuffled storage for co-located joins.

At 100 TB the dominant cost of a fact⋈fact equi-join is shuffling both
sides by the join key on EVERY query. Bucketing pays that shuffle once,
at write time: ``bucketBy(n, key)`` hash-partitions rows into ``n``
files per write-task group, and records the bucket spec in the catalog.
A join of two tables bucketed by the same key into the same bucket count
then reads co-located buckets directly — the planner drops both
Exchange nodes (tests/test_sources_sinks.py pins this on the executed
plan), leaving sort + merge only; adding ``sortBy`` at write time drops
the sorts too.

This is the Spark-native equivalent of the reference's Postgres PK
B-tree locality (Trip.trip_id, BreadCrumb FK — topic_consumer.py:101):
the storage layout, not the query, carries the join structure.

Guidance: bucket the big fact tables by their dominant join key
(trip_id for breadcrumbs, user_id for events/orders); pick bucket
counts ~= target parallelism (a multiple of executor cores) and keep
them EQUAL across tables meant to join (Spark 3.1+ can join n and k·n
buckets without a full shuffle, but equal is always safe).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    buckets: int,
    keys: list[str],
    sort_by: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed parquet table (catalog-registered —
    bucket specs live in table metadata, so plain ``.parquet(path)``
    files cannot carry them)."""
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *keys)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def colocated_join(
    spark: SparkSession, left_table: str, right_table: str, keys: list[str], how: str = "inner"
) -> DataFrame:
    """Join two same-spec bucketed tables on their bucket keys. The plan
    this produces is the point: SortMergeJoin with NO Exchange on either
    side (bucket layout satisfies the join's distribution requirement)."""
    return spark.table(left_table).join(spark.table(right_table), keys, how)
