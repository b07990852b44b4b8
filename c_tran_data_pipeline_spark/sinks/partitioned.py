"""Date-partitioned fact storage: the layout that makes 100 TB of
append-only facts queryable.

The reference appends every daily cron run into one Postgres heap
(topic_consumer.py:274-277; 9.8M rows / 716 MB after five weeks —
Project 4.pdf p8); every analytic query then scans the whole table
unless an index saves it. The Spark-native equivalent is directory
partitioning: ``write.partitionBy('service_date')`` lays each day out
as its own directory, and any query filtering on the partition column
reads ONLY those directories — partition pruning happens in the
planner, before a single byte is scanned (tests pin this via the
scan's ``PartitionFilters`` and the pruned ``partitions read`` count).

Daily ingest = one new directory, written idempotently with dynamic
partition overwrite (re-running a day replaces exactly that day,
nothing else) — the cron-replay story (T4) at the storage layer.

Compose with sinks/bucketed.py for the full layout: partition by date
(prune time ranges) + bucket by join key within partitions (co-locate
joins)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], mode: str = "overwrite"
) -> None:
    """Write parquet partitioned by ``partition_cols``. With
    mode='overwrite' + dynamic partitionOverwriteMode, only partitions
    present in ``df`` are replaced — idempotent daily re-runs."""
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        df.write.mode(mode).partitionBy(*partition_cols).parquet(path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_partition_range(
    spark: SparkSession, path: str, partition_col: str, start, end
) -> DataFrame:
    """Read with a partition-column range predicate — prunes to the
    matching directories at plan time."""
    return spark.read.parquet(path).filter(F.col(partition_col).between(start, end))
