"""SparkSession factory with scale-conscious defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (single JVM); the same conf
block is what we would ship to a 1000-executor cluster, minus the master —
AQE handles runtime re-planning (partition coalescing, skew joins, dynamic
broadcast), and the session timezone is pinned to UTC so timestamp semantics
match columnar stores (and the DuckDB oracle) exactly.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "c-tran-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) the session.

    ``shuffle_partitions`` defaults to the local core count — right for the
    test harness; on a real cluster it would be ~2-3× total executor cores
    (or left to AQE's coalescing with a high initial value).
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    if shuffle_partitions is None:
        shuffle_partitions = cpus
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        # --- determinism / oracle parity ---
        .config("spark.sql.session.timeZone", "UTC")
        # --- adaptive execution: runtime re-plan, skew handling, coalesce ---
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # --- scan sizing: keep per-task input bounded at large SF ---
        .config("spark.sql.files.maxPartitionBytes", "128m")
        # --- joins: broadcast small dims aggressively (Trip-dim pattern) ---
        .config("spark.sql.autoBroadcastJoinThreshold", "64m")
        # --- Python interop: Arrow batches for any pandas-UDF path ---
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        # --- quieter driver in tests ---
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def persist_once(df, level=None):
    """``df.persist(level)`` unless the CANONICALIZED plan is already
    cached — ``DataFrame.storageLevel`` resolves through Spark's
    CacheManager by canonical plan, so this also catches a different
    DataFrame object wrapping an equal plan (a repeated bench run, a
    caller that persisted first). Keeps the bench log free of harmless
    'CacheManager: Asked to cache already cached data' warnings so a
    REAL double-persist stays visible the day one appears (VERDICT r6)."""
    from pyspark.storagelevel import StorageLevel

    lvl = df.storageLevel
    if lvl.useMemory or lvl.useDisk:
        return df
    return df.persist(level if level is not None else StorageLevel.MEMORY_AND_DISK)
