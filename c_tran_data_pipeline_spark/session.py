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
    REAL double-persist stays visible the day one appears (VERDICT r6).

    SHARED-OWNERSHIP HAZARD (ADVICE r7): when this returns without
    persisting, the materialization belongs to *whoever cached the equal
    plan first*. If that holder later unpersists (test teardown, a
    semantic-dedup caller cleaning up), dependents silently fall back to
    re-evaluating lineage — a performance cliff, never a correctness bug.
    Callers that must keep their pin for correctness-of-cost (iterative
    loops re-reading the frame many times) should either own a uniquely
    derived plan (e.g. ``.alias()`` does NOT change the canonical plan —
    add a real no-op like a checkpoint instead) or use
    ``persist_once_owned`` and re-pin when ``owned`` comes back False."""
    frame, _owned = persist_once_owned(df, level)
    return frame


def persist_once_owned(df, level=None):
    """Like ``persist_once`` but returns ``(df, owned)`` where ``owned``
    is True iff THIS call created the persist (and therefore the caller
    may safely unpersist it / rely on it staying pinned). ``owned=False``
    means an equal canonical plan was already cached by someone else."""
    from pyspark.storagelevel import StorageLevel

    lvl = df.storageLevel
    if lvl.useMemory or lvl.useDisk:
        return df, False
    return df.persist(level if level is not None else StorageLevel.MEMORY_AND_DISK), True


def index_cache_dir() -> str:
    """Per-user, mode-0700 directory for derived artifacts that FEED
    QUERY OUTPUTS (trained classifier weights, BPE merge tables, IVF-PQ
    codebooks, semantic-dedup centroid stores).

    Previously these lived under the world-writable shared
    ``$TMPDIR/spark_graft_indexes``; on a multi-user host another user
    could pre-create a fingerprint-matching weights file and silently
    substitute model outputs (ADVICE r7). Scoping to
    ``spark_graft_indexes_<uid>`` with 0o700 makes the trust boundary the
    OS user, matching how any artifact that affects query results should
    be trusted. Override with $SPARK_GRAFT_INDEX_DIR (e.g. to a cluster
    scratch path); the override is created 0o700 as well."""
    import stat
    import tempfile

    override = os.environ.get("SPARK_GRAFT_INDEX_DIR")
    if override:
        path = override
    else:
        uid = os.getuid() if hasattr(os, "getuid") else "u"
        path = os.path.join(tempfile.gettempdir(), f"spark_graft_indexes_{uid}")
    os.makedirs(path, mode=0o700, exist_ok=True)
    # makedirs(exist_ok=True) accepts a PRE-EXISTING dir regardless of who
    # owns it, so creation alone doesn't close the pre-creation attack
    # (ADVICE r8): an attacker who pre-made the path with lax mode and
    # planted fingerprint-matching artifacts would still silently feed
    # query outputs. Verify the trust boundary explicitly — lstat (never
    # follow a planted symlink), must be a real directory, must be OURS —
    # and re-assert 0700; any failure here is a hard error, not a pass:
    # serving artifacts from an unverifiable dir is worse than crashing.
    st = os.lstat(path)
    if not stat.S_ISDIR(st.st_mode):
        raise RuntimeError(
            f"index cache path {path!r} is not a directory (symlink or file "
            f"planted?) — refusing to serve derived artifacts from it"
        )
    if hasattr(os, "getuid") and st.st_uid != os.getuid():
        raise RuntimeError(
            f"index cache dir {path!r} is owned by uid {st.st_uid}, not us "
            f"(uid {os.getuid()}) — pre-created by another user; refusing"
        )
    if stat.S_IMODE(st.st_mode) != 0o700:
        os.chmod(path, 0o700)  # raises on failure — never a silent side door
    return path
