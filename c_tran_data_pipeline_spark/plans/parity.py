"""Reference-parity queries (SURVEY.md §2-§3) on the driver fixture tables.

Fixture mapping (FIXTURES.md §4): ``events`` plays the raw breadcrumb
stream (``ts``→tstamp, ``value``→speed, ``user_id``→vehicle,
``props.k``→direction), ``customer``/``orders`` play the Trip dim / fact
relationships. Each query cites the reference operator it re-creates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c_tran_data_pipeline_spark.functions.json_utils import json_get
from c_tran_data_pipeline_spark.functions.transforms import null_if_empty, service_key_for
from c_tran_data_pipeline_spark.operators.fence import eval_once
from c_tran_data_pipeline_spark.operators.upsert import first_wins, merge_update
from c_tran_data_pipeline_spark.plans.registry import query
from c_tran_data_pipeline_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# E3 flagship: join ⋈ conjunctive filter ⋈ group-avg ⋈ null-skip
# (tsvscript.py:29 — J1 + V6 + A1 + V7). Structure: fact(events) ⋈
# dim(customer, broadcast) with equality/range predicates on date parts,
# grouped per "point", averaging the measure.
# ---------------------------------------------------------------------------
def _hotspot(spark: SparkSession, sf_dir: str, h0: int, h1: int) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    customer = load_table(spark, sf_dir, "customer")
    return (
        events.join(F.broadcast(customer), events.user_id == customer.c_custkey)
        .filter(
            (F.col("event_type") == "purchase")
            & (F.col("c_mktsegment") == "BUILDING")
            & (F.month("ts") == 1)
            & F.dayofmonth("ts").between(1, 21)
            & F.hour("ts").between(h0, h1)
            & F.col("value").isNotNull()  # V7: no NULL avg rows
        )
        .groupBy(F.col("user_id"), F.col("c_nationkey").alias("nationkey"))
        .agg(
            (F.sum(F.col("value").cast("decimal(28,8)")).cast("double") / F.count("value")).alias(
                "avg_value"
            ),
            F.count(F.lit(1)).alias("n_readings"),
        )
    )


@query(
    "q_flagship_hotspot",
    """
    SELECT e.user_id AS user_id,
           c.c_nationkey AS nationkey,
           CAST(SUM(CAST(e.value AS DECIMAL(28, 8))) AS DOUBLE) / COUNT(e.value) AS avg_value,
           COUNT(*) AS n_readings
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
      AND c.c_mktsegment = 'BUILDING'
      AND month(e.ts) = 1 AND day(e.ts) BETWEEN 1 AND 21
      AND hour(e.ts) BETWEEN 9 AND 11
      AND e.value IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="tsvscript.py:29 analog: J1 inner equi-join (broadcast dim) + V6 "
    "conjunctive filter on date parts + A1 hash-agg AVG + V7 null skip.",
    tags=("parity", "join", "agg", "flagship"),
)
def q_flagship_hotspot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hotspot(spark, sf_dir, 9, 11)


@query(
    "q_flagship_hotspot_pm",
    """
    SELECT e.user_id AS user_id,
           c.c_nationkey AS nationkey,
           CAST(SUM(CAST(e.value AS DECIMAL(28, 8))) AS DOUBLE) / COUNT(e.value) AS avg_value,
           COUNT(*) AS n_readings
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
      AND c.c_mktsegment = 'BUILDING'
      AND month(e.ts) = 1 AND day(e.ts) BETWEEN 1 AND 21
      AND hour(e.ts) BETWEEN 16 AND 18
      AND e.value IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="The reference's evening-window hotspot variant (Project 4.pdf "
    "p13 runs the tsvscript query for hours 16-18 as well as 9-11): "
    "same plan, different hour predicate — pinned as its own oracle "
    "entry so both published map queries stay reproducible.",
    tags=("parity", "join", "agg", "flagship"),
)
def q_flagship_hotspot_pm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _hotspot(spark, sf_dir, 16, 18)


# ---------------------------------------------------------------------------
# E1 conform + validate: transform (P1-P5) + reject-row validation (V1-V5)
# over the raw stream analog. props JSON is parsed JVM-side
# (get_json_object), never with a Python UDF.
# ---------------------------------------------------------------------------
_CONFORM_ORACLE = """
    SELECT event_id,
           ts,
           user_id,
           NULLIF(TRIM(event_type), '') AS event_type,
           value,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
           CASE WHEN dayname(ts) = 'Sunday' THEN 'Sunday'
                WHEN dayname(ts) = 'Saturday' THEN 'Saturday'
                ELSE 'Weekday' END AS service_key
    FROM events
    WHERE event_id IS NOT NULL
      AND ts IS NOT NULL
      AND (CAST(json_extract_string(props, '$.k') AS INTEGER) IS NULL
           OR CAST(json_extract_string(props, '$.k') AS INTEGER) BETWEEN 0 AND 359)
      AND (value IS NULL OR value BETWEEN 0 AND 200)
"""


@query(
    "q_conform_validate",
    _CONFORM_ORACLE,
    doc="topic_consumer.py:106-165 analog: P1 null-normalize + P4 "
    "service_key + JSON decode, then V1-V4 reject-row validation as one "
    "conjunctive pushdown-friendly filter.",
    tags=("parity", "transform", "validate"),
)
def q_conform_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = json_get("props", "$.k", "int")
    conformed = e.select(
        "event_id",
        "ts",
        "user_id",
        null_if_empty("event_type").alias("event_type"),
        "value",
        k.alias("k"),
        service_key_for(F.col("ts")).alias("service_key"),
    )
    # Generate fence (operators/fence.py): without it, pushdown expands
    # the V1-V5 filter to five copies of the variant parseJson per row —
    # FilterExec does no subexpression elimination — measured 2.65 s vs
    # 0.36-0.73 s fenced at sf0.1 (compute alone is 0.03 s). The fence is
    # shuffle-free, so nothing here gets more expensive at 100 TB; the
    # predicates it blocks from the scan are all on derived/variant
    # values, which were never parquet-pushable anyway.
    conformed = eval_once(conformed)
    return conformed.filter(
        F.col("event_id").isNotNull()  # V1
        & F.col("ts").isNotNull()  # V2
        & (F.col("k").isNull() | F.col("k").between(0, 359))  # V3
        & (F.col("value").isNull() | F.col("value").between(0, 200))  # V4
    )


# ---------------------------------------------------------------------------
# E1 batch conform, through the REAL production path: raw all-string
# breadcrumb rows (constructed deterministically from events) →
# conform_breadcrumbs (P1-P5: date parse, timestamp derivation, service
# key, placeholders) → validate (V1-V5). The oracle recomputes the
# expected output directly from the source columns, so this checks the
# actual '25-SEP-20' date-parse/derive logic, not a SQL translation of it.
# ---------------------------------------------------------------------------
@query(
    "q_breadcrumb_conform",
    """
    SELECT user_id AS trip_id,
           date_trunc('second', CAST(ts AS TIMESTAMP)) AS tstamp,
           CAST(ts AS DATE) AS opd_date,
           CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS DOUBLE) AS latitude,
           CAST(-CAST(json_extract_string(props, '$.k') AS INTEGER) AS DOUBLE) AS longitude,
           CAST(json_extract_string(props, '$.k') AS INTEGER) * 5 AS direction,
           CAST(floor(value) AS DOUBLE) AS speed,
           CAST(event_id % 1000 AS INTEGER) AS vehicle_id,
           CASE WHEN dayname(ts) = 'Sunday' THEN 'Sunday'
                WHEN dayname(ts) = 'Saturday' THEN 'Saturday'
                ELSE 'Weekday' END AS service_key,
           'Out' AS trip_direction,
           0 AS route_id
    FROM events
    WHERE user_id IS NOT NULL
      AND ts IS NOT NULL
      AND (CAST(json_extract_string(props, '$.k') AS INTEGER) * 5 IS NULL
           OR CAST(json_extract_string(props, '$.k') AS INTEGER) * 5 BETWEEN 0 AND 359)
      AND (floor(value) IS NULL OR floor(value) BETWEEN 0 AND 200)
    """,
    doc="topic_consumer.py:106-165 through the real code path: events "
    "re-serialized to the reference's raw string schema ('25-SEP-20' "
    "dates, seconds-past-midnight ACT_TIME), then conform_breadcrumbs + "
    "validate. The oracle derives the expected rows from the source "
    "directly — a true round-trip check of P2/P3/P4 parsing.",
    tags=("parity", "transform", "validate"),
)
def q_breadcrumb_conform(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.functions.transforms import conform_breadcrumbs
    from c_tran_data_pipeline_spark.functions.validation import validate

    e = load_table(spark, sf_dir, "events")
    k = json_get("props", "$.k", "int")
    secs_of_day = (
        F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
    )
    raw = e.select(
        F.col("user_id").cast("string").alias("EVENT_NO_TRIP"),
        F.lit(None).cast("string").alias("EVENT_NO_STOP"),
        F.upper(F.date_format("ts", "dd-MMM-yy")).alias("OPD_DATE"),
        (F.col("event_id") % 1000).cast("string").alias("VEHICLE_ID"),
        F.lit(None).cast("string").alias("METERS"),
        secs_of_day.cast("string").alias("ACT_TIME"),
        (-k).cast("string").alias("GPS_LONGITUDE"),
        k.cast("string").alias("GPS_LATITUDE"),
        F.lit(None).cast("string").alias("GPS_SATELLITES"),
        F.lit(None).cast("string").alias("GPS_HDOP"),
        (k * 5).cast("string").alias("DIRECTION"),
        F.floor("value").cast("string").alias("VELOCITY"),
    )
    # Generate fence before validate (see q_conform_validate and
    # operators/fence.py): V3/V5 otherwise re-expand the variant parse
    # and date-derivation chains inside the filter, where no
    # subexpression elimination applies. Shuffle-free.
    return validate(eval_once(conform_breadcrumbs(raw)))


# ---------------------------------------------------------------------------
# A2: whole-tuple distinct (the reference's TripRows set(),
# topic_consumer.py:185-193).
# ---------------------------------------------------------------------------
@query(
    "q_distinct_tuples",
    "SELECT DISTINCT user_id, event_type FROM events",
    doc="topic_consumer.py:185-193 analog: set-based dedup on the full "
    "tuple before insert — partial+final HashAggregate, map-side combine.",
    tags=("parity", "dedup"),
)
def q_distinct_tuples(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events").select("user_id", "event_type").distinct()


# ---------------------------------------------------------------------------
# A3: first-wins dedup by key, made deterministic (stop_consumer.py:71-79
# keeps arrival-order-first; we pin (ts, event_id) ordering).
# ---------------------------------------------------------------------------
@query(
    "q_first_wins_dedup",
    """
    SELECT user_id, event_id, ts, event_type, value FROM (
        SELECT user_id, event_id, ts, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM events
    ) WHERE rn = 1
    """,
    doc="stop_consumer.py:71-79 analog: first row per key; deterministic "
    "via row_number over (ts, event_id).",
    tags=("parity", "dedup", "window"),
)
def q_first_wins_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type", "value")
    return first_wins(e, keys=["user_id"], order_by=["ts", "event_id"])


# ---------------------------------------------------------------------------
# J3/K4: insert-if-absent (ON CONFLICT DO NOTHING, topic_consumer.py:203)
# shown as its anti-join core: keys present in incoming but not target.
# ---------------------------------------------------------------------------
@query(
    "q_antijoin_absent",
    """
    SELECT DISTINCT e.user_id AS user_id FROM events e
    WHERE NOT EXISTS (
        SELECT 1 FROM customer c
        WHERE c.c_custkey = e.user_id AND c.c_mktsegment = 'BUILDING'
    )
    """,
    doc="topic_consumer.py:203 analog: the insert-if-absent key filter — "
    "incoming keys (deduped) minus keys already in the target, as a "
    "left-anti join whose build side is pruned to the key column.",
    tags=("parity", "join"),
)
def q_antijoin_absent(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    existing = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    incoming = events.select("user_id").distinct()
    return incoming.join(
        F.broadcast(existing), incoming.user_id == existing.c_custkey, "left_anti"
    )


# ---------------------------------------------------------------------------
# K5/J2: keyed enrichment merge (stop_consumer.py:76-79). Dim rows take
# values from a deduped update stream; unmatched rows keep their old value.
# ---------------------------------------------------------------------------
@query(
    "q_enrich_merge",
    """
    WITH latest AS (
        SELECT o_custkey, o_orderpriority FROM (
            SELECT o_custkey, o_orderpriority,
                   ROW_NUMBER() OVER (PARTITION BY o_custkey
                                      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT c.c_custkey AS c_custkey, c.c_name AS c_name,
           COALESCE(l.o_orderpriority, 'UNKNOWN') AS last_priority
    FROM customer c LEFT JOIN latest l ON c.c_custkey = l.o_custkey
    """,
    doc="stop_consumer.py:76-79 analog: the serial per-row UPDATE re-"
    "expressed as one set-based broadcast merge (first_wins dedup upstream, "
    "as the reference dedups trip_ids per batch).",
    tags=("parity", "merge", "join"),
)
def q_enrich_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", F.lit("UNKNOWN").alias("last_priority")
    )
    orders = load_table(spark, sf_dir, "orders")
    latest = (
        orders.select("o_custkey", "o_orderpriority", "o_orderdate", "o_orderkey")
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("o_custkey").orderBy(
                    F.col("o_orderdate").desc(), F.col("o_orderkey").desc()
                )
            ),
        )
        .filter(F.col("__rn") == 1)
        .select(F.col("o_custkey").alias("c_custkey"), F.col("o_orderpriority").alias("last_priority"))
    )
    return merge_update(customer, latest, keys=["c_custkey"], set_cols=["last_priority"])


# ---------------------------------------------------------------------------
# A5 report analytics: longest trip (Project 4.pdf p10 — trip 169302880,
# 5h30m) = group-by duration + top-k.
# ---------------------------------------------------------------------------
@query(
    "q_longest_sessions",
    """
    SELECT user_id,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us,
           COUNT(*) AS n_events
    FROM events
    GROUP BY user_id
    ORDER BY dur_us DESC, user_id ASC
    LIMIT 5
    """,
    doc="Project 4.pdf p10 'longest trip' analog: group-by min/max duration "
    "+ TakeOrderedAndProject top-k (no full sort at scale).",
    tags=("parity", "agg", "topk"),
)
def q_longest_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id")
        .agg(
            (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy(F.desc("dur_us"), F.asc("user_id"))
        .limit(5)
    )


# ---------------------------------------------------------------------------
# A5 DOW profile (Project 4.pdf p7 per-weekday message averages).
# ---------------------------------------------------------------------------
@query(
    "q_dow_profile",
    """
    SELECT dayname(ts) AS dow, COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28, 8))) AS DOUBLE) / COUNT(value) AS avg_value
    FROM events GROUP BY 1
    """,
    doc="Project 4.pdf p7 analog: per-day-of-week volume + mean measure.",
    tags=("parity", "agg"),
)
def q_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(F.date_format("ts", "EEEE").alias("dow")).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.col("value").cast("decimal(28,8)")).cast("double") / F.count("value")).alias(
            "avg_value"
        ),
    )


# ---------------------------------------------------------------------------
# A5 table summaries (Project 4.pdf p8: counts, bounds, distincts).
# min/max are exact value picks — no float arithmetic — so they compare
# bit-exactly against the oracle.
# ---------------------------------------------------------------------------
@query(
    "q_summaries",
    """
    SELECT COUNT(*) AS n_rows,
           MIN(value) AS min_value, MAX(value) AS max_value,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(DISTINCT event_type) AS n_event_types,
           MIN(ts) AS min_ts, MAX(ts) AS max_ts
    FROM events
    """,
    doc="Project 4.pdf p8 analog: table-level profile (count, bounds, "
    "cardinalities) in one pass.",
    tags=("parity", "agg"),
)
def q_summaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.countDistinct("user_id").alias("n_users"),
        F.countDistinct("event_type").alias("n_event_types"),
        F.min("ts").alias("min_ts"),
        F.max("ts").alias("max_ts"),
    )


@query(
    "q_hotspot_grid",
    """
    WITH conf AS (
        SELECT CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) AS DOUBLE) AS latitude,
               CAST(-CAST(json_extract_string(props, '$.k') AS INTEGER) AS DOUBLE) AS longitude,
               CAST(floor(value) AS DOUBLE) AS speed
        FROM events
        WHERE user_id IS NOT NULL
          AND ts IS NOT NULL
          AND (CAST(json_extract_string(props, '$.k') AS INTEGER) * 5 IS NULL
               OR CAST(json_extract_string(props, '$.k') AS INTEGER) * 5 BETWEEN 0 AND 359)
          AND (floor(value) IS NULL OR floor(value) BETWEEN 0 AND 200)
    )
    SELECT CAST(floor(latitude * 4) AS BIGINT) AS lat_cell,
           CAST(floor(longitude * 4) AS BIGINT) AS lon_cell,
           COUNT(*) AS n_points,
           ROUND(CAST(SUM(CAST(speed AS DECIMAL(20,4))) AS DOUBLE) / COUNT(speed), 6)
               AS avg_speed,
           MAX(speed) AS max_speed
    FROM conf
    WHERE latitude IS NOT NULL AND longitude IS NOT NULL
    GROUP BY 1, 2
    """,
    doc="Spatial binning rollup of the reference's published speed map "
    "(Project 4.pdf p13 renders per-GPS-point averages; a real fleet map "
    "grids first): conformed breadcrumbs bucketed into 0.25-degree cells "
    "(floor(coord*4) — engine-portable integer cells, no geohash "
    "dialect), one partial-aggregated shuffle on the cell key. At fleet "
    "scale the cell key is the natural pre-aggregation that makes the "
    "map O(cells), not O(pings); DECIMAL speed sums keep the per-cell "
    "mean bit-stable.",
    tags=("parity", "agg", "geo"),
)
def q_hotspot_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.functions.transforms import conform_breadcrumbs
    from c_tran_data_pipeline_spark.functions.validation import validate

    e = load_table(spark, sf_dir, "events")
    k = json_get("props", "$.k", "int")
    secs_of_day = F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts")
    raw = e.select(
        F.col("user_id").cast("string").alias("EVENT_NO_TRIP"),
        F.lit(None).cast("string").alias("EVENT_NO_STOP"),
        F.upper(F.date_format("ts", "dd-MMM-yy")).alias("OPD_DATE"),
        (F.col("event_id") % 1000).cast("string").alias("VEHICLE_ID"),
        F.lit(None).cast("string").alias("METERS"),
        secs_of_day.cast("string").alias("ACT_TIME"),
        (-k).cast("string").alias("GPS_LONGITUDE"),
        k.cast("string").alias("GPS_LATITUDE"),
        F.lit(None).cast("string").alias("GPS_SATELLITES"),
        F.lit(None).cast("string").alias("GPS_HDOP"),
        (k * 5).cast("string").alias("DIRECTION"),
        F.floor("value").cast("string").alias("VELOCITY"),
    )
    conformed = validate(eval_once(conform_breadcrumbs(raw)))
    return (
        conformed.filter(F.col("latitude").isNotNull() & F.col("longitude").isNotNull())
        .groupBy(
            F.floor(F.col("latitude") * 4).cast("bigint").alias("lat_cell"),
            F.floor(F.col("longitude") * 4).cast("bigint").alias("lon_cell"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(
                F.sum(F.col("speed").cast("decimal(20,4)")).cast("double")
                / F.count("speed"),
                6,
            ).alias("avg_speed"),
            F.max("speed").alias("max_speed"),
        )
    )


@query(
    "q_fk_orphans",
    """
    SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS fk,
           COUNT(*) AS n_fact,
           COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS n_orphans
    FROM lineitem l
    LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
      ON l.l_orderkey = o.o_orderkey
    UNION ALL
    SELECT 'orders.o_custkey->customer.c_custkey' AS fk,
           COUNT(*) AS n_fact,
           COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS n_orphans
    FROM orders ord
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON ord.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'events.user_id->customer.c_custkey' AS fk,
           COUNT(*) AS n_fact,
           COUNT(CASE WHEN c.c_custkey IS NULL THEN 1 END) AS n_orphans
    FROM events e
    LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) c
      ON e.user_id = c.c_custkey
    """,
    doc="J4 as a first-class data-quality operator "
    "(functions/validation.py referential_summary): per-FK audit rows "
    "(fk, n_fact, n_orphans) for the fixture's three fact→dim "
    "relationships — the queryable form of the reference's FOREIGN KEY "
    "(trip_id) declaration + Trip-before-BreadCrumb write order "
    "(topic_consumer.py:101,204-205); the streaming E1 test asserts "
    "the same invariant via referential_check (orphan anti-join == "
    "empty) after the pipeline runs. Each audit is ONE pass: left "
    "join of the fact's key column against distinct dim keys, counts "
    "folded into a single aggregate — key-width shuffle regardless of "
    "fact row size, no orphan materialization. COUNT(CASE...) keeps "
    "both engines in BIGINT (the r01 HUGEINT lesson).",
    tags=("validation", "join", "report", "parity"),
)
def q_fk_orphans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.functions.validation import referential_summary

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    events = load_table(spark, sf_dir, "events")
    return (
        referential_summary(
            li, orders, "l_orderkey", "o_orderkey",
            "lineitem.l_orderkey->orders.o_orderkey",
        )
        .unionAll(
            referential_summary(
                orders, customer, "o_custkey", "c_custkey",
                "orders.o_custkey->customer.c_custkey",
            )
        )
        .unionAll(
            referential_summary(
                events, customer, "user_id", "c_custkey",
                "events.user_id->customer.c_custkey",
            )
        )
    )


@query(
    "q_variant_props",
    """
    WITH e AS (
        SELECT event_type,
               CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
               json_valid(props) AS ok
        FROM events
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_parsed,
           CAST(SUM(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_missing_k,
           CAST(SUM(k) AS BIGINT) AS sum_k,
           CAST(MIN(k) AS BIGINT) AS min_k,
           CAST(MAX(k) AS BIGINT) AS max_k
    FROM e GROUP BY 1
    """,
    doc="Semi-structured props via Spark 4's VARIANT type: "
    "try_parse_json parses each props payload ONCE into the "
    "binary-encoded variant (malformed payloads become NULL variants "
    "instead of task failures — the PERMISSIVE-quarantine philosophy "
    "at the cell level), then variant_get extracts the typed path from "
    "the encoded form — repeated path reads decode the binary "
    "encoding, where the legacy get_json_object RE-PARSES the JSON "
    "string per call (the reference parses props with json.loads per "
    "row, topic_consumer.py:106-165; this is that step as a columnar "
    "one-parse plan). Per-type audit aggregate: parse success, "
    "missing-key, and exact integer stats over $.k. Oracle: DuckDB "
    "extracts the same paths from the JSON text — value-identical, "
    "engine-native encodings on both sides.",
    tags=("parity", "json", "variant"),
)
def q_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "props")
    v = e.select(
        "event_type",
        F.try_parse_json("props").alias("v"),
    ).select(
        "event_type",
        F.col("v").isNotNull().alias("ok"),
        F.variant_get("v", "$.k", "int").alias("k"),
    )
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).cast("bigint").alias("n_parsed"),
        F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).cast("bigint").alias("n_missing_k"),
        F.sum("k").cast("bigint").alias("sum_k"),
        F.min("k").cast("bigint").alias("min_k"),
        F.max("k").cast("bigint").alias("max_k"),
    )
