"""Headline analytic queries: the OLAP shapes the reference's report ran
(aggregation summaries) plus the standard patterns a warehouse engine must
nail — pricing summary (TPC-H Q1 shape), top-k per group, sessionization.

Cross-engine float policy: sums are computed in exact DECIMAL and cast to
DOUBLE (associativity-proof — a parallel Spark sum and a serial DuckDB sum
of doubles may differ in low bits; decimal sums cannot), and averages are
derived from those exact sums. Durations use integer microseconds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c_tran_data_pipeline_spark.plans.registry import query
from c_tran_data_pipeline_spark.sources.readers import load_table


# ---------------------------------------------------------------------------
# TPC-H Q1-shape pricing summary over lineitem (the canonical scan-heavy
# group-by; whole-stage codegen end-to-end, 2-key hash agg, predicate pushed
# to parquet).
# ---------------------------------------------------------------------------
@query(
    "q_pricing_summary",
    """
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28, 8))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28, 8))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28, 8))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28, 8))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28, 8))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28, 8))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(28, 8))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: pushdown filter + 2-key hash aggregate with 8 "
    "aggregates; exact-decimal sums for cross-engine bit stability.",
    tags=("analytics", "agg", "bench"),
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec = lambda c: c.cast("decimal(28,8)")  # noqa: E731
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec(F.col("l_quantity"))).cast("double").alias("sum_qty"),
            F.sum(dec(F.col("l_extendedprice"))).cast("double").alias("sum_base_price"),
            F.sum(dec(disc_price)).cast("double").alias("sum_disc_price"),
            F.sum(dec(charge)).cast("double").alias("sum_charge"),
            (F.sum(dec(F.col("l_quantity"))).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(dec(F.col("l_extendedprice"))).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            (F.sum(dec(F.col("l_discount"))).cast("double") / F.count(F.lit(1))).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


# ---------------------------------------------------------------------------
# Top-K per group (SURVEY.md §2.7: the reference's report top-1 queries,
# generalized). Window + row_number; Catalyst runs it as one shuffle on the
# partition key.
# ---------------------------------------------------------------------------
@query(
    "q_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        FROM orders
    ) WHERE rn <= 3
    """,
    doc="Top-K per group: window row_number, deterministic tie-break on key.",
    tags=("analytics", "window", "topk"),
)
def q_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") <= 3)
        .drop("rn")
    )


# ---------------------------------------------------------------------------
# Gap-based sessionization (30 min) — the standard event-stream operator
# (guide §OLAP patterns); lag → flag → running sum → per-session agg. In
# streaming this is session_window(ts, gap) — see streaming/pipeline.py.
# ---------------------------------------------------------------------------
# ---------------------------------------------------------------------------
# Tumbling event-time window (T7 extension: the hotspot-over-time shape).
# Exactly the aggregation the streaming pipeline runs with
# withWatermark+window — batch and stream share the plan; the oracle is
# date_trunc since aligned tumbling windows == truncation.
# ---------------------------------------------------------------------------
@query(
    "q_window_hourly",
    """
    SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(28, 8))) AS DOUBLE) / COUNT(value) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Tumbling 1h event-time window aggregation (F.window) — the "
    "Structured Streaming windowed-agg plan run in batch; partial "
    "aggregation map-side, one shuffle on (window, type).",
    tags=("analytics", "window", "streaming"),
)
def q_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (F.sum(F.col("value").cast("decimal(28,8)")).cast("double") / F.count("value")).alias(
                "avg_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "avg_value",
        )
    )


@query(
    "q_sessionize",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), numbered AS (
        SELECT user_id, ts, event_id,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM flagged
    )
    SELECT user_id, session_seq,
           COUNT(*) AS n_events,
           epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS dur_us
    FROM numbered
    GROUP BY user_id, session_seq
    """,
    doc="Sessionization: lag + gap>30min flag + running sum session ids + "
    "per-session aggregates. One shuffle on user_id serves both windows "
    "and the final group-by.",
    tags=("analytics", "window", "sessionize"),
)
def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_seq", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return numbered.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("dur_us"),
    )


@query(
    "q_profile_events",
    """
    SELECT 'event_id' AS column_name, COUNT(*) AS n_rows,
           COUNT(*) - COUNT(event_id) AS n_nulls,
           COUNT(DISTINCT event_id) AS n_distinct
    FROM events
    UNION ALL
    SELECT 'user_id', COUNT(*), COUNT(*) - COUNT(user_id), COUNT(DISTINCT user_id) FROM events
    UNION ALL
    SELECT 'event_type', COUNT(*), COUNT(*) - COUNT(event_type), COUNT(DISTINCT event_type) FROM events
    UNION ALL
    SELECT 'value', COUNT(*), COUNT(*) - COUNT(value), COUNT(DISTINCT value) FROM events
    """,
    doc="Column profiling (count / nulls / distinct per column) — the "
    "ingest health check every pipeline runs before trusting a new "
    "dump. ONE scan, one aggregate: all per-column stats are computed "
    "as parallel aggregate expressions then unpivoted with stack(), vs "
    "the oracle's four scans — same numbers, 4× less I/O.",
    tags=("parity", "agg", "profiling"),
)
def q_profile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cols = ["event_id", "user_id", "event_type", "value"]
    aggd = e.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.count(c).alias(f"__nn_{c}") for c in cols],
        *[F.countDistinct(c).alias(f"__nd_{c}") for c in cols],
    )
    stack = ", ".join(f"'{c}', __n - __nn_{c}, __nd_{c}" for c in cols)
    return aggd.selectExpr(
        f"stack({len(cols)}, {stack}) AS (column_name, n_nulls, n_distinct)", "__n AS n_rows"
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


@query(
    "q_event_transitions",
    """
    WITH seq AS (
        SELECT LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type,
               event_type AS next_type
        FROM events
    ),
    pairs AS (
        SELECT prev_type, next_type, COUNT(*) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           ROUND(CAST(n AS DOUBLE)
                 / CAST(SUM(n) OVER (PARTITION BY prev_type) AS DOUBLE),
                 12) AS p
    FROM pairs
    """,
    doc="First-order Markov transition matrix over per-user event "
    "streams: lag(event_type) over (user, ts, event_id), count each "
    "(prev, next) pair, and normalize rows to transition probabilities "
    "— the behavioral-model shape behind next-event prediction, funnel "
    "anomaly detection and session-synthesis sampling. One shuffle on "
    "user_id for the lag, one partial-agg shuffle on the pair, then a "
    "window over prev_type — and that matrix is bounded by "
    "|event_types|² regardless of row count, so the final window is "
    "over a tiny relation however large the input. Probabilities are "
    "exact-integer ratios (n and the row total are both < 2^53) with "
    "one IEEE division, rounded to 12 — bit-stable across engines "
    "(q_hits float policy).",
    tags=("analytics", "window", "markov"),
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(F.lag("event_type").over(w).alias("prev_type"),
                 F.col("event_type").alias("next_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "next_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n").cast("double") / F.sum("n").over(tot).cast("double"), 12).alias("p"),
    )


@query(
    "q_trimmed_mean",
    """
    WITH r AS (
        SELECT event_type, value, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY value, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events WHERE value IS NOT NULL
    )
    SELECT event_type,
           COUNT(*) AS n_kept,
           ROUND(CAST(SUM(CAST(value AS DECIMAL(28, 8))) AS DOUBLE) / COUNT(*), 12)
               AS trimmed_mean
    FROM r
    WHERE rn > n // 10 AND rn <= n - n // 10
    GROUP BY event_type
    """,
    doc="10% two-sided trimmed mean of event value per type — the "
    "robust-location estimator that shrugs off the heavy tails and "
    "sensor glitches a plain AVG absorbs (companion to q_mad_outliers' "
    "robust-scale estimator). One shuffle on event_type serves the "
    "rank window, the count window and the final aggregate; trim "
    "bounds are integer arithmetic (n DIV 10 — no float percentile "
    "boundary to disagree on), ranks tie-break on event_id for "
    "determinism, and the kept values sum in exact DECIMAL (float "
    "policy). At scale the window is per-group (parallel across "
    "types); for a single giant group the same trim is expressible as "
    "two approx-quantile passes — this exact form is the oracle-able "
    "twin.",
    tags=("analytics", "window", "stats"),
)
def q_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select("event_type", "value", "event_id")
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    r = e.select(
        "event_type",
        "value",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    kept = r.filter(
        (F.col("rn") > F.expr("n DIV 10")) & (F.col("rn") <= F.col("n") - F.expr("n DIV 10"))
    )
    return kept.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.round(
            F.sum(F.col("value").cast("decimal(28,8)")).cast("double")
            / F.count(F.lit(1)),
            12,
        ).alias("trimmed_mean"),
    )


@query(
    "q_attribution",
    """
    WITH touches AS (
        SELECT user_id, ts, event_id, event_type FROM events
        WHERE event_type IN ('view', 'click')
    ),
    purchases AS (
        SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase'
    ),
    j AS (
        SELECT p.event_id AS pid, p.user_id, t.event_id AS tid,
               t.event_type AS ttype, t.ts
        FROM purchases p
        JOIN touches t
          ON t.user_id = p.user_id
         AND t.ts <= p.ts
         AND t.ts >= p.ts - INTERVAL 7 DAY
    ),
    r AS (
        SELECT pid, user_id, tid, ttype,
               ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ts ASC, tid ASC) AS rf,
               ROW_NUMBER() OVER (PARTITION BY pid ORDER BY ts DESC, tid DESC) AS rl,
               COUNT(*) OVER (PARTITION BY pid) AS n_touches
        FROM j
    )
    SELECT pid AS purchase_id, user_id, n_touches,
           MAX(CASE WHEN rf = 1 THEN tid END) AS first_touch_id,
           MAX(CASE WHEN rf = 1 THEN ttype END) AS first_touch_type,
           MAX(CASE WHEN rl = 1 THEN tid END) AS last_touch_id,
           MAX(CASE WHEN rl = 1 THEN ttype END) AS last_touch_type
    FROM r GROUP BY pid, user_id, n_touches
    """,
    doc="Marketing-style touch attribution: for every purchase, the "
    "FIRST and LAST view/click by the same user in the preceding 7 "
    "days, plus the touch count — the first-touch/last-touch pair "
    "every attribution model starts from (multi-touch weights are a "
    "projection over the same joined relation). The candidate join is "
    "user-keyed with a time-band predicate (the q_range_join_follows "
    "shape: equi-join on user_id carries the shuffle, the 7-day band "
    "is a post-filter bounded by events-per-user), then two rank "
    "windows per purchase pick the endpoints deterministically "
    "(event_id tie-break). Purchases with no touch in window drop out "
    "(inner semantics — the unattributed set is the anti-join, "
    "q_antijoin_absent shape).",
    tags=("analytics", "window", "join"),
)
def q_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    touches = e.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_id").alias("tid"),
        F.col("event_type").alias("ttype"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("pid")
    )
    j = purchases.join(
        touches,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAY")),
    )
    wf = Window.partitionBy("pid").orderBy(F.col("t_ts").asc(), F.col("tid").asc())
    wl = Window.partitionBy("pid").orderBy(F.col("t_ts").desc(), F.col("tid").desc())
    wn = Window.partitionBy("pid")
    r = j.select(
        "pid",
        "user_id",
        "tid",
        "ttype",
        F.row_number().over(wf).alias("rf"),
        F.row_number().over(wl).alias("rl"),
        F.count(F.lit(1)).over(wn).alias("n_touches"),
    )
    return r.groupBy(
        F.col("pid").alias("purchase_id"), "user_id", "n_touches"
    ).agg(
        F.max(F.when(F.col("rf") == 1, F.col("tid"))).alias("first_touch_id"),
        F.max(F.when(F.col("rf") == 1, F.col("ttype"))).alias("first_touch_type"),
        F.max(F.when(F.col("rl") == 1, F.col("tid"))).alias("last_touch_id"),
        F.max(F.when(F.col("rl") == 1, F.col("ttype"))).alias("last_touch_type"),
    )


@query(
    "q_autocorr_daily",
    """
    WITH hc AS (
        SELECT event_type, date_trunc('hour', ts) AS h, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    j AS (
        SELECT a.event_type, a.c AS x, b.c AS y
        FROM hc a
        JOIN hc b
          ON b.event_type = a.event_type
         AND b.h = a.h + INTERVAL 24 HOUR
    ),
    s AS (
        SELECT event_type, COUNT(*) AS n,
               CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(x * x) AS DOUBLE) AS sxx,
               CAST(SUM(y * y) AS DOUBLE) AS syy,
               CAST(SUM(x * y) AS DOUBLE) AS sxy
        FROM j GROUP BY event_type
    )
    SELECT event_type, n AS n_hour_pairs,
           ROUND((CAST(n AS DOUBLE) * sxy - sx * sy)
                 / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                        * (CAST(n AS DOUBLE) * syy - sy * sy)), 12) AS autocorr_24h
    FROM s
    """,
    doc="Daily periodicity probe: Pearson autocorrelation of hourly "
    "event counts at lag 24h, per event type — high values mean the "
    "stream has a daily rhythm (organic traffic), near-zero means "
    "arrivals are memoryless (the fixture's synthetic uniform stream — "
    "the anomaly this probe flags on real pipelines where a flat "
    "profile would mean instrumentation loss). The lag join is an "
    "EQUI-join on (event_type, hour+24h) — hours are discrete, so no "
    "range predicate, no window over the full series; counts are "
    "exact integers, the sufficient statistics are exact-integer sums "
    "cast once to DOUBLE (q_degree_assortativity policy), one IEEE "
    "expression per type rounded to 12. Scale: everything after the "
    "first groupBy runs on the |types|·|hours| grain.",
    tags=("analytics", "stats", "join"),
)
def q_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hc = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("c"))
    a, b = hc.alias("a"), hc.alias("b")
    j = a.join(
        b,
        (F.col("b.event_type") == F.col("a.event_type"))
        & (F.col("b.h") == F.col("a.h") + F.expr("INTERVAL 24 HOURS")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        F.col("a.c").alias("x"),
        F.col("b.c").alias("y"),
    )
    s = j.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    nd = F.col("n").cast("double")
    return s.select(
        "event_type",
        F.col("n").alias("n_hour_pairs"),
        F.round(
            (nd * F.col("sxy") - F.col("sx") * F.col("sy"))
            / F.sqrt(
                (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
                * (nd * F.col("syy") - F.col("sy") * F.col("sy"))
            ),
            12,
        ).alias("autocorr_24h"),
    )


@query(
    "q_user_entropy",
    """
    WITH c AS (
        SELECT user_id, event_type, COUNT(*) AS c
        FROM events GROUP BY 1, 2
    ),
    w AS (
        SELECT user_id,
               CAST(SUM(CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) * c)
                    AS BIGINT) AS sw,
               CAST(SUM(c) AS BIGINT) AS n,
               COUNT(*) AS n_types
        FROM c GROUP BY 1
    )
    SELECT user_id, n AS n_events, n_types,
           ROUND(ln(CAST(n AS DOUBLE))
                 - (CAST(sw AS DOUBLE) / 1000000.0) / CAST(n AS DOUBLE), 12)
               AS entropy
    FROM w
    """,
    doc="Per-user Shannon entropy of the event-type mix — the behavioral-"
    "diversity score (bots and scrapers concentrate on one event type → "
    "entropy ≈ 0; organic users spread → entropy near ln(n_types)); the "
    "per-ACCOUNT sibling of q_char_entropy's per-document score, and a "
    "standard feature for traffic-quality filtering before a behavioral "
    "corpus is admitted to training. Exactness is the q_corr_matrix "
    "integerization: H = ln(n) − (Σ c·ln c)/n, where each c·ln c term is "
    "round(ln(c)·1e6)·c — an exact BIGINT product summed exactly — so "
    "the only IEEE math is one fixed-shape final expression, rounded to "
    "12. Plan: two partial-first aggregations sharing the user_id "
    "partitioning (the (user,type) grain then the user grain — AQE "
    "reuses the exchange); no window, no join, no data movement beyond "
    "the one keyed shuffle. At 100 TB the (user,type) grain is the "
    "bound, not event volume.",
    tags=("analytics", "stats", "quality"),
)
def q_user_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("c"))
    w = c.groupBy("user_id").agg(
        F.sum(
            F.round(F.log(F.col("c").cast("double")) * 1000000).cast("bigint")
            * F.col("c")
        )
        .cast("bigint")
        .alias("sw"),
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).alias("n_types"),
    )
    return w.select(
        "user_id",
        F.col("n").alias("n_events"),
        "n_types",
        F.round(
            F.log(F.col("n").cast("double"))
            - (F.col("sw").cast("double") / F.lit(1000000.0)) / F.col("n").cast("double"),
            12,
        ).alias("entropy"),
    )


@query(
    "q_session_ngrams",
    """
    WITH flagged AS (
        SELECT user_id, ts, event_id, event_type,
               CASE WHEN LAG(ts) OVER w IS NULL
                         OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id, event_type,
               CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        FROM flagged
    ),
    tri AS (
        SELECT event_type || '>' || LEAD(event_type, 1) OVER w2
                          || '>' || LEAD(event_type, 2) OVER w2 AS trigram
        FROM numbered
        WINDOW w2 AS (PARTITION BY user_id, session_seq ORDER BY ts, event_id)
    ),
    cnt AS (SELECT trigram, COUNT(*) AS n FROM tri WHERE trigram IS NOT NULL GROUP BY 1)
    SELECT trigram, n, rank FROM (
        SELECT trigram, n,
               ROW_NUMBER() OVER (ORDER BY n DESC, trigram) AS rank
        FROM cnt
    ) WHERE rank <= 10
    """,
    doc="Top-10 within-session event-type trigrams — the path-mining "
    "pass behind 'what do users do right before purchasing' and the "
    "sequence-vocabulary input to behavioral-cloning corpora (the "
    "event-stream sibling of q_bigram_pmi's text collocations). "
    "Sessionization is the exact q_sessionize dataflow (lag + gap>30min "
    "flag + running-sum ids); trigrams come from two LEADs inside the "
    "(user, session) window — the session boundary truncates n-grams "
    "for free because LEAD returns NULL past the partition edge and "
    "concat of NULL is NULL in both engines. ONE hash exchange on "
    "user_id serves the session windows AND the trigram window (the "
    "(user, session) key is a refinement of user — no second shuffle), "
    "then the count agg is partial-first on the trigram key. The final "
    "top-10 window runs on the |distinct trigrams| grain (≤ |types|³ "
    "rows — 125 here), deterministic via the (n DESC, trigram) "
    "tie-break.",
    tags=("analytics", "window", "sessionize", "topk"),
)
def q_session_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap_us = 30 * 60 * 1_000_000
    flagged = e.withColumn(
        "new_session",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    numbered = flagged.withColumn(
        "session_seq",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    w2 = Window.partitionBy("user_id", "session_seq").orderBy("ts", "event_id")
    tri = numbered.select(
        F.concat(
            F.col("event_type"),
            F.lit(">"),
            F.lead("event_type", 1).over(w2),
            F.lit(">"),
            F.lead("event_type", 2).over(w2),
        ).alias("trigram")
    ).filter(F.col("trigram").isNotNull())
    cnt = tri.groupBy("trigram").agg(F.count(F.lit(1)).alias("n"))
    ranked = cnt.select(
        "trigram",
        "n",
        F.row_number().over(Window.orderBy(F.desc("n"), F.asc("trigram"))).alias("rank"),
    )
    return ranked.filter(F.col("rank") <= 10)


@query(
    "q_chi2_independence",
    """
    WITH o AS (
        SELECT event_type, dayofweek(ts) + 1 AS dow, COUNT(*) AS n_obs
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, dow, n_obs,
               CAST(SUM(n_obs) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
               CAST(SUM(n_obs) OVER (PARTITION BY dow) AS BIGINT) AS ct,
               CAST(SUM(n_obs) OVER () AS BIGINT) AS n
        FROM o
    )
    SELECT event_type, dow, n_obs,
           ROUND(CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE), 12)
               AS expected,
           ROUND((CAST(n_obs AS DOUBLE)
                  - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(n_obs AS DOUBLE)
                    - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)), 12)
               AS chi2_term
    FROM m
    """,
    doc="Chi-square independence audit of event_type × day-of-week — the "
    "contingency test behind 'is traffic mix shifting by weekday' drift "
    "checks and label-balance audits (per-cell terms stay exposed so "
    "the report shows WHICH cell deviates, the q_benford_audit policy; "
    "on a fully-observed grid the statistic is their sum — with EMPTY "
    "cells each absent cell additionally contributes its expected "
    "count, which q_cramers_v handles via the Σo²/e − N identity). "
    "Exactness: observed/row/column/grand "
    "totals are exact integers; expected = rt·ct/N and the chi² term "
    "are fixed-shape IEEE expressions written identically in both "
    "engines (rt·ct ≤ N² ≈ 1e14 at sf1 — exact in a double's 53-bit "
    "mantissa), rounded to 12. Plan: ONE fact scan partial-aggregates "
    "to the (type, dow) grain — 35 cells — and the row/column/grand "
    "margins are WINDOW sums over that cell table (re-aggregating each "
    "margin from events would re-scan the fact table 4×; the windows "
    "run on 35 rows). Spark dayofweek(=1 Sunday) vs DuckDB "
    "dayofweek(=0 Sunday) reconciled by +1 on the oracle side.",
    tags=("analytics", "stats", "quality"),
)
def q_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    o = e.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    # Grand total as a broadcast 1-row scalar instead of SUM OVER ():
    # removes the Exchange SinglePartition → WindowExec (and its driver-log
    # warning) honestly (VERDICT r7 #7). Both branches aggregate the SAME
    # (event_type, dow) exchange, so Spark's exchange reuse keeps this one
    # fact scan (plan-gated in tests/test_scale.py).
    total = o.agg(F.sum("n_obs").cast("bigint").alias("n"))
    m = o.select(
        "event_type",
        "dow",
        "n_obs",
        F.sum("n_obs").over(Window.partitionBy("event_type")).cast("bigint").alias("rt"),
        F.sum("n_obs").over(Window.partitionBy("dow")).cast("bigint").alias("ct"),
    ).crossJoin(F.broadcast(total))
    exp_ = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("n").cast("double")
    dev = F.col("n_obs").cast("double") - exp_
    return m.select(
        "event_type",
        "dow",
        "n_obs",
        F.round(exp_, 12).alias("expected"),
        F.round(dev * dev / exp_, 12).alias("chi2_term"),
    )


@query(
    "q_interarrival_stats",
    """
    WITH g AS (
        SELECT event_type, event_id,
               epoch_us(ts) - epoch_us(LAG(ts) OVER w) AS gap_us
        FROM events
        WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    ),
    r AS (
        SELECT event_type, gap_us,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY gap_us, event_id) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM g WHERE gap_us IS NOT NULL
    )
    SELECT event_type,
           MAX(n) AS n_gaps,
           MIN(gap_us) AS min_gap_us,
           MAX(gap_us) AS max_gap_us,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_us END) AS median_gap_us,
           MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN gap_us END) AS p90_gap_us
    FROM r GROUP BY event_type
    """,
    doc="Inter-arrival gap statistics per event type: count, min, max, "
    "exact lower-median and exact p90 of consecutive-arrival gaps — "
    "the stream-health profile (a heartbeat's median gap IS its "
    "period; a p90 blowout is backpressure or an outage; "
    "q_debounce_heartbeat flags individual gaps, this characterizes "
    "the distribution). ENTIRELY integer: gaps are exact µs from the "
    "lag window, and both quantiles are RANK PICKS — row_number with "
    "an event_id tie-break, selecting index (n+1) DIV 2 and "
    "ceil(9n/10) = (9n+9) DIV 10 — no averaging, no IEEE math "
    "anywhere, so the oracle matches bit-for-bit (the "
    "q_theilsen_trend median policy applied to time gaps). Plan: ONE "
    "hash exchange on event_type serves the lag window, the rank "
    "window, and the final aggregate (same key throughout); the "
    "conditional-max idiom turns the quantile picks into one "
    "partial-aggregable pass instead of per-quantile self-joins.",
    tags=("analytics", "window", "stats", "streaming"),
)
def q_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "event_id", "ts")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = e.select(
        "event_type",
        "event_id",
        (F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("gap_us", "event_id")
    wn = Window.partitionBy("event_type")
    r = g.select(
        "event_type",
        "gap_us",
        F.row_number().over(wr).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    median_rn = F.expr("(n + 1) DIV 2")
    p90_rn = F.expr("(9 * n + 9) DIV 10")
    return r.groupBy("event_type").agg(
        F.max("n").alias("n_gaps"),
        F.min("gap_us").alias("min_gap_us"),
        F.max("gap_us").alias("max_gap_us"),
        F.max(F.when(F.col("rn") == median_rn, F.col("gap_us"))).alias("median_gap_us"),
        F.max(F.when(F.col("rn") == p90_rn, F.col("gap_us"))).alias("p90_gap_us"),
    )


@query(
    "q_cramers_v",
    """
    WITH o AS (
        SELECT event_type, dayofweek(ts) + 1 AS dow, COUNT(*) AS n_obs
        FROM events GROUP BY 1, 2
    ),
    m AS (
        SELECT event_type, dow, n_obs,
               CAST(SUM(n_obs) OVER (PARTITION BY event_type) AS BIGINT) AS rt,
               CAST(SUM(n_obs) OVER (PARTITION BY dow) AS BIGINT) AS ct,
               CAST(SUM(n_obs) OVER () AS BIGINT) AS n
        FROM o
    ),
    t AS (
        SELECT CAST(round(
                   CAST(n_obs AS DOUBLE) * CAST(n_obs AS DOUBLE)
                   / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
                   * 1000000) AS BIGINT) AS term_e6,
               event_type, dow, n
        FROM m
    )
    SELECT CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_rows_cat,
           CAST(COUNT(DISTINCT dow) AS BIGINT) AS n_cols_cat,
           MAX(n) AS n_total,
           ROUND(CAST(SUM(CAST(term_e6 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0
                 - CAST(MAX(n) AS DOUBLE), 6) AS chi2,
           (COUNT(DISTINCT event_type) - 1) * (COUNT(DISTINCT dow) - 1) AS dof,
           ROUND(sqrt((CAST(SUM(CAST(term_e6 AS DECIMAL(38,0))) AS DOUBLE) / 1000000.0
                       - CAST(MAX(n) AS DOUBLE))
                      / (CAST(MAX(n) AS DOUBLE)
                         * CAST(least(COUNT(DISTINCT event_type) - 1,
                                      COUNT(DISTINCT dow) - 1) AS DOUBLE))), 6)
               AS cramers_v
    FROM t
    """,
    doc="Cramér's V effect size for the event_type × weekday "
    "association — the 0-to-1 'how strong is the dependence' scalar "
    "that q_chi2_independence's per-cell report rolls up to (chi² "
    "grows with N even for trivial effects; V = sqrt(chi²/(N·min(r−1,"
    "c−1))) is the size-free number a drift monitor thresholds on). "
    "SPARSE-GRID CORRECTNESS: the cell table only holds OBSERVED "
    "(type, dow) combos, and an empty cell still contributes its "
    "expected count to chi² — so the statistic uses the identity "
    "chi² = Σ o²/e − N (over all cells Σ(o−e)²/e = Σo²/e − 2N + Σe "
    "with Σe = N; an empty cell's o²/e is 0), which needs NO "
    "densification cross-join and no second fact scan (a test pins a "
    "perfectly-associated 2×2 grid, half of whose cells are empty, at "
    "exactly V = 1). Cross-engine exactness of a SUM of IEEE terms: "
    "each o²/e term is integerized to micro-units (round(·1e6) → "
    "BIGINT, the q_corr_matrix recipe) so the sum is exact DECIMAL "
    "regardless of summation order; chi2 and V are then single IEEE "
    "expressions rounded to 6 (the terms' own 1e-6 quantization "
    "bounds meaningful precision). Plan: the q_chi2_independence "
    "dataflow (one fact scan, margin windows on the observed-cell "
    "grain) + one 1-row final aggregate.",
    tags=("analytics", "stats", "quality"),
)
def q_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    o = e.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count(F.lit(1)).alias("n_obs"))
    # Broadcast-scalar grand total, not SUM OVER () — see
    # q_chi2_independence (VERDICT r7 #7; exchange reuse keeps one scan).
    total = o.agg(F.sum("n_obs").cast("bigint").alias("n"))
    m = o.select(
        "event_type",
        "dow",
        "n_obs",
        F.sum("n_obs").over(Window.partitionBy("event_type")).cast("bigint").alias("rt"),
        F.sum("n_obs").over(Window.partitionBy("dow")).cast("bigint").alias("ct"),
    ).crossJoin(F.broadcast(total))
    exp_ = F.col("rt").cast("double") * F.col("ct").cast("double") / F.col("n").cast("double")
    obs = F.col("n_obs").cast("double")
    t = m.select(
        F.round(obs * obs / exp_ * 1000000).cast("bigint").alias("term_e6"),
        "event_type",
        "dow",
        "n",
    )
    chi2 = (
        F.sum(F.col("term_e6").cast("decimal(38,0)")).cast("double") / F.lit(1000000.0)
        - F.max("n").cast("double")
    )
    r_1 = F.countDistinct("event_type") - 1
    c_1 = F.countDistinct("dow") - 1
    return t.agg(
        F.countDistinct("event_type").cast("bigint").alias("n_rows_cat"),
        F.countDistinct("dow").cast("bigint").alias("n_cols_cat"),
        F.max("n").alias("n_total"),
        F.round(chi2, 6).alias("chi2"),
        (r_1 * c_1).alias("dof"),
        F.round(
            F.sqrt(chi2 / (F.max("n").cast("double") * F.least(r_1, c_1).cast("double"))), 6
        ).alias("cramers_v"),
    )


@query(
    "q_conversion_latency",
    """
    WITH v AS (SELECT user_id, MIN(ts) AS t_view FROM events
               WHERE event_type = 'view' GROUP BY 1),
    p AS (SELECT e.user_id, MIN(e.ts) AS t_purchase
          FROM events e JOIN v USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts > v.t_view GROUP BY 1),
    lat AS (
        SELECT v.user_id,
               epoch_us(p.t_purchase) - epoch_us(v.t_view) AS latency_us
        FROM v JOIN p USING (user_id)
    ),
    r AS (
        SELECT latency_us,
               ROW_NUMBER() OVER (ORDER BY latency_us, user_id) AS rn,
               COUNT(*) OVER () AS n
        FROM lat
    )
    SELECT MAX(n) AS n_converted,
           MIN(latency_us) AS min_latency_us,
           MAX(latency_us) AS max_latency_us,
           MAX(CASE WHEN rn = (n + 1) // 2 THEN latency_us END) AS median_latency_us,
           MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN latency_us END) AS p90_latency_us
    FROM r
    """,
    doc="Time-to-convert distribution: first view → first subsequent "
    "purchase latency per user, summarized as exact n/min/max/median/"
    "p90 — the 'how long does the funnel take' report layered on "
    "q_funnel_steps' sequence semantics (strictly-after ordering; "
    "never-converting users drop via the inner join, matching the "
    "funnel's NULL progression). All integer µs with rank-pick "
    "quantiles ((n+1) DIV 2, (9n+9) DIV 10 — the q_interarrival_stats "
    "idiom), so the result is exact end to end. Plan: two user-keyed "
    "partial-aggregated MINs sharing one partitioning (funnel "
    "cascade), then the rank window runs on the |converted users| "
    "grain — at 100 TB that's the post-funnel survivor set, orders "
    "of magnitude below event volume.",
    tags=("analytics", "funnel", "stats", "window"),
)
def q_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    lat = v.join(p, "user_id").select(
        "user_id",
        (F.unix_micros("t_purchase") - F.unix_micros("t_view")).alias("latency_us"),
    )
    # Exact rank picks via the range-partitioned global rank
    # (operators/rank.py) — scale-safe even though the |converted
    # users| grain is already far below event volume.
    from c_tran_data_pipeline_spark.operators.rank import global_rank

    r = global_rank(
        lat, ["latency_us", "user_id"], rank_col="rn", total_col="n"
    ).select("latency_us", "rn", "n")
    return r.agg(
        F.max("n").alias("n_converted"),
        F.min("latency_us").alias("min_latency_us"),
        F.max("latency_us").alias("max_latency_us"),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("latency_us"))).alias(
            "median_latency_us"
        ),
        F.max(F.when(F.col("rn") == F.expr("(9 * n + 9) DIV 10"), F.col("latency_us"))).alias(
            "p90_latency_us"
        ),
    )


@query(
    "q_survival_curve",
    """
    WITH l0 AS (
        SELECT user_id, MIN(epoch_us(ts)) AS first_us,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS conv_us
        FROM events GROUP BY 1
    ),
    g AS (SELECT MAX(epoch_us(ts)) AS gmax FROM events),
    l AS (
        SELECT user_id,
               CASE WHEN conv_us IS NOT NULL THEN (conv_us - first_us) // 86400000000
                    ELSE (gmax - first_us) // 86400000000 END AS dur_days,
               conv_us IS NOT NULL AS observed
        FROM l0, g
    ),
    tot AS (SELECT COUNT(*) AS n FROM l),
    steps AS (
        SELECT dur_days, SUM(CAST(observed AS INT)) AS d, COUNT(*) AS ties
        FROM l GROUP BY 1
    ),
    risk AS (
        SELECT dur_days, d,
               (SELECT n FROM tot)
               - COALESCE(SUM(ties) OVER (ORDER BY dur_days
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n_risk
        FROM steps
    ),
    f AS (
        SELECT dur_days, d, n_risk,
               CASE WHEN n_risk > d THEN
                   CAST(round(ln(CAST(n_risk - d AS DOUBLE) / CAST(n_risk AS DOUBLE))
                              * 1000000) AS BIGINT)
               ELSE 0 END AS lnm,
               CAST(n_risk = d AS INT) AS iszero
        FROM risk WHERE d > 0
    )
    SELECT CAST(dur_days AS BIGINT) AS dur_days,
           CAST(d AS BIGINT) AS n_converted,
           CAST(n_risk AS BIGINT) AS n_risk,
           CASE WHEN MAX(iszero) OVER (ORDER BY dur_days
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1 THEN 0.0
                ELSE ROUND(exp(CAST(SUM(lnm) OVER (ORDER BY dur_days
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
                     / 1e6), 12) END AS survival
    FROM f
    """,
    doc="Kaplan-Meier survival curve for time-to-conversion (first event "
    "→ first purchase, in whole days): the censoring-correct version of "
    "q_conversion_latency — users who never purchase are RIGHT-CENSORED "
    "at the observation horizon instead of dropped, which is what makes "
    "the estimator unbiased when the window cuts lifetimes short (the "
    "survival-analysis shape behind retention curves, label-delay "
    "studies, and churn models). Exactness: S(t) = Π(1 − d/n) computed "
    "as exp of an exact integer cumulative sum of round(ln(·)·1e6) "
    "log-micros (the q_user_entropy integerization applied to a running "
    "PRODUCT), with an explicit zero-propagation flag for the n=d step "
    "(ln 0 diverges between engines — Spark nulls, DuckDB throws); "
    "durations are integer µs floor-division (CAST truncation vs "
    "rounding differs across engines — measured, not hypothetical). "
    "Plan: one user-keyed agg (first/conv timestamps share the "
    "partitioning), the horizon re-enters as a broadcast 1-row scalar, "
    "then the day-grain table (≤ observation days) carries two windows "
    "and the final projection — everything after the first agg is "
    "calendar-bounded, not data-bounded.",
    tags=("analytics", "stats", "window"),
)
def q_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    DAY = 86_400_000_000
    us = F.unix_micros(F.col("ts"))
    base = e.select("user_id", "event_type", us.alias("us"))
    lifes = base.groupBy("user_id").agg(
        F.min("us").alias("first_us"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("us"))).alias("conv_us"),
    )
    gmax = base.agg(F.max("us").alias("gmax"))
    lifes = lifes.crossJoin(F.broadcast(gmax)).select(
        "user_id",
        F.when(
            F.col("conv_us").isNotNull(),
            F.floor((F.col("conv_us") - F.col("first_us")) / DAY).cast("bigint"),
        )
        .otherwise(F.floor((F.col("gmax") - F.col("first_us")) / DAY).cast("bigint"))
        .alias("dur_days"),
        F.col("conv_us").isNotNull().alias("observed"),
    )
    total = lifes.count()  # scalar; bounded driver state (user count)
    steps = lifes.groupBy("dur_days").agg(
        F.sum(F.col("observed").cast("int")).alias("d"),
        F.count(F.lit(1)).alias("ties"),
    )
    w_prev = Window.orderBy("dur_days").rowsBetween(Window.unboundedPreceding, -1)
    steps = steps.withColumn(
        "n_risk", F.lit(total) - F.coalesce(F.sum("ties").over(w_prev), F.lit(0))
    ).filter(F.col("d") > 0)
    lnm = F.when(
        F.col("n_risk") > F.col("d"),
        F.round(
            F.log(
                (F.col("n_risk") - F.col("d")).cast("double") / F.col("n_risk").cast("double")
            )
            * 1000000
        ).cast("bigint"),
    ).otherwise(F.lit(0))
    w_cum = Window.orderBy("dur_days").rowsBetween(Window.unboundedPreceding, 0)
    return (
        steps.withColumn("lnm", lnm)
        .withColumn("zero", F.max((F.col("n_risk") == F.col("d")).cast("int")).over(w_cum))
        .withColumn("cum", F.sum("lnm").over(w_cum))
        .select(
            F.col("dur_days").cast("bigint").alias("dur_days"),
            F.col("d").cast("bigint").alias("n_converted"),
            F.col("n_risk").cast("bigint").alias("n_risk"),
            F.when(F.col("zero") == 1, F.lit(0.0))
            .otherwise(F.round(F.exp(F.col("cum").cast("double") / 1e6), 12))
            .alias("survival"),
        )
    )
