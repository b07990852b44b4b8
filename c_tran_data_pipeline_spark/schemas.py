"""Declared schemas (SURVEY.md §1.2-1.3).

The reference is stringly-typed at ingest (every JSON field a string —
reference ``topic_consumer.py:265``) and strongly typed at rest (DDL at
``topic_consumer.py:82-103``). We mirror that: raw schemas are all-string
StructTypes (never ``inferSchema`` in a production path), conformed schemas
are the typed targets reached via :mod:`..functions.transforms`.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Raw breadcrumb message (Kafka crumb_topic value / JSON array file row).
# Fields touched by the reference at topic_consumer.py:115-190; all strings.
# ---------------------------------------------------------------------------
RAW_BREADCRUMB = T.StructType(
    [
        T.StructField("EVENT_NO_TRIP", T.StringType()),
        T.StructField("EVENT_NO_STOP", T.StringType()),
        T.StructField("OPD_DATE", T.StringType()),  # '%d-%b-%y' e.g. 25-SEP-20
        T.StructField("VEHICLE_ID", T.StringType()),
        T.StructField("METERS", T.StringType()),
        T.StructField("ACT_TIME", T.StringType()),  # seconds past midnight
        T.StructField("GPS_LONGITUDE", T.StringType()),
        T.StructField("GPS_LATITUDE", T.StringType()),
        T.StructField("GPS_SATELLITES", T.StringType()),
        T.StructField("GPS_HDOP", T.StringType()),
        T.StructField("DIRECTION", T.StringType()),  # 0-359 compass heading
        T.StructField("VELOCITY", T.StringType()),  # 0-200 speed bound
    ]
)

# Raw stop event (scraped HTML table row, stop_producer.py:77-90; consumed
# fields at stop_consumer.py:50-64). All strings.
RAW_STOP_EVENT = T.StructType(
    [
        T.StructField("trip_id", T.StringType()),
        T.StructField("vehicle_number", T.StringType()),
        T.StructField("route_number", T.StringType()),
        T.StructField("direction", T.StringType()),  # '0'|'1'|''
        T.StructField("service_key", T.StringType()),  # 'W'|'S'|'U'
    ]
)

# ---------------------------------------------------------------------------
# Conformed target tables (DDL topic_consumer.py:82-103). Postgres enums
# become validated strings (Spark has no enum type).
# ---------------------------------------------------------------------------
SERVICE_KEYS = ("Weekday", "Saturday", "Sunday")
TRIP_DIRECTIONS = ("Out", "Back")

TRIP = T.StructType(
    [
        T.StructField("trip_id", T.IntegerType(), nullable=False),
        T.StructField("route_id", T.IntegerType()),
        T.StructField("vehicle_id", T.IntegerType(), nullable=False),
        T.StructField("service_key", T.StringType()),
        T.StructField("direction", T.StringType()),
    ]
)

BREADCRUMB = T.StructType(
    [
        T.StructField("tstamp", T.TimestampType(), nullable=False),
        T.StructField("latitude", T.DoubleType()),
        T.StructField("longitude", T.DoubleType()),
        T.StructField("direction", T.IntegerType()),
        T.StructField("speed", T.DoubleType()),
        T.StructField("trip_id", T.IntegerType(), nullable=False),
    ]
)

# ---------------------------------------------------------------------------
# Driver fixture tables (TESTDATA.md) — explicit schemas for streaming reads
# (readStream requires a schema) and for schema-checked batch loads.
# ---------------------------------------------------------------------------
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),  # JSON payload, e.g. {"k": 87}
    ]
)

EVENT_PROPS = T.StructType([T.StructField("k", T.IntegerType())])

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

# Multimodal asset table (north-star; no driver fixture — synthesized in
# tests). Media payloads are opaque binary + typed metadata, the idiomatic
# Spark representation for image/audio/video at 100 TB (decode happens in
# Arrow-batched UDFs, never driver-side).
MEDIA_ASSET = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), nullable=False),
        T.StructField("modality", T.StringType()),  # image|audio|video
        T.StructField("mime_type", T.StringType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.LongType()),
                    T.StructField("sample_rate", T.IntegerType()),
                ]
            ),
        ),
    ]
)
