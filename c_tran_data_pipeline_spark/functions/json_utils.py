"""JSON field extraction for hot paths.

Spark's Jackson-based paths (``get_json_object``, ``from_json``) create a
parser per row; with jackson-core 2.21's ThreadLocal buffer-recycler pool
this intermittently degrades ~100× in long-lived executor threads
(observed: a 1-2s scan of 100k rows stalling 18-105s; jstack shows the
task spinning in ``ThreadLocal.get`` under ``BufferRecyclers``). The
VARIANT path (Spark 4's semi-structured type) parses once into a binary
variant and extracts fields without that pool — stable ~0.7s on the same
scan — and is the idiomatic Spark 4 design for JSON columns at scale, so
we use it everywhere JSON is touched per-row.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def json_get(col: Column | str, path: str, cast_to: str) -> Column:
    """Extract ``path`` (e.g. ``'$.k'``) from a JSON string column as
    ``cast_to``. NULL on missing key, malformed JSON, or failed cast —
    matching ``get_json_object`` + try-cast semantics."""
    name = col if isinstance(col, str) else None
    c = F.col(col) if isinstance(col, str) else col
    base = F.try_parse_json(c)
    return F.try_variant_get(base, path, cast_to).alias(f"{name or 'json'}_{path.lstrip('$.')}")
