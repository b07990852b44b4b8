"""Data-layout operators: space-filling-curve (Z-order/Morton) keys for
multi-dimensional clustering of written data.

Why this exists at 100 TB: a parquet/Delta table sorted on ONE column
prunes scans on that column only. Interleaving the bits of two (or more)
columns into a Morton key and range-partitioning + sorting the write on
it co-locates rows that are close in BOTH dimensions, so min/max
row-group statistics prune 2-D predicates (bounding boxes, (tenant, time)
rectangles) — the same technique behind Delta OPTIMIZE ZORDER BY and
Databricks/Iceberg clustering, expressed here as plain Spark.

The key is pure integer bit math (shifts, masks, adds) — whole-stage
codegen, no UDF, and an exact cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key_expr(x: str, y: str, bits: int = 16) -> Column:
    """Morton (Z-order) interleave of two named non-negative integer
    cell columns: bit b of ``x`` lands at key bit 2b, bit b of ``y`` at
    2b+1; ``bits`` per dimension (default 16 → 32-bit key). Callers
    quantize floats to cells first (e.g. floor(lat·4)) and offset
    negatives into [0, 2**bits). Unrolled shift/mask sum — one
    whole-stage-codegen'd integer expression, no UDF."""
    parts = []
    for b in range(bits):
        parts.append(f"shiftleft(shiftright(CAST({x} AS BIGINT), {b}) & 1, {2 * b})")
        parts.append(f"shiftleft(shiftright(CAST({y} AS BIGINT), {b}) & 1, {2 * b + 1})")
    return F.expr(" + ".join(parts))


def zorder_sql(x: str, y: str, bits: int = 16) -> str:
    """DuckDB twin of ``zorder_key_expr`` (same unrolled integer math)."""
    # every term fully parenthesized: SQL gives '+' higher precedence
    # than '<<', so a bare `a << 0 + b << 1` chain-shifts instead of
    # summing shifted bits
    parts = []
    for b in range(bits):
        parts.append(f"(((CAST({x} AS BIGINT) >> {b}) & 1) << {2 * b})")
        parts.append(f"(((CAST({y} AS BIGINT) >> {b}) & 1) << {2 * b + 1})")
    return " + ".join(parts)


def zorder_layout(
    df: DataFrame,
    x_cell: str,
    y_cell: str,
    partitions: int,
    bits: int = 16,
) -> DataFrame:
    """Cluster ``df`` for writing: range-partition + sort within
    partitions on the Morton key of (x_cell, y_cell). Each output file
    then covers a compact Z-curve segment ≈ a compact 2-D tile, so
    min/max stats on x_cell/y_cell (and on zkey itself) prune bounding-
    box scans. The one shuffle is the range exchange — the same cost a
    1-D sort-on-write already pays, buying 2-D pruning instead of 1-D."""
    keyed = df.withColumn("zkey", zorder_key_expr(x_cell, y_cell, bits))
    return keyed.repartitionByRange(partitions, "zkey").sortWithinPartitions("zkey")
