"""As-of and range joins — operators Spark has no native form for
(guide §OLAP patterns), built scalably from primitives:

- ``asof_join``: the union-window method. Tag both sides, union, one
  window per partition key ordered by (ts, side): ``last(ignorenulls)``
  carries the most recent right row forward onto each left row. ONE
  shuffle on the key — no join at all — versus the naive
  per-left-row subquery; this is the textbook distributed as-of
  (merge_asof semantics, 'backward', strict inequality).

- ``range_join_bands``: banded range join. Bucketize the range key on
  both sides, equi-join on (key, band) with the right side expanded to
  adjacent bands, then filter the exact predicate. Turns an O(n·m)
  theta join into an equi-join whose fan-out is bounded by band width —
  the standard interval-join strategy (Flink/KDB do the same).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool = True,
    tolerance_seconds: int | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the nearest right row per ``on`` key:
    direction='backward' (default) takes the latest right_ts < left_ts
    (or <= when not strict); 'forward' the earliest right_ts > left_ts;
    'nearest' whichever of the two is closer in time (tie → backward,
    pandas merge_asof precedence). Left rows with no match get NULLs
    (left-outer semantics). Right value columns are exposed as
    ``asof_<col>``.

    ``tolerance_seconds`` bounds the lookback/lookahead (pandas
    merge_asof tolerance): matches farther than the bound null out.
    backward/forward are ONE window pass over the tagged union (forward
    just orders it descending); 'nearest' runs both passes over the same
    union — still one shuffle, since both windows partition by the same
    key and Spark reuses the exchange. Tolerance is a post-filter on the
    carried right timestamp, not a second join."""
    if direction == "nearest":
        return _asof_nearest(
            left, right, on, left_ts, right_ts, value_cols, strict, tolerance_seconds
        )
    if direction not in ("backward", "forward"):
        raise ValueError(f"asof_join: unknown direction {direction!r}")
    lcols = left.columns
    # side ordering at equal ts: strict → right rows sort AFTER left rows
    # (invisible to them); non-strict → before (visible). The same side
    # values work for both directions because ties order by side ASC
    # regardless of the timestamp sort direction.
    l_side, r_side = (0, 1) if strict else (1, 0)

    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols) + ">"
        ).alias("__r"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.lit(None).cast(l.schema["__l"].dataType.simpleString()).alias("__l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"),
    )
    ts_order = F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    w = (
        Window.partitionBy("__k")
        .orderBy(ts_order, F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l.unionByName(r).withColumn("__match", F.last("__r", ignorenulls=True).over(w))
    if tolerance_seconds is not None:
        # the right row's event time, carried by the same window+order as
        # its values, so both refer to the same matched row
        rts = F.last(
            F.when(F.col("__r").isNotNull(), F.col("__ts")), ignorenulls=True
        ).over(w)
        gap = F.unix_micros(F.col("__ts")) - F.unix_micros(rts)
        if direction == "forward":
            gap = -gap
        carried = carried.withColumn(
            "__match", F.when(gap <= int(tolerance_seconds) * 1_000_000, F.col("__match"))
        )
    return carried.filter(F.col("__l").isNotNull()).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__match.{c}").alias(f"asof_{c}") for c in value_cols],
    )


def _asof_nearest(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    strict: bool,
    tolerance_seconds: int | None,
) -> DataFrame:
    """Nearest-of-both-directions: carry the backward match with an
    ascending window and the forward match with a descending one over
    the SAME tagged union, then pick the smaller absolute gap (tie →
    backward). Both windows share the partition key, so AQE/codegen
    reuse one hash exchange; only the sorts differ."""
    lcols = left.columns
    l_side, r_side = (0, 1) if strict else (1, 0)
    l = left.select(
        F.col(on).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(l_side).alias("__side"),
        F.struct(*lcols).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols) + ">"
        ).alias("__r"),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(r_side).alias("__side"),
        F.lit(None).cast(l.schema["__l"].dataType.simpleString()).alias("__l"),
        F.struct(*[F.col(c) for c in value_cols]).alias("__r"),
    )
    u = l.unionByName(r)
    frame = (Window.unboundedPreceding, 0)
    wb = Window.partitionBy("__k").orderBy(F.col("__ts").asc(), F.col("__side").asc()).rowsBetween(*frame)
    wf = Window.partitionBy("__k").orderBy(F.col("__ts").desc(), F.col("__side").asc()).rowsBetween(*frame)
    carried = (
        u.withColumn("__mb", F.last("__r", ignorenulls=True).over(wb))
        .withColumn("__tb", F.last(F.when(F.col("__r").isNotNull(), F.col("__ts")), ignorenulls=True).over(wb))
        .withColumn("__mf", F.last("__r", ignorenulls=True).over(wf))
        .withColumn("__tf", F.last(F.when(F.col("__r").isNotNull(), F.col("__ts")), ignorenulls=True).over(wf))
    )
    gap_b = F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__tb"))
    gap_f = F.unix_micros(F.col("__tf")) - F.unix_micros(F.col("__ts"))
    if tolerance_seconds is not None:
        bound = int(tolerance_seconds) * 1_000_000
        carried = carried.withColumn("__mb", F.when(gap_b <= bound, F.col("__mb"))).withColumn(
            "__mf", F.when(gap_f <= bound, F.col("__mf"))
        )
    pick_backward = F.col("__mf").isNull() | (F.col("__mb").isNotNull() & (gap_b <= gap_f))
    chosen = F.when(pick_backward, F.col("__mb")).otherwise(F.col("__mf"))
    return (
        carried.withColumn("__match", chosen)
        .filter(F.col("__l").isNotNull())
        .select(
            *[F.col(f"__l.{c}").alias(c) for c in lcols],
            *[F.col(f"__match.{c}").alias(f"asof_{c}") for c in value_cols],
        )
    )


def range_join_bands(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    window_seconds: int,
) -> DataFrame:
    """Pairs (left, right) with same key and
    left_ts < right_ts ≤ left_ts + window_seconds.

    Band width == window size ⇒ each left row probes exactly 2 bands
    (its own + the next); the equi-join key (__k, __band) is what
    shuffles, so Catalyst runs a plain shuffled hash/sort-merge join
    instead of a broadcast-nested-loop theta join."""
    band = lambda ts: F.floor(F.unix_micros(ts) / (window_seconds * 1_000_000))  # noqa: E731
    l = left.select(
        F.col(on).alias("__k"), F.col(left_ts).alias("__lts"), F.struct(*left.columns).alias("__l")
    ).withColumn("__band", F.explode(F.array(band(F.col("__lts")), band(F.col("__lts")) + 1)))
    r = right.select(
        F.col(on).alias("__k"), F.col(right_ts).alias("__rts"), F.struct(*right.columns).alias("__r")
    ).withColumn("__band", band(F.col("__rts")))
    joined = l.join(r, on=["__k", "__band"]).filter(
        (F.col("__rts") > F.col("__lts"))
        & (F.unix_micros("__rts") <= F.unix_micros("__lts") + window_seconds * 1_000_000)
    )
    return joined.select("__l.*", *[F.col(f"__r.{c}").alias(f"r_{c}") for c in right.columns])


def kernel_smooth(
    df: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    key: str = "event_id",
    window_seconds: int = 86_400,
    value_decimal: str = "decimal(12,2)",
) -> DataFrame:
    """Triangular-kernel smoothing of an irregular time series, per key:

        smoothed(i) = Σ_j v_j·w_ij / Σ_j w_ij,
        w_ij = W − |t_i − t_j|  (µs)  for |t_i − t_j| < W, else 0

    — the signal-processing denoise for telemetry (GPS speeds, sensor
    values) where readings are unevenly spaced so a fixed-row moving
    average is wrong. The triangular kernel keeps every weight an exact
    INTEGER (µs), so products sum in exact DECIMAL and the result is
    bit-reproducible under any partitioning — a Gaussian exp(−Δt²/τ²)
    kernel is the one-line swap at production (transcendental, so the
    oracle would need rounding).

    Physical plan: neighbors come from a time-bucketed self-join (bucket
    width = W; the probe side explodes to its 3 adjacent buckets, the
    build side stays single-bucket, so each true neighbor pair matches
    exactly once). The shuffle keys on (series key, bucket) — per-bucket
    occupancy is bounded by event density × W, never O(series²); the
    window never materializes per-row neighbor lists.

    Returns (key, n_obs, smoothed_<value>)."""
    w_us = window_seconds * 1_000_000
    base = df.select(
        F.col(key),
        F.col(on).alias("__k"),
        F.unix_micros(F.col(ts)).alias("__t"),
        F.col(value).alias("__v"),
    )
    probe = base.withColumn(
        "__band",
        F.explode(F.array(*[(F.floor(F.col("__t") / w_us) + i).cast("long") for i in (-1, 0, 1)])),
    )
    build = base.select(
        F.col("__k"),
        F.floor(F.col("__t") / w_us).cast("long").alias("__band"),
        F.col("__t").alias("__rt"),
        F.col("__v").alias("__rv"),
    )
    weight = (F.lit(w_us) - F.abs(F.col("__rt") - F.col("__t"))).alias("__w")
    pairs = (
        probe.join(build, on=["__k", "__band"])
        .filter(F.abs(F.col("__rt") - F.col("__t")) < w_us)
        .select(F.col(key), F.col("__v"), F.col("__rv"), weight)
    )
    # exact-DECIMAL numerator (value × integer weight), integer denominator:
    # the division is the only float op, one per output row.
    # ``value_decimal`` must cover the value's true precision (here:
    # 2-decimal telemetry readings); widen it for finer-grained signals —
    # the decimal×integer product must stay ≤ 38 digits on both engines.
    num = F.sum(F.col("__rv").cast(value_decimal) * F.col("__w").cast("decimal(12,0)"))
    den = F.sum(F.col("__w"))
    return pairs.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.round(num.cast("double") / den.cast("double"), 6).alias(f"smoothed_{value}"),
    )


def resample_ffill(
    df: DataFrame,
    on: str = "user_id",
    ts: str = "ts",
    value: str = "value",
    key: str = "event_id",
    interval_seconds: int = 86_400,
) -> DataFrame:
    """Resample an irregular series onto a regular grid with forward
    fill: per series key, one grid point per ``interval_seconds`` bucket
    from the first to the last observation, carrying the latest value
    observed at-or-before the grid point (ties broken by ``key``). The
    gap-filling step every telemetry/feature pipeline needs before
    aligning series for joins or models.

    Bucket index is exact integer math ((t + W−1) DIV W — no float
    ceil), so grid membership is engine-portable. Shape: one per-series
    min/max agg, a per-series integer sequence explode (bounded by
    span/W, never row count), a left equi-join of grid to per-bucket
    last values, and one forward-fill window — all shuffles key on the
    series key. Returns (on, bucket_idx, <value>_ffill)."""
    w_us = interval_seconds * 1_000_000
    base = df.select(
        F.col(on).alias("__k"),
        F.unix_micros(F.col(ts)).alias("__t"),
        F.col(value).alias("__v"),
        F.col(key).alias("__id"),
    ).withColumn("__g", F.expr(f"CAST((__t + {w_us - 1}) DIV {w_us} AS BIGINT)"))
    # last value per (series, bucket): max_by over the (t, id) order
    last_in_bucket = base.groupBy("__k", "__g").agg(
        F.max_by("__v", F.struct(F.col("__t"), F.col("__id"))).alias("__bv")
    )
    grid = (
        base.groupBy("__k")
        .agg(F.min("__g").alias("__lo"), F.max("__g").alias("__hi"))
        .select("__k", F.explode(F.sequence("__lo", "__hi")).alias("__g"))
    )
    win = (
        Window.partitionBy("__k")
        .orderBy("__g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(last_in_bucket, on=["__k", "__g"], how="left")
        .withColumn("__f", F.last("__bv", ignorenulls=True).over(win))
        .select(
            F.col("__k").alias(on),
            F.col("__g").alias("bucket_idx"),
            F.col("__f").alias(f"{value}_ffill"),
        )
    )
