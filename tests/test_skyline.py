"""skyline_2d: grid-prune + sort-scan vs a brute-force dominance replay."""

from __future__ import annotations

import random

from c_tran_data_pipeline_spark.operators.skyline import skyline_2d


def _brute_skyline(pts):
    pts = sorted(set(pts))
    out = []
    for bx, by in pts:
        dominated = any(
            ax >= bx and ay >= by and (ax > bx or ay > by) for ax, ay in pts
        )
        if not dominated:
            out.append((bx, by))
    return sorted(out)


def _run(spark, pts, width=1.0):
    df = spark.createDataFrame(pts, "x double, y double")
    return sorted(
        (r["x"], r["y"]) for r in skyline_2d(df, "x", "y", bucket_width=width).collect()
    )


def test_skyline_matches_bruteforce_with_dups_and_ties(spark):
    rng = random.Random(7)
    pts = [(float(rng.randrange(20)), float(rng.randrange(20))) for _ in range(300)]
    # guaranteed exact-duplicate points and single-axis ties above
    assert _run(spark, pts) == _brute_skyline(pts)


def test_skyline_single_bucket_degenerate(spark):
    # every x lands in bucket 0: prune is a no-op, sweep must carry it
    rng = random.Random(8)
    pts = [(rng.random(), rng.random()) for _ in range(200)]
    assert _run(spark, pts, width=100.0) == _brute_skyline(pts)


def test_skyline_anticorrelated_worst_case(spark):
    # classic skyline worst case: y = -x, EVERY distinct point is on the
    # frontier — prune must not drop any
    pts = [(float(i), float(100 - i)) for i in range(100)]
    assert _run(spark, pts) == sorted(pts)


def test_skyline_partition_invariant_and_null_drop(spark):
    rng = random.Random(9)
    pts = [(float(rng.randrange(50)), float(rng.randrange(50))) for _ in range(400)]
    df = spark.createDataFrame(
        pts + [(None, 1.0), (1.0, None)], "x double, y double"
    )
    a = sorted(map(tuple, skyline_2d(df.repartition(2), "x", "y").collect()))
    b = sorted(map(tuple, skyline_2d(df.repartition(29), "x", "y").collect()))
    assert a == b == [tuple(map(float, p)) for p in _brute_skyline(pts)]


def test_skyline_prune_shrinks_sweep_input(spark):
    # correlated data (x ~ y): frontier is tiny and the bucket prune
    # must collapse the sweep input to near the frontier, not pass
    # everything through — this is the operator's scale property
    rng = random.Random(10)
    pts = [(v := rng.random() * 1000.0, v + rng.random() * 10.0) for _ in range(5000)]
    df = spark.createDataFrame(pts, "x double, y double")
    out = skyline_2d(df, "x", "y", bucket_width=10.0)
    # count survivors of the prune stage by rebuilding it
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    b = df.distinct().withColumn("__b", F.floor(F.col("x") / F.lit(10.0)))
    wb = Window.orderBy(F.desc("__b")).rowsBetween(Window.unboundedPreceding, -1)
    brun = b.groupBy("__b").agg(F.max("y").alias("m")).select(
        "__b", F.max("m").over(wb).alias("hi")
    )
    survivors = (
        b.join(F.broadcast(brun), "__b")
        .filter(F.col("hi").isNull() | (F.col("hi") < F.col("y")))
        .count()
    )
    assert survivors < 500  # ≪ 5000 input points
    assert sorted((r["x"], r["y"]) for r in out.collect()) == _brute_skyline(pts)
