"""Distributed logistic-regression quality classifier
(operators/classifier.py + q_quality_classifier).

The load-bearing property is DETERMINISM: per-row gradient/loss
contributions round to a 12-dp grain and sum as exact DECIMAL, so the
trained trajectory must be bit-identical under any partitioning. On
top of that: the trajectory must match an independent pure-Python
replay (same rounding discipline, math.exp/log instead of JVM libm),
the loss must decrease monotonically, and the deliberately
uninformative feature must learn a near-zero weight.
"""

from __future__ import annotations

import math
from decimal import ROUND_HALF_UP, Decimal

import pytest
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.classifier import logreg_train, standardize
from tests.conftest import SF_ORACLE


def _features(spark, n_parts):
    from c_tran_data_pipeline_spark.plans.curation_queries import clf_features
    from c_tran_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text").repartition(n_parts)
    feats = clf_features(docs).drop("vowel_ratio")
    cols = ["log_tokens", "stop_ratio", "mean_wlen"]
    std, stats = standardize(feats, cols)
    return std, cols, stats


def test_training_is_partition_invariant(spark):
    """Bit-identical weights whether the data sits in 3 or 32 partitions
    — the whole point of the decimal-grain gradient contract."""
    t7 = logreg_train(_features(spark, 3)[0], ["log_tokens", "stop_ratio", "mean_wlen"],
                      "label", iters=5, lr=1.0)
    t32 = logreg_train(_features(spark, 32)[0], ["log_tokens", "stop_ratio", "mean_wlen"],
                       "label", iters=5, lr=1.0)
    for a, b in zip(t7, t32):
        assert a["loss"] == b["loss"]  # exact, not approx
        for k in a["weights"]:
            assert a["weights"][k] == b["weights"][k]


def test_loss_decreases_monotonically(spark):
    std, cols, _ = _features(spark, 8)
    traj = logreg_train(std, cols, "label", iters=8, lr=1.0)
    losses = [t["loss"] for t in traj]
    assert losses[0] == pytest.approx(math.log(2), abs=1e-6)  # null model
    assert all(b < a for a, b in zip(losses, losses[1:]))
    assert losses[-1] < 0.45  # the label is genuinely learnable


def _round12(x: float) -> Decimal:
    # Mirror Spark's round(double, 12): HALF_UP at 12 dp on the shortest
    # decimal representation of the double (repr(float) == Java
    # Double.toString up to formatting).
    return Decimal(repr(x)).quantize(Decimal("1e-12"), rounding=ROUND_HALF_UP)


def test_matches_pure_python_replay(spark):
    """The distributed trajectory equals an independent driver-side
    replay of the same algorithm (math.exp/log vs JVM libm — agreement
    well inside 1e-6 after the 12-dp contribution rounding)."""
    std, cols, _ = _features(spark, 8)
    traj = logreg_train(std, cols, "label", iters=4, lr=1.0)

    rows = std.select(*cols, "label").collect()
    x = [[float(r[c]) for c in cols] for r in rows]
    y = [float(r["label"]) for r in rows]
    n, d = len(rows), len(cols)
    w, b = [0.0] * d, 0.0
    eps = 1e-12
    for it in range(4):
        g = [Decimal(0)] * d
        gb = Decimal(0)
        ls = Decimal(0)
        for xi, yi in zip(x, y):
            z = b + sum(w[j] * xi[j] for j in range(d))
            p = 1.0 / (1.0 + math.exp(-z))
            pc = min(max(p, eps), 1.0 - eps)
            err = p - yi
            for j in range(d):
                g[j] += _round12(err * xi[j])
            gb += _round12(err)
            ls += _round12(-(yi * math.log(pc) + (1.0 - yi) * math.log(1.0 - pc)))
        assert traj[it]["loss"] == pytest.approx(float(ls) / n, abs=1e-6)
        for j in range(d):
            w[j] -= 1.0 * float(g[j]) / n
        b -= 1.0 * float(gb) / n
        for j, c in enumerate(cols):
            assert traj[it]["weights"][c] == pytest.approx(w[j], abs=1e-6)
        assert traj[it]["weights"]["__bias__"] == pytest.approx(b, abs=1e-6)


def test_standardize_moments_and_zero_variance(spark):
    df = spark.createDataFrame(
        [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0), (6.0, 5.0)], "a double, c double"
    )
    std, stats = standardize(df, ["a", "c"])
    mu, sd = stats["a"]
    assert mu == pytest.approx(3.0, abs=1e-9)
    assert sd == pytest.approx(math.sqrt(3.5), abs=1e-9)  # population std
    # zero-variance column passes through unscaled (std treated as 1)
    assert stats["c"] == (5.0, 1.0)
    vals = sorted(r["c"] for r in std.collect())
    assert vals == [0.0, 0.0, 0.0, 0.0]
    a_vals = [r["a"] for r in std.select("a").collect()]
    assert max(a_vals) == pytest.approx((6.0 - 3.0) / math.sqrt(3.5), abs=1e-9)


def test_uninformative_feature_learns_near_zero_weight(spark):
    from c_tran_data_pipeline_spark.plans import all_queries

    rows = all_queries()["q_quality_classifier"].builder(spark, SF_ORACLE).collect()
    final = {r.feature: r.weight for r in rows if r.iteration == 12}
    assert abs(final["log_tokens"]) > 1.0  # the real signal
    assert abs(final["vowel_ratio"]) < 0.15  # the planted noise feature
    losses = sorted({(r.iteration, r.loss) for r in rows})
    assert losses[-1][1] < 0.45


def test_validation_errors(spark):
    df = spark.createDataFrame([(1.0, 1)], "a double, label int")
    with pytest.raises(ValueError, match="iters"):
        logreg_train(df, ["a"], "label", iters=0)
    with pytest.raises(ValueError, match="empty"):
        logreg_train(df.filter(F.lit(False)), ["a"], "label")


def test_filter_scores_match_trained_weights(spark):
    """q_classifier_filter's per-doc scores are exactly the sigmoid of
    the final trained weights (recomputed here independently via
    q_quality_classifier's trajectory output)."""
    from c_tran_data_pipeline_spark.plans import all_queries

    traj = all_queries()["q_quality_classifier"].builder(spark, SF_ORACLE).collect()
    w = {r.feature: r.weight for r in traj if r.iteration == 12}
    scored = all_queries()["q_classifier_filter"].builder(spark, SF_ORACLE)
    assert scored.count() == scored.select("doc_id").distinct().count()
    # Rebuild the standardized features the same way and score in Python.
    std, cols, _ = _features_with_ids(spark)
    rows = {r["doc_id"]: r for r in std.collect()}
    got = {r.doc_id: (r.junk_prob, r.keep) for r in scored.collect()}
    assert set(got) == set(rows)
    for doc_id, r in rows.items():
        z = w["__bias__"] + sum(w[c] * float(r[c]) for c in cols)
        p = 1.0 / (1.0 + math.exp(-z))
        jp, keep = got[doc_id]
        assert jp == pytest.approx(round(p, 9), abs=1e-6)
        assert keep == (p < 0.5)


def _features_with_ids(spark):
    from c_tran_data_pipeline_spark.plans.curation_queries import (
        _CLF_FEATURES,
        clf_features,
    )
    from c_tran_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "text")
    feats = clf_features(docs, with_id=True)
    std, stats = standardize(feats, list(_CLF_FEATURES))
    return std, list(_CLF_FEATURES), stats


def test_hll_vocab_union_estimates_and_merge_algebra(spark):
    """Fixture path: every per-source estimate and the union row match
    the exact distinct counts (31-word vocab — HLL is exact there).
    High-cardinality synthetic path: lgK=12 sketches estimate 60k/40k
    distinct keys within the published ~1.6%·3σ envelope, and the
    MERGED union of half-overlapping sources lands between max and sum
    and within the same envelope of the exact union."""
    import duckdb

    from pyspark.sql import functions as F

    from c_tran_data_pipeline_spark.plans.curation_queries import q_hll_vocab_union

    sf = "/root/testdata/sf0.001"
    got = {r.source: r.est_vocab for r in q_hll_vocab_union(spark, sf).collect()}
    con = duckdb.connect()
    exact = dict(
        con.execute(
            rf"""SELECT source, COUNT(DISTINCT w) FROM (
                 SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS w
                 FROM '{sf}/documents.parquet') GROUP BY 1"""
        ).fetchall()
    )
    exact["__union__"] = con.execute(
        rf"""SELECT COUNT(DISTINCT w) FROM (
             SELECT unnest(string_split_regex(trim(text), '\s+')) AS w
             FROM '{sf}/documents.parquet')"""
    ).fetchone()[0]
    assert set(got) == set(exact)
    for s, est in got.items():
        assert abs(est - exact[s]) <= max(1, 0.05 * exact[s]), (s, est, exact[s])

    # high-cardinality merge algebra: A = 0..59999, B = 30000..69999
    a = spark.range(0, 60_000).select(F.lit("a").alias("src"), F.col("id"))
    b = spark.range(30_000, 70_000).select(F.lit("b").alias("src"), F.col("id"))
    sk = a.unionByName(b).groupBy("src").agg(F.hll_sketch_agg("id", F.lit(12)).alias("sk"))
    per = {r.src: r.e for r in sk.select("src", F.hll_sketch_estimate("sk").alias("e")).collect()}
    uni = sk.agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")).collect()[0].e
    assert abs(per["a"] - 60_000) <= 0.05 * 60_000
    assert abs(per["b"] - 40_000) <= 0.05 * 40_000
    assert abs(uni - 70_000) <= 0.05 * 70_000
    assert max(per.values()) <= uni <= per["a"] + per["b"]
