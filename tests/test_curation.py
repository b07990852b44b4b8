"""Curation operators: the properties the oracles can't express —
split stability under corpus growth (the leakage guard), sample
determinism across reruns, dedup representative choice."""

from __future__ import annotations

from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.curation import (
    domain_cap,
    exact_dedup,
    hash_split,
    stratified_sample,
)
from c_tran_data_pipeline_spark.sources.readers import load_table
from tests.conftest import SF_ORACLE


def test_hash_split_stable_under_corpus_growth(spark):
    """Adding new docs must not move ANY existing doc across splits —
    the property that prevents train/test leakage on incremental
    rebuilds (a fraction-based randomSplit fails this)."""
    docs = load_table(spark, SF_ORACLE, "documents")
    first = {r["doc_id"]: r["split"] for r in hash_split(docs.limit(200), "doc_id").select("doc_id", "split").collect()}
    full = {r["doc_id"]: r["split"] for r in hash_split(docs, "doc_id").select("doc_id", "split").collect()}
    assert all(full[k] == v for k, v in first.items())


def test_hash_split_proportions(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    counts = {
        r["split"]: r["count"]
        for r in hash_split(docs, "doc_id").groupBy("split").count().collect()
    }
    total = sum(counts.values())
    assert total == docs.count()
    assert 0.8 < counts["train"] / total < 0.97  # 90% ±, small-N noise
    assert set(counts) <= {"train", "val", "test"}


def test_stratified_sample_deterministic_and_bounded(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    out = stratified_sample(
        docs, stratum="lang", fractions={"en": 0.5, "de": 1.0}, key="doc_id", default_fraction=0.0
    )
    a = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    b = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert a == b  # rerun-identical (df.sample is not, across partitionings)
    kept = {r["lang"]: r["count"] for r in out.groupBy("lang").count().collect()}
    base = {r["lang"]: r["count"] for r in docs.groupBy("lang").count().collect()}
    assert kept["de"] == base["de"]  # fraction 1.0 keeps everything
    assert 0.3 < kept["en"] / base["en"] < 0.7  # ~50%
    assert set(kept) == {"en", "de"}  # default 0.0 drops other strata


def test_exact_dedup_keeps_min_key(spark):
    df = spark.createDataFrame(
        [(3, "same"), (1, "same"), (2, "same"), (9, "other")], "doc_id int, text string"
    )
    out = exact_dedup(df, content="text", key="doc_id").collect()
    assert sorted((r["doc_id"], r["text"]) for r in out) == [(1, "same"), (9, "other")]


def test_domain_cap_total_order(spark):
    docs = load_table(spark, SF_ORACLE, "documents").select("doc_id", "source", "n_chars")
    out = domain_cap(
        docs, domain="source", order_by=[F.col("n_chars").desc(), F.col("doc_id").asc()], cap=5
    )
    per = out.groupBy("source").count().collect()
    assert all(r["count"] <= 5 for r in per)
    # kept docs per source are exactly the 5 largest (ties by doc_id)
    src = per[0]["source"]
    kept = sorted(
        (r["n_chars"], -r["doc_id"])
        for r in out.filter(F.col("source") == src).collect()
    )
    best = sorted(
        ((r["n_chars"], -r["doc_id"]) for r in docs.filter(F.col("source") == src).collect()),
        reverse=True,
    )[:5]
    assert sorted(best) == kept


def test_decontaminate_flags_planted_overlap(spark):
    """A train doc embedding an eval doc's 5-gram is flagged with the
    right shared count; an unrelated doc is not."""
    from pyspark.sql import Row

    from c_tran_data_pipeline_spark.operators.curation import decontaminate

    ev = spark.createDataFrame(
        [Row(doc_id=1, text="the quick brown fox jumps over the lazy dog")]
    )
    tr = spark.createDataFrame(
        [
            # contains 'quick brown fox jumps over' (and one more shifted 5-gram)
            Row(doc_id=100, text="note quick brown fox jumps over the fence today"),
            Row(doc_id=101, text="completely unrelated words appear in this one here"),
        ]
    )
    out = {r.doc_id: r.n_shared for r in decontaminate(tr, ev, n=5).collect()}
    assert 100 in out and out[100] >= 2
    assert 101 not in out


def test_boilerplate_scrub_drops_recurring_lines_only(spark):
    """Planted high-frequency lines vanish from every doc; unique lines
    survive in original order; a doc made entirely of boilerplate
    reassembles to the empty string (not a dropped row)."""
    from c_tran_data_pipeline_spark.operators.curation import boilerplate_scrub

    boiler = "click here to accept cookies"
    rows = [
        (1, ["alpha one", boiler, "beta two"]),
        (2, [boiler, "gamma three"]),
        (3, ["delta four", boiler]),
        (4, ["epsilon five"]),
        (5, [boiler]),  # all-boilerplate doc
    ]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = {
        r["doc_id"]: r
        for r in boilerplate_scrub(df, min_df=3, min_df_frac=0.05).collect()
    }
    assert out[1]["clean_text"] == "alpha one\nbeta two"
    assert out[1]["n_dropped"] == 1
    assert out[2]["clean_text"] == "gamma three"
    assert out[3]["clean_text"] == "delta four"
    assert out[4]["n_dropped"] == 0
    assert out[5]["clean_text"] == "" and out[5]["n_kept"] == 0
    assert len(out) == 5


def test_boilerplate_scrub_relative_threshold_scales(spark):
    """With min_df_frac dominating, a line shared by 2 of 40 docs is NOT
    boilerplate even though an absolute min_df=2 would flag it — the
    property that keeps the cutoff meaningful as the corpus grows."""
    from c_tran_data_pipeline_spark.operators.curation import boilerplate_scrub

    rows = [(i, [f"unique line {i}", "rare shared line" if i < 2 else f"filler {i}"]) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, lines array<string>")
    out = boilerplate_scrub(df, min_df=2, min_df_frac=0.2)
    # threshold = max(2, ceil(0.2*40)) = 8 > 2 occurrences -> nothing dropped
    assert out.agg(F.sum("n_dropped")).collect()[0][0] == 0


def test_upsample_mix_repeat_semantics(spark):
    """Weight 3.0 = exactly 3 copies each; 0.5 keeps ~half once; 0 drops
    the stratum; default 1.0 passes through — and reruns are identical."""
    from c_tran_data_pipeline_spark.operators.curation import upsample_mix

    rows = [(i, ["a", "b", "c", "d"][i % 4]) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, src string")
    weights = {"a": 3.0, "b": 0.5, "c": 0.0}
    out = upsample_mix(df, stratum="src", weights=weights, key="doc_id")
    per_src = {r["src"]: r["n"] for r in out.groupBy("src").agg(F.count("*").alias("n")).collect()}
    assert per_src["a"] == 300  # 100 docs × exactly 3
    assert 25 <= per_src["b"] <= 75  # ~half of 100, hash noise
    assert "c" not in per_src
    assert per_src["d"] == 100
    copies = {r["doc_id"]: r["n"] for r in out.filter("src = 'a'").groupBy("doc_id").agg(F.count("*").alias("n")).collect()}
    assert set(copies.values()) == {3}
    again = upsample_mix(df, stratum="src", weights=weights, key="doc_id")
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_mad_outliers_flags_planted_spike_only(spark):
    from pyspark.sql import Row

    from c_tran_data_pipeline_spark.operators.curation import mad_outliers

    rows = [Row(event_id=i, event_type="a", value=float(v)) for i, v in enumerate([1, 2, 3, 4, 5, 6, 7, 500])]
    rows += [Row(event_id=100 + i, event_type="b", value=float(i)) for i in range(8)]  # clean group
    out = mad_outliers(spark.createDataFrame(rows), k=3.0).collect()
    assert [(r.event_id, r.event_type) for r in out] == [(7, "a")]
    r = out[0]
    # median 4.5, deviations {3.5,2.5,1.5,0.5,0.5,1.5,2.5,495.5} → MAD 2.0
    assert r.med == 4.5 and r.mad == 2.0 and r.value == 500.0
    assert abs(r.score - 495.5 / 2.0) < 1e-9


def test_weighted_sample_determinism_quota_and_weight_monotonicity(spark):
    from pyspark.sql import Row

    from c_tran_data_pipeline_spark.operators.curation import weighted_sample

    rows = [Row(doc_id=i, lang="en", w=1.0) for i in range(200)]
    rows += [Row(doc_id=1000, lang="en", w=1e9)]  # overwhelming weight
    rows += [Row(doc_id=2000 + i, lang="de", w=1.0) for i in range(5)]
    df = spark.createDataFrame(rows)

    out = weighted_sample(df, key="doc_id", weight="w", k=10, stratum="lang")
    got = out.collect()
    by_lang = {}
    for r in got:
        by_lang.setdefault(r.lang, set()).add(r.doc_id)
    assert len(by_lang["en"]) == 10          # quota enforced
    assert by_lang["de"] == {2000 + i for i in range(5)}  # under-quota stratum kept whole
    assert 1000 in by_lang["en"]             # giant weight always wins

    again = weighted_sample(df, key="doc_id", weight="w", k=10, stratum="lang").collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))  # deterministic

    other = weighted_sample(df, key="doc_id", weight="w", k=10, stratum="lang", salt="v2")
    ids_other = {r.doc_id for r in other.collect() if r.lang == "en"}
    assert ids_other != by_lang["en"]        # salt rotates the draw


def test_temperature_sample_flattens_mixture(spark):
    """alpha<1 upweights small strata: the sampled mixture's max/min
    source ratio must shrink vs the raw corpus, per-stratum takes track
    n^alpha expectations, and membership is deterministic."""
    from c_tran_data_pipeline_spark.operators.curation import temperature_sample

    from tests.conftest import SF_ORACLE
    from c_tran_data_pipeline_spark.sources.readers import load_table

    docs = load_table(spark, SF_ORACLE, "documents")
    raw = {r["source"]: r["count"] for r in docs.groupBy("source").count().collect()}
    out = temperature_sample(docs, stratum="source", target=200, alpha=0.5)
    got = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}

    z = sum(n**0.5 for n in raw.values())
    for s, n in raw.items():
        expect = min(n, 200 * (n**0.5) / z)
        # hash membership is Binomial(n, rate): allow 4 sigma + 1
        assert abs(got.get(s, 0) - expect) <= 4 * expect**0.5 + 1, (s, got.get(s), expect)
    total_expect = sum(min(n, 200 * (n**0.5) / z) for n in raw.values())
    assert abs(sum(got.values()) - total_expect) <= 4 * total_expect**0.5 + 1

    again = temperature_sample(docs, stratum="source", target=200, alpha=0.5)
    assert sorted(r["doc_id"] for r in out.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )

    # flattening property needs a SKEWED corpus (the fixture is uniform):
    # 900 docs of 'big' vs 100 of 'small' → alpha=0.5 narrows the ratio
    skew = spark.createDataFrame(
        [(i, "big" if i < 900 else "small") for i in range(1000)], "doc_id long, source string"
    )
    s_out = {
        r["source"]: r["count"]
        for r in temperature_sample(skew, stratum="source", target=300, alpha=0.5)
        .groupBy("source")
        .count()
        .collect()
    }
    raw_ratio = 900 / 100
    got_ratio = s_out["big"] / s_out["small"]
    assert 1.0 < got_ratio < raw_ratio * 0.6  # pulled toward sqrt(9) = 3
    # and alpha=1 reproduces raw proportions (sanity of the formula)
    p_out = {
        r["source"]: r["count"]
        for r in temperature_sample(skew, stratum="source", target=300, alpha=1.0)
        .groupBy("source")
        .count()
        .collect()
    }
    assert abs(p_out["big"] / p_out["small"] - 9.0) < 3.0


def test_quantile_norm_is_rank_preserving_and_global_valued(spark):
    """Within a source, normalization preserves quality order; every
    normalized value is an actual GLOBAL quality value (quantile mapping
    substitutes ranks, never interpolates invented scores)."""
    from c_tran_data_pipeline_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    out = all_queries()["q_quantile_norm"].builder(spark, sf).collect()
    by_src: dict = {}
    for r in out:
        by_src.setdefault(r["source"], []).append((r["quality"], r["doc_id"], r["norm_quality"]))
    for rows in by_src.values():
        rows.sort()
        normed = [n for _, _, n in rows]
        assert normed == sorted(normed), "normalization broke within-source order"
    global_vals = {round(r["quality"], 6) for r in out}
    assert all(round(r["norm_quality"], 6) in global_vals for r in out)


def test_source_jsd_bounds_and_self_divergence(spark):
    """0 <= JSD <= ln 2 for every pair; and a distribution against
    itself scores 0 up to the 1e-6 log quantization (computed through
    the same integerized pipeline, so this also pins the
    Σnum-collapses-to-D identity)."""
    import math

    from pyspark.sql import functions as F

    from c_tran_data_pipeline_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    out = all_queries()["q_source_jsd"].builder(spark, sf).collect()
    assert len(out) == 15
    for r in out:
        assert -2e-6 <= r["jsd"] <= math.log(2) + 2e-6
    # self-JSD: duplicate one source under two labels and run the same
    # dataflow reduced to that single pair
    d = spark.read.parquet(sf + "/documents.parquet").select("source", "text")
    one = d.filter(F.col("source") == "src0")
    both = one.withColumn("source", F.lit("a")).unionByName(
        one.withColumn("source", F.lit("b"))
    )
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        both.write.parquet(os.path.join(td, "documents.parquet"))
        # reuse the registered builder against the synthetic sf_dir
        res = all_queries()["q_source_jsd"].builder(spark, td).collect()
    assert len(res) == 1 and abs(res[0]["jsd"]) < 2e-6
