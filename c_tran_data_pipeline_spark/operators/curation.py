"""Corpus-curation operators: the layer a training-data pipeline runs
between raw documents and a training set. All pure Column expressions —
shuffle only where the semantics demand one (dedup, per-domain ranking).

Determinism is the design constraint everything here follows: splits,
samples, and caps are all driven by the portable 60-bit md5 hash
(functions.text.md5_long — DuckDB-reproducible, so every operator is
oracle-checkable) rather than RNG. A rerun, a replay, or a different
cluster produces the SAME training set — which is what makes dataset
versioning and leakage audits possible at 100 TB.

Scale shape: hash_split and stratified_sample are projections/filters
(no shuffle, pushed to the scan where the planner allows); exact_dedup
shuffles once on the content hash; domain_cap shuffles once on the
domain key. Nothing here collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from c_tran_data_pipeline_spark.functions.text import md5_long


def split_bucket(key: Column, salt: str, buckets: int = 10_000) -> Column:
    """Stable bucket in [0, buckets) from a key column — the primitive
    under splits and samples. Salted so independent decisions (split vs
    sample) decorrelate."""
    return F.pmod(md5_long(key.cast("string"), F.lit(salt)), F.lit(buckets))


def hash_split(
    df: DataFrame,
    key: str,
    weights: dict[str, float] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: hash the stable row key
    into 10k buckets, slice by cumulative weight. Same key → same split,
    forever and on any engine — the property that prevents train/test
    leakage when the corpus is rebuilt or incrementally extended
    (a new dump re-splits ONLY new keys)."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    bucket = split_bucket(F.col(key), salt)
    expr: Column | None = None
    cum = 0.0
    for name, w in weights.items():
        cum += w
        bound = int(round(cum * 10_000))
        expr = F.when(bucket < bound, F.lit(name)) if expr is None else expr.when(
            bucket < bound, F.lit(name)
        )
    return df.withColumn("split", expr)


def stratified_sample(
    df: DataFrame,
    stratum: str,
    fractions: dict[str, float],
    key: str,
    default_fraction: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling (e.g. cap the dominant
    language, keep all of a rare one): keep rows whose hash bucket falls
    under the stratum's fraction. Pure filter — pushable, shuffle-free,
    and reproducible (unlike df.sample, whose output depends on
    partitioning)."""
    bucket = split_bucket(F.col(key), salt)
    frac: Column = F.lit(default_fraction)
    for value, f in sorted(fractions.items()):
        frac = F.when(F.col(stratum) == value, F.lit(f)).otherwise(frac)
    return df.filter(bucket < (frac * 10_000).cast("bigint"))


def exact_dedup(df: DataFrame, content: str, key: str) -> DataFrame:
    """Keep one representative (min key) per exact content hash — the
    first pass of every dedup cascade. One shuffle on the 128-bit hash,
    never on the content itself."""
    w = Window.partitionBy(F.md5(F.col(content))).orderBy(F.col(key).asc())
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def domain_cap(df: DataFrame, domain: str, order_by: list[Column], cap: int) -> DataFrame:
    """Per-domain quota: rank within domain, keep the top ``cap`` — the
    standard guard against one crawl source dominating the corpus.
    ``order_by`` must be a total order (include a unique key) so the cut
    is deterministic."""
    w = Window.partitionBy(domain).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= cap).drop("__rn")
    )


def incremental_ingest(
    incoming: DataFrame, existing: DataFrame, content: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Daily-dump ingest against an already-ingested corpus: drop
    incoming docs whose exact content already exists (anti-join on the
    md5 digest — the shuffle moves 16-byte hashes, never documents),
    then exact-dedup WITHIN the batch. The K4 insert-if-absent pattern
    (reference: ON CONFLICT DO NOTHING, topic_consumer.py:203) applied
    to content rather than keys; at production scale ``existing`` is the
    stored fingerprint table, not the corpus itself."""
    existing_hashes = existing.select(F.md5(F.col(content)).alias("__h")).distinct()
    fresh = (
        incoming.withColumn("__h", F.md5(F.col(content)))
        .join(existing_hashes, on="__h", how="left_anti")
        .drop("__h")
    )
    return exact_dedup(fresh, content=content, key=key)


def boilerplate_scrub(
    df: DataFrame,
    lines: str = "lines",
    key: str = "doc_id",
    min_df: int = 3,
    min_df_frac: float = 0.05,
    sep: str = "\n",
) -> DataFrame:
    """C4-style line-level boilerplate removal: a line that recurs across
    ``max(min_df, ceil(min_df_frac · n_docs))`` distinct documents is
    boilerplate (nav bars, cookie banners, license footers) and is dropped
    from every document; survivors are reassembled in original order.
    The relative threshold is what survives a 100× corpus growth — an
    absolute cutoff silently stops firing as n_docs grows.

    Input: one row per document with an ordered ``array<string>`` line
    column. Output: (key, n_lines, n_kept, n_dropped, clean_text).

    Scale shape: line frequency aggregates on the 128-bit line digest
    (the shuffle carries 16-byte hashes + doc keys, never text); the
    boiler set is tiny by construction (high-frequency lines are few
    distinct) so the removal is a broadcast anti-join; reassembly is the
    single shuffle that moves text, once, keyed by document. No driver
    collection anywhere."""
    ex = df.select(
        F.col(key),
        F.posexplode(F.col(lines)).alias("__pos", "__line"),
    ).withColumn("__h", F.md5(F.col("__line")))
    dfreq = ex.groupBy("__h").agg(F.countDistinct(key).alias("__df"))
    ndocs = df.select(F.countDistinct(key).alias("__n"))
    boiler = (
        dfreq.crossJoin(F.broadcast(ndocs))
        .filter(
            F.col("__df")
            >= F.greatest(F.lit(min_df).cast("bigint"), F.ceil(F.lit(min_df_frac) * F.col("__n")))
        )
        .select("__h")
    )
    kept = ex.join(F.broadcast(boiler), on="__h", how="left_anti")
    rebuilt = kept.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                lambda s: s["__line"],
            ),
            sep,
        ).alias("clean_text"),
    )
    totals = df.select(F.col(key), F.size(F.col(lines)).alias("n_lines"))
    return (
        totals.join(rebuilt, on=key, how="left")
        .select(
            key,
            "n_lines",
            F.coalesce("n_kept", F.lit(0)).alias("n_kept"),
            (F.col("n_lines") - F.coalesce("n_kept", F.lit(0))).alias("n_dropped"),
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
        )
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Benchmark decontamination: per train doc, the number of distinct
    word ``n``-grams it shares with ANY eval/benchmark document (the
    standard test-set-leakage audit before pre-training; n=13 over
    characters in GPT-3's protocol, word-5-grams here to suit short
    fixtures). Returns (key, n_shared) for contaminated docs only —
    downstream anti-joins them away or thresholds on n_shared.

    Scale shape: eval sets are small by construction (benchmarks, not
    corpora), so the distinct eval shingle set BROADCASTS and the check
    is one corpus scan + explode + broadcast hash join + one partial-
    aggregated groupBy on the train key. The corpus never self-joins and
    never shuffles its text."""
    from c_tran_data_pipeline_spark.functions.text import shingles
    from c_tran_data_pipeline_spark.sources.readers import spread

    eval_sh = (
        eval_df.select(F.explode(shingles(text, n)).alias("shingle")).distinct()
    )
    # spread(): the shingle explode is the CPU bulk and single-row-group
    # fixture scans would pin it to one thread; no-op on wide inputs.
    train_sh = spread(train.select(F.col(key), F.col(text))).select(
        F.col(key), F.explode(shingles(text, n)).alias("shingle")
    )
    return (
        train_sh.join(F.broadcast(eval_sh), on="shingle")
        .groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def upsample_mix(
    df: DataFrame,
    stratum: str,
    weights: dict[str, float],
    key: str,
    default_weight: float = 1.0,
    salt: str = "mix",
) -> DataFrame:
    """Deterministic data-mixture upsampling: emit each row
    ``floor(w)`` times plus one more iff its hash bucket falls under
    frac(w) — so a stratum with weight 2.5 contributes each doc 2-3
    times, EXACTLY 2.5× in expectation, and the same docs get the extra
    copy on every rerun/engine (RNG-free, like every sampler here).
    Weights < 1 downsample (0.25 keeps a deterministic quarter once);
    weight 0 drops the stratum. This is the repeat-factor op behind
    training-data recipes that mix domains at fixed ratios.

    Output adds ``copy`` (1..n). Shape: pure projection + explode of a
    per-row integer sequence — no shuffle, no state; fan-out is bounded
    by max(weights). Dedup-sensitive consumers should key on
    (key, copy)."""
    w: Column = F.lit(default_weight)
    for value, wt in sorted(weights.items()):
        w = F.when(F.col(stratum) == value, F.lit(float(wt))).otherwise(w)
    base = F.floor(w).cast("bigint")
    extra = (
        split_bucket(F.col(key), salt) < ((w - F.floor(w)) * 10_000).cast("bigint")
    ).cast("bigint")
    n = (base + extra).alias("__n")
    return (
        df.withColumn("__n", n)
        .filter(F.col("__n") >= 1)
        .withColumn("copy", F.explode(F.sequence(F.lit(1).cast("bigint"), F.col("__n"))))
        .drop("__n")
    )


def mad_outliers(
    df: DataFrame,
    group: str = "event_type",
    value: str = "value",
    keep: tuple[str, ...] = ("event_id",),
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outlier detection by median absolute deviation:
    flag rows with |v − median| > k·MAD, MAD = median(|v − median|).

    Median/MAD (not mean/stddev) because training-data quality signals
    and telemetry values are heavy-tailed: the outliers being hunted
    would inflate a stddev fence and hide themselves; the median fence
    doesn't move. This is the numeric twin of the text quality filters —
    run it on quality scores, token counts, or sensor values before a
    corpus ships.

    Shape: two grouped exact percentiles (|groups| rows each — tiny) and
    broadcast joins back onto one scan; nothing but group keys shuffles.
    At 100 TB swap F.percentile for percentile_approx (same query shape,
    mergeable sketches) exactly as q_percentiles → q_approx_percentiles.
    Returns (*keep, group, value, med, mad, score) for flagged rows;
    displayed stats round to 6, the fence compares unrounded."""
    med = df.groupBy(group).agg(F.percentile(value, F.lit(0.5)).alias("__med"))
    dev = df.join(F.broadcast(med), group).withColumn(
        "__dev", F.abs(F.col(value) - F.col("__med"))
    )
    mad = dev.groupBy(group).agg(F.percentile("__dev", F.lit(0.5)).alias("__mad"))
    return (
        dev.join(F.broadcast(mad), group)
        .filter(F.col("__dev") > F.lit(k) * F.col("__mad"))
        .select(
            *keep,
            group,
            value,
            F.round("__med", 6).alias("med"),
            F.round("__mad", 6).alias("mad"),
            F.round(F.col("__dev") / F.col("__mad"), 4).alias("score"),
        )
    )


def dataset_fingerprint(
    df: DataFrame,
    cols: list[str],
    group: str | None = None,
) -> DataFrame:
    """Order-insensitive dataset digest for training-set versioning /
    replication audits: two multiset hashes over the selected columns —

        xor_digest = BIT_XOR of per-row 60-bit hashes
        sum_digest = Σ per-row hashes in exact DECIMAL (AdHash-style
                     incremental multiset hash, emitted as a string)

    plus n_rows. XOR alone is blind to even multiplicities (a row
    repeated twice cancels out); the additive digest catches exactly
    that, and together with the count the pair detects any added,
    dropped, duplicated, or altered row with overwhelming probability.
    Two clusters (or two engine versions, or a rerun after a migration)
    producing the same triple holds the SAME multiset of rows — the
    cheap answer to "is this the dataset we trained on?".

    Shape: one scan, per-row md5, partial-aggregated XOR/SUM — both
    digests are commutative+associative so they combine map-side and the
    shuffle carries |groups| rows. The digest is also incrementally
    maintainable: fingerprint(A ∪ B) folds from the two digests without
    rescanning A (sum adds, xor xors, counts add)."""
    # unit-separator + null sentinels so ("a","b") ≠ ("ab","") ≠ ("a",NULL)
    payload = F.concat_ws(
        "␟", *[F.coalesce(F.col(c).cast("string"), F.lit("␀")) for c in cols]
    )
    h = md5_long(payload).alias("__h")
    keys = [group] if group else []
    base = df.select(*keys, h)
    return base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.expr("bit_xor(__h)").alias("xor_digest"),
        F.sum(F.col("__h").cast("decimal(38,0)")).cast("string").alias("sum_digest"),
    )


def weighted_sample(
    df: DataFrame,
    key: str,
    weight: str,
    k: int,
    stratum: str | None = None,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis–
    Spirakis exponential race): each row draws u ∈ (0,1] from the
    portable md5 hash of its key (no RNG — reruns and replicas pick the
    SAME sample) and the k smallest −ln(u)/w per stratum win, which
    selects with probability ∝ weight. The quality-weighted /
    length-weighted corpus subsampling primitive: one projection + one
    top-k window per stratum, no full sort, no collect.

    Returns the sampled rows + (es_key, rnk). Like the ANN family, the
    selection compares floats (ln is transcendental), so the oracle
    policy is the similarity one: keys are well-separated random values
    and a cross-engine last-ulp flip is measure-zero."""
    u = (md5_long(F.col(key).cast("string"), F.lit(salt)) + 1) / F.lit(float(1 << 60))
    es = (-F.log(u) / F.col(weight)).alias("__es")
    parts = [stratum] if stratum else []
    w = Window.partitionBy(*parts).orderBy(F.col("__es").asc(), F.col(key).asc())
    return (
        df.select(*df.columns, es)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(*df.columns, F.round("__es", 6).alias("es_key"), "rnk")
    )


def temperature_sample(
    df: DataFrame,
    stratum: str,
    target: int,
    alpha: float = 0.5,
    key: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-flattened stratified sampling (the multilingual /
    multi-domain data-recipe sampler: p(stratum) ∝ n^alpha, alpha<1
    upweights small strata relative to raw proportions). Each stratum's
    expected take is ``target * n_s^alpha / Σ n_t^alpha`` capped at n_s;
    membership is the deterministic md5 race (u(key) ≤ rate) — no RNG,
    so reruns, replicas, and engines agree row-for-row.

    Plan: one count-per-stratum agg (|strata| rows), the alpha-power
    normalizer as a 1-row aggregate broadcast back via crossJoin, the
    per-stratum rate broadcast-joined onto one corpus scan, then a
    pushable hash filter. Nothing but the filtered sample ever
    shuffles; the only floats are IEEE pow/divide on already-exact
    counts — identical cross-engine, and u is a well-separated 60-bit
    ratio so the ≤ boundary is measure-zero (the weighted_sample
    policy)."""
    counts = df.groupBy(stratum).agg(F.count(F.lit(1)).alias("__n"))
    norm = counts.agg(
        F.sum(F.pow(F.col("__n").cast("double"), F.lit(alpha))).alias("__z")
    )
    rates = counts.crossJoin(F.broadcast(norm)).select(
        stratum,
        F.least(
            F.lit(1.0),
            F.lit(float(target))
            * F.pow(F.col("__n").cast("double"), F.lit(alpha))
            / F.col("__z")
            / F.col("__n").cast("double"),
        ).alias("__rate"),
    )
    u = (md5_long(F.col(key).cast("string"), F.lit(salt)) + 1) / F.lit(float(1 << 60))
    return (
        df.join(F.broadcast(rates), stratum)
        .filter(u <= F.col("__rate"))
        .select(*df.columns, F.round("__rate", 9).alias("samp_rate"))
    )
