"""Deduplication operators for the training-data pipeline: exact,
n-gram-Jaccard, MinHash+LSH, SimHash (north-star extensions;
BASELINE.json).

Scale design (the part that matters at 100 TB):

- Exact dedup hashes the payload FIRST (md5 → 16 bytes) so the shuffle
  moves digests, not documents.
- Near-dup never computes O(n²) pairs: candidates come from an equi-join
  on shared shingles (inverted index) or shared LSH buckets, i.e. the
  shuffle key is the shingle/bucket hash and skew is bounded by dropping
  ultra-common shingles (stopword shingles) before the join.
- MinHash signatures are one pass over exploded shingles with a
  min-aggregate per (doc, seed) — partial aggregation does the heavy
  lifting map-side.
- All hashing is md5-based and engine-portable, so every stage has an
  exact DuckDB oracle (plans/dedup_queries.py) — at production scale you
  would swap md5 for xxhash64 with one line here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Column
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.functions.text import md5_long, shingles


def exact_dedup(df: DataFrame, payload: str = "text", key: str = "doc_id") -> DataFrame:
    """Exact duplicate groups by payload hash; keeps min(key) as the
    canonical representative. Returns (content_hash, rep_<key>, n_copies).
    The groupBy key is the 32-char digest — bounded-width shuffle rows."""
    return (
        df.select(F.md5(F.col(payload)).alias("content_hash"), F.col(key))
        .groupBy("content_hash")
        .agg(F.min(key).alias(f"rep_{key}"), F.count(F.lit(1)).alias("n_copies"))
    )


def _spread(df: DataFrame) -> DataFrame:
    """Re-spread the input across all cores before CPU-heavy per-row work.
    Fixture/document tables often arrive as ONE parquet row group — an
    unsplittable single partition, so every downstream md5 would run on a
    single thread (measured 11× slowdown at sf0.1). The repartition
    round-robins the (small, pre-explode) rows; at 100 TB inputs are
    many-row-group and this becomes a no-op-sized shuffle."""
    return df.repartition(df.sparkSession.sparkContext.defaultParallelism)


def shingle_index(df: DataFrame, payload: str = "text", key: str = "doc_id", n: int = 3) -> DataFrame:
    """Inverted index: one row per (key, distinct shingle). The explode is
    the only row-multiplying step; everything downstream groups/joins on
    the shingle."""
    return _spread(df).select(F.col(key), F.explode(shingles(payload, n)).alias("shingle"))


def ngram_jaccard_pairs(
    df: DataFrame,
    payload: str = "text",
    key: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Near-dup pairs by exact word-n-gram Jaccard, computed via the
    inverted-index self-join (no cross product):

        |A ∩ B| = count of shared shingles (join on shingle, group by pair)
        |A ∪ B| = |A| + |B| − |A ∩ B|

    ``max_shingle_df`` drops shingles appearing in more than that many
    docs before the join — the skew guard: a stop-shingle shared by 1M
    docs would otherwise generate 10¹² join rows. Safe for thresholds
    where a dropped shingle can't flip the verdict (it shrinks the
    intersection equally for all pairs sharing it); we keep it None for
    oracle-checked runs and set it in the large-scale path.
    """
    idx = shingle_index(df, payload, key, n)
    if max_shingle_df is not None:
        hot = idx.groupBy("shingle").count().filter(F.col("count") > max_shingle_df)
        idx = idx.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sizes = idx.groupBy(key).agg(F.count(F.lit(1)).alias("n_shingles"))

    a = idx.alias("a")
    b = idx.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{key}") < F.col(f"b.{key}"))
        .groupBy(F.col(f"a.{key}").alias("d1"), F.col(f"b.{key}").alias("d2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(key).alias("d1"), F.col("n_shingles").alias("n1"))
    sb = sizes.select(F.col(key).alias("d2"), F.col("n_shingles").alias("n2"))
    return (
        inter.join(sa, "d1")
        .join(sb, "d2")
        .withColumn(
            "jaccard",
            F.round(F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("d1", "d2", "jaccard")
    )


def ngram_containment_pairs(
    df: DataFrame,
    payload: str = "text",
    key: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Asymmetric near-dup pairs by n-gram CONTAINMENT:

        containment(A, B) = |A ∩ B| / min(|A|, |B|)

    Jaccard misses the short-doc-inside-long-doc case (a quote, an
    excerpt, a doc embedded in a crawl page): |A∩B|/|A∪B| is diluted by
    the long side's size, while containment normalizes by the SMALL
    side, so a fully-quoted short doc scores 1.0 regardless of host
    length. Same inverted-index physical plan as ``ngram_jaccard_pairs``
    (equi-join on shingle, never all-pairs; ``max_shingle_df`` is the
    identical hot-shingle skew guard), only the denominator differs.
    Returns (d1, d2, containment)."""
    idx = shingle_index(df, payload, key, n)
    if max_shingle_df is not None:
        hot = idx.groupBy("shingle").count().filter(F.col("count") > max_shingle_df)
        idx = idx.join(F.broadcast(hot.select("shingle")), "shingle", "left_anti")
    sizes = idx.groupBy(key).agg(F.count(F.lit(1)).alias("n_shingles"))

    a = idx.alias("a")
    b = idx.alias("b")
    inter = (
        a.join(b, on="shingle")
        .filter(F.col(f"a.{key}") < F.col(f"b.{key}"))
        .groupBy(F.col(f"a.{key}").alias("d1"), F.col(f"b.{key}").alias("d2"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(key).alias("d1"), F.col("n_shingles").alias("n1"))
    sb = sizes.select(F.col(key).alias("d2"), F.col("n_shingles").alias("n2"))
    return (
        inter.join(sa, "d1")
        .join(sb, "d2")
        .withColumn(
            "containment",
            F.round(F.col("n_common") / F.least(F.col("n1"), F.col("n2")), 6),
        )
        .filter(F.col("containment") >= threshold)
        .select("d1", "d2", "containment")
    )


def minhash_signatures(
    df: DataFrame, payload: str = "text", key: str = "doc_id", num_hashes: int = 16, n: int = 3
) -> DataFrame:
    """MinHash signature rows (key, seed, minhash): min over shingles of a
    seeded 60-bit hash, kept as its 15-hex-char string — fixed-width hex
    sorts identically to its numeric value, and skipping the hex→int
    conversion is a measured 3× win (conv() goes through BigInteger
    string parsing on 4M+ rows). Long-form rows (not an array column) so
    banding is a plain group-by and the oracle is plain SQL. One explode
    + one partial-aggregated groupBy — the map-side combine collapses
    each partition to ≤ |docs|×|seeds| rows before the shuffle."""
    return _minhash_sig_rows(df, payload, key, num_hashes, n).select(
        F.col(key), F.posexplode("sig").alias("seed", "minhash")
    )


def _minhash_sig_rows(
    df: DataFrame, payload: str, key: str, num_hashes: int, n: int
) -> DataFrame:
    """(key, sig: array<string>) — the whole signature as ONE array
    expression: sig[seed] = min over the doc's distinct shingles of the
    seeded 60-bit hash. Nested transform + array_min stay in whole-stage
    codegen, so the signature is computed in the scan projection — no
    shingle explode is ever materialized and nothing shuffles (the
    former explode × seeds → groupBy(key, seed) min pushed
    |shingles|×|seeds| rows through an aggregate; same md5 count,
    strictly less row traffic). Docs with no shingle (shorter than n
    words) are dropped, mirroring the explode path which emitted no
    rows for them. The eval_once fence keeps CollapseProject from
    inlining the shingle array into each of the num_hashes lambdas."""
    from c_tran_data_pipeline_spark.operators.fence import eval_once

    base = eval_once(
        _spread(df).select(F.col(key), shingles(payload, n).alias("sh"))
    ).filter(F.size("sh") >= 1)
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda seed: F.array_min(
            F.transform(
                F.col("sh"),
                lambda s: F.substring(
                    F.md5(F.concat_ws(":", seed.cast("string"), s)), 1, 15
                ),
            )
        ),
    )
    return base.select(F.col(key), sig.alias("sig"))


def minhash_buckets(
    df: DataFrame,
    payload: str = "text",
    key: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """(key, band, bucket) LSH bucket rows — the per-document, history-
    free stage of MinHash-LSH, split out so an incremental pipeline can
    persist it as the dedup INDEX: a doc's buckets depend only on its own
    text, so the stored table never needs recomputation when the corpus
    grows (see ``incremental_neardup``)."""
    if num_hashes % bands:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands ({bands}): "
            f"slice-based banding would silently drop the trailing "
            f"{num_hashes % bands} signature entries and weaken LSH recall"
        )
    rows_per_band = num_hashes // bands
    # The signature array is already in seed order, so each band's bucket
    # is md5 over a SLICE of it — banding happens in the same projection
    # as the signature (zero shuffles in this whole stage; the former
    # groupBy(key, band) + collect_list re-shuffled the signature rows
    # just to reassemble an order the array never lost).
    sig_rows = _minhash_sig_rows(df, payload, key, num_hashes, n)
    buckets = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.md5(
            F.concat_ws(",", F.slice(F.col("sig"), b * rows_per_band + 1, rows_per_band))
        ),
    )
    return sig_rows.select(F.col(key), F.posexplode(buckets).alias("band", "bucket"))


def incremental_neardup(
    new_docs: DataFrame,
    bucket_store: DataFrame,
    payload: str = "text",
    key: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
) -> tuple[DataFrame, DataFrame]:
    """Near-dup candidates for a NEW batch against an already-indexed
    corpus, without touching the old corpus' text: ``bucket_store`` is
    the (key, band, bucket) table ``minhash_buckets`` produced for
    everything ingested so far; only the new batch is shingled/hashed.

    Returns ``(pairs, updated_store)``: pairs is every candidate with at
    least one new endpoint — new×old AND new×new — canonicalized
    (d1 < d2) and distinct across bands, exactly the rows
    ``minhash_lsh_candidates(old ∪ new)`` would add over
    ``minhash_lsh_candidates(old)`` (bucketing is per-document and
    deterministic, so the equivalence is exact — pinned in
    tests/test_dedup.py); updated_store indexes the union.

    Scale: this is the daily-ingest near-dup shape — per-batch cost is
    O(|new|) hashing plus an equi-join of the new buckets against the
    store on (band, bucket). The probe is SPLIT into new×store + new×new
    (a bag-union decomposition of the old new×(store ∪ new) join —
    identical pair set after the canonical distinct) precisely so the
    store side keeps its own storage layout: a union would erase it and
    force an O(corpus) reshuffle of the store EVERY batch, turning the
    O(new) promise into O(corpus) network. Persist the store bucketed by
    (band, bucket) (sinks/bucketed.py) and the probe join reads
    co-located buckets with ZERO Exchange on the stored side (pinned on
    the executed plan in tests/test_scale.py); the store carries ~bands
    32-byte rows per doc, never text. The caller appends
    ``updated_store``'s new rows (or writes the returned frame) — the
    operator itself stays side-effect-free."""
    nb = minhash_buckets(new_docs, payload, key, num_hashes, bands, n)
    store = bucket_store.select(key, "band", "bucket")
    all_b = store.unionByName(nb)
    a = nb.alias("a")
    ka = F.col(f"a.{key}")

    def _canon(joined, kb):
        return joined.filter(ka != kb).select(
            F.least(ka, kb).alias("d1"), F.greatest(ka, kb).alias("d2")
        )

    cross = _canon(a.join(store.alias("b"), on=["band", "bucket"]), F.col(f"b.{key}"))
    within = _canon(a.join(nb.alias("c"), on=["band", "bucket"]), F.col(f"c.{key}"))
    pairs = cross.unionByName(within).distinct()
    return pairs, all_b


def minhash_lsh_candidates(
    df: DataFrame,
    payload: str = "text",
    key: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
) -> DataFrame:
    """LSH banding: group the signature into ``bands`` bands of
    num_hashes/bands rows, bucket = md5 of the band's concatenated
    minhashes, emit distinct candidate pairs sharing any bucket.

    With 16 hashes / 4 bands (r=4), P(candidate) = 1-(1-j⁴)⁴ — ~50% at
    j≈0.65, >99% at j≈0.9: tuned for high-similarity dedup. The bucket
    join is an equi-join on (band, bucket_hash); bucket skew is bounded
    because identical docs share all buckets but near-dup clusters are
    small; a degenerate mega-cluster (e.g. empty docs) should be removed
    by exact_dedup first."""
    buckets = minhash_buckets(df, payload, key, num_hashes, bands, n)
    a = buckets.alias("a")
    b = buckets.alias("b")
    return (
        a.join(b, on=["band", "bucket"])
        .filter(F.col(f"a.{key}") < F.col(f"b.{key}"))
        .select(F.col(f"a.{key}").alias("d1"), F.col(f"b.{key}").alias("d2"))
        .distinct()
    )


def simhash(df: DataFrame, payload: str = "text", key: str = "doc_id", bits: int = 32) -> DataFrame:
    """SimHash over distinct word tokens: per bit, sum +1/−1 according to
    that bit of each token's hash; bit set iff the sum is positive.
    Pure integer math → exact cross-engine oracle. Returns (key, simhash).

    Implemented as explode(tokens) × sequence(bits) → two-level aggregate;
    the (key, bit) partial sums combine map-side, so the shuffle carries
    ≤ |docs|×bits rows regardless of document length."""
    toks = _spread(df).select(
        F.col(key), F.explode(F.array_distinct(F.split(F.trim(F.col(payload)), r"\s+"))).alias("tok")
    )
    hashed = toks.select(F.col(key), md5_long(F.col("tok")).alias("h"))
    bit = F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit")
    contrib = hashed.select(
        F.col(key),
        bit,
        # SQL shiftright accepts a column shift amount (the Python wrapper
        # only takes a literal int)
        F.when(F.expr("shiftright(h, bit) & 1") == 1, 1).otherwise(-1).alias("c"),
    )
    return (
        contrib.groupBy(key, "bit")
        .agg(F.sum("c").alias("s"))
        .groupBy(key)
        .agg(
            F.sum(
                F.when(F.col("s") > 0, F.expr("shiftleft(cast(1 as bigint), bit)")).otherwise(
                    F.lit(0).cast("bigint")
                )
            ).alias("simhash")
        )
    )


def simhash_neardup_pairs(
    df: DataFrame,
    payload: str = "text",
    key: str = "doc_id",
    bits: int = 32,
    max_hamming: int = 3,
    bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ ``max_hamming``,
    found the scalable way: split the ``bits``-bit signature into
    ``bands`` equal bands — any pair within distance d < bands must
    share at least one EXACT band (pigeonhole), so candidates come from
    an equi-join on (band, band_value) and only candidates pay the
    XOR/popcount check. Shuffle keys on band values, never all-pairs.
    Returns (d1, d2, hamming)."""
    width = bits // bands
    mask = (1 << width) - 1
    sig = simhash(df, payload=payload, key=key, bits=bits)
    banded = sig.select(
        F.col(key),
        F.col("simhash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.expr(f"shiftright(simhash, {b * width}) & {mask}").alias("val"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bv"),
    ).select(key, "simhash", "bv.band", "bv.val")
    a = banded.select(
        F.col(key).alias("d1"), F.col("simhash").alias("s1"), "band", "val"
    )
    b = banded.select(
        F.col(key).alias("d2"), F.col("simhash").alias("s2"), "band", "val"
    )
    return (
        a.join(b, on=["band", "val"])
        .filter(F.col("d1") < F.col("d2"))
        .select("d1", "d2", F.bit_count(F.col("s1").bitwiseXOR(F.col("s2"))).alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def fuzzy_pairs(
    df: DataFrame,
    payload: str = "text",
    key: str = "doc_id",
    length_col: str = "n_chars",
    prefix: int = 80,
    max_len_diff: int = 16,
    max_edit: int = 8,
) -> DataFrame:
    """Edit-distance matching with length-bucket blocking — the entity-
    resolution / fuzzy-key-join shape (near-identical titles, OCR'd or
    typo'd records that shingle methods over-fragment). Pairs must have
    overall length within ``max_len_diff`` AND Levenshtein distance
    ≤ ``max_edit`` on the first ``prefix`` chars.

    Levenshtein is O(prefix²) per comparison, so the blocking IS the
    operator: rows bucket by length (width = max_len_diff); the probe
    side explodes to its 3 adjacent buckets, the build side stays
    single-bucket, so every qualifying pair meets exactly once and the
    shuffle keys on the bucket — candidates are bounded by per-bucket
    density, never all-pairs (same bucketing argument as kernel_smooth /
    range_join_bands, applied to the length dimension). Returns
    (d1, d2, edit)."""
    base = df.select(
        F.col(key),
        F.substring(F.col(payload), 1, prefix).alias("__p"),
        F.col(length_col).cast("bigint").alias("__n"),
    )
    probe = base.withColumn(
        "__b",
        F.explode(
            F.array(*[(F.floor(F.col("__n") / max_len_diff) + i).cast("long") for i in (-1, 0, 1)])
        ),
    )
    build = base.select(
        F.col(key).alias("__k2"),
        F.col("__p").alias("__p2"),
        F.col("__n").alias("__n2"),
        F.floor(F.col("__n") / max_len_diff).cast("long").alias("__b"),
    )
    return (
        probe.join(build, on="__b")
        .filter(
            (F.col(key) < F.col("__k2"))
            & (F.abs(F.col("__n") - F.col("__n2")) <= max_len_diff)
            & (F.levenshtein(F.col("__p"), F.col("__p2")) <= max_edit)
        )
        .select(
            F.col(key).alias("d1"),
            F.col("__k2").alias("d2"),
            F.levenshtein(F.col("__p"), F.col("__p2")).alias("edit"),
        )
        .distinct()
    )


def sorted_neighborhood_pairs(
    df: DataFrame,
    payload: str = "text",
    key: str = "doc_id",
    block_len: int = 4,
    key_len: int = 32,
    window: int = 3,
) -> DataFrame:
    """Sorted-neighborhood candidate pairs (Hernández & Stolfo's
    merge/purge method): normalize the payload to a sort key
    (lowercase, alphanumerics only, first ``key_len`` chars), sort
    within each ``block_len``-char-prefix block, and emit every pair at
    rank distance ≤ ``window`` as (d1, d2, gap) with d1 the
    sort-earlier document. The THIRD blocking family next to the
    inverted-index (shingle/LSH) and pigeonhole (simhash/length-bucket)
    strategies: SNM catches near-dups that share a long prefix but no
    rare shingle, at a fixed |docs|·window candidate budget — the
    classic record-linkage recipe is several passes with different
    keys, unioned.

    Distributed shape: the textbook method sorts GLOBALLY — a
    single-partition window at scale. The blocked variant sorts within
    prefix blocks only (window partitioned by block, fully parallel),
    which is the standard distributed SNM compromise: pairs straddling
    a block boundary are the recall price, bounded by window/|block|
    and recovered by the multi-pass discipline. The neighborhood join
    is a pure EQUI-join — the left side explodes rank offsets 1..window
    and matches (block, rank+j) exactly — so there is no range predicate
    to force a sort-merge-with-filter, and skew lands on block
    population (known, keyed, AQE-splittable), never on a cross
    product."""
    from pyspark.sql.window import Window

    norm = F.substring(
        F.regexp_replace(
            F.lower(F.coalesce(F.col(payload), F.lit(""))), "[^a-z0-9]", ""
        ),
        1,
        key_len,
    )
    keyed = _spread(df).select(F.col(key), norm.alias("__key")).withColumn(
        "__blk", F.substring("__key", 1, block_len)
    )
    w = Window.partitionBy("__blk").orderBy("__key", key)
    r = keyed.withColumn("__rn", F.row_number().over(w))
    left = (
        r.select("__blk", "__rn", F.col(key).alias("d1"))
        .withColumn(
            "__j", F.explode(F.array(*[F.lit(j) for j in range(1, window + 1)]))
        )
        .withColumn("__rn2", F.col("__rn") + F.col("__j"))
    )
    right = r.select(
        "__blk", F.col("__rn").alias("__rn2"), F.col(key).alias("d2")
    )
    return left.join(right, ["__blk", "__rn2"]).select(
        "d1", "d2", F.col("__j").cast("long").alias("gap")
    )


def prefix_filter_jaccard_pairs(
    df: DataFrame,
    payload: str = "text",
    key: str = "doc_id",
    n: int = 3,
    t_num: int = 4,
    t_den: int = 5,
) -> DataFrame:
    """Exact word-n-gram Jaccard self-join with PREFIX FILTERING
    (AllPairs / PPJoin, Bayardo et al. WWW'07 / Xiao et al. WWW'08):
    identical output to ``ngram_jaccard_pairs`` at threshold
    t = t_num/t_den, but candidate generation joins only each
    document's PREFIX — its (|d| − ⌈t·|d|⌉ + 1) globally-rarest
    shingles under a shared (df, shingle) total order — instead of the
    full inverted index. If J(A,B) ≥ t the two prefixes must share a
    shingle (pigeonhole on the common order), so the filter is
    LOSSLESS; candidates additionally pass the length filter
    t_den·min(|A|,|B|) ≥ t_num·max(|A|,|B|), then exact verification
    counts the full intersection for surviving pairs only.

    Why it matters at 100 TB: the full inverted-index self-join pays
    Σ df² over ALL shingles — including the common ones that dominate
    the frequency mass; prefix filtering pays Σ df² only over each
    doc's rarest slice, which is where df is smallest, and high-df
    stop-shingles fall out of every prefix automatically (no
    max_shingle_df recall trade at all — this is the exact-answer
    counterpart to that guard). Threshold arithmetic is pure-integer
    (⌈t·n⌉ = (t_num·n + t_den − 1) DIV t_den; the final test is
    t_den·inter ≥ t_num·union), so no float threshold can diverge
    across engines.

    One extra shuffle vs the naive join (global shingle df) + a
    per-doc window keyed on the doc; verification joins are keyed on
    (doc, shingle). All equi-joins, no cross product anywhere."""
    from pyspark.sql.window import Window

    # NOT persisted deliberately: the index feeds five branches, but it
    # is a cheap shuffle-less projection and LARGER than its input — at
    # any scale, re-tokenizing five column-pruned scans beats writing +
    # re-reading the exploded rows (measured: persisting moved sf0.1
    # from 3.0 to 3.4 s; the cost lives in the joins, not the explode).
    idx = shingle_index(df, payload, key, n)
    sizes = idx.groupBy(key).agg(F.count(F.lit(1)).alias("n_shingles"))
    dfreq = idx.groupBy("shingle").agg(F.count(F.lit(1)).alias("__df"))
    w = Window.partitionBy(key).orderBy("__df", "shingle")
    pre = (
        idx.join(dfreq, "shingle")
        .withColumn("__rn", F.row_number().over(w))
        .join(sizes, key)
        .filter(
            F.col("__rn")
            <= F.col("n_shingles")
            - F.expr(f"({t_num} * n_shingles + {t_den} - 1) DIV {t_den}")
            + 1
        )
        .select(F.col(key), "shingle", "n_shingles")
    )
    a, b = pre.alias("a"), pre.alias("b")
    cand = (
        a.join(b, "shingle")
        .filter(
            (F.col(f"a.{key}") < F.col(f"b.{key}"))
            & (
                F.lit(t_den) * F.least("a.n_shingles", "b.n_shingles")
                >= F.lit(t_num) * F.greatest("a.n_shingles", "b.n_shingles")
            )
        )
        .select(F.col(f"a.{key}").alias("d1"), F.col(f"b.{key}").alias("d2"))
        .distinct()
    )
    ia = idx.select(F.col(key).alias("d1"), "shingle")
    ib = idx.select(F.col(key).alias("d2"), "shingle")
    inter = (
        cand.join(ia, "d1")
        .join(ib, ["d2", "shingle"])
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(key).alias("d1"), F.col("n_shingles").alias("n1"))
    sb = sizes.select(F.col(key).alias("d2"), F.col("n_shingles").alias("n2"))
    return (
        inter.join(sa, "d1")
        .join(sb, "d2")
        .filter(
            F.lit(t_den) * F.col("n_common")
            >= F.lit(t_num) * (F.col("n1") + F.col("n2") - F.col("n_common"))
        )
        .select(
            "d1",
            "d2",
            F.round(
                F.col("n_common") / (F.col("n1") + F.col("n2") - F.col("n_common")), 6
            ).alias("jaccard"),
        )
    )


def dedup_lines(
    docs: DataFrame, key: str = "doc_id", text: str = "text", seg_words: int = 10
) -> DataFrame:
    """Line-grain dedup with document reassembly (the RefinedWeb/CCNet
    line-dedup shape; 'lines' = consecutive ``seg_words``-word aligned
    segments on this whitespace corpus). Each distinct segment survives
    at exactly ONE position corpus-wide — first occurrence wins as the
    lexicographic MIN of struct(key, seg_idx), so election is exact for
    ANY key/index magnitude (no encoded key·2^shift occurrence key to
    overflow) — and every doc re-concatenates its kept segments in
    position order; docs losing every segment still emit a row.
    Output: (key, n_segments, n_kept_segments, kept_text). Plan: one
    tokenize+explode pass at segment grain, winner election as a
    partial-first agg grouped by (xxhash64(seg), seg) — the hash keeps
    shuffle keys digest-led while grouping on the segment STRING makes
    a 64-bit collision harmless (two colliding distinct segments land
    in different groups, matching the oracle exactly) — one join back
    on the same (hash, seg) pair, then doc-grain reassembly via
    sort_array(collect_list(struct)) — bounded by doc length, the
    document-grain class."""
    toks = docs.select(F.col(key), F.split(F.trim(F.col(text)), r"\s+").alias("tk"))
    segs = toks.filter(F.size("tk") >= 1).select(
        key,
        F.explode(
            F.expr(
                f"transform(sequence(0, CAST(ceil(size(tk)/{seg_words}.0) AS INT) - 1),"
                f" j -> struct(j AS seg_idx,"
                f" concat_ws(' ', slice(tk, j*{seg_words}+1, {seg_words})) AS seg))"
            )
        ).alias("u"),
    ).select(
        key,
        F.col("u.seg_idx").alias("seg_idx"),
        F.col("u.seg").alias("seg"),
        F.xxhash64("u.seg").alias("h"),
    )
    winners = segs.groupBy("h", "seg").agg(
        F.min(F.struct(key, "seg_idx")).alias("w")
    )
    kept = segs.join(winners, ["h", "seg"]).filter(
        (F.col(key) == F.col("w").getField(key))
        & (F.col("seg_idx") == F.col("w").getField("seg_idx"))
    )
    re = kept.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(F.collect_list(F.struct("seg_idx", "seg"))),
                lambda s: s.seg,
            ),
        ).alias("kept_text"),
    )
    return toks.join(re, key, "left").select(
        key,
        F.ceil(F.size("tk") / F.lit(float(seg_words))).cast("bigint").alias("n_segments"),
        F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept_segments"),
        F.coalesce("kept_text", F.lit("")).alias("kept_text"),
    )
