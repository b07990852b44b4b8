"""Oracle-checked dedup queries over the ``documents`` table
(north-star extensions; operators in operators/dedup.py).

Every hash here is md5-based so DuckDB reproduces the exact values:
Spark ``conv(substr(md5(x),1,15),16,10)::bigint`` ==
DuckDB ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)`` (verified bit-equal).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from c_tran_data_pipeline_spark.plans.registry import query
from c_tran_data_pipeline_spark.sources.readers import load_table

# Shared SQL fragments -------------------------------------------------------

_SHINGLES_CTE = """
    w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents),
    sh AS (
        SELECT doc_id, unnest(list_distinct(
            list_transform(generate_series(1, len(words)-2),
                           i -> array_to_string(words[i:i+2], ' ')))) AS shingle
        FROM w
    )
"""

_H60 = "CAST('0x' || substr(md5({x}), 1, 15) AS BIGINT)"


@query(
    "q_dedup_exact",
    """
    SELECT md5(text) AS content_hash, MIN(doc_id) AS rep_doc_id, COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
    doc="Exact dedup: md5 content hash → min-key representative. The "
    "shuffle carries 16-byte digests, not documents.",
    tags=("dedup",),
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


@query(
    "q_dedup_ngram_jaccard",
    f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT d1, d2,
           ROUND(n_common * 1.0 / (s1.n + s2.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON d1 = s1.doc_id
    JOIN sizes s2 ON d2 = s2.doc_id
    WHERE n_common * 1.0 / (s1.n + s2.n - n_common) >= 0.8
    """,
    doc="Near-dup pairs by exact word-3-gram Jaccard via inverted-index "
    "self-join (|A∩B| from shared shingles; no O(n²) cross product).",
    tags=("dedup", "join"),
)
def q_dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ngram_jaccard_pairs(load_table(spark, sf_dir, "documents"), threshold=0.8)


@query(
    "q_dedup_containment",
    f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT d1, d2,
           ROUND(n_common * 1.0 / least(s1.n, s2.n), 6) AS containment
    FROM inter
    JOIN sizes s1 ON d1 = s1.doc_id
    JOIN sizes s2 ON d2 = s2.doc_id
    WHERE n_common * 1.0 / least(s1.n, s2.n) >= 0.8
    """,
    doc="Asymmetric near-dup by n-gram CONTAINMENT |A∩B|/min(|A|,|B|): "
    "catches a short doc quoted inside a long one, which Jaccard "
    "dilutes below threshold. Same inverted-index equi-join plan as "
    "q_dedup_ngram_jaccard — only the denominator differs.",
    tags=("dedup", "join"),
)
def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.dedup import ngram_containment_pairs

    return ngram_containment_pairs(load_table(spark, sf_dir, "documents"), threshold=0.8)


@query(
    "q_dedup_minhash_sig",
    f"""
    WITH {_SHINGLES_CTE},
    seeded AS (
        SELECT doc_id, seed, substr(md5(concat(seed, ':', shingle)), 1, 15) AS h
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed)
    )
    SELECT doc_id, seed, MIN(h) AS minhash
    FROM seeded GROUP BY doc_id, seed
    """,
    doc="MinHash signatures (16 seeded 60-bit hex hashes, long form): one "
    "explode + min-aggregate; partial aggregation collapses map-side.",
    tags=("dedup",),
)
def q_dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_signatures(load_table(spark, sf_dir, "documents"), num_hashes=16)


@query(
    "q_dedup_minhash_lsh",
    f"""
    WITH {_SHINGLES_CTE},
    seeded AS (
        SELECT doc_id, seed, substr(md5(concat(seed, ':', shingle)), 1, 15) AS h
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed)
    ),
    sig AS (SELECT doc_id, seed, MIN(h) AS minhash FROM seeded GROUP BY doc_id, seed),
    bucketed AS (
        SELECT doc_id, seed // 4 AS band,
               md5(string_agg(minhash, ',' ORDER BY seed)) AS bucket
        FROM sig GROUP BY doc_id, seed // 4
    )
    SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
    FROM bucketed a JOIN bucketed b USING (band, bucket)
    WHERE a.doc_id < b.doc_id
    """,
    doc="MinHash-LSH candidate pairs: 16 hashes, 4 bands × 4 rows; bucket "
    "= md5 of band signature; candidates share any bucket. Equi-join on "
    "(band, bucket) — the scalable near-dup shuffle key.",
    tags=("dedup", "join"),
)
def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return minhash_lsh_candidates(load_table(spark, sf_dir, "documents"), num_hashes=16, bands=4)


@query(
    "q_dedup_clusters",
    f"""
    WITH RECURSIVE {_SHINGLES_CTE},
    seeded AS (
        SELECT doc_id, seed, substr(md5(concat(seed, ':', shingle)), 1, 15) AS h
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed)
    ),
    sig AS (SELECT doc_id, seed, MIN(h) AS minhash FROM seeded GROUP BY doc_id, seed),
    bucketed AS (
        SELECT doc_id, seed // 4 AS band,
               md5(string_agg(minhash, ',' ORDER BY seed)) AS bucket
        FROM sig GROUP BY doc_id, seed // 4
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM bucketed a JOIN bucketed b USING (band, bucket)
        WHERE a.doc_id < b.doc_id
    ),
    edges AS (SELECT d1 AS a, d2 AS b FROM pairs UNION SELECT d2, d1 FROM pairs),
    reach(node, lbl) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node
    )
    SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node
    """,
    doc="operators/graph.py: connected components over the MinHash-LSH "
    "candidate pairs — iterative min-label propagation (one shuffle per "
    "round, lineage cut by localCheckpoint), vs the oracle's recursive-"
    "CTE transitive closure. Completes dedup: pairs → clusters → keep "
    "one representative per cluster.",
    tags=("dedup", "graph", "iterative"),
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.graph import dedup_clusters

    pairs = minhash_lsh_candidates(
        load_table(spark, sf_dir, "documents"), num_hashes=16, bands=4
    )
    return dedup_clusters(pairs)


@query(
    "q_dedup_simhash",
    f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS tok
        FROM documents
    ),
    hashed AS (SELECT doc_id, {_H60.format(x="tok")} AS h FROM toks),
    contrib AS (
        SELECT doc_id, bit,
               CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END AS c
        FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS bit)
    ),
    sums AS (SELECT doc_id, bit, SUM(c) AS s FROM contrib GROUP BY doc_id, bit)
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS BIGINT) AS simhash
    FROM sums GROUP BY doc_id
    """,
    doc="32-bit SimHash per document over distinct tokens — pure integer "
    "math, bit-exact oracle; near-dups cluster within small Hamming "
    "distance (tests verify vs Jaccard pairs).",
    tags=("dedup",),
)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return simhash(load_table(spark, sf_dir, "documents"), bits=32)


@query(
    "q_dedup_simhash_pairs",
    f"""
    WITH toks AS (
        SELECT doc_id,
               unnest(list_distinct(string_split_regex(trim(text), '\\s+'))) AS tok
        FROM documents
    ),
    hashed AS (SELECT doc_id, {_H60.format(x="tok")} AS h FROM toks),
    contrib AS (
        SELECT doc_id, bit,
               CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END AS c
        FROM hashed CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS bit)
    ),
    sums AS (SELECT doc_id, bit, SUM(c) AS s FROM contrib GROUP BY doc_id, bit),
    sig AS (
        SELECT doc_id,
               SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << bit ELSE 0 END) AS simhash
        FROM sums GROUP BY doc_id
    )
    SELECT a.doc_id AS d1, b.doc_id AS d2,
           bit_count(xor(a.simhash, b.simhash)) AS hamming
    FROM sig a JOIN sig b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
    """,
    doc="SimHash near-dup pairs, Hamming ≤ 3 of 32 bits. Spark finds "
    "candidates via pigeonhole banding (4 bands of 8 bits — any pair at "
    "distance < 4 shares an exact band, so the shuffle is an equi-join "
    "on band values, never all-pairs); the oracle brute-forces all "
    "pairs, proving the banding loses nothing.",
    tags=("dedup", "join"),
)
def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.dedup import simhash_neardup_pairs

    return simhash_neardup_pairs(
        load_table(spark, sf_dir, "documents"), bits=32, max_hamming=3, bands=4
    )


@query(
    "q_fuzzy_pairs",
    """
    WITH d AS (SELECT doc_id, substr(text, 1, 80) AS p, n_chars FROM documents)
    SELECT a.doc_id AS d1, b.doc_id AS d2, levenshtein(a.p, b.p) AS edit
    FROM d a JOIN d b ON a.doc_id < b.doc_id
    WHERE abs(a.n_chars - b.n_chars) <= 16 AND levenshtein(a.p, b.p) <= 8
    """,
    doc="Edit-distance fuzzy matching (operators/dedup.py fuzzy_pairs): "
    "Levenshtein ≤ 8 on 80-char prefixes, restricted to pairs whose "
    "overall length differs ≤ 16 — the entity-resolution shape for "
    "typo'd/OCR'd near-identical records that shingling over-fragments. "
    "Spark blocks by length bucket (probe explodes to 3 adjacent "
    "buckets → equi-join on the bucket, candidates bounded by bucket "
    "density); the oracle brute-forces all pairs, proving the blocking "
    "loses nothing.",
    tags=("dedup", "join", "fuzzy"),
)
def q_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.dedup import fuzzy_pairs

    return fuzzy_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "q_incremental_neardup",
    f"""
    WITH {_SHINGLES_CTE},
    seeded AS (
        SELECT doc_id, seed, substr(md5(concat(seed, ':', shingle)), 1, 15) AS h
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed)
    ),
    sig AS (SELECT doc_id, seed, MIN(h) AS minhash FROM seeded GROUP BY doc_id, seed),
    bucketed AS (
        SELECT doc_id, seed // 4 AS band,
               md5(string_agg(minhash, ',' ORDER BY seed)) AS bucket
        FROM sig GROUP BY doc_id, seed // 4
    )
    SELECT DISTINCT least(a.doc_id, b.doc_id) AS d1,
                    greatest(a.doc_id, b.doc_id) AS d2
    FROM bucketed a JOIN bucketed b USING (band, bucket)
    WHERE a.doc_id <> b.doc_id
      AND (a.doc_id % 10 >= 8 OR b.doc_id % 10 >= 8)
    """,
    doc="Incremental MinHash-LSH near-dup (operators/dedup.py "
    "incremental_neardup): docs with doc_id%10>=8 arrive as the NEW "
    "batch and are deduped against the stored (key, band, bucket) "
    "index of the other 80% — only the new batch is shingled/hashed; "
    "the old corpus' text is never touched. Emits every candidate "
    "pair with ≥1 new endpoint (new×old and new×new), canonical "
    "d1<d2. The oracle re-derives the same set from a full-corpus "
    "bucketing, which is the exactness claim: incremental == batch "
    "restricted to new-endpoint pairs (also pinned as set algebra in "
    "tests/test_dedup.py).",
    tags=("dedup", "incremental", "join"),
)
def q_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F

    from c_tran_data_pipeline_spark.operators.dedup import (
        incremental_neardup,
        minhash_buckets,
    )

    docs = load_table(spark, sf_dir, "documents")
    existing = docs.filter(F.col("doc_id") % 10 < 8)
    new = docs.filter(F.col("doc_id") % 10 >= 8)
    store = minhash_buckets(existing)
    pairs, _store = incremental_neardup(new, store)
    return pairs


@query(
    "q_minhash_estimate",
    f"""
    WITH {_SHINGLES_CTE},
    seeded AS (
        SELECT doc_id, seed, substr(md5(concat(seed, ':', shingle)), 1, 15) AS h
        FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed)
    ),
    sig AS (SELECT doc_id, seed, MIN(h) AS minhash FROM seeded GROUP BY doc_id, seed),
    bucketed AS (
        SELECT doc_id, seed // 4 AS band,
               md5(string_agg(minhash, ',' ORDER BY seed)) AS bucket
        FROM sig GROUP BY doc_id, seed // 4
    ),
    pairs AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM bucketed a JOIN bucketed b USING (band, bucket)
        WHERE a.doc_id < b.doc_id
    ),
    est AS (
        SELECT p.d1, p.d2,
               SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) / 16.0
                   AS est_jaccard
        FROM pairs p
        JOIN sig sa ON sa.doc_id = p.d1
        JOIN sig sb ON sb.doc_id = p.d2 AND sb.seed = sa.seed
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    inter AS (
        SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
        FROM sh a JOIN sh b USING (shingle)
        WHERE a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    exact AS (
        SELECT d1, d2,
               ROUND(n_common * 1.0 / (s1.n + s2.n - n_common), 6) AS jacc
        FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
    )
    SELECT e.d1, e.d2,
           ROUND(e.est_jaccard, 6) AS est_jaccard,
           COALESCE(x.jacc, 0.0) AS exact_jaccard,
           ROUND(abs(e.est_jaccard - COALESCE(x.jacc, 0.0)), 6) AS abs_err
    FROM est e LEFT JOIN exact x ON e.d1 = x.d1 AND e.d2 = x.d2
    """,
    doc="Sketch-quality audit: for every MinHash-LSH candidate pair, the "
    "SIGNATURE-estimated Jaccard (matching components / 16) next to "
    "the exact shingle Jaccard and the absolute error — how you "
    "validate a sketch family before trusting it to delete data at "
    "100 TB, computed in-engine on the same pass shapes the dedup "
    "path already uses (signature agg + banded candidates + "
    "inverted-index intersection, all partial-first equi-joins). The "
    "exact leg SEMI-JOINS the corpus to the candidate doc ids before "
    "building its inverted index, so its intersection join pairs only "
    "candidate docs — cost is bounded by the (already sub-quadratic) "
    "candidate set, never corpus-wide all-intersecting-pairs; the "
    "oracle computes corpus-wide and left-joins, which is value-"
    "identical for the emitted candidate rows. MinHash is "
    "deterministic here (seeded md5), so even the accuracy audit "
    "carries an exact SQL oracle — the q_retrieval_metrics principle "
    "applied to sketches.",
    tags=("dedup", "eval"),
)
def q_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.dedup import (
        minhash_lsh_candidates,
        minhash_signatures,
        ngram_jaccard_pairs,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(d, num_hashes=16, bands=4)
    # The audit re-derives candidates for the semi-join below, so pin the
    # (deterministic) candidate set once — at scale you'd persist the
    # banded-candidate table anyway (sinks/bucketed.py does for the
    # incremental path).
    from c_tran_data_pipeline_spark.session import persist_once

    pairs = persist_once(pairs)
    sigs = minhash_signatures(d, num_hashes=16)
    sa = sigs.select(F.col("doc_id").alias("d1"), "seed", F.col("minhash").alias("__h1"))
    sb = sigs.select(F.col("doc_id").alias("d2"), "seed", F.col("minhash").alias("__h2"))
    est = (
        pairs.join(sa, "d1")
        .join(sb, ["d2", "seed"])
        .groupBy("d1", "d2")
        .agg(
            (
                F.sum(F.when(F.col("__h1") == F.col("__h2"), 1).otherwise(0)) / F.lit(16.0)
            ).alias("__est")
        )
    )
    # Exact-Jaccard leg restricted to candidate DOCS: a doc's own shingle
    # set (and so any candidate pair's intersection/union) is unchanged by
    # dropping non-candidate docs, but the inverted-index self-join now
    # pairs only docs that appear in some candidate — without this it
    # computed exact Jaccard for every intersecting pair corpus-wide and
    # the audit's cost was dominated by pairs the left join then discarded.
    cand_ids = (
        pairs.select(F.col("d1").alias("doc_id"))
        .union(pairs.select(F.col("d2").alias("doc_id")))
        .distinct()
    )
    d_cand = d.join(cand_ids, "doc_id", "left_semi")
    exact = ngram_jaccard_pairs(d_cand, threshold=0.0).select(
        "d1", "d2", F.col("jaccard").alias("__jx")
    )
    return (
        est.join(exact, ["d1", "d2"], "left_outer")
        .select(
            "d1",
            "d2",
            F.round("__est", 6).alias("est_jaccard"),
            F.round(F.coalesce(F.col("__jx"), F.lit(0.0)), 6).alias("exact_jaccard"),
            F.round(F.abs(F.col("__est") - F.coalesce(F.col("__jx"), F.lit(0.0))), 6).alias(
                "abs_err"
            ),
        )
    )


@query(
    "q_dedup_canonical",
    r"""
    WITH d AS (
        SELECT doc_id, n_chars,
               array_to_string(string_split_regex(trim(text), '\s+')[1:2], ' ')
                   AS block_key
        FROM documents
    )
    SELECT doc_id, block_key,
           FIRST_VALUE(doc_id) OVER (
               PARTITION BY block_key ORDER BY n_chars DESC, doc_id
           ) AS canonical_id,
           COUNT(*) OVER (PARTITION BY block_key) AS cluster_size,
           doc_id = FIRST_VALUE(doc_id) OVER (
               PARTITION BY block_key ORDER BY n_chars DESC, doc_id
           ) AS is_canonical
    FROM d
    """,
    doc="Canonical-representative selection: docs blocked by their "
    "2-token prefix (the blocking key is pluggable — same shape for a "
    "MinHash band or URL host), the longest doc per block (ties: min "
    "doc_id) elected canonical, and EVERY doc emitted with its "
    "doc_id→canonical_id mapping + cluster size — the rewrite table a "
    "curation pipeline joins against to redirect references, vs "
    "q_prefix_dedup's per-group summary. One shuffle on the block key; "
    "both windows share it.",
    tags=("dedup", "curation", "window"),
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from c_tran_data_pipeline_spark.functions.text import words

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars",
        F.concat_ws(" ", F.slice(words("text"), 1, 2)).alias("block_key"),
    )
    w = Window.partitionBy("block_key").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    wp = Window.partitionBy("block_key")
    canonical = F.first("doc_id").over(w)
    return d.select(
        "doc_id", "block_key",
        canonical.alias("canonical_id"),
        F.count(F.lit(1)).over(wp).alias("cluster_size"),
        (F.col("doc_id") == canonical).alias("is_canonical"),
    )


@query(
    "q_sorted_neighborhood",
    """
    WITH k AS (
        SELECT doc_id,
               substr(regexp_replace(lower(coalesce(text, '')),
                                     '[^a-z0-9]', '', 'g'), 1, 32) AS skey
        FROM documents
    ),
    r AS (
        SELECT doc_id, substr(skey, 1, 4) AS blk,
               ROW_NUMBER() OVER (PARTITION BY substr(skey, 1, 4)
                                  ORDER BY skey, doc_id) AS rn
        FROM k
    )
    SELECT a.doc_id AS d1, b.doc_id AS d2, b.rn - a.rn AS gap
    FROM r a JOIN r b
      ON a.blk = b.blk AND b.rn - a.rn BETWEEN 1 AND 3
    """,
    doc="Sorted-neighborhood (merge/purge) blocking: normalize text to "
    "a 32-char alphanumeric sort key, rank within 4-char-prefix blocks, "
    "pair every document with its ≤3 sort-neighbors. Third blocking "
    "family beside the shingle inverted index and the simhash "
    "pigeonhole — catches shared-prefix near-dups at a FIXED "
    "|docs|·window candidate budget (no shingle-frequency dependence). "
    "The Spark neighborhood join explodes rank offsets into a pure "
    "(block, rank+j) equi-join — no range predicate, no cross product; "
    "the SQL twin writes the same pairs as a BETWEEN self-join. "
    "Within-block window parallelizes across blocks (the distributed "
    "SNM compromise; boundary pairs are the documented recall price of "
    "blocking, recovered multi-pass).",
    tags=("dedup", "window"),
)
def q_sorted_neighborhood(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.dedup import sorted_neighborhood_pairs

    return sorted_neighborhood_pairs(load_table(spark, sf_dir, "documents"))


@query(
    "q_dedup_prefix_filter",
    f"""
    WITH {_SHINGLES_CTE},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    dfreq AS (SELECT shingle, COUNT(*) AS df FROM sh GROUP BY 1),
    pre AS (
        SELECT doc_id, shingle, n FROM (
            SELECT sh.doc_id, sh.shingle, sizes.n,
                   ROW_NUMBER() OVER (PARTITION BY sh.doc_id
                                      ORDER BY dfreq.df, sh.shingle) AS rn
            FROM sh JOIN dfreq USING (shingle) JOIN sizes USING (doc_id)
        ) WHERE rn <= n - ((4 * n + 4) // 5) + 1
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
        FROM pre a JOIN pre b USING (shingle)
        WHERE a.doc_id < b.doc_id
          AND 5 * least(a.n, b.n) >= 4 * greatest(a.n, b.n)
    ),
    inter AS (
        SELECT c.d1, c.d2, COUNT(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.d1
        JOIN sh b ON b.doc_id = c.d2 AND b.shingle = a.shingle
        GROUP BY 1, 2
    )
    SELECT d1, d2,
           ROUND(n_common * 1.0 / (s1.n + s2.n - n_common), 6) AS jaccard
    FROM inter
    JOIN sizes s1 ON d1 = s1.doc_id
    JOIN sizes s2 ON d2 = s2.doc_id
    WHERE 5 * n_common >= 4 * (s1.n + s2.n - n_common)
    """,
    doc="Exact Jaccard-0.8 near-dup pairs via PREFIX FILTERING "
    "(AllPairs/PPJoin): join only each document's (n − ⌈0.8n⌉ + 1) "
    "globally-RAREST shingles — if J(A,B) ≥ 0.8 the prefixes must "
    "intersect under the shared (df, shingle) order, so the filter is "
    "lossless — then length-filter and verify candidates exactly. The "
    "scalable exact counterpart to q_dedup_ngram_jaccard's full "
    "inverted-index join: the self-join cost concentrates where df is "
    "SMALLEST, and stop-shingles drop out of every prefix "
    "automatically instead of via the recall-trading max_shingle_df "
    "guard. All thresholds are integer arithmetic (⌈0.8n⌉ = "
    "(4n+4) DIV 5; final test 5·inter ≥ 4·union) — no float threshold "
    "to diverge across engines.",
    tags=("dedup", "join"),
)
def q_dedup_prefix_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.dedup import prefix_filter_jaccard_pairs

    return prefix_filter_jaccard_pairs(load_table(spark, sf_dir, "documents"))


def _cdc_chunk_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, chunk) under content-defined 8-word-expected chunking —
    the shared projection behind q_cdc_chunks and q_incremental_cdc.
    Boundary falls AFTER any word whose md5's last hex digit ∈ {0,8};
    boundaries + chunks are ONE array expression per doc, O(len)."""
    from c_tran_data_pipeline_spark.sources.readers import spread

    base = (
        spread(docs.select("doc_id", "text"))
        .select("doc_id", F.split(F.trim("text"), r"\s+").alias("tk"))
        .filter(F.array_size("tk") >= 1)
    )
    bpos = F.filter(
        F.sequence(F.lit(1), F.array_size("tk")),
        lambda i: F.substring(F.md5(F.element_at(F.col("tk"), i)), 32, 1).isin("0", "8"),
    )
    wb = base.select("doc_id", "tk", bpos.alias("bpos"))
    start = lambda j: (  # noqa: E731
        F.when(j == 1, F.lit(1)).otherwise(F.element_at(F.col("bpos"), (j - 1).cast("int")) + 1)
    )
    end = lambda j: (  # noqa: E731
        F.when(j <= F.array_size("bpos"), F.element_at(F.col("bpos"), j.cast("int")))
        .otherwise(F.array_size("tk"))
    )
    chunks = F.filter(
        F.transform(
            F.sequence(F.lit(1), F.array_size("bpos") + 1),
            lambda j: F.concat_ws(
                " ", F.slice(F.col("tk"), start(j), F.greatest(end(j) - start(j) + 1, F.lit(0)))
            ),
        ),
        lambda c: c != "",
    )
    return wb.select("doc_id", F.explode(chunks).alias("chunk"))


@query(
    "q_cdc_chunks",
    r"""
    WITH w AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
        WHERE len(string_split_regex(trim(text), '\s+')) >= 1
    ),
    b AS (
        SELECT doc_id, tk,
               list_filter(generate_series(1, len(tk)),
                           i -> substr(md5(tk[i]), 32, 1) IN ('0','8')) AS bpos
        FROM w
    ),
    ch0 AS (
        SELECT doc_id, unnest(generate_series(1, len(bpos) + 1)) AS j, tk, bpos
        FROM b
    ),
    ch1 AS (
        SELECT doc_id,
               array_to_string(tk[(CASE WHEN j = 1 THEN 1 ELSE bpos[j-1]+1 END)
                                  :(CASE WHEN j <= len(bpos) THEN bpos[j] ELSE len(tk) END)],
                               ' ') AS chunk
        FROM ch0
    ),
    g AS (SELECT doc_id, md5(chunk) AS chunk_hash FROM ch1 WHERE chunk <> ''),
    dup AS (SELECT chunk_hash FROM g GROUP BY 1 HAVING COUNT(DISTINCT doc_id) >= 2),
    dc AS (SELECT doc_id, COUNT(*) AS n_dup FROM g
           WHERE chunk_hash IN (SELECT chunk_hash FROM dup) GROUP BY 1),
    tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM g GROUP BY 1)
    SELECT tot.doc_id AS doc_id, n_chunks,
           COALESCE(dc.n_dup, 0) AS n_dup_chunks,
           ROUND(COALESCE(dc.n_dup, 0) * 1.0 / n_chunks, 12) AS dup_chunk_fraction
    FROM tot LEFT JOIN dc USING (doc_id)
    """,
    doc="Content-defined chunking dedup (the Rabin/FastCDC idea on the "
    "word stream): a chunk boundary falls AFTER any word whose md5's "
    "last hex digit ∈ {0,8} (P=1/8 ⇒ ~8-word expected chunks), so "
    "boundaries depend only on LOCAL content — insert one word early in "
    "a re-crawled page and every later chunk still re-aligns, which "
    "fixed-offset chunking (q_payload_chunks) cannot do; per doc the "
    "duplicated-chunk count and fraction against the whole corpus. The "
    "storage-dedup/incremental-crawl primitive. Plan: boundaries and "
    "chunks are ONE array projection per doc (filter + transform + "
    "slice, whole-stage codegen, O(len) — no O(len·window) rolling "
    "recompute); chunks travel as md5 digests; dup membership is the "
    "q_dup_span_fraction shape — count-distinct agg on the digest, then "
    "one co-shuffled LEFT join + doc-keyed agg producing numerator and "
    "denominator together.",
    tags=("dedup", "text", "multimodal"),
)
def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _cdc_chunk_rows(load_table(spark, sf_dir, "documents")).select(
        "doc_id", F.md5("chunk").alias("chunk_hash")
    )
    dup = (
        g.groupBy("chunk_hash")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("chunk_hash", F.lit(1).alias("isdup"))
    )
    return (
        g.join(dup, "chunk_hash", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count("isdup").cast("bigint").alias("n_dup_chunks"),
        )
        .select(
            "doc_id",
            "n_chunks",
            "n_dup_chunks",
            F.round(
                F.col("n_dup_chunks").cast("double") / F.col("n_chunks"), 12
            ).alias("dup_chunk_fraction"),
        )
    )


@query(
    "q_linkage_score",
    """
    WITH clean AS (
        SELECT c_custkey AS key, c_nationkey AS nat, c_mktsegment AS seg,
               c_name AS name, c_acctbal AS bal
        FROM customer),
    n AS (SELECT COUNT(*) AS n_total FROM clean),
    c2 AS (SELECT *, substr(name, 1, 16) AS nm16 FROM clean),
    wseg AS (SELECT seg, COUNT(*) AS df_seg FROM c2 GROUP BY 1),
    wnm AS (SELECT nm16, COUNT(*) AS df_nm FROM c2 GROUP BY 1),
    wbal AS (SELECT bal, COUNT(*) AS df_bal FROM c2 GROUP BY 1),
    cw AS (
        SELECT key, nat, seg, nm16, bal,
               CAST(round(ln(CAST(n_total AS DOUBLE)/df_seg)*1000000) AS BIGINT) AS w_seg,
               CAST(round(ln(CAST(n_total AS DOUBLE)/df_nm)*1000000) AS BIGINT) AS w_nm,
               CAST(round(ln(CAST(n_total AS DOUBLE)/df_bal)*1000000) AS BIGINT) AS w_bal
        FROM c2 JOIN wseg USING (seg) JOIN wnm USING (nm16) JOIN wbal USING (bal), n),
    dirty AS (
        SELECT key AS dkey, nat, seg AS dseg,
               substr(name,1,16) || substr(name,18,1) || substr(name,17,1) AS dname,
               bal AS dbal
        FROM clean WHERE key % 10 = 0),
    d2 AS (SELECT dkey, nat, dseg, substr(dname,1,16) AS dnm16, dbal FROM dirty),
    scored AS (
        SELECT dkey, key AS cand,
               (CASE WHEN dseg = seg THEN w_seg ELSE 0 END
                + CASE WHEN dnm16 = nm16 THEN w_nm ELSE 0 END
                + CASE WHEN dbal = bal THEN w_bal ELSE 0 END) AS score_micro,
               (CAST(dseg = seg AS INT) + CAST(dnm16 = nm16 AS INT)
                + CAST(dbal = bal AS INT)) AS n_agree
        FROM d2 JOIN cw USING (nat))
    SELECT dkey, cand, score_micro, n_agree FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY dkey
                                     ORDER BY score_micro DESC, cand) AS rn
        FROM scored
    ) WHERE rn = 1
    """,
    doc="Record-linkage scoring with frequency-derived agreement weights "
    "(the deterministic core of Fellegi-Sunter entity resolution): a "
    "dirty twin of every 10th customer is planted (last two name chars "
    "swapped — the typo class linkage exists for), candidates come from "
    "nation blocking, and each field agreement scores the SELF-"
    "INFORMATION of the shared value, ln(N/df(value)) — agreeing on a "
    "near-unique balance is strong evidence, agreeing on one of five "
    "segments is weak — summed in log-micros (exact BIGINT; the ln is "
    "per-distinct-value, rounded once). Per dirty record the best-"
    "scoring candidate wins (row_number, deterministic ties). Completes "
    "the ER stack: q_sorted_neighborhood/q_fuzzy_pairs generate "
    "candidates, this SCORES them. Plan: per-field value-frequency "
    "aggs on the clean side only (weights attach to clean records, so "
    "the pair pass is one equi-join on the block key + a pure "
    "projection — no per-pair lookups), then a per-dirty-key top-1 "
    "window on the bounded candidate set.",
    tags=("dedup", "join", "stats"),
)
def q_linkage_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    c = load_table(spark, sf_dir, "customer")
    clean = c.select(
        F.col("c_custkey").alias("key"),
        F.col("c_nationkey").alias("nat"),
        F.col("c_mktsegment").alias("seg"),
        F.col("c_name").alias("name"),
        F.col("c_acctbal").alias("bal"),
    )
    dirty = clean.filter(F.col("key") % 10 == 0).select(
        F.col("key").alias("dkey"),
        "nat",
        "seg",
        F.concat(
            F.substring("name", 1, 16), F.substring("name", 18, 1), F.substring("name", 17, 1)
        ).alias("name"),
        "bal",
    )
    n_total = clean.count()  # scalar; at scale a metadata-only count
    lnw = lambda df_col: (  # noqa: E731
        F.round(F.log(F.lit(float(n_total)) / df_col.cast("double")) * 1000000).cast("bigint")
    )
    clean2 = clean.withColumn("nm16", F.substring("name", 1, 16))
    wseg = clean2.groupBy("seg").agg(F.count(F.lit(1)).alias("df_seg"))
    wnm = clean2.groupBy("nm16").agg(F.count(F.lit(1)).alias("df_nm"))
    wbal = clean2.groupBy("bal").agg(F.count(F.lit(1)).alias("df_bal"))
    cw = (
        clean2.join(wseg, "seg")
        .join(wnm, "nm16")
        .join(wbal, "bal")
        .select(
            "key", "nat", "seg", "nm16", "bal",
            lnw(F.col("df_seg")).alias("w_seg"),
            lnw(F.col("df_nm")).alias("w_nm"),
            lnw(F.col("df_bal")).alias("w_bal"),
        )
    )
    d2 = dirty.select(
        "dkey", "nat",
        F.col("seg").alias("dseg"),
        F.substring("name", 1, 16).alias("dnm16"),
        F.col("bal").alias("dbal"),
    )
    pairs = d2.join(cw, "nat")
    score = (
        F.when(F.col("dseg") == F.col("seg"), F.col("w_seg")).otherwise(F.lit(0))
        + F.when(F.col("dnm16") == F.col("nm16"), F.col("w_nm")).otherwise(F.lit(0))
        + F.when(F.col("dbal") == F.col("bal"), F.col("w_bal")).otherwise(F.lit(0))
    )
    n_agree = (
        (F.col("dseg") == F.col("seg")).cast("int")
        + (F.col("dnm16") == F.col("nm16")).cast("int")
        + (F.col("dbal") == F.col("bal")).cast("int")
    )
    scored = pairs.select(
        "dkey", F.col("key").alias("cand"), score.alias("score_micro"), n_agree.alias("n_agree")
    )
    w = Window.partitionBy("dkey").orderBy(F.desc("score_micro"), F.asc("cand"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")


# Shared DuckDB CTE: (doc_id, chunk) under the same content-defined
# chunking as _cdc_chunk_rows (q_cdc_chunks carries the inline original).
_CDC_SQL_CTE = r"""
    w AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS tk FROM documents
        WHERE len(string_split_regex(trim(text), '\s+')) >= 1
    ),
    b AS (
        SELECT doc_id, tk,
               list_filter(generate_series(1, len(tk)),
                           i -> substr(md5(tk[i]), 32, 1) IN ('0','8')) AS bpos
        FROM w
    ),
    ch0 AS (
        SELECT doc_id, unnest(generate_series(1, len(bpos) + 1)) AS j, tk, bpos
        FROM b
    ),
    ch1 AS (
        SELECT doc_id,
               array_to_string(tk[(CASE WHEN j = 1 THEN 1 ELSE bpos[j-1]+1 END)
                                  :(CASE WHEN j <= len(bpos) THEN bpos[j] ELSE len(tk) END)],
                               ' ') AS chunk
        FROM ch0
    ),
    g AS (SELECT doc_id, chunk FROM ch1 WHERE chunk <> '')
"""


@query(
    "q_incremental_cdc",
    f"""
    WITH {_CDC_SQL_CTE},
    store AS (
        SELECT DISTINCT md5(chunk) AS chunk_hash FROM g WHERE doc_id % 5 = 0
    ),
    incoming AS (
        SELECT doc_id, chunk, md5(chunk) AS chunk_hash,
               octet_length(encode(chunk)) AS nbytes
        FROM g WHERE doc_id % 5 <> 0
    ),
    acc AS (
        SELECT i.doc_id,
               COUNT(*) AS n_chunks,
               SUM(CASE WHEN s.chunk_hash IS NOT NULL THEN 1 ELSE 0 END) AS n_known,
               CAST(SUM(nbytes) AS BIGINT) AS total_bytes,
               CAST(SUM(CASE WHEN s.chunk_hash IS NULL THEN nbytes ELSE 0 END)
                    AS BIGINT) AS novel_bytes
        FROM incoming i LEFT JOIN store s USING (chunk_hash)
        GROUP BY 1
    )
    SELECT doc_id, n_chunks, CAST(n_known AS BIGINT) AS n_known_chunks,
           total_bytes, novel_bytes,
           ROUND(novel_bytes * 1.0 / total_bytes, 12) AS novelty
    FROM acc
    """,
    doc="Incremental ingest over a CDC chunk store (the rsync/restic/"
    "crawl-re-ingest accounting): docs with doc_id%5=0 stand in for the "
    "already-ingested corpus whose chunk hashes are the STORE; each "
    "incoming doc reports how many of its content-defined chunks the "
    "store already holds and the novel-byte volume actually requiring "
    "transfer/storage — the deduplication-ratio ledger every chunked "
    "object store keeps. Pairs with q_incremental_neardup (minhash "
    "bucket store, doc-level) as the CHUNK-level incremental path: CDC "
    "boundaries re-align around edits (95.4% measured, SCALE.md CDC "
    "ladder), so a re-crawled page pays only its edited spans. Plan: "
    "per-batch cost is O(|incoming|) chunking (one array projection) + "
    "one equi-join of 16-byte digests against the store; at scale the "
    "store is a bucketed table on chunk_hash and the probe co-locates "
    "(sinks/bucketed.py), exactly like the minhash store.",
    tags=("dedup", "incremental", "multimodal"),
)
def q_incremental_cdc(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = _cdc_chunk_rows(load_table(spark, sf_dir, "documents"))
    hashed = g.select(
        "doc_id",
        F.md5("chunk").alias("chunk_hash"),
        F.octet_length(F.encode("chunk", "utf-8")).alias("nbytes"),
    )
    store = (
        hashed.filter(F.col("doc_id") % 5 == 0).select("chunk_hash").distinct()
        .withColumn("known", F.lit(1))
    )
    incoming = hashed.filter(F.col("doc_id") % 5 != 0)
    return (
        incoming.join(store, "chunk_hash", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.count("known").cast("bigint").alias("n_known_chunks"),
            F.sum("nbytes").cast("bigint").alias("total_bytes"),
            F.sum(F.when(F.col("known").isNull(), F.col("nbytes")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("novel_bytes"),
        )
        .select(
            "doc_id", "n_chunks", "n_known_chunks", "total_bytes", "novel_bytes",
            F.round(F.col("novel_bytes").cast("double") / F.col("total_bytes"), 12).alias(
                "novelty"
            ),
        )
    )


@query(
    "q_lsh_quality",
    f"""
    WITH {_SHINGLES_CTE},
    seeded AS (SELECT doc_id, seed, substr(md5(concat(seed, ':', shingle)), 1, 15) AS h
               FROM sh CROSS JOIN (SELECT unnest(generate_series(0, 15)) AS seed)),
    sig AS (SELECT doc_id, seed, MIN(h) AS minhash FROM seeded GROUP BY doc_id, seed),
    bucketed AS (SELECT doc_id, seed // 4 AS band,
                        md5(string_agg(minhash, ',' ORDER BY seed)) AS bucket
                 FROM sig GROUP BY doc_id, seed // 4),
    cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
             FROM bucketed a JOIN bucketed b USING (band, bucket)
             WHERE a.doc_id < b.doc_id),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
              FROM sh a JOIN sh b USING (shingle)
              WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
    truep AS (SELECT d1, d2 FROM inter
              JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
              WHERE n_common * 1.0 / (s1.n + s2.n - n_common) >= 0.8),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    u AS (
        SELECT COALESCE(c.d1, t.d1) AS d1, COALESCE(c.d2, t.d2) AS d2,
               c.d1 IS NOT NULL AS isc, t.d1 IS NOT NULL AS ist
        FROM cand c FULL JOIN truep t ON c.d1 = t.d1 AND c.d2 = t.d2
    ),
    agg AS (
        SELECT CAST(SUM(CAST(isc AS INT)) AS BIGINT) AS n_candidates,
               CAST(SUM(CAST(ist AS INT)) AS BIGINT) AS n_true_pairs,
               CAST(SUM(CAST(isc AND ist AS INT)) AS BIGINT) AS n_hits
        FROM u
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_docs * (n_docs - 1) / 2 AS BIGINT) AS n_possible_pairs,
           n_candidates, n_true_pairs, n_hits,
           ROUND(CAST(n_hits AS DOUBLE) / n_true_pairs, 12) AS recall,
           ROUND(CAST(n_candidates AS DOUBLE) / (n_docs * (n_docs - 1) / 2), 12)
               AS candidate_rate
    FROM agg, nd
    """,
    doc="MinHash-LSH banding audited AS A QUERY with an exact oracle: "
    "candidate pairs (16 hashes / 4 bands) set-compared against the "
    "exact Jaccard-0.8 truth (inverted-index join, no sampling) — one "
    "row with recall and candidate rate, the two numbers that decide a "
    "banding recipe (recall = what dedup misses; candidate_rate = what "
    "the verify stage pays; at this recipe the fixture measures recall "
    "1.0 at ~2e-4 of all pairs). Both legs are deterministic relational "
    "plans, so unlike the usual sampled recall estimate this audit is "
    "EXACT and driver-hash-checked every round — the q_minhash_estimate "
    "(per-pair sketch accuracy) and SCALE.md ladder (volume growth) "
    "companions at the pair-set level. Scale: truth leg costs the "
    "inverted-index join — run the audit on a hash-sampled slice at "
    "production sizes, same plan.",
    tags=("dedup", "report", "stats"),
)
def q_lsh_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cand = minhash_lsh_candidates(d, num_hashes=16, bands=4).select("d1", "d2")
    true = ngram_jaccard_pairs(d, threshold=0.8).select("d1", "d2")
    n_docs = d.count()  # scalar; bounded driver state
    stats = (
        cand.withColumn("src", F.lit("c"))
        .unionByName(true.withColumn("src", F.lit("t")))
        .groupBy("d1", "d2")
        .agg(F.collect_set("src").alias("s"))
        .agg(
            F.sum(F.array_contains("s", "c").cast("int")).cast("bigint").alias("n_candidates"),
            F.sum(F.array_contains("s", "t").cast("int")).cast("bigint").alias("n_true_pairs"),
            F.sum((F.array_contains("s", "c") & F.array_contains("s", "t")).cast("int"))
            .cast("bigint")
            .alias("n_hits"),
        )
    )
    possible = F.lit(n_docs) * (n_docs - 1) / 2
    return stats.select(
        F.lit(n_docs).cast("bigint").alias("n_docs"),
        possible.cast("bigint").alias("n_possible_pairs"),
        "n_candidates",
        "n_true_pairs",
        "n_hits",
        F.round(F.col("n_hits").cast("double") / F.col("n_true_pairs"), 12).alias("recall"),
        F.round(F.col("n_candidates").cast("double") / possible, 12).alias("candidate_rate"),
    )
