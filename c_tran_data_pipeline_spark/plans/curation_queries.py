"""Corpus-curation queries (operators/curation.py) — deterministic
train/val/test splits, stratified sampling, per-domain quotas, and the
end-to-end corpus-prep pipeline, each oracle-checked against DuckDB.

The md5 bucket identity (Spark ``conv(substr(md5(x),1,15),16,10)`` ==
DuckDB ``CAST('0x'||substr(md5(x),1,15) AS BIGINT)``) makes every
"random" decision bit-reproducible across engines — see
plans/dedup_queries.py where the same trick pins minhash signatures.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.functions.text import lang_id, quality_score
from c_tran_data_pipeline_spark.operators.curation import (
    domain_cap,
    exact_dedup,
    hash_split,
    stratified_sample,
)
from c_tran_data_pipeline_spark.plans.registry import query
from c_tran_data_pipeline_spark.plans.text_queries import langid_case_sql, quality_sql
from c_tran_data_pipeline_spark.sources.readers import load_table, spread


def _bucket_sql(key_sql: str, salt: str, buckets: int = 10_000) -> str:
    return (
        f"CAST('0x' || substr(md5('{salt}' || ':' || {key_sql}), 1, 15) AS BIGINT) % {buckets}"
    )


@query(
    "q_train_split",
    f"""
    SELECT doc_id,
           CASE WHEN {_bucket_sql("CAST(doc_id AS VARCHAR)", "split")} < 9000 THEN 'train'
                WHEN {_bucket_sql("CAST(doc_id AS VARCHAR)", "split")} < 9500 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
    doc="operators/curation.py hash_split: 90/5/5 train/val/test by "
    "salted md5 bucket of doc_id — same doc always lands in the same "
    "split, on any engine (leakage-proof under corpus rebuilds). Pure "
    "projection, no shuffle.",
    tags=("curation", "split"),
)
def q_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    out = hash_split(d, key="doc_id")
    return out.select("doc_id", F.coalesce("split", F.lit("test")).alias("split"))


@query(
    "q_stratified_sample",
    f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_bucket_sql("CAST(doc_id AS VARCHAR)", "sample", 10_000)}
          < CAST((CASE WHEN lang = 'en' THEN 0.5 WHEN lang = 'de' THEN 1.0 ELSE 0.2 END) * 10000 AS BIGINT)
    """,
    doc="operators/curation.py stratified_sample: per-language "
    "deterministic downsampling (en 50%, de 100%, rest 20%) via salted "
    "hash buckets — a pushable filter, reproducible unlike df.sample.",
    tags=("curation", "sample"),
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        d, stratum="lang", fractions={"en": 0.5, "de": 1.0}, key="doc_id", default_fraction=0.2
    ).select("doc_id", "lang")


@query(
    "q_domain_cap",
    """
    SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn
        FROM documents
    ) WHERE rn <= 15
    """,
    doc="operators/curation.py domain_cap: keep the 15 largest docs per "
    "source — the anti-domination quota every crawl corpus needs. One "
    "shuffle on the domain key.",
    tags=("curation", "quota"),
)
def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return domain_cap(
        d, domain="source", order_by=[F.col("n_chars").desc(), F.col("doc_id").asc()], cap=15
    )


@query(
    "q_corpus_prep",
    f"""
    WITH scored AS (
        SELECT doc_id, source, n_chars, text,
               {langid_case_sql()} AS pred_lang,
               {quality_sql()} AS quality
        FROM documents
    ),
    kept AS (
        SELECT * FROM scored WHERE pred_lang = 'en' AND quality >= 0.2
    ),
    dedup AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM kept
        ) WHERE rn = 1
    )
    SELECT doc_id, source, n_chars, ROUND(quality, 6) AS quality FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality DESC, doc_id) AS rn2
        FROM dedup
    ) WHERE rn2 <= 15
    """,
    doc="End-to-end corpus prep: language filter (lang_id = en) → "
    "quality floor → exact dedup (min doc per content hash) → per-source "
    "quality-ranked cap (15/source). The composition every training-data pipeline "
    "runs, as ONE declarative plan: the filters fuse into the scan, then "
    "exactly two shuffles (content hash, domain quota).",
    tags=("curation", "pipeline"),
)
def q_corpus_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id",
        "source",
        "n_chars",
        "text",
        lang_id("text").alias("pred_lang"),
        quality_score("text").alias("quality"),
    )
    kept = scored.filter((F.col("pred_lang") == "en") & (F.col("quality") >= 0.2))
    deduped = exact_dedup(kept, content="text", key="doc_id")
    capped = domain_cap(
        deduped, domain="source", order_by=[F.col("quality").desc(), F.col("doc_id").asc()], cap=15
    )
    return capped.select("doc_id", "source", "n_chars", F.round("quality", 6).alias("quality"))


@query(
    "q_corpus_prep_neardup",
    f"""
    WITH RECURSIVE scored AS (
        SELECT doc_id, source, text,
               {langid_case_sql()} AS pred_lang,
               {quality_sql()} AS quality
        FROM documents
    ),
    kept AS (
        SELECT doc_id, source, text, quality FROM scored
        WHERE pred_lang = 'en' AND quality >= 0.2
    ),
    exact AS (
        SELECT * FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
            FROM kept
        ) WHERE rn = 1
    ),
    w AS (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM exact),
    sh AS (
        SELECT doc_id, unnest(list_distinct(
            list_transform(generate_series(1, len(words)-2),
                           i -> array_to_string(words[i:i+2], ' ')))) AS shingle
        FROM w
    ),
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
    ),
    comp AS (SELECT node AS doc_id, MIN(lbl) AS component FROM reach GROUP BY node)
    SELECT doc_id, source, ROUND(quality, 6) AS quality FROM (
        SELECT e.*, ROW_NUMBER() OVER (PARTITION BY e.source ORDER BY e.quality DESC, e.doc_id) AS rn2
        FROM exact e LEFT JOIN comp c ON e.doc_id = c.doc_id
        WHERE c.doc_id IS NULL OR c.component = e.doc_id
    ) WHERE rn2 <= 15
    """,
    doc="The FULL training-data prep: langid → quality floor → exact "
    "dedup → MinHash-LSH near-dup clustering (connected components; "
    "keep each cluster's min-id representative) → per-source quality "
    "quota. One declarative plan plus the iterative cluster loop; the "
    "oracle runs the identical cascade with a recursive-CTE closure.",
    tags=("curation", "dedup", "graph", "pipeline"),
)
def q_corpus_prep_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.dedup import minhash_lsh_candidates
    from c_tran_data_pipeline_spark.operators.graph import dedup_clusters

    # spread(): langid + quality + md5 all run before the first shuffle;
    # a one-row-group fixture scan would pin that cascade to one thread.
    d = spread(load_table(spark, sf_dir, "documents"))
    scored = d.select(
        "doc_id", "source", "text", lang_id("text").alias("pred_lang"),
        quality_score("text").alias("quality"),
    )
    kept = scored.filter((F.col("pred_lang") == "en") & (F.col("quality") >= 0.2))
    # exact is consumed TWICE (shingled into LSH pairs, then joined against
    # the cluster labels) — materialize the scan→score→dedup cascade once.
    # Lazy checkpoint: the CC loop's eager checkpoint of its edge list is
    # the first action, so this caches as a byproduct of work already done
    # (the cluster equivalent of writing the silver layer before near-dup).
    exact = exact_dedup(kept, content="text", key="doc_id").localCheckpoint(eager=False)
    pairs = minhash_lsh_candidates(exact, num_hashes=16, bands=4)
    comp = dedup_clusters(pairs)
    # survivors: docs not in any cluster, or the cluster representative
    survivors = (
        exact.join(comp, on="doc_id", how="left")
        .filter(F.col("component").isNull() | (F.col("component") == F.col("doc_id")))
        .drop("component")
    )
    capped = domain_cap(
        survivors, domain="source", order_by=[F.col("quality").desc(), F.col("doc_id").asc()], cap=15
    )
    return capped.select("doc_id", "source", F.round("quality", 6).alias("quality"))


@query(
    "q_incremental_ingest",
    """
    WITH existing AS (
        SELECT DISTINCT md5(text) AS h FROM documents WHERE doc_id % 5 = 0
    ),
    incoming AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
    fresh AS (
        SELECT i.* FROM incoming i LEFT JOIN existing e ON md5(i.text) = e.h
        WHERE e.h IS NULL
    )
    SELECT doc_id, source, n_chars FROM (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
        FROM fresh
    ) WHERE rn = 1
    """,
    doc="operators/curation.py incremental_ingest: a new dump anti-joins "
    "its content hashes against the already-ingested fingerprint set "
    "(docs with doc_id%5=0 stand in for the historical corpus), then "
    "dedups within the batch — the content-level ON CONFLICT DO NOTHING "
    "every recurring crawl ingest needs. Digest-width shuffles only.",
    tags=("curation", "dedup", "incremental"),
)
def q_incremental_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.curation import incremental_ingest

    d = load_table(spark, sf_dir, "documents")
    existing = d.filter(F.col("doc_id") % 5 == 0)
    incoming = d.filter(F.col("doc_id") % 5 != 0)
    return incremental_ingest(incoming, existing).select("doc_id", "source", "n_chars")


_BOILER_NEWSLETTER = "subscribe to our newsletter for updates"
_BOILER_COPYRIGHT = "all rights reserved copyright notice"


@query(
    "q_boilerplate_scrub",
    r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks FROM documents
    ),
    base AS (
        SELECT doc_id, list_transform(
            generate_series(0, CAST(floor((len(toks)-1)/12) AS INT)),
            i -> array_to_string(toks[i*12+1 : i*12+12], ' ')) AS lines
        FROM t
    ),
    p1 AS (
        SELECT doc_id, CASE WHEN doc_id % 3 = 0
            THEN lines[1:1] || ['subscribe to our newsletter for updates'] || lines[2:]
            ELSE lines END AS lines
        FROM base
    ),
    p2 AS (
        SELECT doc_id, CASE WHEN doc_id % 5 = 0
            THEN lines || ['all rights reserved copyright notice']
            ELSE lines END AS lines
        FROM p1
    ),
    ex AS (
        SELECT doc_id, u.pos AS pos, u.line AS line
        FROM (SELECT doc_id, unnest(list_transform(generate_series(1, len(lines)),
                     i -> {'pos': i, 'line': lines[i]})) AS u FROM p2)
    ),
    dfreq AS (SELECT md5(line) AS h, COUNT(DISTINCT doc_id) AS ddf FROM ex GROUP BY 1),
    tot AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
    boiler AS (SELECT h FROM dfreq, tot WHERE ddf >= greatest(3, CAST(ceil(0.05*n) AS BIGINT))),
    kept AS (SELECT ex.doc_id, ex.pos, ex.line FROM ex ANTI JOIN boiler ON md5(ex.line) = boiler.h),
    reb AS (SELECT doc_id, COUNT(*) AS n_kept,
                   array_to_string(list(line ORDER BY pos), chr(10)) AS clean
            FROM kept GROUP BY 1)
    SELECT p2.doc_id,
           len(p2.lines) AS n_lines,
           coalesce(reb.n_kept, 0) AS n_kept,
           len(p2.lines) - coalesce(reb.n_kept, 0) AS n_dropped,
           md5(coalesce(reb.clean, '')) AS clean_hash
    FROM p2 LEFT JOIN reb USING (doc_id)
    """,
    doc="C4-style line-level boilerplate removal "
    "(operators/curation.py:boilerplate_scrub): documents are wrapped "
    "into 12-token lines (the fixture has no newlines) and two canonical "
    "boilerplate lines are planted on every 3rd/5th doc — the scrub must "
    "then find them BY FREQUENCY (line recurs across >= max(3, ceil(5% "
    "of docs)) distinct documents) and strip them while reassembling "
    "every untouched line in order. The relative threshold is the part "
    "that survives 100x corpus growth. Line frequency aggregates on "
    "16-byte md5 digests; removal is a broadcast anti-join; reassembly "
    "is the one shuffle that moves text. Output carries md5(clean_text) "
    "so compared rows stay narrow.",
    tags=("curation", "text", "quality"),
)
def q_boilerplate_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.curation import boilerplate_scrub

    d = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_src_lines = F.floor((F.size(toks) - 1) / F.lit(12)).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_src_lines),
        lambda i: F.array_join(F.slice(toks, i * 12 + 1, 12), " "),
    )
    from c_tran_data_pipeline_spark.operators.fence import eval_once

    # Fence after line construction: the planted when/concat branches
    # below reference `lines` up to 3× each, and CollapseProject would
    # otherwise inline (split → sequence → transform → slice) once per
    # reference. One Generate barrier = the whole tokenize+window runs
    # once per row.
    with_lines = eval_once(d.select("doc_id", lines.alias("lines")))
    l = F.col("lines")
    planted1 = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.slice(l, 1, 1),
            F.array(F.lit(_BOILER_NEWSLETTER)),
            F.slice(l, 2, F.greatest(F.size(l) - 1, F.lit(0))),
        ),
    ).otherwise(l)
    p1 = with_lines.select("doc_id", planted1.alias("lines"))
    planted2 = F.when(
        F.col("doc_id") % 5 == 0, F.concat(l, F.array(F.lit(_BOILER_COPYRIGHT)))
    ).otherwise(l)
    p2 = p1.select("doc_id", planted2.alias("lines"))
    scrubbed = boilerplate_scrub(p2, lines="lines", key="doc_id", min_df=3, min_df_frac=0.05)
    return scrubbed.select(
        "doc_id",
        F.col("n_lines").cast("bigint").alias("n_lines"),
        F.col("n_kept").cast("bigint").alias("n_kept"),
        F.col("n_dropped").cast("bigint").alias("n_dropped"),
        F.md5("clean_text").alias("clean_hash"),
    )


@query(
    "q_upsample_mix",
    f"""
    WITH w AS (
        SELECT doc_id, source,
               CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.25
                           WHEN 'src2' THEN 0.0 ELSE 1.0 END AS wt,
               {_bucket_sql("CAST(doc_id AS VARCHAR)", "mix")} AS bucket
        FROM documents
    ),
    n AS (
        SELECT doc_id, source,
               CAST(floor(wt) AS BIGINT) +
               CASE WHEN bucket < CAST((wt - floor(wt)) * 10000 AS BIGINT)
                    THEN 1 ELSE 0 END AS n
        FROM w
    )
    SELECT doc_id, source, unnest(generate_series(1, n)) AS copy
    FROM n WHERE n >= 1
    """,
    doc="Deterministic data-mixture upsampling (operators/curation.py "
    "upsample_mix): the repeat-factor op behind fixed-ratio domain "
    "mixing — src0 at weight 2.5 (every doc twice, a deterministic "
    "hashed half a third time), src1 at 0.25 (quarter kept once), src2 "
    "dropped, everything else 1.0. RNG-free like every sampler here: "
    "the SAME docs get the extra copy on any engine or rerun, so a "
    "mixture is versionable. Pure projection + bounded explode — no "
    "shuffle; weights chosen binary-exact so the frac-threshold "
    "arithmetic is bit-identical cross-engine.",
    tags=("curation", "sample", "mix"),
)
def q_upsample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.curation import upsample_mix

    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return upsample_mix(
        d,
        stratum="source",
        weights={"src0": 2.5, "src1": 0.25, "src2": 0.0},
        key="doc_id",
        salt="mix",
    )


@query(
    "q_weighted_sample",
    """
    WITH keyed AS (
        SELECT doc_id, text, lang, source, n_chars,
               -ln((CAST('0x' || substr(md5(concat('wsample', ':', CAST(doc_id AS VARCHAR))), 1, 15)
                    AS BIGINT) + 1) / 1152921504606846976.0) / n_chars AS es
        FROM documents
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY es ASC, doc_id ASC) AS rnk
        FROM keyed
    )
    SELECT doc_id, text, lang, source, n_chars, ROUND(es, 6) AS es_key, rnk
    FROM ranked WHERE rnk <= 20
    """,
    doc="Deterministic weighted sampling without replacement "
    "(operators/curation.py weighted_sample — Efraimidis–Spirakis "
    "exponential race): u from the portable md5 hash of the key (no "
    "RNG), the 20 smallest −ln(u)/n_chars per language win → selection "
    "probability ∝ document length, reproducible on any engine or "
    "rerun. One projection + per-stratum top-k window, no full sort. "
    "The quality-weighted corpus subsampling primitive.",
    tags=("curation", "sample", "topk"),
)
def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.curation import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    return weighted_sample(docs, key="doc_id", weight="n_chars", k=20, stratum="lang")


@query(
    "q_psi_drift",
    f"""
    WITH s AS (
        SELECT event_type,
               CASE WHEN {_bucket_sql("CAST(event_id AS VARCHAR)", "split")} < 5000
                    THEN 'a' ELSE 'b' END AS half,
               CAST(least(floor(value / 25.0), 19) AS BIGINT) AS vb
        FROM events
    ), cnt AS (
        SELECT event_type, half, vb, COUNT(*) AS n FROM s GROUP BY 1, 2, 3
    ), wide AS (
        SELECT event_type, vb,
               CAST(SUM(CASE WHEN half = 'a' THEN n ELSE 0 END) AS DOUBLE) AS na,
               CAST(SUM(CASE WHEN half = 'b' THEN n ELSE 0 END) AS DOUBLE) AS nb
        FROM cnt GROUP BY 1, 2
    ), tot AS (
        SELECT event_type,
               CAST(SUM(na) AS DOUBLE) AS ta, CAST(SUM(nb) AS DOUBLE) AS tb
        FROM wide GROUP BY 1
    ), terms AS (
        SELECT w.event_type,
               greatest(w.na / t.ta, 1e-6) AS pa,
               greatest(w.nb / t.tb, 1e-6) AS pb
        FROM wide w JOIN tot t ON w.event_type = t.event_type
    )
    SELECT event_type, ROUND(SUM((pa - pb) * ln(pa / pb)), 6) AS psi
    FROM terms GROUP BY event_type
    """,
    doc="Population Stability Index between two deterministic hash-split "
    "halves of the event stream, per event type over 20 fixed-width "
    "value buckets (epsilon-floored proportions so an empty bucket "
    "contributes a finite term) — the drift monitor a feature pipeline "
    "runs between yesterday's and today's distribution, here oracled "
    "on a split where PSI should sit near 0. Two partial-first aggs "
    "(cells, then per-type totals rejoined on the |types|-row side); "
    "the float ln/sum is ROUND(6)-stable because counts are exact and "
    "terms are O(1e-2). At 100 TB the cell table is "
    "|types|×|buckets|×2 rows — constant — whatever the event volume.",
    tags=("curation", "stats", "report"),
)
def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.curation import split_bucket

    e = load_table(spark, sf_dir, "events")
    s = e.select(
        "event_type",
        F.when(split_bucket(F.col("event_id"), "split") < 5000, "a").otherwise("b").alias("half"),
        F.least(F.floor(F.col("value") / 25.0), F.lit(19)).cast("bigint").alias("vb"),
    )
    cnt = s.groupBy("event_type", "half", "vb").agg(F.count(F.lit(1)).alias("n"))
    wide = cnt.groupBy("event_type", "vb").agg(
        F.sum(F.when(F.col("half") == "a", F.col("n")).otherwise(0)).cast("double").alias("na"),
        F.sum(F.when(F.col("half") == "b", F.col("n")).otherwise(0)).cast("double").alias("nb"),
    )
    tot = wide.groupBy("event_type").agg(
        F.sum("na").cast("double").alias("ta"), F.sum("nb").cast("double").alias("tb")
    )
    terms = wide.join(F.broadcast(tot), "event_type").select(
        "event_type",
        F.greatest(F.col("na") / F.col("ta"), F.lit(1e-6)).alias("pa"),
        F.greatest(F.col("nb") / F.col("tb"), F.lit(1e-6)).alias("pb"),
    )
    return terms.groupBy("event_type").agg(
        F.round(F.sum((F.col("pa") - F.col("pb")) * F.log(F.col("pa") / F.col("pb"))), 6).alias("psi")
    )


@query(
    "q_global_shuffle_shards",
    """
    WITH keyed AS (
        SELECT doc_id, md5('shuffle:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
        FROM documents
    ), pos AS (
        SELECT doc_id, shuffle_key,
               ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) - 1 AS position
        FROM keyed
    )
    SELECT doc_id, position, position % 8 AS shard
    FROM pos
    """,
    doc="Deterministic global training-order shuffle + shard assignment: "
    "order = md5('shuffle:'||doc_id) — reproducible on any engine, no "
    "RNG state — position striped across 8 shards so each shard is an "
    "unbiased sample of the whole corpus (contiguous slicing would "
    "put correlated ingest neighbors in one shard). The global "
    "ROW_NUMBER is operators/rank.py's global_rank: "
    "repartitionByRange(shuffle_key) + in-partition row_number + "
    "per-partition-count prefix offsets broadcast back — no "
    "single-partition exchange anywhere, and the md5 key guarantees "
    "balanced ranges at any scale. "
    "For writer-side sharding the position is unnecessary: "
    "pmod(md5_long(key), shards) needs no global sort at all — this "
    "query pins the ORDER, which epoch-streaming loaders need.",
    tags=("curation", "sampling", "training"),
)
def q_global_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.rank import global_rank

    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        F.md5(F.concat_ws(":", F.lit("shuffle"), F.col("doc_id"))).alias("shuffle_key"),
    )
    # Range-partitioned exact global row number (operators/rank.py) —
    # the md5 key is uniform, so the range partitions are balanced and
    # no single task ever sees the whole corpus.
    ranked = global_rank(keyed, ["shuffle_key", "doc_id"], rank_col="__rn")
    return ranked.select(
        "doc_id",
        (F.col("__rn") - 1).alias("position"),
    ).withColumn("shard", F.col("position") % 8)


@query(
    "q_temperature_sample",
    """
    WITH counts AS (SELECT source, COUNT(*) AS n FROM documents GROUP BY 1),
    z AS (SELECT SUM(pow(CAST(n AS DOUBLE), 0.5)) AS z FROM counts),
    rates AS (
        SELECT source,
               LEAST(1.0, 200.0 * pow(CAST(n AS DOUBLE), 0.5) / z / CAST(n AS DOUBLE))
                   AS rate
        FROM counts, z
    )
    SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars,
           ROUND(r.rate, 9) AS samp_rate
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE (CAST('0x' || substr(md5(concat('temp', ':', CAST(doc_id AS VARCHAR))), 1, 15)
            AS BIGINT) + 1) / 1152921504606846976.0 <= r.rate
    """,
    doc="Temperature-flattened stratified sampling (operators/curation.py "
    "temperature_sample, alpha=0.5, target=200): the multilingual/"
    "multi-domain recipe sampler — stratum take ∝ n^alpha, so small "
    "sources are upweighted relative to raw proportions (the mT5/XLM-R "
    "sampling rule). Deterministic md5-race membership (u(doc) ≤ rate): "
    "no RNG, reruns and engines agree row-for-row. Plan: |strata|-row "
    "count agg, 1-row alpha-power normalizer re-entering as a broadcast "
    "scalar, per-stratum rates broadcast onto ONE corpus scan, then a "
    "hash filter — only the sample itself survives. The float policy is "
    "the weighted_sample one: u is a well-separated 60-bit ratio so the "
    "≤ boundary cannot flip cross-engine.",
    tags=("curation", "sample", "training"),
)
def q_temperature_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.curation import temperature_sample

    docs = load_table(spark, sf_dir, "documents")
    return temperature_sample(docs, stratum="source", target=200, alpha=0.5)


@query(
    "q_span_corruption",
    r"""
    WITH toks AS (
        SELECT doc_id, u.i AS pos, len(string_split_regex(trim(text), '\s+')) AS n_tokens
        FROM (SELECT doc_id, text,
                     unnest(list_transform(
                        generate_series(1, len(string_split_regex(trim(text), '\s+'))),
                        i -> {'i': i})) AS u
              FROM documents)
    ),
    flagged AS (
        SELECT doc_id, n_tokens,
               CASE WHEN CAST('0x' || substr(md5(concat(doc_id, ':', pos)), 1, 15)
                         AS BIGINT) % 100 < 15 THEN 1 ELSE 0 END AS m,
               CASE WHEN pos > 1 AND
                         CAST('0x' || substr(md5(concat(doc_id, ':', pos - 1)), 1, 15)
                              AS BIGINT) % 100 < 15 THEN 1 ELSE 0 END AS prev_m
        FROM toks
    )
    SELECT doc_id, MAX(n_tokens) AS n_tokens,
           COUNT(CASE WHEN m = 1 THEN 1 END) AS n_masked,
           COUNT(CASE WHEN m = 1 AND prev_m = 0 THEN 1 END) AS n_spans
    FROM flagged GROUP BY 1
    """,
    doc="T5-style span-corruption planning: mask ~15% of each document's "
    "tokens via a deterministic md5 coin per (doc, position), merge "
    "consecutive masked tokens into sentinel spans, and report per-doc "
    "(n_tokens, n_masked, n_spans) — the statistics a denoising-"
    "objective data pipeline needs to size sentinel vocabulary and "
    "target lengths. The span merge needs NO window: a token starts a "
    "span iff it is masked and position-1's coin (recomputed from the "
    "same hash — pure expression) is not, so the whole plan is "
    "explode → projection → one partial-first agg per doc; "
    "deterministic across engines, partitionings, and reruns, hence "
    "the exact oracle. At 100 TB the fan-out row is (doc_id, two "
    "bits), and the same coin recipe applied at APPLY time "
    "reconstructs identical spans without storing the plan.",
    tags=("curation", "text", "training"),
)
def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.functions.text import words

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.size(words("text")).alias("n_tokens"),
        F.posexplode(words("text")).alias("pos0", "tok"),
    ).select("doc_id", "n_tokens", (F.col("pos0") + 1).alias("pos"))

    def coin(pos_col):
        return (
            F.conv(F.substring(F.md5(F.concat_ws(":", F.col("doc_id"), pos_col)), 1, 15), 16, 10)
            .cast("bigint")
            % 100
            < 15
        )

    flagged = toks.select(
        "doc_id",
        "n_tokens",
        coin(F.col("pos")).cast("int").alias("m"),
        ((F.col("pos") > 1) & coin(F.col("pos") - 1)).cast("int").alias("prev_m"),
    )
    return flagged.groupBy("doc_id").agg(
        F.max("n_tokens").alias("n_tokens"),
        F.count(F.when(F.col("m") == 1, 1)).alias("n_masked"),
        F.count(F.when((F.col("m") == 1) & (F.col("prev_m") == 0), 1)).alias("n_spans"),
    )


@query(
    "q_grouped_kfold",
    """
    SELECT doc_id,
           CAST('0x' || substr(md5(md5(text)), 1, 15) AS BIGINT) % 5 AS fold
    FROM documents
    """,
    doc="Leakage-safe k-fold assignment: the fold is a deterministic "
    "hash of the document's CONTENT fingerprint (md5(text)), so exact "
    "duplicates — the classic cross-validation leak — land in the "
    "same fold by construction, across engines and reruns, with no "
    "stored fold table (the same property as the hash train/val "
    "split, lifted from row identity to content identity; for "
    "near-dup-safe folds, substitute the dedup-cluster representative "
    "id from q_dedup_clusters as the group key — same one-line "
    "recipe). Pure projection: no shuffle, no state, reproducible on "
    "100 TB by re-evaluating the expression.",
    tags=("curation", "sample", "training"),
)
def q_grouped_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(F.substring(F.md5(F.md5(F.col("text"))), 1, 15), 16, 10).cast("bigint") % 5
    )
    return docs.select("doc_id", fold.alias("fold"))


@query(
    "q_source_gini",
    r"""
    WITH mass AS (
        SELECT source, SUM(len(string_split_regex(trim(text), '\s+'))) AS toks
        FROM documents GROUP BY 1
    ),
    ranked AS (
        SELECT source, toks,
               ROW_NUMBER() OVER (ORDER BY toks ASC, source ASC) AS i,
               COUNT(*) OVER () AS n,
               SUM(toks) OVER () AS total
        FROM mass
    )
    SELECT ROUND(
             CAST(SUM(CAST(2 * i * toks AS DECIMAL(38,6))) AS DOUBLE)
                 / (MAX(n) * MAX(total))
               - (MAX(n) + 1.0) / MAX(n),
           6) AS gini
    FROM ranked
    """,
    doc="Gini coefficient of token mass across sources — the one-number "
    "source-imbalance diagnostic a curation pipeline tracks before and "
    "after domain capping / temperature sampling (0 = perfectly "
    "balanced mixture, →1 = one source dominates; pairs with "
    "q_source_mix_report's per-source shares and q_domain_cap's "
    "correction). Computed by the Lorenz-order identity "
    "G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending-sorted strata: the "
    "sort/window runs over the |sources|-row AGGREGATE (tiny by "
    "construction), never the corpus — token mass partial-aggregates "
    "per source in one pass. Integer i·xᵢ products summed in exact "
    "DECIMAL; the two final divisions are single IEEE ops — exact "
    "oracle.",
    tags=("curation", "report", "agg"),
)
def q_source_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from c_tran_data_pipeline_spark.functions.text import words

    from c_tran_data_pipeline_spark.operators.rank import global_rank

    docs = load_table(spark, sf_dir, "documents")
    mass = docs.groupBy("source").agg(F.sum(F.size(words("text"))).alias("toks"))
    # Lorenz rank over the per-source strata via the range-partitioned
    # global_rank (r8): the strata table is bounded by |sources|, but
    # this removes the last unpartitioned WindowExec from the plan —
    # and keeps the query correct even if the stratum key ever becomes
    # high-cardinality (per-domain instead of per-source).
    ranked = global_rank(mass, [F.asc("toks"), F.asc("source")], "i").select("toks", "i")
    return ranked.agg(
        F.round(
            F.sum((2 * F.col("i") * F.col("toks")).cast("decimal(38,6)")).cast("double")
            / (F.count(F.lit(1)) * F.sum("toks"))
            - (F.count(F.lit(1)) + 1.0) / F.count(F.lit(1)),
            6,
        ).alias("gini")
    )


@query(
    "q_quantile_norm",
    f"""
    WITH q AS (SELECT doc_id, source, {quality_sql()} AS quality FROM documents),
    ranked AS (
        SELECT doc_id, source, quality,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY quality, doc_id) AS rk,
               COUNT(*) OVER (PARTITION BY source) AS ns,
               ROW_NUMBER() OVER (ORDER BY quality, doc_id) AS gidx,
               COUNT(*) OVER () AS N
        FROM q
    ),
    t AS (
        SELECT doc_id, source, quality,
               CASE WHEN ns > 1 THEN 1 + (2*(rk-1)*(N-1) + (ns-1)) // (2*(ns-1))
                    ELSE 1 + (N-1) // 2 END AS tidx
        FROM ranked
    ),
    g AS (SELECT gidx AS tidx, quality AS norm_quality FROM ranked)
    SELECT doc_id, source, ROUND(quality, 6) AS quality,
           ROUND(norm_quality, 6) AS norm_quality
    FROM t JOIN g USING (tidx)
    """,
    doc="Cross-source quantile normalization of quality scores (the "
    "calibration step before mixing corpora: a 0.6 from a lenient "
    "scorer and a 0.6 from a strict one are NOT the same signal — map "
    "each doc to the GLOBAL score at its within-source percentile, so "
    "thresholds compare like for like across sources). Exactness is "
    "pure rank arithmetic: within-source row_number → target global "
    "index via integer half-up division (2(rk−1)(N−1)+(ns−1)) DIV "
    "(2(ns−1)) — no float percentile anywhere — then one equi-join on "
    "the index into the globally ranked table. The global rank and the "
    "COUNT(*) OVER () total both come from operators/rank.py's "
    "range-partitioned global_rank — no single-partition exchange at "
    "any scale; only the per-source window remains partitioned.",
    tags=("curation", "quality", "stats"),
)
def q_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    from c_tran_data_pipeline_spark.functions.text import quality_score
    from c_tran_data_pipeline_spark.operators.rank import global_rank

    d = load_table(spark, sf_dir, "documents")
    q = d.select("doc_id", "source", quality_score("text").alias("quality"))
    # Global index + total via the range-partitioned exact rank
    # (operators/rank.py) — no single-partition window; the per-source
    # rank stays a partitioned window (each source is one hash group).
    w_src = Window.partitionBy("source").orderBy("quality", "doc_id")
    ranked = global_rank(
        q, ["quality", "doc_id"], rank_col="gidx", total_col="N"
    ).select(
        "doc_id", "source", "quality", "gidx", "N",
        F.row_number().over(w_src).alias("rk"),
        F.count(F.lit(1)).over(Window.partitionBy("source")).alias("ns"),
    )
    tgt = F.when(
        F.col("ns") > 1, F.expr("1 + (2*(rk-1)*(N-1) + (ns-1)) DIV (2*(ns-1))")
    ).otherwise(F.expr("1 + (N-1) DIV 2"))
    with_t = ranked.select("doc_id", "source", "quality", tgt.alias("tidx"))
    glob = ranked.select(F.col("gidx").alias("tidx"), F.col("quality").alias("norm_quality"))
    return with_t.join(glob, "tidx").select(
        "doc_id", "source",
        F.round("quality", 6).alias("quality"),
        F.round("norm_quality", 6).alias("norm_quality"),
    )


@query(
    "q_source_jsd",
    r"""
    WITH toks AS (
        SELECT source, unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
    ),
    cnt AS (SELECT source, tok, COUNT(*) AS c FROM toks GROUP BY 1, 2),
    totals AS (SELECT source, CAST(SUM(c) AS BIGINT) AS n FROM cnt GROUP BY 1),
    top AS (SELECT source, n FROM totals ORDER BY n DESC, source LIMIT 6),
    sl AS (SELECT cnt.* FROM cnt JOIN top USING (source)),
    pairs AS (SELECT a.source AS s1, a.n AS n1, b.source AS s2, b.n AS n2
              FROM top a JOIN top b ON a.source < b.source),
    l AS (SELECT s1, s2, tok, c AS c1 FROM sl JOIN pairs ON sl.source = pairs.s1),
    r AS (SELECT s1, s2, tok, c AS c2 FROM sl JOIN pairs ON sl.source = pairs.s2),
    u AS (
        SELECT COALESCE(l.s1, r.s1) AS s1, COALESCE(l.s2, r.s2) AS s2,
               COALESCE(l.tok, r.tok) AS tok,
               COALESCE(c1, 0) AS c1, COALESCE(c2, 0) AS c2
        FROM l FULL JOIN r ON l.s1 = r.s1 AND l.s2 = r.s2 AND l.tok = r.tok
    ),
    uj AS (SELECT u.*, n1, n2 FROM u JOIN pairs USING (s1, s2)),
    sm AS (
        SELECT s1, s2, n1, n2,
               SUM(CAST((c1*n2 + c2*n1)
                        * CAST(round(ln(CAST(c1*n2 + c2*n1 AS DOUBLE)) * 1000000) AS BIGINT)
                        AS HUGEINT)) AS s_m,
               SUM(CASE WHEN c1 > 0 THEN
                       CAST(c1 * CAST(round(ln(CAST(c1 AS DOUBLE)) * 1000000) AS BIGINT)
                            AS HUGEINT) END) AS s_p,
               SUM(CASE WHEN c2 > 0 THEN
                       CAST(c2 * CAST(round(ln(CAST(c2 AS DOUBLE)) * 1000000) AS BIGINT)
                            AS HUGEINT) END) AS s_q
        FROM uj GROUP BY 1, 2, 3, 4
    )
    SELECT s1, s2, n1 AS n1_tokens, n2 AS n2_tokens,
           ROUND( (ln(2.0*n1*n2) - CAST(s_m AS DOUBLE)/(2000000.0*n1*n2))
                - ((ln(CAST(n1 AS DOUBLE)) - CAST(s_p AS DOUBLE)/(1000000.0*n1))
                 + (ln(CAST(n2 AS DOUBLE)) - CAST(s_q AS DOUBLE)/(1000000.0*n2)))/2,
                 12) AS jsd
    FROM sm
    """,
    doc="Pairwise Jensen-Shannon divergence between the token "
    "distributions of the 6 largest sources — the data-mixing "
    "diagnostic (which corpora are near-duplicates of each other in "
    "DISTRIBUTION, which are genuinely diverse; JSD is symmetric, "
    "bounded by ln 2, and defined even where supports differ — exactly "
    "why it beats KL here). Exactness: with M=(P+Q)/2 over the union "
    "vocab, every term reduces to Σ k·ln k over INTEGERS (mixture "
    "numerators c1·n2+c2·n1 share the denominator 2·n1·n2, and "
    "Σnum = 2n1n2 collapses the cross-terms), so each entropy leg is "
    "the q_user_entropy integerization — round(ln(k)·1e6)·k summed as "
    "DECIMAL(38,0) (no bigint overflow at 100 TB token counts) — and "
    "one fixed-shape IEEE expression at the end, rounded 12. Plan: one "
    "(source, tok) count shuffle; the 6-source slice joins the tiny "
    "pair table broadcast; the union-vocab FULL join is co-keyed on "
    "(s1, s2, tok); partial-agg to 15 rows.",
    tags=("curation", "text", "stats"),
)
def q_source_jsd(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents").select("source", "text"))
    toks = d.select("source", F.explode(F.split(F.trim("text"), r"\s+")).alias("tok"))
    cnt = toks.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    totals = cnt.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    top = totals.orderBy(F.desc("n"), "source").limit(6)
    sl = cnt.join(F.broadcast(top.select("source")), "source")
    pairs = (
        top.select(F.col("source").alias("s1"), F.col("n").alias("n1"))
        .crossJoin(top.select(F.col("source").alias("s2"), F.col("n").alias("n2")))
        .filter(F.col("s1") < F.col("s2"))
    )
    lmic = lambda x: F.round(F.log(x.cast("double")) * 1000000).cast("bigint")  # noqa: E731
    left = sl.join(F.broadcast(pairs), sl.source == F.col("s1")).select(
        "s1", "s2", "tok", F.col("c").alias("c1")
    )
    right = sl.join(F.broadcast(pairs), sl.source == F.col("s2")).select(
        F.col("s1").alias("s1r"), F.col("s2").alias("s2r"),
        F.col("tok").alias("tokr"), F.col("c").alias("c2"),
    )
    both = left.join(
        right,
        (left.s1 == right.s1r) & (left.s2 == right.s2r) & (left.tok == right.tokr),
        "full",
    ).select(
        F.coalesce("s1", "s1r").alias("s1"),
        F.coalesce("s2", "s2r").alias("s2"),
        F.coalesce("c1", F.lit(0)).alias("c1"),
        F.coalesce("c2", F.lit(0)).alias("c2"),
    ).join(F.broadcast(pairs), ["s1", "s2"])
    num = F.col("c1") * F.col("n2") + F.col("c2") * F.col("n1")
    sm = both.groupBy("s1", "s2", "n1", "n2").agg(
        F.sum((num * lmic(num)).cast("decimal(38,0)")).alias("s_m"),
        F.sum(
            F.when(F.col("c1") > 0, (F.col("c1") * lmic(F.col("c1"))).cast("decimal(38,0)"))
        ).alias("s_p"),
        F.sum(
            F.when(F.col("c2") > 0, (F.col("c2") * lmic(F.col("c2"))).cast("decimal(38,0)"))
        ).alias("s_q"),
    )
    return sm.select(
        "s1", "s2",
        F.col("n1").alias("n1_tokens"), F.col("n2").alias("n2_tokens"),
        F.round(
            (
                F.log(F.lit(2.0) * F.col("n1") * F.col("n2"))
                - F.col("s_m").cast("double") / (F.lit(2e6) * F.col("n1") * F.col("n2"))
            )
            - (
                (
                    F.log(F.col("n1").cast("double"))
                    - F.col("s_p").cast("double") / (F.lit(1e6) * F.col("n1"))
                )
                + (
                    F.log(F.col("n2").cast("double"))
                    - F.col("s_q").cast("double") / (F.lit(1e6) * F.col("n2"))
                )
            )
            / 2,
            12,
        ).alias("jsd"),
    )


@query(
    "q_dataset_card",
    f"""
    WITH base AS (
        SELECT doc_id, source, lang, n_chars,
               len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
               md5(text) AS h,
               CAST(round(({quality_sql()}) * 1000000) AS BIGINT) AS q_micro
        FROM documents
    ),
    dup AS (SELECT h, COUNT(*) AS nh FROM base GROUP BY 1),
    wd AS (SELECT base.*, CAST(nh > 1 AS INT) AS is_dup FROM base JOIN dup USING (h)),
    lc AS (SELECT source, lang, COUNT(*) AS c FROM wd GROUP BY 1, 2),
    le AS (SELECT source,
                  CAST(SUM(CAST(round(ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT) * c)
                       AS BIGINT) AS sw,
                  CAST(SUM(c) AS BIGINT) AS nn
           FROM lc GROUP BY 1),
    med AS (
        SELECT source, n_chars AS median_n_chars FROM (
            SELECT source, n_chars, doc_id,
                   ROW_NUMBER() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY source) AS ns
            FROM wd
        ) WHERE rn = (ns + 1) // 2
    ),
    agg AS (
        SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
               CAST(SUM(is_dup) AS BIGINT) AS n_dup_docs,
               CAST(SUM(q_micro) AS BIGINT) AS q_sum_micro
        FROM wd GROUP BY 1
    )
    SELECT source, n_docs, n_tokens,
           ROUND(n_dup_docs * 1.0 / n_docs, 12) AS dup_doc_share,
           ROUND(CAST(q_sum_micro AS DOUBLE) / 1e6 / n_docs, 6) AS mean_quality,
           ROUND(ln(CAST(nn AS DOUBLE)) - (CAST(sw AS DOUBLE) / 1e6) / nn, 12) AS lang_entropy,
           median_n_chars
    FROM agg JOIN le USING (source) JOIN med USING (source)
    """,
    doc="Per-source dataset card — the release-manifest table every "
    "corpus ships with: doc and token counts, exact-duplicate share "
    "(corpus-wide md5 membership attributed per source), mean quality, "
    "language-mix entropy, and median document length, in ONE query. "
    "Each column uses the repo's exactness recipe for its type: "
    "duplicate share from a digest-keyed count join; mean quality as an "
    "exact BIGINT sum of per-row micro-units (a double sum would be "
    "fold-order-dependent); entropy via the q_user_entropy ln-micros "
    "integerization; the median as a rank pick (no float percentile). "
    "Plan: one token/hash/quality projection over the scan, a digest "
    "count join, then three aggs sharing the source partitioning "
    "(AQE reuses the exchange); output is |sources| rows.",
    tags=("curation", "report", "stats"),
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    base = d.select(
        "doc_id", "source", "lang", "n_chars",
        F.array_size(F.split(F.trim("text"), r"\s+")).alias("n_tokens"),
        F.md5("text").alias("h"),
        F.round(quality_score("text") * 1000000).cast("bigint").alias("q_micro"),
    )
    dup = base.groupBy("h").agg(F.count(F.lit(1)).alias("nh"))
    wd = base.join(dup, "h").withColumn("is_dup", (F.col("nh") > 1).cast("int"))
    lang_c = wd.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    lang_e = lang_c.groupBy("source").agg(
        F.sum(
            F.round(F.log(F.col("c").cast("double")) * 1000000).cast("bigint") * F.col("c")
        )
        .cast("bigint")
        .alias("sw"),
        F.sum("c").cast("bigint").alias("nn"),
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    med = (
        wd.withColumn("rn", F.row_number().over(w))
        .withColumn("ns", F.count(F.lit(1)).over(Window.partitionBy("source")))
        .filter(F.col("rn") == F.expr("(ns + 1) DIV 2"))
        .select("source", F.col("n_chars").alias("median_n_chars"))
    )
    agg = wd.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("is_dup").cast("bigint").alias("n_dup_docs"),
        F.sum("q_micro").cast("bigint").alias("q_sum_micro"),
    )
    return (
        agg.join(lang_e, "source")
        .join(med, "source")
        .select(
            "source", "n_docs", "n_tokens",
            F.round(F.col("n_dup_docs").cast("double") / F.col("n_docs"), 12).alias(
                "dup_doc_share"
            ),
            F.round(F.col("q_sum_micro").cast("double") / 1e6 / F.col("n_docs"), 6).alias(
                "mean_quality"
            ),
            F.round(
                F.log(F.col("nn").cast("double"))
                - (F.col("sw").cast("double") / 1e6) / F.col("nn"),
                12,
            ).alias("lang_entropy"),
            "median_n_chars",
        )
    )


@query(
    "q_lorenz_curve",
    r"""
    WITH mass AS (
        SELECT doc_id, CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS toks
        FROM documents
    ),
    r AS (
        SELECT doc_id, toks,
               ROW_NUMBER() OVER (ORDER BY toks, doc_id) AS rank,
               CAST(SUM(toks) OVER (ORDER BY toks, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_toks,
               COUNT(*) OVER () AS n,
               CAST(SUM(toks) OVER () AS BIGINT) AS total_toks
        FROM mass
    )
    SELECT doc_id, CAST(rank AS BIGINT) AS rank, toks, cum_toks,
           ROUND(CAST(rank AS DOUBLE) / n, 12) AS pop_share,
           ROUND(CAST(cum_toks AS DOUBLE) / total_toks, 12) AS token_share
    FROM r
    """,
    doc="Document-grain Lorenz curve of token mass: docs sorted ascending "
    "by size, each row gives (population share, cumulative token share) "
    "— the curve whose area gap IS the Gini that q_source_gini reports "
    "at source grain, here at full document resolution (the 'what "
    "fraction of the corpus budget do the smallest p%% of documents "
    "carry' planning view behind length-balanced batch packing and "
    "dedup-impact reports). Exact end to end: integer token counts, "
    "integer cumulative sums, two final IEEE divisions rounded 12. "
    "Plan: BOTH the global rank and the running total come from ONE "
    "operators/rank.py global_cumsum pass (a constant-1 column's "
    "running sum IS the row number, so no second boundary job and no "
    "single-partition window anywhere); the (toks, doc_id) total order "
    "makes the ROWS frame deterministic cross-engine.",
    tags=("curation", "report", "window"),
)
def q_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.functions.text import words
    from c_tran_data_pipeline_spark.operators.rank import global_cumsum

    mass = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text")).select(
        "doc_id",
        F.size(words("text")).cast("bigint").alias("toks"),
        F.lit(1).cast("bigint").alias("ones"),
    )
    c = global_cumsum(mass, ["toks", "doc_id"], ["toks", "ones"])
    return c.select(
        "doc_id",
        F.col("ones_cum").cast("bigint").alias("rank"),
        "toks",
        F.col("toks_cum").cast("bigint").alias("cum_toks"),
        F.round(F.col("ones_cum").cast("double") / F.col("ones_tot"), 12).alias("pop_share"),
        F.round(F.col("toks_cum").cast("double") / F.col("toks_tot"), 12).alias("token_share"),
    )


#: Shared DuckDB CTE: hashed-unigram DSIR scoring to the per-doc grain
#: (mirrors _dsir_scored; both q_dsir_* oracles build on it).
_DSIR_SQL_CTE = r"""    WITH toks AS (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
               CAST('0x' || substr(md5(w), 1, 15) AS BIGINT) % 1024 AS b
        FROM (SELECT doc_id, lang,
                     unnest(string_split_regex(trim(text), '\s+')) AS w
              FROM documents)
    ),
    bucket AS (SELECT b, SUM(is_t) AS ct, COUNT(*) AS cr FROM toks GROUP BY 1),
    tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM bucket),
    lw AS (
        SELECT b, ln((ct + 1.0) / (nt + 1024.0))
                - ln((cr + 1.0) / (nr + 1024.0)) AS lw
        FROM bucket, tot
    ),
    per_doc AS (
        SELECT doc_id, SUM(lw) AS s, COUNT(*) AS n_words
        FROM toks JOIN lw USING (b) GROUP BY 1
    )"""


def _dsir_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_words, dsir_weight): the shared DSIR scoring pipeline
    behind q_dsir_weights (decile report) and q_dsir_resample
    (Gumbel-top-k selection) — see q_dsir_weights' doc for semantics
    and the double-vs-integerized-log rationale."""
    from c_tran_data_pipeline_spark.functions.text import words

    B = 1024
    docs = spread(load_table(spark, sf_dir, "documents"))
    toks = docs.select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("is_t"),
        F.explode(words("text")).alias("w"),
    ).select(
        "doc_id",
        "is_t",
        (
            F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("bigint") % B
        ).alias("b"),
    )
    bucket = toks.groupBy("b").agg(F.sum("is_t").alias("ct"), F.count(F.lit(1)).alias("cr"))
    tot = bucket.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    lw = bucket.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct") + 1.0) / (F.col("nt") + float(B)))
            - F.log((F.col("cr") + 1.0) / (F.col("nr") + float(B)))
        ).alias("lw"),
    )
    per_doc = (
        toks.join(F.broadcast(lw), "b")
        .groupBy("doc_id")
        .agg(F.sum("lw").alias("s"), F.count(F.lit(1)).alias("n_words"))
    )
    return per_doc.select(
        "doc_id",
        "n_words",
        F.round(F.col("s") / F.col("n_words"), 6).alias("dsir_weight"),
    )



@query(
    "q_dsir_weights",
    _DSIR_SQL_CTE
    + """
    SELECT doc_id, n_words,
           ROUND(s / n_words, 6) AS dsir_weight,
           NTILE(10) OVER (ORDER BY ROUND(s / n_words, 6) DESC, doc_id) AS decile
    FROM per_doc
    """,
    doc="DSIR importance weights (Xie et al. 2023, arXiv:2302.03169): "
    "score every raw document by how much its hashed-unigram profile "
    "looks like the TARGET distribution (here: the English slice — the "
    "stand-in for 'high-quality domain') vs the full raw crawl, the "
    "importance-resampling selector behind data-mixture curation. "
    "Features are md5-hashed word buckets (B=1024, the cross-engine "
    "md5-bucket identity); per-bucket add-1-smoothed log-ratios "
    "lw[b] = ln p_target(b) − ln p_raw(b) stay DOUBLE deliberately — "
    "the integerized-micro-unit recipe is WRONG here: with 2·B ln "
    "evaluations, engine-libm ULP differences straddle a round(ln·1e6) "
    "boundary with ~1e-3 probability (observed at sf0.1), while raw "
    "doubles keep the cross-engine divergence at ~1e-14 per bucket and "
    "~1e-12 on the per-doc MEAN — six orders inside the final "
    "ROUND(·,6). Output adds the exact NTILE(10) decile over "
    "(weight DESC, doc_id) — the resampling cut a curation pipeline "
    "thresholds on. Spark plan: one tokenize+hash explode, a 1024-row "
    "(value-domain-bounded) bucket aggregate joined back as a "
    "BROADCAST, totals as a 1-row broadcast scalar, and the decile via "
    "operators/rank.py global_ntile — no single-partition window, no "
    "full-vocab state, driver state ≤ B rows at any corpus size.",
    tags=("curation", "text", "training", "window"),
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.operators.rank import global_ntile

    scored = _dsir_scored(spark, sf_dir)
    return global_ntile(
        scored, 10, [F.col("dsir_weight").desc(), F.col("doc_id").asc()], bucket_col="decile"
    )


@query(
    "q_dsir_resample",
    _DSIR_SQL_CTE
    + """
    SELECT doc_id,
           ROUND(s / n_words, 6) AS dsir_weight,
           ROUND(ROUND(s / n_words, 6)
                 - ln(-ln((CAST('0x' || substr(md5('gmb:' || CAST(doc_id AS VARCHAR)), 1, 12)
                                AS BIGINT) + 0.5) / 281474976710656.0)), 6) AS sample_key
    FROM per_doc
    ORDER BY sample_key DESC, doc_id
    LIMIT 100
    """,
    doc="The SELECTION half of DSIR (Xie et al. 2023 §2: sample ∝ "
    "exp(importance weight) without replacement): Gumbel-top-k — "
    "key_i = w_i + Gumbel_i, take the k largest — draws exactly that "
    "distribution, and the Gumbel noise here is DETERMINISTIC: "
    "u_i = (md5-bucket('gmb:'||doc_id) + 0.5) / 2^48 (48 hash bits + "
    "the half-offset fit a double exactly; the salt decouples the draw "
    "from every other md5 use of doc_id), g_i = −ln(−ln(u_i)) — so the "
    "sample is reproducible across engines, runs, and partitionings "
    "with no RNG state, the same salted-hash discipline as "
    "q_train_split. Keys are ROUND(·,6) with a doc_id tie-break, so "
    "the top-k cutoff cannot straddle an engine-libm ULP. Spark plan: "
    "the shared _dsir_scored pipeline + ONE TakeOrdered(k) — no "
    "window, no global sort (top-k heaps merge per partition), "
    "k·row driver state. Budget k=100 docs.",
    tags=("curation", "text", "training", "sample"),
)
def q_dsir_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    scored = _dsir_scored(spark, sf_dir)
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("gmb:"), F.col("doc_id").cast("string"))), 1, 12),
        16,
        10,
    ).cast("bigint")
    u = (h + F.lit(0.5)) / F.lit(float(1 << 48))
    key = F.round(F.col("dsir_weight") - F.log(-F.log(u)), 6)
    return (
        scored.select("doc_id", "dsir_weight", key.alias("sample_key"))
        .orderBy(F.col("sample_key").desc(), F.col("doc_id").asc())
        .limit(100)
    )


@query(
    "q_length_bucket_padding",
    r"""
    WITH toks AS (
        SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_words
        FROM documents
    ),
    b AS (
        SELECT doc_id, n_words,
               NTILE(8) OVER (ORDER BY n_words, doc_id) AS bucket
        FROM toks
    )
    SELECT bucket, COUNT(*) AS n_docs,
           MAX(n_words) AS max_len,
           CAST(SUM(n_words) AS BIGINT) AS total_tokens,
           ROUND(1.0 - SUM(n_words) / (1.0 * COUNT(*) * MAX(n_words)), 6)
               AS pad_waste
    FROM b GROUP BY 1
    """,
    doc="Length-bucketed batching planner: split the corpus into 8 exact "
    "length octiles (NTILE over (n_words, doc_id) — deterministic "
    "cross-engine bucket boundaries) and report, per bucket, the "
    "padding waste of batching its documents together (1 − real tokens "
    "/ padded-to-bucket-max tokens) — the number that decides whether "
    "length bucketing is worth the shuffle before a training run "
    "(uniform batching pads everything to the GLOBAL max; the octile "
    "rows expose how much of that waste bucketing recovers; pairs with "
    "q_pack_sequences, which eliminates padding entirely by packing). "
    "Exact oracle: tokens are integer counts, the waste ratio is one "
    "IEEE expression rounded 6. Spark plan: one tokenize projection, "
    "the octile via operators/rank.py global_ntile (range buckets + "
    "prefix offsets — no single-partition window), one 8-group "
    "aggregate.",
    tags=("curation", "training", "window", "report"),
)
def q_length_bucket_padding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.functions.text import words
    from c_tran_data_pipeline_spark.operators.rank import global_ntile

    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.array_size(words("text")).alias("n_words"))
    b = global_ntile(toks, 8, ["n_words", "doc_id"], bucket_col="bucket")
    per = b.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("n_words").alias("max_len"),
        F.sum("n_words").cast("bigint").alias("total_tokens"),
    )
    return per.select(
        "bucket",
        "n_docs",
        "max_len",
        "total_tokens",
        F.round(
            1.0 - F.col("total_tokens") / (1.0 * F.col("n_docs") * F.col("max_len")), 6
        ).alias("pad_waste"),
    )


@query(
    "q_source_overlap",
    r"""
    WITH w AS (SELECT source, string_split_regex(trim(text), '\s+') AS words
               FROM documents),
    fp AS (
        SELECT DISTINCT source,
               CAST('0x' || substr(md5(g), 1, 15) AS BIGINT) AS h
        FROM (
            SELECT source, unnest(list_distinct(
                list_transform(generate_series(1, len(words)-4),
                               i -> array_to_string(words[i:i+4], ' ')))) AS g
            FROM w
        )
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM fp GROUP BY 1),
    pairs AS (
        SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_shared
        FROM fp a JOIN fp b ON a.h = b.h AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT source_a, source_b, n_shared,
           ROUND(n_shared * 1.0 / least(sa.n, sb.n), 6) AS containment,
           ROUND(n_shared * 1.0 / (sa.n + sb.n - n_shared), 6) AS jaccard
    FROM pairs
    JOIN sizes sa ON sa.source = source_a
    JOIN sizes sb ON sb.source = source_b
    """,
    doc="Cross-source n-gram overlap matrix — the mixture-dedup audit a "
    "multi-source corpus runs BEFORE committing to sampling weights "
    "(how much of source A is already inside source B decides whether "
    "its quota double-counts content; CCNet/Dolma-style pipelines "
    "publish exactly this matrix): per source pair, the number of "
    "shared distinct word-5-gram fingerprints plus containment "
    "(shared / smaller side — catches a source EMBEDDED in a bigger "
    "one) and Jaccard. Plan: one tokenize+explode pass to the DISTINCT "
    "(source, 60-bit md5 gram fingerprint) table — digest-width "
    "shuffle rows, never text — then a fingerprint equi-join whose "
    "output is bounded by sources² per shared gram (20 sources → "
    "≤190 pairs/gram), one pair-grain aggregate, and a broadcast-sized "
    "join against the per-source totals. Exact oracle: the md5-prefix "
    "fingerprint is the engine-portable hash every dedup oracle here "
    "uses.",
    tags=("curation", "dedup", "report"),
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.functions.text import md5_long, shingles

    docs = spread(load_table(spark, sf_dir, "documents").select("source", "text"))
    fp = (
        docs.select("source", F.explode(shingles("text", 5)).alias("g"))
        .select("source", md5_long(F.col("g")).alias("h"))
        .distinct()
    )
    sizes = fp.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = fp.alias("a"), fp.alias("b")
    pairs = (
        a.join(b, on="h")
        .filter(F.col("a.source") < F.col("b.source"))
        .groupBy(F.col("a.source").alias("source_a"), F.col("b.source").alias("source_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("nb"))
    return (
        pairs.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_shared",
            F.round(F.col("n_shared") / F.least("na", "nb"), 6).alias("containment"),
            F.round(F.col("n_shared") / (F.col("na") + F.col("nb") - F.col("n_shared")), 6).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------------------
# Learned quality classifier: shared feature recipe, fingerprint-keyed
# model cache (the _bpe_cache_path pattern — q_quality_classifier and
# q_classifier_filter previously trained the IDENTICAL model twice,
# ~4 s of the 9.4 s pair at sf0.1), and a fully self-contained DuckDB
# oracle that REPLAYS the training as a recursive CTE — converting both
# queries from rows-only to exact value-hash parity.
# ---------------------------------------------------------------------------

#: feature order is load-bearing: it fixes the z-accumulation order on
#: both engines (left-assoc float adds must match bit-for-bit).
_CLF_FEATURES = ["log_tokens", "stop_ratio", "mean_wlen", "vowel_ratio"]
_CLF_PARAMS = {"iters": 12, "lr": 1.0, "features": _CLF_FEATURES, "v": 2}


def clf_features(docs: DataFrame, with_id: bool = False) -> DataFrame:
    """The classifier's feature projection — ONE definition shared by
    both registered queries and the test suite. Every feature is either
    exact integer arithmetic + one division (vowel_ratio) or rounded to
    6 dp (the text-quality convention), so the feature doubles are
    bit-identical across engines; log_tokens is round(log1p(n), 6)
    because JVM log/log1p and DuckDB ln disagree by 1 ulp on ~1% of
    inputs (measured) and the 6-dp round absorbs that."""
    from c_tran_data_pipeline_spark.functions.text import (
        dup_token_fraction,
        mean_word_len,
        stopword_ratio,
        token_count,
    )

    vowels = F.length(F.regexp_replace(F.lower("text"), "[^aeiou]", ""))
    cols = [
        F.round(F.log1p(token_count("text").cast("double")), 6).alias("log_tokens"),
        stopword_ratio("text").alias("stop_ratio"),
        mean_word_len("text").alias("mean_wlen"),
        (vowels.cast("double") / F.greatest(F.length("text"), F.lit(1))).alias("vowel_ratio"),
        (dup_token_fraction("text") > 0.5).cast("int").alias("label"),
    ]
    return docs.select("doc_id", *cols) if with_id else docs.select(*cols)


def _clf_cache_path(sf_dir: str) -> str:
    import hashlib
    import json as _json
    import os

    from c_tran_data_pipeline_spark.session import index_cache_dir

    tag = hashlib.md5(
        _json.dumps({"sf_dir": os.path.abspath(sf_dir), "params": _CLF_PARAMS},
                    sort_keys=True).encode()
    ).hexdigest()[:10]
    base = os.path.basename(sf_dir.rstrip("/")) or "sf"
    return os.path.join(index_cache_dir(), f"clf_{base}_{tag}.json")


def _clf_fingerprint(sf_dir: str) -> dict:
    import os

    p = os.path.abspath(os.path.join(sf_dir, "documents.parquet"))
    try:
        st = os.stat(p)
        return {"path": p, "mtime": st.st_mtime, "size": st.st_size}
    except OSError:
        return {"path": p}


def _clf_model_for(spark: SparkSession, sf_dir: str) -> dict:
    """Cached (trajectory, standardization stats) if fresh, else
    train+commit (atomic tmp+rename; fixture fingerprint in the payload
    so a regenerated fixture forces retrain). Floats survive the JSON
    round-trip bit-exactly (repr shortest-round-trip), so the cached
    model is indistinguishable from a fresh training run."""
    import json as _json
    import os

    from c_tran_data_pipeline_spark.operators.classifier import logreg_train, standardize

    path = _clf_cache_path(sf_dir)
    try:
        with open(path) as f:
            rec = _json.load(f)
        if rec.get("fixture") == _clf_fingerprint(sf_dir):
            return rec
    except (OSError, ValueError):
        pass

    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    feats = clf_features(docs)
    std, stats = standardize(feats, _CLF_FEATURES)
    std = std.persist()
    try:
        traj = logreg_train(
            std, _CLF_FEATURES, "label",
            iters=_CLF_PARAMS["iters"], lr=_CLF_PARAMS["lr"],
        )
    finally:
        std.unpersist()
    rec = {
        "trajectory": traj,
        "stats": {c: list(stats[c]) for c in _CLF_FEATURES},
        "fixture": _clf_fingerprint(sf_dir),
    }
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.build-{os.getpid()}"
    with open(tmp, "w") as f:
        _json.dump(rec, f)
    os.replace(tmp, path)
    return rec


# --- DuckDB oracle: the WHOLE pipeline (features → decimal-grain
# standardization → 12 GD iterations as a recursive CTE → scoring) in
# SQL. No trained constants are embedded — DuckDB replays the training,
# so the oracle is self-contained at ANY scale factor. Exactness rests
# on the same contract as the Spark side: per-row contributions rounded
# to the 12-dp grain and summed as DECIMAL(27,12) absorb the measured
# ~10% 1-ulp exp() disagreements between JVM and DuckDB libm, and all
# OUTPUT floats round to 9 dp so residual 1e-15 drift cannot surface.
_CLF_TK = r"string_split_regex(trim(text), '\s+')"
_CLF_RAW_SQL = rf"""
    raw AS (
        SELECT doc_id,
           ROUND(ln(1.0 + len({_CLF_TK})), 6) AS log_tokens,
           ROUND(len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is|that|for|with)\b')) * 1.0
                 / greatest(len({_CLF_TK}), 1), 6) AS stop_ratio,
           ROUND(length(regexp_replace(text, '\s+', '', 'g')) * 1.0
                 / greatest(len({_CLF_TK}), 1), 6) AS mean_wlen,
           length(regexp_replace(lower(text), '[^aeiou]', '', 'g')) * 1.0
                 / greatest(length(text), 1) AS vowel_ratio,
           CASE WHEN ROUND((len({_CLF_TK}) - len(list_distinct({_CLF_TK}))) * 1.0
                 / greatest(len({_CLF_TK}), 1), 6) > 0.5 THEN 1 ELSE 0 END AS label
        FROM documents
    )"""


def _clf_oracle_ctes() -> str:
    """Shared CTE chain: raw → stats → prm (mu/sd) → feats → gd."""
    d = len(_CLF_FEATURES)
    s1 = ",\n           ".join(
        f"CAST(SUM(CAST(round({c}, 12) AS DECIMAL(27,12))) AS DOUBLE) AS s1_{j}"
        for j, c in enumerate(_CLF_FEATURES, 1)
    )
    s2 = ",\n           ".join(
        f"CAST(SUM(CAST(round({c} * {c}, 12) AS DECIMAL(27,12))) AS DOUBLE) AS s2_{j}"
        for j, c in enumerate(_CLF_FEATURES, 1)
    )
    prm = ",\n           ".join(
        f"s1_{j}/n AS mu{j},\n           "
        f"CASE WHEN sqrt(greatest(s2_{j}/n - (s1_{j}/n)*(s1_{j}/n), 0.0)) = 0.0 THEN 1.0"
        f" ELSE sqrt(greatest(s2_{j}/n - (s1_{j}/n)*(s1_{j}/n), 0.0)) END AS sd{j}"
        for j in range(1, d + 1)
    )
    fx = ",\n           ".join(
        f"({c} - mu{j}) / sd{j} AS x{j}" for j, c in enumerate(_CLF_FEATURES, 1)
    )
    # z accumulates left-assoc in feature order — same as the Spark loop.
    z = "g.b" + "".join(f" + g.w{j} * f.x{j}" for j in range(1, d + 1))
    p = f"1.0/(1.0 + exp(-({z})))"
    pc = f"least(greatest({p}, 1e-12), 1.0 - 1e-12)"
    n = "(SELECT n FROM stats)"
    upd = ",\n               ".join(
        f"g.w{j} - CAST(SUM(CAST(round(({p} - f.y) * f.x{j}, 12) AS DECIMAL(27,12))) AS DOUBLE) / {n} AS w{j}"
        for j in range(1, d + 1)
    )
    zero_ws = ", ".join(f"CAST(0.0 AS DOUBLE) AS w{j}" for j in range(1, d + 1))
    group_ws = ", ".join(f"g.w{j}" for j in range(1, d + 1))
    return rf"""
    WITH RECURSIVE
    {_CLF_RAW_SQL.strip()},
    stats AS (
        SELECT COUNT(*) AS n,
           {s1},
           {s2}
        FROM raw
    ),
    prm AS (
        SELECT n,
           {prm}
        FROM stats
    ),
    feats AS (
        SELECT doc_id,
           {fx},
           CAST(label AS DOUBLE) AS y
        FROM raw, prm
    ),
    gd AS (
        SELECT 0 AS it, {zero_ws}, CAST(0.0 AS DOUBLE) AS b, CAST(NULL AS DOUBLE) AS loss
        UNION ALL
        SELECT g.it + 1,
               {upd},
               g.b - CAST(SUM(CAST(round({p} - f.y, 12) AS DECIMAL(27,12))) AS DOUBLE) / {n} AS b,
               CAST(SUM(CAST(round(-(f.y * ln({pc}) + (1.0 - f.y) * ln(1.0 - {pc})), 12) AS DECIMAL(27,12))) AS DOUBLE) / {n} AS loss
        FROM gd g, feats f
        WHERE g.it < {_CLF_PARAMS["iters"]}
        GROUP BY g.it, {group_ws}, g.b
    )"""


def _clf_traj_oracle() -> str:
    cases = " ".join(
        f"WHEN '{c}' THEN w{j}" for j, c in enumerate(_CLF_FEATURES, 1)
    )
    return rf"""{_clf_oracle_ctes()}
    SELECT CAST(it AS INT) AS iteration, fn.feature,
           ROUND(CASE fn.feature WHEN '__bias__' THEN b {cases} END, 9) AS weight,
           ROUND(loss, 9) AS loss
    FROM gd, (VALUES ('__bias__'), {", ".join(f"('{c}')" for c in sorted(_CLF_FEATURES))}) fn(feature)
    WHERE it >= 1
    """


def _clf_filter_oracle() -> str:
    d = len(_CLF_FEATURES)
    z = "fin.b" + "".join(f" + fin.w{j} * f.x{j}" for j in range(1, d + 1))
    p = f"1.0/(1.0 + exp(-({z})))"
    return rf"""{_clf_oracle_ctes()},
    fin AS (SELECT * FROM gd WHERE it = {_CLF_PARAMS["iters"]})
    SELECT f.doc_id,
           ROUND({p}, 9) AS junk_prob,
           ({p} < 0.5) AS keep
    FROM feats f, fin
    """


@query(
    "q_quality_classifier",
    _clf_traj_oracle(),
    doc="GPT-3/LLaMA-style learned quality filter (Brown et al. 2020 "
    "App. A; Touvron et al. 2023 §2), trained to DISTILL an expensive "
    "quality rule into cheap features: weak labels come from the "
    "Gopher-class repetition rule (Rae et al. 2021 §A1.1 uses absolute "
    "duplicate-fraction thresholds; here y=1 when the doc's "
    "duplicated-token fraction exceeds 0.5 — the 'junk' class), and "
    "the model is logistic regression over four features the label "
    "definition never sees (log1p token count, stopword ratio, mean "
    "word length, vowel ratio — the last is deliberately uninformative "
    "to show a near-zero learned weight). Output is "
    "the full training trajectory — one row per (iteration, feature) "
    "with the post-update weight and the iteration-entry mean log-loss "
    "(both rounded to 9 dp at output) — deterministic BIT-FOR-BIT "
    "across partitionings because every gradient/loss contribution "
    "rounds to a 12-dp grain and sums as exact DECIMAL "
    "(operators/classifier.py). EXACT oracle since r7: DuckDB replays "
    "the full training as a recursive CTE over the identical feature/"
    "standardization/gradient recipe — no trained constants embedded, "
    "so the oracle is self-contained at any SF; the 12-dp grain "
    "absorbs the measured ~10% 1-ulp JVM-vs-DuckDB exp() disagreement "
    "and the 9-dp output round hides residual 1e-15 drift. Plan: ONE "
    "cached 5-column projection; each iteration is a width-6 "
    "partial-first aggregate (map-side combine, single-row exchange); "
    "driver state = 5 doubles, cached per fixture fingerprint (the "
    "_bpe_cache_path pattern) so q_classifier_filter reuses the model "
    "instead of retraining. At 100 TB the same gradient contract "
    "feeds mini-batch GD or L-BFGS; nothing at data grain ever leaves "
    "the executors.",
    tags=("curation", "quality", "ml"),
)
def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    model = _clf_model_for(spark, sf_dir)
    rows = [
        (t["iteration"], feat, round(float(wt), 9), round(float(t["loss"]), 9))
        for t in model["trajectory"]
        for feat, wt in sorted(t["weights"].items())
    ]
    return spark.createDataFrame(
        rows, "iteration INT, feature STRING, weight DOUBLE, loss DOUBLE"
    )


@query(
    "q_classifier_filter",
    _clf_filter_oracle(),
    doc="The learned quality filter APPLIED (the second half of the "
    "GPT-3 recipe, Brown et al. 2020 App. A: train the classifier, "
    "then keep documents by score): scores EVERY document in one "
    "distributed pass with the frozen weights of the same "
    "deterministic logistic regression as q_quality_classifier (label "
    "= Gopher-style repetition rule) and emits doc_id, junk_prob "
    "(round 9), and the keep flag at the 0.5 posterior. The model "
    "comes from the fixture-fingerprint-keyed cache (_clf_model_for), "
    "so the q_quality_classifier/q_classifier_filter pair trains ONCE "
    "— this query is pure scoring when the cache is warm: the weights "
    "AND standardization constants enter as literals, making the whole "
    "stage one whole-stage-codegen projection over the parquet scan — "
    "no training aggregates, no join, no shuffle. EXACT oracle since "
    "r7: the same recursive-CTE training replay as "
    "q_quality_classifier, extended with the scoring projection. At "
    "100 TB the scoring pass is embarrassingly parallel and the filter "
    "predicate pushes into downstream reads.",
    tags=("curation", "quality", "ml"),
)
def q_classifier_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    model = _clf_model_for(spark, sf_dir)
    w = model["trajectory"][-1]["weights"]
    docs = spread(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    feats = clf_features(docs, with_id=True)
    # Standardize via the cached constants — bit-identical to running
    # operators/classifier.standardize (same floats, same expression).
    z = F.lit(w["__bias__"])
    for c in _CLF_FEATURES:
        mu, sd = model["stats"][c]
        z = z + F.lit(w[c]) * ((F.col(c) - F.lit(mu)) / F.lit(sd))
    junk = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.select(
        "doc_id",
        F.round(junk, 9).alias("junk_prob"),
        (junk < 0.5).alias("keep"),
    )


@query(
    "q_dp_counts",
    r"""
    WITH per AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(LEAST(len(string_split_regex(trim(text), '\s+')), 512))
                  AS BIGINT) AS clipped_tokens
      FROM documents GROUP BY 1
    ), seeded AS (
      SELECT source, n_docs, clipped_tokens,
        CAST(CAST('0x' || substr(md5('dp:count:' || source), 1, 13) AS BIGINT)
             AS DOUBLE) / 4503599627370496.0 - 0.5 AS u1,
        CAST(CAST('0x' || substr(md5('dp:tokens:' || source), 1, 13) AS BIGINT)
             AS DOUBLE) / 4503599627370496.0 - 0.5 AS u2
      FROM per
    )
    SELECT source,
           CAST(1.0 AS DOUBLE) AS epsilon,
           ROUND(n_docs - (1.0 / 1.0) * sign(u1)
                 * ln(greatest(1.0 - 2.0 * abs(u1), 1e-15)), 6) AS noisy_n_docs,
           ROUND(clipped_tokens - (512.0 / 1.0) * sign(u2)
                 * ln(greatest(1.0 - 2.0 * abs(u2), 1e-15)), 6) AS noisy_tokens
    FROM seeded
    """,
    doc="Differentially-private dataset-card statistics (Dwork et al. "
    "2006 Laplace mechanism): per-source document counts and "
    "CLIPPED token totals (per-doc contribution capped at 512 — the "
    "standard DP-SQL bounded-contribution clamp that makes the token "
    "sum's sensitivity 512 instead of unbounded) published with "
    "Laplace(sensitivity/epsilon) noise at epsilon=1. The noise is "
    "DETERMINISTIC — inverse-CDF transform of a uniform derived from "
    "md5(salt||source) (13 hex digits = 52 bits, exact in a double), "
    "the same keyed-hash-randomness idiom as q_train_split — so the "
    "release is reproducible, cross-engine exact-oracle-able, and "
    "stable under recomputation (a re-released card doesn't leak a "
    "second noise draw: the privacy budget is spent ONCE per salt). "
    "Plan: one partial-first agg at source grain; the noise transform "
    "is a per-row projection over |sources| rows. At 100 TB nothing "
    "but the bounded source-grain table leaves the aggregate.",
    tags=("curation", "privacy"),
)
def q_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from c_tran_data_pipeline_spark.functions.text import token_count

    docs = spread(load_table(spark, sf_dir, "documents").select("source", "text"))
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.least(token_count("text"), F.lit(512)).cast("bigint"))
        .cast("bigint")
        .alias("clipped_tokens"),
    )

    def _uniform(salt: str) -> F.Column:
        h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), F.col("source"))), 1, 13), 16, 10)
        return h.cast("double") / F.lit(4503599627370496.0) - F.lit(0.5)

    def _laplace(u: F.Column, sensitivity: float, eps: float) -> F.Column:
        return (
            -F.lit(sensitivity / eps)
            * F.signum(u)
            * F.log(F.greatest(F.lit(1.0) - F.lit(2.0) * F.abs(u), F.lit(1e-15)))
        )

    u1, u2 = _uniform("dp:count:"), _uniform("dp:tokens:")
    return per.select(
        "source",
        F.lit(1.0).alias("epsilon"),
        F.round(F.col("n_docs") + _laplace(u1, 1.0, 1.0), 6).alias("noisy_n_docs"),
        F.round(F.col("clipped_tokens") + _laplace(u2, 512.0, 1.0), 6).alias("noisy_tokens"),
    )


@query(
    "q_kanon_audit",
    """
    SELECT c_nationkey, c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS group_size,
           CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) AS BIGINT)
               AS ndv_sensitive,
           CAST(CASE WHEN COUNT(*) >= 5 THEN 1 ELSE 0 END AS INT) AS k_anonymous,
           CAST(CASE WHEN COUNT(DISTINCT CAST(floor(c_acctbal / 1000.0) AS BIGINT)) >= 3
                THEN 1 ELSE 0 END AS INT) AS l_diverse
    FROM customer
    GROUP BY 1, 2
    """,
    doc="k-anonymity / l-diversity release audit (Sweeney 2002; "
    "Machanavajjhala et al. 2007): group the table by its "
    "quasi-identifier tuple (nationkey, mktsegment — the columns an "
    "adversary can link from outside data) and flag every equivalence "
    "class smaller than k=5, plus classes whose SENSITIVE attribute "
    "(account-balance band, floor(acctbal/1000)) shows fewer than l=3 "
    "distinct values — the homogeneity attack k-anonymity alone "
    "misses. The audit a privacy review runs BEFORE releasing any "
    "per-group statistics; the flagged rows are exactly the groups "
    "that need generalization (coarser QI) or suppression. Plan: ONE "
    "partial-first aggregate at QI grain (count + distinct-band "
    "count); output is bounded by |QI combinations|, never row-grain. "
    "Flags emitted as INT (0/1) for cross-engine hash stability.",
    tags=("curation", "privacy"),
)
def q_kanon_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / F.lit(1000.0)).cast("bigint")
    return (
        cust.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("group_size"),
            F.countDistinct(band).cast("bigint").alias("ndv_sensitive"),
        )
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            "ndv_sensitive",
            (F.col("group_size") >= 5).cast("int").alias("k_anonymous"),
            (F.col("ndv_sensitive") >= 3).cast("int").alias("l_diverse"),
        )
    )


@query(
    "q_hll_vocab_union",
    None,  # sketch estimates are engine-specific — rows-only; error
    # bounds + merge algebra pinned in tests/test_classifier.py, full
    # output golden-pinned
    doc="MERGEABLE distinct-count sketches (Apache DataSketches HLL via "
    "F.hll_sketch_agg / hll_union_agg): per-source vocabulary sketches "
    "built ONCE, then combined into the global vocabulary estimate by "
    "sketch UNION — never rescanning the corpus. This is the 100 TB "
    "rollup pattern q_approx_distinct (one-shot approx_count_distinct) "
    "can't express: persisted per-partition sketches make any "
    "combination of sources — daily→monthly rollups, ad-hoc source "
    "subsets — a cheap merge over |sources| binary blobs instead of a "
    "corpus-grain re-aggregation. Output: per-source estimated vocab "
    "plus a '__union__' row estimating the DISTINCT union (< the sum "
    "when sources share words). Plan: one word-grain partial-first "
    "sketch agg; the union is an agg over |sources| rows. pytest pins "
    "every estimate within the published HLL error envelope of the "
    "exact count and the union algebra (max ≤ union ≤ sum).",
    tags=("curation", "sketch"),
)
def q_hll_vocab_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spread(load_table(spark, sf_dir, "documents").select("source", "text"))
    words = docs.select(
        "source", F.explode(F.split(F.trim("text"), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    sk = words.groupBy("source").agg(F.hll_sketch_agg("word", F.lit(12)).alias("sk"))
    per = sk.select("source", F.hll_sketch_estimate("sk").cast("bigint").alias("est_vocab"))
    uni = sk.agg(F.hll_union_agg("sk").alias("u")).select(
        F.lit("__union__").alias("source"),
        F.hll_sketch_estimate("u").cast("bigint").alias("est_vocab"),
    )
    return per.unionByName(uni)
