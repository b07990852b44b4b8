"""Oracle-checked text-analysis queries over ``documents``
(primitives in functions/text.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.functions.text import (
    LANG_PROFILES,
    bpe_ish_token_count,
    lang_id,
    mean_word_len,
    punct_ratio,
    quality_score,
    rolling_hash,
    stopword_ratio,
    token_count,
)
from c_tran_data_pipeline_spark.plans.registry import query
from c_tran_data_pipeline_spark.sources.readers import load_table


@query(
    "q_text_tokens",
    r"""
    SELECT doc_id,
           len(string_split_regex(trim(text), '\s+')) AS n_tokens,
           len(regexp_extract_all(text, '\w+|[^\w\s]')) AS n_bpe_ish,
           length(text) AS n_chars
    FROM documents
    """,
    doc="Token counting: whitespace tokens + BPE-ish word/punct chunks. "
    "Per-row, shuffle-free, codegen'd regexp.",
    tags=("text",),
)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count("text").alias("n_tokens"),
        bpe_ish_token_count("text").alias("n_bpe_ish"),
        F.length("text").alias("n_chars"),
    )


def _score_sql(lang: str) -> str:
    pattern = r"\b(" + "|".join(LANG_PROFILES[lang]) + r")\b"
    return f"len(regexp_extract_all(lower(text), '{pattern}'))"


# CASE tests langs in sorted order against greatest(...) — the first lang
# at the max score wins, matching lang_id's (score desc, lang asc) fold.
_LANGS = sorted(LANG_PROFILES)


def langid_case_sql() -> str:
    """Self-contained DuckDB expression for lang_id(text) — shared with
    the curation oracles (plans/curation_queries.py)."""
    g = ", ".join(_score_sql(lang) for lang in _LANGS)
    return (
        f"CASE WHEN greatest({g}) = 0 THEN 'und' "
        + " ".join(f"WHEN {_score_sql(lang)} = greatest({g}) THEN '{lang}'" for lang in _LANGS)
        + " END"
    )


_PUNCT_SQL = "ROUND(len(regexp_extract_all(text, '[.,!?;:]')) * 1.0 / greatest(length(text), 1), 6)"
_STOP_SQL = (
    r"ROUND(len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is|that|for|with)\b')) * 1.0"
    r" / greatest(len(string_split_regex(trim(text), '\s+')), 1), 6)"
)
_MWL_SQL = (
    r"ROUND(length(regexp_replace(text, '\s+', '', 'g')) * 1.0"
    r" / greatest(len(string_split_regex(trim(text), '\s+')), 1), 6)"
)


def quality_sql() -> str:
    """DuckDB twin of functions.text.quality_score — shared with the
    curation oracles."""
    return (
        f"ROUND(least(1.0, {_STOP_SQL} * 2) - {_PUNCT_SQL}"
        f" + CASE WHEN {_MWL_SQL} BETWEEN 3 AND 10 THEN 0.5 ELSE 0.0 END, 6)"
    )


@query(
    "q_text_langid",
    f"""
    WITH scored AS (
        SELECT doc_id, lang AS true_lang,
               {", ".join(f"{_score_sql(lang)} AS s_{lang}" for lang in _LANGS)}
        FROM documents
    )
    SELECT doc_id, true_lang,
           CASE WHEN greatest({", ".join("s_" + lang for lang in _LANGS)}) = 0 THEN 'und'
                {" ".join(f"WHEN s_{lang} = greatest({', '.join('s_' + l for l in _LANGS)}) THEN '{lang}'" for lang in _LANGS)}
           END AS pred_lang
    FROM scored
    """,
    doc="Language ID via stopword-profile argmax (score desc, lang asc "
    "tie-break); 'und' when no profile hits.",
    tags=("text",),
)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id", F.col("lang").alias("true_lang"), lang_id("text").alias("pred_lang")
    )


@query(
    "q_text_quality",
    f"""
    SELECT doc_id,
           {_PUNCT_SQL} AS punct_ratio,
           {_STOP_SQL} AS stopword_ratio,
           {_MWL_SQL} AS mean_word_len,
           {quality_sql()} AS quality
    FROM documents
    """,
    doc="Quality scoring: punctuation/stopword/word-length signals + "
    "composite score (C4/Gopher-style cheap filters).",
    tags=("text",),
)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        punct_ratio("text").alias("punct_ratio"),
        stopword_ratio("text").alias("stopword_ratio"),
        mean_word_len("text").alias("mean_word_len"),
        quality_score("text").alias("quality"),
    )


@query(
    "q_text_fingerprint",
    """
    SELECT doc_id,
           list_reduce(
               list_prepend(CAST(0 AS BIGINT),
                            list_transform(string_split(text, ''),
                                           c -> CAST(ord(c) AS BIGINT))),
               (acc, x) -> (acc * 31 + x) % 1000000007) AS fingerprint
    FROM documents
    """,
    doc="Polynomial rolling-hash document fingerprint (order-sensitive, "
    "mod 1e9+7) — exact integer math, bit-equal across engines.",
    tags=("text",),
)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", rolling_hash("text").alias("fingerprint"))
