"""Text-analysis primitives for the training-data pipeline (north-star
extensions; BASELINE.json): tokenization, shingling, hashing, language-ID
profiles, quality signals. Everything is a native Column expression —
array/lambda expressions run inside codegen, no Python in the hot path —
and every construct has an exact ANSI-SQL twin so the DuckDB oracle can
verify it bit-for-bit (see plans/text_queries.py).

Scale: all per-document, embarrassingly parallel, no shuffle. The only
shuffling operators built on these are the dedup joins (operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Large prime modulus for rolling hashes: keeps (acc*31 + x) within int64.
HASH_MOD = 1_000_000_007


def words(col: Column | str) -> Column:
    """Whitespace tokenization (the count twin is len(string_split_regex)
    in DuckDB)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def token_count(col: Column | str) -> Column:
    return F.array_size(words(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: word chunks + standalone punctuation, the
    usual cheap proxy for BPE token counts."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(r"\w+|[^\w\s]"))


def shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles. transform(sequence(...)) stays in
    codegen; slice/concat_ws are JVM array ops.

    Docs shorter than ``n`` words yield an EMPTY array — guarded with a
    CASE WHEN because ``sequence(0, negative)`` in Spark *descends*
    (sequence(0,-1) = [0,-1]) and the -1 index would crash F.slice with
    INVALID_PARAMETER_VALUE.START. CASE WHEN branches evaluate lazily per
    row in codegen, so the guard costs nothing on the hot path and matches
    the DuckDB oracle form generate_series(1, len-n+1) → empty."""
    w = words(col)
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.array_size(w) - n),
            lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
        )
    )
    return F.when(F.array_size(w) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def md5_long(col: Column, salt: Column | None = None) -> Column:
    """Deterministic 60-bit hash: first 15 hex chars of md5 as bigint.
    Engine-portable (DuckDB: CAST('0x'||substr(md5(x),1,15) AS BIGINT));
    used for minhash/simhash so oracles reproduce signatures exactly.
    For engine-internal hashing xxhash64 would be faster, but signature
    portability is worth more here and md5 is still JVM-side."""
    x = F.concat_ws(":", salt, col) if salt is not None else col
    return F.conv(F.substring(F.md5(x), 1, 15), 16, 10).cast("bigint")


def rolling_hash(col: Column | str) -> Column:
    """Polynomial rolling hash over characters mod HASH_MOD — the
    document-fingerprint primitive (cheap, order-sensitive)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(
        F.transform(F.split(c, ""), lambda ch: F.ascii(ch).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % HASH_MOD,
    )


# ---------------------------------------------------------------------------
# Language ID: stopword-profile scoring. Count profile-word hits per
# language, argmax with deterministic tie-break (score desc, lang asc).
# Profiles are tiny/function-word based — the classic cheap n-gram/stopword
# heuristic (fasttext-style quality without the model dependency).
# ---------------------------------------------------------------------------
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is", "that", "for", "with"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "von"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es", "por", "con"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "est", "que", "pour"),
    "zh": ("的", "是", "在", "了", "和", "有", "我", "不", "这", "他"),
}


def lang_score(col: Column | str, lang: str) -> Column:
    """Profile-hit count for one language (word-boundary regexp count —
    identical semantics to DuckDB len(regexp_extract_all(...)))."""
    c = F.col(col) if isinstance(col, str) else col
    pattern = r"\b(" + "|".join(LANG_PROFILES[lang]) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pattern))


def lang_id(col: Column | str) -> Column:
    """argmax over lang_score with (score desc, lang asc) tie-break;
    'und' (undetermined) when no profile hits at all.

    Shape matters: ONE array of (score, -index, lang) structs and an
    array_max — each profile regex appears exactly once in the plan.
    (A when-chain fold duplicates the whole accumulated chain in every
    condition AND branch — exponential expression blowup that made the
    corpus-prep plan inline ~100 regex calls per row.) Struct comparison
    is field-order lexicographic, so max = highest score, ties broken by
    smallest index = alphabetically first language."""
    c = F.col(col) if isinstance(col, str) else col
    entries = F.array(
        *[
            F.struct(
                lang_score(c, lang).alias("score"),
                F.lit(-i).alias("ni"),
                F.lit(lang).alias("lang"),
            )
            for i, lang in enumerate(sorted(LANG_PROFILES))
        ]
    )
    best = F.array_max(entries)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))


# ---------------------------------------------------------------------------
# Quality signals (length / punctuation / stopword ratios) — the standard
# cheap pre-training filters (C4/Gopher-style rules).
# ---------------------------------------------------------------------------
def punct_ratio(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(F.regexp_count(c, F.lit(r"[.,!?;:]")) / F.greatest(F.length(c), F.lit(1)), 6)


def stopword_ratio(col: Column | str, lang: str = "en") -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.round(lang_score(c, lang) / F.greatest(token_count(c), F.lit(1)), 6)


def mean_word_len(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    # chars excluding whitespace / word count
    squashed = F.length(F.regexp_replace(c, r"\s+", ""))
    return F.round(squashed / F.greatest(token_count(c), F.lit(1)), 6)


def quality_score(col: Column | str) -> Column:
    """Composite [0,1]-ish score: reward stopword presence and sane word
    lengths, penalize punctuation soup. Deliberately simple + portable;
    the point is the shape (per-doc scoring feeding a filter threshold)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(
        F.least(F.lit(1.0), stopword_ratio(c) * 2)
        - punct_ratio(c)
        + F.when(mean_word_len(c).between(3, 10), 0.5).otherwise(0.0),
        6,
    )


def dup_token_fraction(col: Column | str) -> Column:
    """Fraction of tokens that are repeats of an earlier token — the
    Gopher-style duplicate-content signal (word-soup analog of its
    duplicate-line fraction). Pure array expr, shuffle-free."""
    w = words(col)
    n = F.array_size(w)
    return F.round(
        (n - F.array_size(F.array_distinct(w))) / F.greatest(n, F.lit(1)), 6
    )


def bigrams(col: Column | str) -> Column:
    """NON-distinct word 2-grams (repetition analysis needs multiplicity;
    dedup's ``shingles`` dedups)."""
    w = words(col)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.array_size(w) - 2, F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, 2)),
    )


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"
# Both patterns are deliberately within the common subset of Java regex
# (Spark) and RE2 (DuckDB/Go tooling): no lookaround, no backrefs — so the
# scrub is reproducible outside the JVM and oracle-checkable.


def pii_scrub(col: Column | str) -> Column:
    """Redact emails → [EMAIL] and NNN-NNN-NNNN phones → [PHONE]. The
    standard pre-training PII pass, as two chained codegen'd
    regexp_replace ops (JVM-side; no UDF)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(
        F.regexp_replace(c, PII_EMAIL, "[EMAIL]"), PII_PHONE, "[PHONE]"
    )
