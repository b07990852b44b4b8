"""Positional-posting-list phrase search (plans/text_queries.py
q_phrase_search): the alignment-vote formulation (start = pos - offset,
a start with all |phrase| distinct offsets matched is an occurrence)
must handle the cases a naive contains() scan gets wrong — repeated
phrase tokens, overlapping occurrences, phrases spanning the whole doc —
and must match a brute-force Python reference on a corpus built to
exercise them. The registered query derives its phrase from doc 0's
first three tokens; the helper here inlines the same plan shape with an
arbitrary phrase so the operator itself is what's under test."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.functions.text import words

DOCS = [
    (0, "a b c a b c a b"),      # overlapping-adjacent repeats of "a b c"
    (1, "a a a a"),              # repeated-token phrase territory
    (2, "x y z"),                # no match
    (3, "a b c"),                # exact whole-doc match
    (4, "b c a b"),              # match not at position 1
    (5, "a b"),                  # shorter than the phrase
]


def _phrase_search(spark: SparkSession, docs: DataFrame, phrase: list[str]) -> dict:
    toks = docs.select(
        "doc_id", F.posexplode(words("text")).alias("pos0", "tok")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "tok")
    ph = spark.createDataFrame(
        [(t, i) for i, t in enumerate(phrase)], "tok string, off int"
    )
    hits = toks.join(F.broadcast(ph), "tok").select(
        "doc_id", (F.col("pos") - F.col("off")).alias("start_pos"), "off"
    )
    matches = (
        hits.groupBy("doc_id", "start_pos")
        .agg(F.count_distinct("off").alias("n_off"))
        .filter(F.col("n_off") == len(phrase))
    )
    out = matches.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matches"), F.min("start_pos").alias("first_pos")
    )
    return {r["doc_id"]: (r["n_matches"], r["first_pos"]) for r in out.collect()}


def _reference(phrase: list[str]) -> dict:
    ref = {}
    for doc_id, text in DOCS:
        t = text.split()
        starts = [
            i + 1
            for i in range(len(t) - len(phrase) + 1)
            if t[i : i + len(phrase)] == phrase
        ]
        if starts:
            ref[doc_id] = (len(starts), starts[0])
    return ref


def _docs_df(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_overlapping_and_offset_matches(spark):
    got = _phrase_search(spark, _docs_df(spark), ["a", "b", "c"])
    assert got == _reference(["a", "b", "c"])
    # sanity on the interesting rows: doc 0 has two occurrences ("a b c
    # a b c a b"), doc 3 matches exactly, docs 2/4/5 are absent
    assert got[0] == (2, 1) and got[3] == (1, 1)
    assert 2 not in got and 4 not in got and 5 not in got
    # a match away from position 1: "c a b" starts at 3 in doc 0
    got2 = _phrase_search(spark, _docs_df(spark), ["c", "a", "b"])
    assert got2 == _reference(["c", "a", "b"]) and got2[0][1] == 3


def test_repeated_token_phrase(spark):
    # "a a" occurs 3 times in "a a a a" (overlapping) — the COUNT(DISTINCT
    # off) vote must not double-count the same posting row across offsets
    got = _phrase_search(spark, _docs_df(spark), ["a", "a"])
    assert got[1] == (3, 1)
    assert got == _reference(["a", "a"])


def test_two_token_phrase_matches_reference(spark):
    for phrase in (["b", "c"], ["c", "a"], ["x", "y"]):
        assert _phrase_search(spark, _docs_df(spark), phrase) == _reference(phrase)
