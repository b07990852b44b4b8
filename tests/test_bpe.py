"""BPE trainer/encoder vs an independent pure-Python replay: identical
merge tables on the full sf0.001 corpus, identical per-word encodings,
token-count conservation, and partitioning invariance."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.bpe import (
    END,
    bpe_encode_words,
    bpe_token_counts,
    bpe_train,
)

SF = "/root/testdata/sf0.001"


# --- independent reference implementation (same published algorithm,
# same deterministic tie-break: count DESC, then pair lexicographic) ---

def _py_pair_counts(vocab: dict[tuple[str, ...], int]) -> Counter:
    pc: Counter = Counter()
    for syms, cnt in vocab.items():
        for i in range(len(syms) - 1):
            pc[(syms[i], syms[i + 1])] += cnt
    return pc


def _py_merge(syms: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    out, i = [], 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


@pytest.fixture(scope="module")
def corpus_words(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    rows = docs.select(F.split(F.trim("text"), r"\s+").alias("w")).collect()
    words: Counter = Counter()
    for r in rows:
        for w in r["w"]:
            if w:
                words[w] += 1
    return words


def _py_bpe_clean(words: Counter, num_merges: int, min_count: int = 2):
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in words.items():
        key = tuple(w) + (END,)
        vocab[key] = vocab.get(key, 0) + c
    merges = []
    for _ in range(num_merges):
        pc = _py_pair_counts(vocab)
        if not pc:
            break
        (a, b), n = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        if n < min_count:
            break
        merges.append((a, b, n))
        nxt: dict[tuple[str, ...], int] = {}
        for s, c in vocab.items():
            k = _py_merge(s, a, b)
            nxt[k] = nxt.get(k, 0) + c
        vocab = nxt
    return merges


def test_merge_table_matches_python_replay(spark, corpus_words):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    got = bpe_train(docs, num_merges=25)
    exp = _py_bpe_clean(corpus_words, 25)
    assert got == exp


def test_encoding_matches_python_and_conserves(spark, corpus_words):
    """Every distinct corpus word encodes to the same subword sequence
    as the python replay; per-doc BPE token counts are consistent
    (Σ subwords == Σ per-word encodings) and every doc appears."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    merges = bpe_train(docs, num_merges=20)
    exp_merges = _py_bpe_clean(corpus_words, 20)
    assert merges == exp_merges

    vocab = spark.createDataFrame([(w,) for w in corpus_words], "word string")
    enc = {r["word"]: list(r["tokens"]) for r in bpe_encode_words(vocab, merges).collect()}
    for w in corpus_words:
        syms = tuple(w) + (END,)
        for a, b, _n in merges:
            syms = _py_merge(syms, a, b)
        assert enc[w] == list(syms), w
        # conservation: concatenating subwords reproduces the word+END
        assert "".join(enc[w]) == w + END

    counts = {r["doc_id"]: r for r in bpe_token_counts(docs, merges).collect()}
    raw = {
        r["doc_id"]: [w for w in r["w"] if w]
        for r in docs.select("doc_id", F.split(F.trim("text"), r"\s+").alias("w")).collect()
    }
    with_words = {k for k, v in raw.items() if v}
    assert set(counts) == with_words
    for did in list(with_words)[:50]:
        exp_tokens = sum(len(enc[w]) for w in raw[did])
        assert (counts[did]["n_words"], counts[did]["n_bpe_tokens"]) == (
            len(raw[did]),
            exp_tokens,
        )


def test_training_partition_invariant(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    a = bpe_train(docs, num_merges=12)
    b = bpe_train(docs.repartition(7), num_merges=12)
    assert a == b


def test_merge_once_overlap_and_double_letter(spark):
    """aa-merge applies left-to-right non-overlapping: aaa -> [aa, a]."""
    from c_tran_data_pipeline_spark.operators.bpe import _merge_once

    df = spark.createDataFrame([(["a", "a", "a"],), (["a", "b", "a", "b"],)], "syms array<string>")
    out = [list(r["m"]) for r in df.select(_merge_once(F.col("syms"), "a", "a").alias("m")).collect()]
    assert out[0] == ["aa", "a"]
    out2 = [list(r["m"]) for r in df.select(_merge_once(F.col("syms"), "a", "b").alias("m")).collect()]
    assert out2[1] == ["ab", "ab"]


def test_merge_once_sql_equals_column_form(spark):
    """The SQL-string fold (_merge_once_sql, the product path since r9's
    py4j-chatter fix) is row-identical to the Column-API fold on
    adversarial symbols: quotes, backslashes, the \\x01 END sentinel,
    unicode — so _sql_lit's escaping is proven against F.lit."""
    from c_tran_data_pipeline_spark.operators.bpe import (
        END,
        _merge_once,
        _merge_once_sql,
    )

    cases = [
        ("a", "a"),
        ("a", "b"),
        ("l'", "\\o"),
        ("w", END),
        ("é", "ß"),
    ]
    rows = [
        (["a", "a", "a"],),
        (["a", "b", "a", "b"],),
        (["l'", "\\o", "l'", "l'", "\\o"],),
        (["w", END, "w"],),
        (["é", "ß", "é"],),
        ([],),
    ]
    df = spark.createDataFrame(rows, "syms array<string>")
    for a, b in cases:
        got_sql = [
            list(r["m"])
            for r in df.select(F.expr(_merge_once_sql("syms", a, b)).alias("m")).collect()
        ]
        got_col = [
            list(r["m"]) for r in df.select(_merge_once(F.col("syms"), a, b).alias("m")).collect()
        ]
        assert got_sql == got_col, (a, b)


def test_fertility_consistent_with_doc_grain_encode(spark):
    """q_tokenizer_fertility's source-grain sums equal the doc-grain
    encode (q_bpe_token_counts) re-aggregated by source driver-side,
    and fertility ≥ 1 / unsplit_frac ∈ [0,1] hold by construction."""
    from c_tran_data_pipeline_spark.plans.text_queries import (
        q_bpe_token_counts,
        q_tokenizer_fertility,
    )
    from c_tran_data_pipeline_spark.sources.readers import load_table

    sf = "/root/testdata/sf0.001"
    got = {r.source: r for r in q_tokenizer_fertility(spark, sf).collect()}
    doc_counts = {r.doc_id: r for r in q_bpe_token_counts(spark, sf).collect()}
    src = {
        r.doc_id: r.source
        for r in load_table(spark, sf, "documents").select("doc_id", "source").collect()
    }
    want_words: dict = {}
    want_tokens: dict = {}
    for doc_id, r in doc_counts.items():
        s = src[doc_id]
        want_words[s] = want_words.get(s, 0) + r.n_words
        want_tokens[s] = want_tokens.get(s, 0) + r.n_bpe_tokens
    assert set(got) == set(want_words)
    for s, r in got.items():
        assert (r.n_words, r.n_tokens) == (want_words[s], want_tokens[s]), s
        assert r.fertility == round(r.n_tokens / r.n_words, 6)
        assert r.fertility >= 1.0
        assert 0.0 <= r.unsplit_frac <= 1.0
        assert r.bytes_per_token > 0
