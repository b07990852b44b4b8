"""Byte-pair-encoding tokenizer training and encoding, Spark-first.

The missing half of the text stack (functions/text.py counts whitespace
tokens; real pipelines train a subword vocabulary first): classic BPE
(Sennrich et al. 2016) — start from characters, repeatedly merge the
most frequent adjacent symbol pair — expressed so every corpus-sized
stage is one declarative shuffle:

- Training runs on the WORD-FREQUENCY table (word → count), the
  standard reduction: the corpus collapses to its distinct words ONCE
  (one groupBy at corpus grain), and every merge iteration touches only
  that vocab-grain table — at 100 TB the word table is millions of
  rows, not trillions. Each iteration: explode adjacent pairs weighted
  by word count (one projection), aggregate pair counts (partial-first
  shuffle), take the arg-max on the driver (ONE row — bounded driver
  state), and rewrite symbol arrays with a native array fold (no
  Python). Iterations are jobs, so ``num_merges`` is an explicit cost
  knob; the word table is cached for the loop's duration (the
  train-loop caching lever, cf. _kmeans_rows).
- Ties break deterministically (count DESC, then pair lexicographic) so
  the merge table is bit-reproducible on any engine/partitioning — the
  property every oracle in this repo is built on.
- Encoding applies the learned merge list in rank order as a pure
  array-expression pipeline per word — no Python in the path; documents
  encode by splitting to words and summing their subword counts
  (optionally joining the word table as a broadcast cache).

Reference parity: the C-Tran reference has no tokenizer (its "tokens"
are CSV fields); this is north-star surface for the training-data
extensions (token budgeting, packing, LM scoring all consume it).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

END = "\x01"  # end-of-word sentinel symbol (never a corpus char; escaped so the literal is visible)


def word_freq_table(docs: DataFrame, text: str = "text") -> DataFrame:
    """(word, cnt) — the corpus collapsed to distinct words, the one
    corpus-grain shuffle in BPE training."""
    return (
        docs.select(F.explode(F.split(F.trim(F.col(text)), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _initial_symbols(word: Column) -> Column:
    # characters + end-of-word marker: "low" -> [l, o, w, END]
    return F.concat(F.split(word, ""), F.array(F.lit(END)))


def _sql_lit(s: str) -> str:
    """``s`` as a Spark SQL string literal. Quote, backslash and control
    characters (the END sentinel is \\x01) go out as ``\\uXXXX`` escapes,
    which ``ParserUtils.unescapeSQLString`` decodes back to the exact
    codepoint — so the parsed literal equals ``F.lit(s)`` byte-for-byte
    for any BMP string (astral chars pass through raw, legal in a
    literal).

    Config dependency (ADVICE r9): the ``\\uXXXX`` decode requires
    ``spark.sql.parser.escapedStringLiterals=false`` — the Spark default,
    asserted at parse time by ``_assert_escaped_literals_off`` on every
    entry point that feeds these literals into ``F.expr`` — because the
    legacy literal mode would pass the escape text through RAW and merge
    symbols containing quotes/backslashes/END would silently corrupt."""
    out = []
    for ch in s:
        o = ord(ch)
        if ch in ("'", "\\") or o < 0x20 or 0x7F <= o < 0xA0:
            out.append("\\u%04x" % o)
        else:
            out.append(ch)
    return "'" + "".join(out) + "'"


def _assert_escaped_literals_off(df: DataFrame) -> None:
    """Hard-fail if the session runs the legacy literal parser (ADVICE
    r9): merge symbols come from CORPUS DATA, so under
    ``spark.sql.parser.escapedStringLiterals=true`` a symbol containing
    a quote/backslash/control char would parse as the WRONG BYTES with
    no error — corrupt BPE output is strictly worse than a crash."""
    conf = df.sparkSession.conf.get("spark.sql.parser.escapedStringLiterals", "false")
    if str(conf).lower() == "true":
        raise RuntimeError(
            "BPE SQL-literal rendering requires "
            "spark.sql.parser.escapedStringLiterals=false (the default); "
            "the legacy literal mode would silently corrupt merge symbols"
        )


def _merge_once_sql(inner: str, a: str, b: str) -> str:
    """``_merge_once`` as ONE SQL expression string over the SQL fragment
    ``inner``. Semantically identical to the Column form (pinned by
    tests/test_bpe.py::test_merge_once_sql_equals_column_form); exists
    because building the fold through the Python lambda API costs
    hundreds of py4j round-trips PER MERGE (the round-9 census measured
    2.2 s of driver wall per 16-merge cascade, ~9,500 socket
    round-trips), while this string parses JVM-side in one call —
    driver plan-construction time is serial wall time on any cluster
    (guide §5/§7.3)."""
    A, B, AB = _sql_lit(a), _sql_lit(b), _sql_lit(a + b)
    return (
        f"aggregate({inner}, "
        "struct(CAST(array() AS array<string>) AS out, false AS pend), "
        "(acc, x) -> CASE "
        f"WHEN acc.pend AND x = {B} THEN struct(concat(acc.out, array({AB})) AS out, false AS pend) "
        f"WHEN acc.pend AND x = {A} THEN struct(concat(acc.out, array({A})) AS out, true AS pend) "
        f"WHEN acc.pend THEN struct(concat(acc.out, array({A}, x)) AS out, false AS pend) "
        f"WHEN x = {A} THEN struct(acc.out AS out, true AS pend) "
        "ELSE struct(concat(acc.out, array(x)) AS out, false AS pend) END, "
        f"acc -> CASE WHEN acc.pend THEN concat(acc.out, array({A})) ELSE acc.out END)"
    )


def _merge_once(syms: Column, a: str, b: str) -> Column:
    """Replace every non-overlapping [a, b] adjacency in ``syms`` with
    the merged symbol a||b, left to right — one aggregate fold, pure
    Column expression. The accumulator carries (out array, pending
    flag): pending marks that the previous element was an unconsumed
    ``a``; finish flushes a trailing pending ``a``."""
    a_l, b_l, ab = F.lit(a), F.lit(b), F.lit(a + b)
    return F.aggregate(
        syms,
        F.struct(
            F.expr("CAST(array() AS array<string>)").alias("out"),
            F.lit(False).alias("pend"),
        ),
        lambda acc, x: F.when(
            acc["pend"] & (x == b_l),
            F.struct(F.concat(acc["out"], F.array(ab)).alias("out"), F.lit(False).alias("pend")),
        )
        .when(
            acc["pend"] & (x == a_l),
            F.struct(F.concat(acc["out"], F.array(a_l)).alias("out"), F.lit(True).alias("pend")),
        )
        .when(
            acc["pend"],
            F.struct(
                F.concat(acc["out"], F.array(a_l, x)).alias("out"), F.lit(False).alias("pend")
            ),
        )
        .when(x == a_l, F.struct(acc["out"].alias("out"), F.lit(True).alias("pend")))
        .otherwise(
            F.struct(F.concat(acc["out"], F.array(x)).alias("out"), F.lit(False).alias("pend"))
        ),
        lambda acc: F.when(acc["pend"], F.concat(acc["out"], F.array(a_l))).otherwise(acc["out"]),
    )


def _pair_counts(words: DataFrame) -> DataFrame:
    """(p1, p2, n) adjacent-symbol pair frequencies weighted by word
    count — overlapping occurrences count once per position, matching
    the merge's left-to-right non-overlapping application closely
    enough for arg-max purposes (the classic implementation does the
    same)."""
    pairs = words.select(
        "cnt",
        F.explode(
            F.expr(
                "CASE WHEN size(syms) >= 2 THEN"
                " transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i-1] AS p1, syms[i] AS p2))"
                " ELSE CAST(array() AS array<struct<p1:string,p2:string>>) END"
            )
        ).alias("p"),
    )
    return pairs.groupBy("p.p1", "p.p2").agg(F.sum("cnt").alias("n"))


def bpe_train(
    docs: DataFrame, num_merges: int = 40, text: str = "text", min_pair_count: int = 2
) -> list[tuple[str, str, int]]:
    """Learn ``num_merges`` merges; returns [(left, right, count), ...]
    in merge order (KBs of driver state — ship it as a literal, like
    k-means centroids). Stops early when no pair reaches
    ``min_pair_count``."""
    _assert_escaped_literals_off(docs)
    wf = word_freq_table(docs, text)
    # Eager localCheckpoint per iteration, NOT persist: each iteration's
    # frame must start from a TRUNCATED logical plan. The pair-count
    # projection references `syms` three times, so Catalyst's
    # CollapseProject would substitute the (growing) merge expression
    # 3× per level — an O(3^k) logical-plan blowup that OOMs the
    # optimizer near k≈20. The checkpointed frame is vocab-grain
    # (distinct words × symbol arrays — MBs), so materializing it per
    # merge is the cheap side of the trade.
    words = wf.select(_initial_symbols(F.col("word")).alias("syms"), "cnt").localCheckpoint()
    merges: list[tuple[str, str, int]] = []
    for _ in range(num_merges):
        top = (
            _pair_counts(words)
            .orderBy(F.col("n").desc(), F.col("p1").asc(), F.col("p2").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0]["n"] < min_pair_count:
            break
        a, b, n = top[0]["p1"], top[0]["p2"], int(top[0]["n"])
        merges.append((a, b, n))
        # SQL-string form of the fold (one py4j round-trip instead of
        # hundreds); LAZY checkpoint — the plan is truncated to a
        # LogicalRDD either way, and the next iteration's arg-max
        # collect materializes it, so eager's extra blocking job per
        # merge bought nothing (round-9 census: 2 jobs/merge -> 1).
        words = words.select(
            F.expr(_merge_once_sql("syms", a, b)).alias("syms"), "cnt"
        ).localCheckpoint(eager=False)
    return merges


def bpe_encode_words(
    words: DataFrame, merges: list[tuple[str, str, int]], word: str = "word"
) -> DataFrame:
    """words + ``tokens`` (array of subword symbols): apply the learned
    merge list in rank order — the whole merge cascade is one chained
    Column expression (native fold per merge, no Python, no joins)."""
    _assert_escaped_literals_off(words)
    # Escape embedded backticks in the identifier (`` is the quoted-
    # identifier escape, mirroring what _sql_lit does for string
    # literals) so a column name containing ` parses correctly (ADVICE
    # r9; the old F.col path handled such names).
    ident = word.replace("`", "``")
    expr = f"concat(split(`{ident}`, ''), array({_sql_lit(END)}))"
    for a, b, _n in merges:
        expr = _merge_once_sql(expr, a, b)
    return words.withColumn("tokens", F.expr(expr))


def bpe_token_counts(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    key: str = "doc_id",
    text: str = "text",
) -> DataFrame:
    """(key, n_words, n_bpe_tokens): encode via the DISTINCT-WORD table
    (each word encodes once; docs join the result — the same
    vocab-grain reduction training uses) and sum subword counts per
    document."""
    doc_words = docs.select(
        F.col(key), F.explode(F.split(F.trim(F.col(text)), r"\s+")).alias("word")
    ).filter(F.col("word") != "")
    vocab = doc_words.select("word").distinct()
    encoded = bpe_encode_words(vocab, merges).select(
        "word", F.size("tokens").alias("n_sub")
    )
    return (
        doc_words.join(encoded, "word")
        .groupBy(key)
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_sub").cast("bigint").alias("n_bpe_tokens"),
        )
    )
