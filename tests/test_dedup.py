"""Behavioral tests for dedup operators: planted duplicates must be found,
and the probabilistic paths (MinHash-LSH, SimHash) must agree with the
exact Jaccard ground truth on high-similarity pairs."""

from __future__ import annotations

import pytest

from pyspark.sql import Row

from c_tran_data_pipeline_spark.operators.dedup import (
    exact_dedup,
    minhash_lsh_candidates,
    ngram_jaccard_pairs,
    simhash,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees"
)
NEAR = BASE.replace("warm windowsill", "cold doorstep")  # one shingle region changed
OTHER = (
    "completely different content about spark query engines and columnar "
    "execution with vectorized readers and adaptive plans at scale"
)


def _docs(spark):
    return spark.createDataFrame(
        [
            Row(doc_id=1, text=BASE),
            Row(doc_id=2, text=BASE),  # exact dup of 1
            Row(doc_id=3, text=NEAR),  # near dup of 1
            Row(doc_id=4, text=OTHER),
        ]
    )


def test_exact_dedup_groups(spark):
    out = exact_dedup(_docs(spark)).collect()
    groups = {r.rep_doc_id: r.n_copies for r in out}
    assert groups == {1: 2, 3: 1, 4: 1}


def test_ngram_jaccard_finds_planted_pair(spark):
    pairs = {(r.d1, r.d2): r.jaccard for r in ngram_jaccard_pairs(_docs(spark), threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 <= pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_minhash_lsh_candidates_cover_planted_pairs(spark):
    cands = {(r.d1, r.d2) for r in minhash_lsh_candidates(_docs(spark)).collect()}
    assert (1, 2) in cands  # identical docs share all buckets
    assert not any(4 in p for p in cands)


def test_simhash_hamming_tracks_similarity(spark):
    sh = {r.doc_id: r.simhash for r in simhash(_docs(spark)).collect()}
    ham = lambda a, b: bin(a ^ b).count("1")  # noqa: E731
    assert ham(sh[1], sh[2]) == 0  # identical text → identical simhash
    assert ham(sh[1], sh[3]) < ham(sh[1], sh[4])  # near-dup closer than unrelated


def test_lsh_recall_on_fixture(spark):
    """On the real documents table, LSH candidates must recover almost all
    truly-similar pairs (jaccard ≥ 0.8; P(miss) = (1-j⁴)⁴ ≤ 2.3% at j=0.8)."""
    from c_tran_data_pipeline_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    truth = {(r.d1, r.d2) for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    cands = {(r.d1, r.d2) for r in minhash_lsh_candidates(docs, num_hashes=16, bands=4).collect()}
    assert truth, "fixture should contain planted near-dups"
    recall = len(truth & cands) / len(truth)
    assert recall >= 0.9, f"LSH recall {recall:.2f} over {len(truth)} true pairs"


def test_connected_components_known_graph(spark):
    """Chain 1-2-3 + isolated pair (8,9) + triangle (4,5,6): three
    components with min-id representatives; chain forces >1 round."""
    from c_tran_data_pipeline_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(2, 3), (1, 2), (8, 9), (4, 5), (5, 6), (4, 6)], "d1 bigint, d2 bigint"
    )
    out = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 8: 8, 9: 8, 4: 4, 5: 4, 6: 4}


def test_dedup_clusters_cover_all_candidate_pairs(spark):
    """Every doc in a candidate pair lands in a cluster, both ends of a
    pair share a component, and representatives are cluster minima."""
    from c_tran_data_pipeline_spark.operators.dedup import minhash_lsh_candidates
    from c_tran_data_pipeline_spark.operators.graph import dedup_clusters
    from c_tran_data_pipeline_spark.sources.readers import load_table
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    pairs = minhash_lsh_candidates(docs, num_hashes=16, bands=4)
    comp = {r["doc_id"]: r["component"] for r in dedup_clusters(pairs).collect()}
    for r in pairs.collect():
        assert comp[r["d1"]] == comp[r["d2"]]
    by_comp = {}
    for d, c in comp.items():
        by_comp.setdefault(c, []).append(d)
    assert all(c == min(ds) for c, ds in by_comp.items())


def test_connected_components_long_chain_and_nonconvergence(spark):
    """A 12-node chain needs ~11 rounds: converges with ample max_iter,
    and REFUSES (rather than silently mislabels) when max_iter is too
    small for the diameter."""
    import pytest as _pytest

    from c_tran_data_pipeline_spark.operators.graph import connected_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 12)], "d1 bigint, d2 bigint"
    )
    out = {r["node"]: r["component"] for r in connected_components(chain, max_iter=15).collect()}
    assert set(out.values()) == {1} and len(out) == 12
    with _pytest.raises(RuntimeError, match="not converged"):
        connected_components(chain, max_iter=3)


@pytest.mark.slow
def test_star_cc_long_chain_where_min_propagation_refuses(spark):
    """A 40-node chain (diameter 39 ≫ 25): one-hop min-propagation at the
    default max_iter correctly refuses, while large-star/small-star
    converges in O(log² n) rounds and labels every node with the chain
    minimum — the documented escalation path for adversarial graphs."""
    import pytest as _pytest

    from c_tran_data_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 40)], "d1 bigint, d2 bigint"
    )
    with _pytest.raises(RuntimeError, match="not converged"):
        connected_components(chain)  # default max_iter=25 < diameter

    out = {
        r["node"]: r["component"]
        for r in connected_components_star(chain, max_iter=12).collect()
    }
    assert len(out) == 40 and set(out.values()) == {1}


def test_star_cc_matches_min_propagation_on_mixed_graph(spark):
    """Same labels as min-propagation on a multi-component graph with a
    triangle, a chain, an isolated pair, and a star — including
    non-contiguous ids."""
    from c_tran_data_pipeline_spark.operators.graph import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(2, 3), (1, 2), (8, 9), (4, 5), (5, 6), (4, 6), (100, 50), (100, 70), (100, 60)],
        "d1 bigint, d2 bigint",
    )
    a = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    b = {r["node"]: r["component"] for r in connected_components_star(edges).collect()}
    assert a == b


def test_containment_catches_excerpt_that_jaccard_misses(spark):
    from c_tran_data_pipeline_spark.operators.dedup import ngram_containment_pairs

    excerpt = "the quick brown fox jumps over the lazy dog"  # prefix of BASE
    df = spark.createDataFrame(
        [Row(doc_id=1, text=BASE), Row(doc_id=2, text=excerpt), Row(doc_id=3, text=OTHER)]
    )
    # every shingle of the excerpt appears in BASE → containment 1.0 ...
    cont = {(r.d1, r.d2): r.containment for r in ngram_containment_pairs(df, threshold=0.9).collect()}
    assert cont == {(1, 2): 1.0}
    # ... while Jaccard is diluted by the host doc's size and misses it
    jac = {(r.d1, r.d2) for r in ngram_jaccard_pairs(df, threshold=0.9).collect()}
    assert (1, 2) not in jac


def test_containment_hot_shingle_guard_is_applied(spark):
    from c_tran_data_pipeline_spark.operators.dedup import ngram_containment_pairs

    df = _docs(spark)
    # capping shingle df at 1 drops every shared shingle → no pairs survive
    assert ngram_containment_pairs(df, threshold=0.1, max_shingle_df=1).count() == 0


def test_fuzzy_pairs_catches_typo_and_blocking_excludes_distant_lengths(spark):
    from c_tran_data_pipeline_spark.operators.dedup import fuzzy_pairs

    typo = BASE.replace("quick", "quikc").replace("lazy", "lzay")  # 4 edits in prefix
    df = spark.createDataFrame(
        [
            Row(doc_id=1, text=BASE, n_chars=len(BASE)),
            Row(doc_id=2, text=typo, n_chars=len(typo)),
            Row(doc_id=3, text=OTHER, n_chars=len(OTHER)),
            # same prefix as BASE but radically different total length →
            # the length block must exclude it even though edit distance is 0
            Row(doc_id=4, text=BASE, n_chars=len(BASE) + 500),
        ]
    )
    out = {(r.d1, r.d2): r.edit for r in fuzzy_pairs(df, max_len_diff=16, max_edit=8).collect()}
    assert (1, 2) in out and 0 < out[(1, 2)] <= 8
    assert not any(3 in p for p in out)
    assert not any(4 in p for p in out)


def test_incremental_neardup_equals_batch_delta(spark):
    """Exactness of the incremental contract: batch candidates on the
    union == batch candidates on the old corpus ∪ incremental pairs,
    and the incremental pairs are exactly the new-endpoint subset."""
    from pyspark.sql import functions as F

    from c_tran_data_pipeline_spark.operators.dedup import (
        incremental_neardup,
        minhash_buckets,
        minhash_lsh_candidates,
    )
    from c_tran_data_pipeline_spark.sources.readers import load_table
    from tests.conftest import SF_ORACLE

    docs = load_table(spark, SF_ORACLE, "documents")
    old = docs.filter(F.col("doc_id") % 10 < 8)
    new = docs.filter(F.col("doc_id") % 10 >= 8)

    batch_union = {(r.d1, r.d2) for r in minhash_lsh_candidates(docs).collect()}
    batch_old = {(r.d1, r.d2) for r in minhash_lsh_candidates(old).collect()}
    inc, store2 = incremental_neardup(new, minhash_buckets(old))
    inc_pairs = {(r.d1, r.d2) for r in inc.collect()}

    assert batch_old | inc_pairs == batch_union
    assert batch_old & inc_pairs == set()  # delta only touches new endpoints
    # the updated store indexes the union (same rows a fresh build makes)
    fresh = {tuple(r) for r in minhash_buckets(docs).collect()}
    assert {tuple(r) for r in store2.collect()} == fresh


def test_incremental_neardup_empty_batch(spark):
    from c_tran_data_pipeline_spark.operators.dedup import (
        incremental_neardup,
        minhash_buckets,
    )
    from c_tran_data_pipeline_spark.sources.readers import load_table
    from tests.conftest import SF_SMOKE

    docs = load_table(spark, SF_SMOKE, "documents")
    store = minhash_buckets(docs)
    pairs, store2 = incremental_neardup(docs.filter("doc_id < 0"), store)
    assert pairs.count() == 0
    assert store2.count() == store.count()


def test_minhash_estimate_error_bounded(spark):
    """Sketch audit semantics: estimates live on the k=16 lattice
    (multiples of 1/16), near-identical pairs estimate high, and the
    mean absolute error over candidates is within the ~1/sqrt(k)
    regime (16 hashes → sd ≈ 0.125 per pair at mid-range Jaccard)."""
    from c_tran_data_pipeline_spark.plans import all_queries

    from tests.conftest import SF_SMOKE

    rows = all_queries()["q_minhash_estimate"].builder(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        assert abs(r["est_jaccard"] * 16 - round(r["est_jaccard"] * 16)) < 1e-6
        assert 0.0 <= r["exact_jaccard"] <= 1.0
    mean_err = sum(r["abs_err"] for r in rows) / len(rows)
    assert mean_err <= 0.2, f"minhash estimate error blew past the k=16 regime: {mean_err}"
    # LSH candidates are biased toward true near-dups: the top estimated
    # pair should also be genuinely similar
    top = max(rows, key=lambda r: r["est_jaccard"])
    assert top["exact_jaccard"] >= 0.5


def test_dedup_canonical_election_rules(spark):
    """Longest doc wins its block; ties break to min doc_id; every doc
    maps to its block's canonical; singletons are their own canonical."""
    import tempfile

    from c_tran_data_pipeline_spark.plans.dedup_queries import q_dedup_canonical

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma", 16),
            (2, "alpha beta gamma delta epsilon", 30),  # longest in block "alpha beta"
            (3, "alpha beta x", 12),
            (4, "zeta eta", 8),                          # singleton block
            (5, "mu nu one", 9),                         # tie on n_chars with 6 → min id wins
            (6, "mu nu two", 9),
        ],
        "doc_id long, text string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        rows = {r.doc_id: r for r in q_dedup_canonical(spark, d).collect()}
    assert rows[1].canonical_id == 2 and rows[3].canonical_id == 2
    assert rows[2].is_canonical and rows[2].cluster_size == 3
    assert rows[4].is_canonical and rows[4].cluster_size == 1
    assert rows[5].canonical_id == 5 and rows[6].canonical_id == 5  # tie → min doc_id


# --------------------------------------------------------------------------
# sorted-neighborhood blocking
# --------------------------------------------------------------------------


def _snm_replay(rows, block_len=4, key_len=32, window=3):
    import re

    keyed = [
        (re.sub(r"[^a-z0-9]", "", (t or "").lower())[:key_len], did) for did, t in rows
    ]
    blocks = {}
    for k, did in keyed:
        blocks.setdefault(k[:block_len], []).append((k, did))
    pairs = set()
    for items in blocks.values():
        items.sort()
        for i in range(len(items)):
            for j in range(i + 1, min(i + window + 1, len(items))):
                pairs.add((items[i][1], items[j][1], j - i))
    return pairs


def test_sorted_neighborhood_matches_replay(spark):
    from c_tran_data_pipeline_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [
        (1, "The quick brown fox jumps"),
        (2, "The quick brown fox jumped"),   # prefix near-dup of 1
        (3, "the QUICK-brown fox!! jumps"),  # normalizes EQUAL to 1's key
        (4, "a completely different text"),
        (5, "The quiet brown fox"),          # same 4-char block, later key
        (6, "zzz outlier"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.d1, r.d2, r.gap)
        for r in sorted_neighborhood_pairs(df).collect()
    }
    want = _snm_replay(rows)
    assert got == want
    # the prefix near-dups land in the same neighborhood; the outlier pairs with nobody
    assert any(p[:2] == (1, 2) or p[:2] == (2, 1) for p in got)
    assert not any(6 in p[:2] for p in got)


def test_sorted_neighborhood_replay_random_and_partition_invariant(spark):
    import random

    from c_tran_data_pipeline_spark.operators.dedup import sorted_neighborhood_pairs

    rng = random.Random(23)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon"]
    rows = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 6))))
        for i in range(120)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    want = _snm_replay(rows)
    got = {(r.d1, r.d2, r.gap) for r in sorted_neighborhood_pairs(df).collect()}
    got13 = {
        (r.d1, r.d2, r.gap)
        for r in sorted_neighborhood_pairs(df.repartition(13)).collect()
    }
    assert got == want
    assert got13 == want


# --------------------------------------------------------------------------
# prefix-filtered (AllPairs/PPJoin) exact Jaccard join
# --------------------------------------------------------------------------


def _zipf_corpus(n_docs=60, seed=31):
    """Zipfian synthetic corpus (the fixture vocabulary is uniform —
    useless for demonstrating rarity-based pruning)."""
    import random

    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(50)]
    weights = [1.0 / (i + 1) for i in range(50)]
    docs = []
    for i in range(n_docs):
        words = rng.choices(vocab, weights=weights, k=rng.randint(6, 14))
        docs.append((i, " ".join(words)))
    # plant exact/near duplicates so the threshold has positives
    docs.append((1000, docs[0][1]))
    docs.append((1001, docs[3][1] + " extra"))
    return docs


def _brute_jaccard_pairs(rows, n=3, t_num=4, t_den=5):
    def sh(text):
        w = text.split()
        return {" ".join(w[i : i + n]) for i in range(len(w) - n + 1)}

    sets = {did: sh(t) for did, t in rows}
    out = set()
    ids = sorted(sets)
    for i, d1 in enumerate(ids):
        for d2 in ids[i + 1 :]:
            a, b = sets[d1], sets[d2]
            if not a or not b:
                continue
            inter = len(a & b)
            union = len(a) + len(b) - inter
            if t_den * inter >= t_num * union:
                out.add((d1, d2, round(inter / union, 6)))
    return out


def test_prefix_filter_matches_brute_force(spark):
    from c_tran_data_pipeline_spark.operators.dedup import prefix_filter_jaccard_pairs

    rows = _zipf_corpus()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.d1, r.d2, r.jaccard) for r in prefix_filter_jaccard_pairs(df).collect()}
    assert got == _brute_jaccard_pairs(rows)
    assert got, "corpus must contain planted positives"


def test_prefix_filter_prunes_candidates(spark):
    """The point of the prefix: the candidate join must touch far fewer
    pairs than the full inverted-index self-join on Zipfian data."""
    from pyspark.sql import functions as F

    from c_tran_data_pipeline_spark.operators.dedup import shingle_index

    rows = _zipf_corpus(n_docs=80, seed=37)
    df = spark.createDataFrame(rows, "doc_id long, text string")
    idx = shingle_index(df)
    full_pairs = (
        idx.alias("a")
        .join(idx.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    # rebuild the operator's candidate stage standalone
    from pyspark.sql.window import Window

    sizes = idx.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = idx.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id").orderBy("df", "shingle")
    pre = (
        idx.join(dfreq, "shingle")
        .withColumn("rn", F.row_number().over(w))
        .join(sizes, "doc_id")
        .filter(F.col("rn") <= F.col("n") - F.expr("(4 * n + 4) DIV 5") + 1)
    )
    cand = (
        pre.alias("a")
        .join(pre.alias("b"), "shingle")
        .filter(
            (F.col("a.doc_id") < F.col("b.doc_id"))
            & (5 * F.least("a.n", "b.n") >= 4 * F.greatest("a.n", "b.n"))
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert cand < full_pairs / 3, (cand, full_pairs)


def test_repeated_ngrams_finds_planted_span(spark):
    """A 10-token license block planted in 3 docs surfaces every one of
    its three 8-gram shingles with n=3; unique text never appears; a
    7-token doc emits nothing."""
    import tempfile

    from c_tran_data_pipeline_spark.plans.text_queries import q_repeated_ngrams

    block = "licensed under the apache license version two zero one one"  # 11 tokens
    docs = [
        (1, block + " alpha beta", "en", "s1", 0),
        (2, "gamma " + block, "en", "s2", 0),
        (3, block, "en", "s3", 0),
        (4, "seven little tokens do not make eight", "en", "s4", 0),  # 7 tokens
        (5, "entirely unique text with no duplicate span here at all", "en", "s5", 0),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = q_repeated_ngrams(spark, d).collect()
    got = {r.gram: (r.n, r.n_docs) for r in out}
    toks = block.split()
    for i in range(len(toks) - 7):  # all 4 in-block 8-grams repeat 3x
        assert got[" ".join(toks[i : i + 8])] == (3, 3)
    assert all(g.count(" ") == 7 for g in got)  # every gram is exactly 8 tokens
    assert not any("unique" in g for g in got)


def test_dup_span_fraction_flags_majority_duplicated(spark):
    """A doc that is one long shared block is majority-duplicated
    (drop); a doc quoting one shared 8-gram plus unique text keeps;
    a fully unique doc scores 0.0."""
    import tempfile

    from c_tran_data_pipeline_spark.plans.text_queries import q_dup_span_fraction

    block = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    docs = [
        (1, block, "en", "s", 0),                      # 1 shingle, duplicated
        (2, block + " unique tail words here now final stop end", "en", "s", 0),
        (3, "totally distinct text with nothing shared across any doc", "en", "s", 0),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in q_dup_span_fraction(spark, d).collect()}
    assert (out[1].n_shingles, out[1].n_dup_shingles, out[1].dup_fraction) == (1, 1, 1.0)
    assert out[1].drop_doc is True
    # doc 2: 16 tokens -> 9 shingles, only the leading block 8-gram is shared
    assert (out[2].n_shingles, out[2].n_dup_shingles) == (9, 1)
    assert out[2].drop_doc is False
    assert out[3].n_dup_shingles == 0 and out[3].dup_fraction == 0.0


def test_cdc_chunks_realign_after_insertion(spark):
    """THE content-defined-chunking property: prepending one word to a
    document changes only the chunks up to the first boundary — every
    later chunk hash re-aligns (fixed-offset chunking shifts ALL of
    them). Verified via the registered builder on a two-doc corpus."""
    import os
    import tempfile

    from c_tran_data_pipeline_spark.plans import all_queries

    base_words = [f"w{i}" for i in range(400)]
    orig = " ".join(base_words)
    shifted = "INSERTED " + orig
    df = spark.createDataFrame(
        [(1, orig, "en", "s", len(orig)), (2, shifted, "en", "s", len(shifted))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "documents.parquet"))
        out = {r["doc_id"]: r for r in all_queries()["q_cdc_chunks"].builder(spark, td).collect()}
    # nearly every chunk of the original doc also appears in the shifted
    # doc => counted duplicated; only the first chunk (prefix-perturbed)
    # may differ on each side
    assert out[1]["n_chunks"] > 10, "fixture doc too short to exercise CDC"
    assert out[1]["n_dup_chunks"] >= out[1]["n_chunks"] - 1
    assert out[2]["n_dup_chunks"] >= out[2]["n_chunks"] - 1


def test_linkage_score_finds_planted_parent(spark):
    """Every planted dirty twin links back to its own parent record, and
    the winning score always includes the near-unique name16+balance
    agreements (score strictly above the segment-only floor)."""
    from c_tran_data_pipeline_spark.plans import all_queries

    sf = "/root/testdata/sf0.001"
    out = all_queries()["q_linkage_score"].builder(spark, sf).collect()
    assert len(out) == 15
    for r in out:
        assert r["cand"] == r["dkey"], f"dirty {r['dkey']} linked to {r['cand']}"
        assert r["n_agree"] == 3


def test_span_cut_keep_first_and_conservation(spark):
    """Keep-first policy: the min-doc_id holder of a duplicated 8-gram
    keeps its tokens; every other doc masks the gram's 8 positions.
    Conservation: kept + cut token counts == input, and kept_text
    re-tokenizes to exactly n_kept_tokens."""
    import tempfile

    from c_tran_data_pipeline_spark.plans.text_queries import q_dedup_span_cut

    block = "alpha beta gamma delta epsilon zeta eta theta"  # exactly 8 tokens
    docs = [
        (1, block + " own tail one two three four five six", "en", "s", 0),
        (2, "lead " + block, "en", "s", 0),          # loses the block (keeper=1)
        (3, block, "en", "s", 0),                    # fully cut
        (4, "nothing shared with any other document here at all", "en", "s", 0),
        (5, "tiny", "en", "s", 0),                   # < 8 tokens: no grams
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in q_dedup_span_cut(spark, d).collect()}
    # keeper keeps everything
    assert out[1].n_cut_tokens == 0 and out[1].kept_text == docs[0][1]
    # doc 2 masks the block's 8 tokens, keeps its unique lead
    assert (out[2].n_tokens, out[2].n_kept_tokens, out[2].kept_text) == (9, 1, "lead")
    # doc 3 is the block alone: fully cut, empty kept_text
    assert (out[3].n_kept_tokens, out[3].kept_text) == (0, "")
    # untouched docs pass through verbatim
    assert out[4].kept_text == docs[3][1] and out[5].kept_text == "tiny"
    for r in out.values():
        assert r.n_kept_tokens + r.n_cut_tokens == r.n_tokens  # conservation
        retok = [t for t in r.kept_text.split(" ") if t != ""]
        assert len(retok) == r.n_kept_tokens


def test_dedup_lines_first_wins_and_reassembly(spark):
    """Line-grain (10-word segment) dedup: a segment survives at its
    FIRST (doc_id, seg_idx) occurrence only — across docs, across
    positions, and within one doc — and each doc reassembles its kept
    segments in position order."""
    import tempfile

    from c_tran_data_pipeline_spark.plans.text_queries import q_dedup_lines

    A = " ".join(f"a{i}" for i in range(10))
    B = " ".join(f"b{i}" for i in range(10))
    C = " ".join(f"c{i}" for i in range(10))
    docs = [
        (1, f"{A} {B}", "en", "s", 0),          # first holder of A (pos 0) and B (pos 1)
        (2, f"{B} {A}", "en", "s", 0),          # both segments lose: fully removed
        (3, A, "en", "s", 0),                   # single repeated segment: removed
        (4, "u0 u1 u2 u3 u4 u5 u6 u7 u8 u9 tail1 tail2 tail3", "en", "s", 0),
        (5, "x y z", "en", "s", 0),             # short tail-only doc, unique: kept
        (6, f"{C} {C}", "en", "s", 0),          # within-doc dup: second copy removed
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            docs, "doc_id long, text string, lang string, source string, n_chars long"
        ).write.parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in q_dedup_lines(spark, d).collect()}
    assert len(out) == 6  # every doc emits a row, even fully-removed ones
    assert (out[1].n_segments, out[1].n_kept_segments) == (2, 2)
    assert out[1].kept_text == docs[0][1]
    assert (out[2].n_kept_segments, out[2].kept_text) == (0, "")
    assert (out[3].n_kept_segments, out[3].kept_text) == (0, "")
    # unique doc passes through verbatim incl. the 3-word tail segment
    assert (out[4].n_segments, out[4].kept_text) == (2, docs[3][1])
    assert (out[5].n_segments, out[5].kept_text) == (1, "x y z")
    # within-doc duplicate: first copy kept, second removed
    assert (out[6].n_segments, out[6].n_kept_segments, out[6].kept_text) == (2, 1, C)
    for r in out.values():
        assert 0 <= r.n_kept_segments <= r.n_segments


def test_shingles_short_doc_yields_empty_not_crash(spark):
    """ADVICE r7 (medium): docs with fewer than n words used to hit
    sequence(0, -1) = [0, -1] (Spark sequences DESCEND for start > stop)
    and the -1 index crashed F.slice with INVALID_PARAMETER_VALUE.START.
    Now they yield an empty array, matching the DuckDB oracle form
    generate_series(1, len-n+1) -> empty — and long docs are unchanged."""
    from pyspark.sql import functions as F

    from c_tran_data_pipeline_spark.functions.text import shingles

    df = spark.createDataFrame(
        [
            Row(doc_id=1, text="one two three four"),  # 4 words < n=5
            Row(doc_id=2, text="a"),  # single word
            Row(doc_id=3, text="one two three four five six"),  # 6 words
        ]
    ).select("doc_id", shingles("text", 5).alias("g"))
    got = {r.doc_id: r.g for r in df.collect()}
    assert got[1] == [] and got[2] == []
    assert got[3] == ["one two three four five", "two three four five six"]
    # exactly-n words: one shingle (the boundary the guard must not eat)
    one = (
        spark.createDataFrame([Row(text="one two three four five")])
        .select(shingles("text", 5).alias("g"))
        .collect()[0]
        .g
    )
    assert one == ["one two three four five"]
    # the same guard on payload_chunks: a zero-length binary payload
    # must emit ZERO chunk rows (not two bogus chunk_idx in {0,-1} rows)
    from c_tran_data_pipeline_spark.operators.multimodal import chunk_payloads

    assets = spark.createDataFrame(
        [Row(asset_id=1, payload=bytearray(b"")), Row(asset_id=2, payload=bytearray(b"xyz"))]
    )
    rows = chunk_payloads(assets, key="asset_id", payload="payload", chunk_bytes=2).collect()
    by_asset = {}
    for r in rows:
        by_asset.setdefault(r.asset_id, []).append((r.chunk_idx, bytes(r.chunk)))
    assert 1 not in by_asset
    assert sorted(by_asset[2]) == [(0, b"xy"), (1, b"z")]
