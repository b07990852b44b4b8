"""BM25 max-score pruning: the pruned form must be LOSSLESS (identical
top-k, identical scores — it shares q_bm25_rank's exact DuckDB oracle at
the driver gate too) while scoring measurably fewer candidate documents
wherever the vocabulary has rare terms to establish a threshold. The
pruning math (static per-term upper bound + seed-pass threshold +
essential-term suffix sums) lives in plans/text_queries.py::_bm25_rank.

The documents FIXTURE cannot demonstrate volume reduction: every token
there appears in ~75% of docs (df 373-378 of 500 — measured), so there
are no rare terms, every posting list covers most of the corpus, and
max-score pruning correctly keeps nearly everything. The volume test
therefore builds a Zipfian corpus (rare + common tokens) where the
pruning opportunity actually exists — which is also the realistic shape:
natural language is Zipfian, the fixture is the degenerate case."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.plans.text_queries import _bm25_rank
from tests.conftest import SF_ORACLE


def test_pruned_bm25_identical_results_fixture(spark):
    plain = _bm25_rank(spark, SF_ORACLE, prune=False)
    pruned = _bm25_rank(spark, SF_ORACLE, prune=True)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, pruned.collect()))


def _zipf_docs(spark):
    """200 docs: 5 query docs (ids 0-4) each carrying one rare token
    shared with 8 other docs; 155 docs of common-only filler. Rare
    tokens have high idf → high ub; common tokens have idf ≈ 0."""
    common = "alpha beta gamma delta epsilon"
    rows = []
    for q in range(5):
        rows.append((q, f"rare{q} {common}"))
    did = 5
    for q in range(5):
        for _ in range(8):
            rows.append((did, f"rare{q} {common} zeta"))
            did += 1
    while did < 200:
        rows.append((did, f"{common} zeta eta"))
        did += 1
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.mark.slow
def test_pruned_bm25_identical_results_zipf(spark):
    docs = _zipf_docs(spark)
    plain = _bm25_rank(spark, SF_ORACLE, prune=False, docs=docs)
    pruned = _bm25_rank(spark, SF_ORACLE, prune=True, docs=docs)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, pruned.collect()))


@pytest.mark.slow
def test_pruned_bm25_scores_fewer_candidates_zipf(spark):
    """On a Zipfian corpus the rare seed term establishes θ and the
    common terms (idf ≈ 0, ub ≈ 0) become non-essential: candidate
    pairs collapse from ~every doc per query to the rare-term postings
    — require at least a 2× reduction so a silently disabled threshold
    fails loudly."""
    docs = _zipf_docs(spark)
    full = _bm25_rank(
        spark, SF_ORACLE, prune=False, return_candidates=True, docs=docs
    ).count()
    kept = _bm25_rank(
        spark, SF_ORACLE, prune=True, return_candidates=True, docs=docs
    ).count()
    assert kept < full / 2, f"pruning kept {kept}/{full} candidate pairs"
    # and pruning never ADDS candidates on the degenerate fixture either
    f_full = _bm25_rank(spark, SF_ORACLE, prune=False, return_candidates=True).count()
    f_kept = _bm25_rank(spark, SF_ORACLE, prune=True, return_candidates=True).count()
    assert f_kept <= f_full


# ---------------------------------------------------------------------------
# Property: pruning is lossless on ARBITRARY corpora. The Zipf test covers
# the shape pruning was built for; hypothesis sweeps the space where the
# soundness argument has to hold edge to edge — ties at θ, queries with
# fewer than k seed candidates (no pruning), empty postings, single-token
# docs, shared vs disjoint vocabularies.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_tok = st.sampled_from(["a", "b", "c", "dd", "ee", "rare1", "rare2", "zz"])
_doc = st.lists(_tok, min_size=1, max_size=6).map(" ".join)


@given(texts=st.lists(_doc, min_size=6, max_size=18))
@settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)
@pytest.mark.slow
def test_pruned_bm25_lossless_on_random_corpora(spark, texts):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    plain = _bm25_rank(spark, SF_ORACLE, prune=False, docs=docs)
    pruned = _bm25_rank(spark, SF_ORACLE, prune=True, docs=docs)
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, pruned.collect()))
