"""Shared canonicalization for full-output golden pins of rows-only
queries (used by BOTH the committed-golden test and
scripts/gen_goldens.py, so the pin and its regeneration can never
drift).

Canonical form per query:
- rows sorted by their integer id columns;
- PCA projections sign-canonicalized per component (eigenvector sign is
  arbitrary: flip each pc column so its value on the smallest vec_id
  with |v| > 1e-9 is positive);
- floats kept at full precision in the golden; the COMPARISON allows
  |Δ| ≤ 1e-6 for float cells (cross-partitioning partial-sum jitter is
  ≤ 1e-8 by the dedicated invariance tests; exact-match everything
  else).
"""

from __future__ import annotations

FLOAT_TOL = 1e-6

#: query -> columns used as the sort key (must be non-float, unique)
SORT_KEYS = {
    "q_semantic_dedup": ["vec_id"],
    "q_image_ahash_neardup": ["a1", "a2"],
    "q_mmr_rerank": ["query_id", "mmr_rank"],
    "q_pca_project": ["vec_id"],
    # round-6 sweep (VERDICT r5 item 4): every remaining rows-only query
    # gets the full-output treatment.
    "q_ann_ivf_search": ["query_id", "rank"],
    "q_ann_ivf_topk": ["query_id", "rank"],
    "q_ann_ivfpq_build": ["centroid_id"],
    "q_ann_ivfpq_search": ["query_id", "rank"],
    "q_ann_ivfpq_topk": ["query_id", "rank"],
    "q_ann_lsh_topk": ["query_id", "rank"],
    "q_ann_neardup_lsh": ["d1", "d2"],
    "q_ann_pq_search": ["query_id", "rank"],
    "q_ann_pq_topk": ["query_id", "rank"],
    "q_approx_distinct": ["event_type"],
    "q_approx_percentiles": ["event_type"],
    "q_audio_features": ["asset_id"],
    "q_audio_dsp": ["asset_id"],
    "q_bpe_merges": ["merge_rank"],
    "q_bpe_token_counts": ["doc_id"],
    "q_incremental_semantic_dedup": ["vec_id"],
    "q_pack_sequences": ["shard", "pack_seq"],
    "q_quality_classifier": ["iteration", "feature"],
    "q_classifier_filter": ["doc_id"],
    "q_image_phash_neardup": ["a1", "a2"],
    "q_tokenizer_fertility": ["source"],
    "q_audio_mfcc": ["asset_id", "coef_idx"],
    "q_hll_vocab_union": ["source"],
    # round-9: incremental IVF-PQ append (base-80 build + batch append +
    # search — same result shape as the other ANN searches)
    "q_ann_ivfpq_append": ["query_id", "rank"],
}


def canonical_rows(name: str, columns: list[str], rows: list[list]) -> list[list]:
    idx = [columns.index(c) for c in SORT_KEYS[name]]
    out = sorted([list(r) for r in rows], key=lambda r: [r[i] for i in idx])
    if name == "q_pca_project":
        for ci, col in enumerate(columns):
            if not col.startswith("pc"):
                continue
            anchor = next((r[ci] for r in out if abs(r[ci]) > 1e-9), 1.0)
            if anchor < 0:
                for r in out:
                    r[ci] = -r[ci]
    return out


def assert_rows_match(golden_rows: list[list], rows: list[list], columns: list[str]) -> None:
    assert len(rows) == len(golden_rows), (
        f"row count {len(rows)} != golden {len(golden_rows)}"
    )
    for ri, (g, r) in enumerate(zip(golden_rows, rows)):
        for ci, (gv, rv) in enumerate(zip(g, r)):
            if isinstance(gv, float) or isinstance(rv, float):
                assert rv == rv and abs(rv - gv) <= FLOAT_TOL, (
                    f"row {ri} col {columns[ci]}: {rv!r} vs golden {gv!r}"
                )
            else:
                assert rv == gv, (
                    f"row {ri} col {columns[ci]}: {rv!r} vs golden {gv!r}"
                )
