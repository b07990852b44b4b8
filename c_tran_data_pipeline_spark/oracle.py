"""Local DuckDB-oracle comparison harness.

Mimics the driver's correctness gate: run the Spark builder and the oracle
SQL over the same parquet fixtures, compare row count, column names, and an
order-insensitive value representation. Used by tests/test_oracle_parity.py
and by ad-hoc dev runs (``python -m c_tran_data_pipeline_spark.oracle``).
"""

from __future__ import annotations

import math
import os
from dataclasses import dataclass

from pyspark.sql import SparkSession

from c_tran_data_pipeline_spark.sources.readers import TABLES


@dataclass
class CompareResult:
    name: str
    ok: bool
    spark_rows: int
    oracle_rows: int
    detail: str = ""


def _canon_cell(v) -> str:
    """Canonical string for a cell: floats rounded to 9 significant-ish
    decimals, timestamps via isoformat, bytes hex."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bytes):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, list):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    return str(v)


def _canon_rows(cols: list[str], rows: list[tuple]) -> list[str]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(_canon_cell(r[i]) for i in order) for r in rows)


def duckdb_connect(sf_dir: str):
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def compare_query(spark: SparkSession, name: str, sf_dir: str) -> CompareResult:
    from c_tran_data_pipeline_spark.plans import all_queries

    spec = all_queries()[name]
    sdf = spec.builder(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    if spec.oracle is None:
        return CompareResult(name, ok=len(s_rows) >= 0, spark_rows=len(s_rows), oracle_rows=-1, detail="rows-only (no oracle)")

    con = duckdb_connect(sf_dir)
    cur = con.execute(spec.oracle)
    o_cols = [d[0] for d in cur.description]
    o_rows = cur.fetchall()

    if sorted(s_cols) != sorted(o_cols):
        return CompareResult(name, False, len(s_rows), len(o_rows), f"schema mismatch: spark={sorted(s_cols)} oracle={sorted(o_cols)}")
    if len(s_rows) != len(o_rows):
        return CompareResult(name, False, len(s_rows), len(o_rows), "row count mismatch")
    s_canon = _canon_rows(s_cols, s_rows)
    o_canon = _canon_rows(o_cols, o_rows)
    if s_canon != o_canon:
        diffs = [(a, b) for a, b in zip(s_canon, o_canon) if a != b][:3]
        return CompareResult(name, False, len(s_rows), len(o_rows), f"value mismatch, first diffs: {diffs}")
    return CompareResult(name, True, len(s_rows), len(o_rows))


def typed_gate_check(spark: SparkSession, name: str, sf_dir: str) -> str | None:
    """Detect the two dtype classes that break an EXTERNAL typed-value
    comparator even when canonical values match (both bit us in round 1):

    - a column that is floating on one engine and integral on the other
      (DuckDB widens integer SUMs to HUGEINT, which pandas materializes
      as float — '1.0' vs '1' hash mismatch);
    - an unsortable (list-typed) output column (pandas sort_values
      crashes, the comparator records an error instead of a result).

    Width-only gaps (int32 vs int64, ns vs us timestamps) are fine —
    round 1 evidence shows the driver canonicalizes those."""
    from c_tran_data_pipeline_spark.plans import all_queries

    spec = all_queries()[name]
    sdf = spec.builder(spark, sf_dir).toPandas()
    odf = None if spec.oracle is None else duckdb_connect(sf_dir).execute(spec.oracle).df()
    problems = []
    frames = [("spark", sdf)] + ([("oracle", odf)] if odf is not None else [])

    def _unsortable(v) -> bool:
        # toPandas() materializes Spark arrays as numpy.ndarray, maps as
        # dict, structs as Row — NONE of which are plain `list`, which is
        # how the round-6 typed sweep stayed green on a query whose
        # ArrayType column then crashed the driver comparator
        # (CORRECTNESS_r06 q_audio_mfcc). Duck-type instead: anything
        # sized that isn't str/bytes is unhashable for pandas factorize.
        return hasattr(v, "__len__") and not isinstance(v, (str, bytes))

    for side, df in frames:
        for c in df.columns:
            if df[c].map(_unsortable).any():
                problems.append(f"{side}.{c} is list/dict/array-typed (comparator sort crash)")
    if odf is not None:
        for c in set(sdf.columns) & set(odf.columns):
            sk, ok_ = sdf[c].dtype.kind, odf[c].dtype.kind
            if {sk, ok_} == {"f", "i"} or {sk, ok_} == {"f", "u"}:
                problems.append(f"{c}: float on one engine, integer on the other")
    return "; ".join(problems) or None


def main() -> int:
    import sys

    from c_tran_data_pipeline_spark.plans import all_queries
    from c_tran_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    args = sys.argv[1:]
    typed = "--typed" in args
    names = [a for a in args if not a.startswith("--")] or list(all_queries())
    spark = get_spark("oracle-parity")
    failures = 0
    for n in names:
        r = compare_query(spark, n, sf_dir)
        status = "OK  " if r.ok else "FAIL"
        extra = ""
        if typed:
            t = typed_gate_check(spark, n, sf_dir)
            if t:
                status, extra = "FAIL", f" [typed-gate: {t}]"
        print(f"{status} {n}: spark={r.spark_rows} oracle={r.oracle_rows} {r.detail}{extra}")
        failures += 0 if status.startswith("OK") else 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())


# The real assertion behind every rows-only (no-SQL-oracle) query: the
# driver's `no_oracle` CORRECTNESS rows are row-count smoke checks ONLY —
# these pytest assertions are the evidence that the answers are right.
# tests/test_oracle_parity.py enforces that every oracle-less registered
# query has an entry here, so a new rows-only query cannot land without
# naming its proof.
ROWS_ONLY_EVIDENCE: dict[str, str] = {
    # q_bpe_merges / q_bpe_token_counts / q_tokenizer_fertility graduated
    # to EXACT DuckDB oracles in round 7 — the training replays as a
    # recursive CTE over the merge-list state, the encode as a fold of
    # doubled-separator replace()s (plans/text_queries.py _bpe_rec_ctes);
    # the python-replay/conservation/invariance tests still run.
    "q_incremental_semantic_dedup": (
        "tests/test_incremental_semantic.py::test_planted_twins_all_caught_and_full_equivalence "
        "(batch-incremental keep flags EQUAL full-corpus semantic_dedup on the "
        "planted fixture; 100%% twin recovery; store grows by exactly the kept "
        "rows) + ::test_store_roundtrip_and_torn_sidecar + "
        "::test_stored_rep_stays_canonical_when_new_id_is_smaller"
    ),
    "q_ann_ivf_topk": (
        "tests/test_similarity.py::test_ivf_full_probe_equals_exact (nprobe==nlist "
        "is ROW-IDENTICAL to exact brute force) + ::test_ivf_partial_probe_recall "
        "(recall floor at nprobe=4/16)"
    ),
    "q_ann_ivfpq_topk": (
        "tests/test_pq.py::test_ivfpq_recall_and_nprobe_ladder (recall floors, "
        "probe-more-never-hurts monotonicity, nprobe==nlist ≡ whole-corpus "
        "re-ranked PQ)"
    ),
    "q_ann_ivfpq_build": (
        "tests/test_pq.py::test_ivfpq_persisted_index_roundtrip_pruning_and_equivalence "
        "(write→read round-trip, sidecar commit marker, torn-index refusal) + "
        "::test_ivfpq_registered_build_then_search_uses_cache (cells partition the "
        "corpus exactly)"
    ),
    "q_ann_ivfpq_search": (
        "tests/test_pq.py::test_ivfpq_persisted_index_roundtrip_pruning_and_equivalence "
        "(search over the persisted index is ROW-IDENTICAL to the one-shot "
        "ivfpq_topk; plan shows parquet PartitionFilters on centroid_id)"
    ),
    # q_ann_lsh_topk graduated to an EXACT DuckDB oracle in round 7
    # (literal sign matrix + sequential-fold bucket twin); its recall
    # test vs cosine_topk still runs as belt-and-suspenders.
    # q_mmr_rerank graduated to an EXACT DuckDB oracle in round 7 (the
    # greedy loop replays as a recursive CTE with list-typed selection
    # state); its python-replay/diversity/invariance tests still run.
    # q_ann_neardup_lsh graduated to an EXACT DuckDB oracle in round 7
    # (size-CASE banding twin incl. the mean-relative hot-bucket cap);
    # its recall/precision/cap tests still run.
    "q_semantic_dedup": (
        "tests/test_goldens_rowsonly.py::test_rows_only_query_matches_golden (ALL "
        "550 sf0.01 rows — cell, component, keep — equal the committed golden) + "
        "tests/test_similarity.py::test_semantic_dedup_single_cell_equals_bruteforce "
        "(nlist=1 is COMPONENT-IDENTICAL to clustering the exact all-pairs "
        "graph) + ::test_semantic_dedup_blocked_precision_and_representatives "
        "(EVERY planted cosine-0.999 twin links to its parent under cell "
        "blocking; exactly one representative per component; precision 1.0 "
        "by exact-cosine verification)"
    ),
    "q_ann_pq_topk": (
        "tests/test_pq.py::test_pq_recall_ladder (raw ADC < re-ranked ADC ≤ exact) "
        "+ ::test_rerank_distances_are_exact (re-ranked distances equal true L2)"
    ),
    "q_ann_ivf_search": (
        "tests/test_pq.py::test_ivf_search_from_shared_index_row_identical "
        "(IVF-flat search over the shared persisted index is ROW-IDENTICAL to "
        "the one-shot ivf_topk at the index's training parameters; plan shows "
        "PartitionFilters on centroid_id)"
    ),
    "q_ann_pq_search": (
        "tests/test_pq.py::test_pq_search_amortized_books_row_identical (search "
        "with the persisted index's codebooks is ROW-IDENTICAL to the "
        "train-in-query q_ann_pq_topk — identical deterministic training "
        "parameters, zero training jobs)"
    ),
    "q_ann_ivfpq_append": (
        "tests/test_pq.py::test_ivfpq_append_equals_rebuild_and_commit_protocol "
        "(append with frozen quantizers is ROW-IDENTICAL to a frozen-quantizer "
        "rebuild of old∪new; torn generation dirs are invisible to readers and "
        "reclaimed by the next append; PartitionFilters reach every "
        "generation's scan) + ::test_ivfpq_append_staleness_trigger (cell-size "
        "drift raises IndexStaleError BEFORE writing; allow_stale records it) + "
        "::test_registered_append_query_row_identical_to_frozen_rebuild (the "
        "registered base-80 + append + search cycle, idempotent per run)"
    ),
    # q_audio_features graduated to an EXACT DuckDB oracle in round 7
    # (the oracle re-synthesizes the sine PCM sample-for-sample and
    # recomputes every feature, cross-checking the whole WAV
    # encode→parse→feature path); its pure-Python replay test still runs.
    "q_audio_dsp": (
        "tests/test_multimodal.py::test_audio_dsp_recovers_generation_frequency "
        "(FFT dominant frequency recovers each seeded sine's generation "
        "frequency to within one bin; ZCR matches the analytic 2f/rate; every "
        "value equals an independent numpy replay from the raw WAV bytes)"
    ),
    "q_approx_distinct": (
        "tests/test_olap.py::test_approx_distinct_error_bound (HLL++ estimate "
        "within 3×rsd of exact COUNT DISTINCT per group)"
    ),
    "q_approx_percentiles": (
        "tests/test_olap.py::test_approx_percentiles_within_rank_error (GK-sketch "
        "percentiles within the configured rank error of the exact sort-based twin)"
    ),
    # q_frame_sample graduated to an EXACT DuckDB oracle in round 7 (the
    # digest moved to md5-over-hex — DuckDB md5 is VARCHAR-only — and the
    # oracle reconstructs each sampled frame's header+body hex from the
    # deterministic formula); golden + stride tests still run.
    "q_image_ahash_neardup": (
        "tests/test_goldens_rowsonly.py::test_rows_only_query_matches_golden "
        "(the full sf0.01 pair list equals the committed golden) + "
        "tests/test_multimodal.py::test_image_ahash_matches_numpy_replay "
        "(hash bits vs an independent numpy replay) + "
        "::test_ahash_pairs_lossless_vs_bruteforce (banded pairs == brute-force "
        "all-pairs at hamming<=3) + ::test_ahash_single_pixel_neardup "
        "(perturbed sampled pixel stays within the hamming budget)"
    ),
    "q_image_phash_neardup": (
        "tests/test_goldens_rowsonly.py::test_rows_only_query_matches_golden "
        "(the full sf0.01 pair list equals the committed golden) + "
        "tests/test_multimodal.py::test_image_phash_matches_independent_dct_replay "
        "(hash bits vs an O(n^4) direct-DCT replay sharing no basis code) + "
        "::test_phash_brightness_shift_invariant + "
        "::test_phash_robust_where_ahash_drifts (threshold-crossing edits stay "
        "within the pairing budget under pHash, break it under aHash) + "
        "::test_phash_pairs_lossless_vs_bruteforce (banded pairs == brute-force "
        "all-pairs at hamming<=3)"
    ),
    "q_hll_vocab_union": (
        "tests/test_goldens_rowsonly.py::test_rows_only_query_matches_golden "
        "(the full per-source + union report equals the committed golden) + "
        "tests/test_classifier.py::test_hll_vocab_union_estimates_and_merge_algebra "
        "(fixture estimates equal exact DuckDB distinct counts; 60k/40k-key "
        "synthetic sketches estimate within the published envelope; merged "
        "union bounded by max and sum and within the envelope of the exact "
        "union)"
    ),
    "q_audio_mfcc": (
        "tests/test_goldens_rowsonly.py::test_rows_only_query_matches_golden "
        "(ALL 6500 sf0.01 long-format (asset_id, coef_idx, coef) rows equal "
        "the committed golden) + "
        "tests/test_multimodal.py::test_audio_mfcc_matches_formula_replay "
        "(every coefficient equals an independent from-the-formula "
        "python/numpy recomputation — HTK mel points, triangular weights, "
        "orthonormal DCT-II — and the sine fixtures' mel energy peaks in "
        "the filter containing the generation tone)"
    ),
    "q_pca_project": (
        "tests/test_goldens_rowsonly.py::test_rows_only_query_matches_golden (ALL "
        "500 sf0.01 sign-canonicalized projections equal the committed golden, "
        "atol 1e-6) + tests/test_pca.py::test_projection_matches_numpy_replay (vs "
        "a full-matrix numpy PCA, atol 1e-8) + ::test_partition_invariant "
        "(repartition(7) projections within 1e-8) + "
        "::test_components_orthonormal_and_variance_ordered"
    ),
    # q_multimodal_features graduated to an EXACT DuckDB oracle in
    # round 7 (the deterministic payload body replays in SQL); its
    # golden + byte-level reference tests still run.
    # q_pack_sequences graduated to an EXACT DuckDB oracle in round 7
    # (the greedy fold replays as a per-shard recursive CTE); its
    # packing-invariant tests still run.
    # q_quality_classifier / q_classifier_filter graduated to EXACT
    # DuckDB oracles in round 7 (the training replays as a recursive
    # CTE — plans/curation_queries.py _clf_oracle_ctes); their pytest
    # evidence (partition invariance, pure-Python replay equality,
    # monotone loss, score==sigmoid(weights)) still runs, now as
    # belt-and-suspenders alongside the value-hash gate.
}

# Round-6 golden sweep (VERDICT r5 item 4): EVERY rows-only query now has
# a committed full-output golden (tests/goldens/<name>_sf0.01.json) pinned
# by tests/test_goldens_rowsonly.py — prepend that proof to each entry
# that predates the sweep so the inventory names it.
for _n in sorted(ROWS_ONLY_EVIDENCE):
    # (q_frame_sample / q_multimodal_features pin their goldens via
    # tests/test_multimodal.py::test_registered_query_matches_golden)
    if "matches_golden" not in ROWS_ONLY_EVIDENCE[_n]:
        ROWS_ONLY_EVIDENCE[_n] = (
            "tests/test_goldens_rowsonly.py::test_rows_only_query_matches_golden "
            f"(ALL sf0.01 output rows equal the committed golden tests/goldens/"
            f"{_n}_sf0.01.json) + " + ROWS_ONLY_EVIDENCE[_n]
        )


def write_inventory(path: str = "QUERIES.md") -> None:
    """Generate the query-inventory doc from the registry (run:
    ``python -c "from c_tran_data_pipeline_spark.oracle import
    write_inventory; write_inventory()"``)."""
    from c_tran_data_pipeline_spark.plans import all_queries

    lines = [
        "# Query inventory (auto-generated from plans/registry)",
        "",
        "One row per registered query: driver-gate oracle kind, tags, and",
        "what it demonstrates. `exact` = DuckDB value-hash parity at",
        "sf0.01 AND sf0.1; `rows-only` = non-SQL-expressible (approximate/",
        "iterative/UDF) — for those, the `real assertion` section below",
        "names the pytest proof behind the driver's row-count smoke check.",
        "",
        "| query | oracle | tags | demonstrates |",
        "|---|---|---|---|",
    ]
    for name, spec in sorted(all_queries().items()):
        kind = "exact" if spec.oracle else "rows-only"
        doc = " ".join((spec.doc or "").split())
        lines.append(f"| `{name}` | {kind} | {', '.join(spec.tags)} | {doc} |")
    lines += [
        "",
        "## Real assertions behind rows-only queries",
        "",
        "A driver `no_oracle` row means ONLY that the query ran and its",
        "row count was recorded. The correctness evidence is:",
        "",
        "| query | real assertion |",
        "|---|---|",
    ]
    for name in sorted(ROWS_ONLY_EVIDENCE):
        lines.append(f"| `{name}` | {ROWS_ONLY_EVIDENCE[name]} |")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
