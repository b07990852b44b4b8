"""One larger-SF scaling rung (VERDICT r9 #8) — measurement harness only.

sf0.1 is overhead-bound: 8-core ≈ 32-core totals because ~43% of wall is
driver-side plan construction, so core-count ratios say nothing about
the data plane. This harness synthesizes a K× fixture (deterministic
key-shifted replication of every sf0.1 table — replica i shifts every
id/key column by i·10^9, preserving schema, distributions and FK
structure), then times a compute-bound query subset at 32 and at 8
cores in FRESH subprocesses (own JVM each, min-of-2 warm reps), so the
ratio measures the data plane, not session bring-up.

Usage:  python scripts/compute_rung.py [K]      (default K=5, ~sf0.5)
Output: one JSON blob on stdout — commit as COMPUTE_RUNG_r10.json and
paste the table into SCALE.md. Correctness at the synthetic rung is NOT
oracle-checked (the fixture is derived, not driver-issued); this is a
scaling measurement only.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SHIFT = 1_000_000_000  # far above any fixture id

#: Every id/key column per table that must shift per replica so joins
#: stay consistent and uniqueness survives replication. Non-key columns
#: replicate verbatim (same value distributions).
_KEY_COLS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: Compute-bound subset: data-plane heavy (shuffle/agg/join/encode), not
#: collect- or plan-construction-bound at sf0.1 per the round-9 census.
QUERIES = [
    "q_dedup_minhash_lsh",
    "q_ann_neardup_lsh",
    "q_corpus_prep_neardup",
    "q_bm25_rank",
    "q_pagerank",
    "q_triangle_count",
    "q_rfm_segments",
    "q_image_ahash_neardup",
    "q_lm_score_kn",
    "q_corr_matrix",
]

_CHILD = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from c_tran_data_pipeline_spark.plans import all_queries
from c_tran_data_pipeline_spark.session import get_spark
spark = get_spark("compute-rung")
reg = all_queries()
out = {{}}
for name in {queries!r}:
    spec = reg[name]
    spec.builder(spark, {sf_dir!r}).collect()  # warm (JIT, index builds)
    runs = []
    for _ in range(2):
        t0 = time.perf_counter()
        spec.builder(spark, {sf_dir!r}).collect()
        runs.append(round(time.perf_counter() - t0, 3))
    out[name] = min(runs)
print("RUNG_JSON:" + json.dumps(out))
"""


def synth(out_dir: str, k: int) -> None:
    from pyspark.sql import functions as F

    from c_tran_data_pipeline_spark.session import get_spark
    from c_tran_data_pipeline_spark.sources.readers import load_table

    spark = get_spark("rung-synth")
    for name, keys in _KEY_COLS.items():
        base = load_table(spark, SRC, name)
        if not keys or k == 1:
            reps = base
            if keys and k == 1:
                pass
        else:
            parts = [base]
            for i in range(1, k):
                r = base
                for c in keys:
                    r = r.withColumn(c, F.col(c) + F.lit(i * SHIFT))
                parts.append(r)
            from functools import reduce

            reps = reduce(lambda a, b: a.unionByName(b), parts)
        reps.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    spark.stop()


def run_at(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus))
    code = _CHILD.format(repo=str(_REPO), queries=QUERIES, sf_dir=sf_dir)
    p = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    for line in p.stdout.splitlines():
        if line.startswith("RUNG_JSON:"):
            return json.loads(line[len("RUNG_JSON:"):])
    raise RuntimeError(f"child at cpus={cpus} produced no record:\n{p.stderr[-2000:]}")


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    with tempfile.TemporaryDirectory() as td:
        sf_dir = os.path.join(td, f"rung_{k}x")
        synth(sf_dir, k)
        t32 = run_at(32, sf_dir)
        t8 = run_at(8, sf_dir)
    rows = {
        n: {
            "sec_32c": t32[n],
            "sec_8c": t8[n],
            "ratio_8c_over_32c": round(t8[n] / t32[n], 2) if t32[n] else None,
        }
        for n in QUERIES
    }
    print(json.dumps({"k": k, "source": SRC, "queries": rows}, indent=1))


if __name__ == "__main__":
    main()
