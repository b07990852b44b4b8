"""Interleaved A/B/C of the multi-table LSH bucket-pass shapes at a
corpus ladder (VERDICT r9 #2) — measurement harness only.

Shapes (operators/similarity.py, all proven bit-identical):
  lambda — round-9 interpreted HOF over one sign-tensor Literal
  flat   — round-10 split-projection codegen arithmetic
  arrow  — mapInPandas numpy sequential fold (guide §4.2)

Per rung: the synthetic corpus (scale_ladder recipe) is WRITTEN TO
PARQUET and re-read so each shape pays a realistic scan; per rep the
harness times (a) DataFrame CONSTRUCTION (Catalyst analysis — the cost
that killed the flat shape in round 9; reported cold = cache-bypassed
and warm = through multi_table_lsh_buckets' analyzed-plan cache) and
(b) EXECUTION of the ids-only bucket pass to the noop sink. Shapes
alternate A/B/C within the same session so host drift hits all three
equally; min-of-reps reported.

Run: python scripts/lsh_shape_ab.py [n ...]   (default rungs 2000 20000)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from scripts.scale_ladder import synth_embeddings  # noqa: E402

DIM = 64
REPS = int(os.environ.get("AB_REPS", "3"))


def main() -> None:
    from c_tran_data_pipeline_spark.operators import similarity as S
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("lsh-shape-ab")
    rungs = [int(a) for a in sys.argv[1:]] or [2000, 20000]
    out = {"reps": REPS, "rungs": {}}
    with tempfile.TemporaryDirectory() as td:
        for n in rungs:
            planes, tables = S.auto_banding(n)
            path = os.path.join(td, f"emb_{n}")
            synth_embeddings(spark, n).write.mode("overwrite").parquet(path)

            def build(shape: str, use_cache: bool):
                df = spark.read.parquet(path)
                t0 = time.perf_counter()
                if shape == "lambda":
                    b = S._multi_table_lsh_buckets_lambda(df, planes, tables, "vec_id", "embedding", DIM)
                elif shape == "flat" and use_cache:
                    b = S.multi_table_lsh_buckets(df, planes, tables, "vec_id", "embedding", DIM)
                elif shape == "flat":
                    b = S._multi_table_lsh_buckets_flat(df, planes, tables, "vec_id", "embedding", DIM)
                else:
                    b = S._multi_table_lsh_buckets_arrow(df, planes, tables, "vec_id", "embedding", DIM)
                b = b.select("table", "bucket", "vec_id")
                t_construct = time.perf_counter() - t0
                return b, t_construct

            rec = {"planes": planes, "tables": tables,
                   "construct_cold": {}, "construct_warm": {}, "exec": {}}
            shapes = ["lambda", "flat", "arrow"]
            # one untimed warm-up each (JIT, arrow worker spin-up)
            for sh in shapes:
                b, _ = build(sh, use_cache=False)
                b.write.format("noop").mode("overwrite").save()
            for _ in range(REPS):
                for sh in shapes:
                    b, tc = build(sh, use_cache=False)
                    rec["construct_cold"].setdefault(sh, []).append(round(tc, 3))
                    _, tw = build(sh, use_cache=(sh == "flat"))
                    rec["construct_warm"].setdefault(sh, []).append(round(tw, 3))
                    t0 = time.perf_counter()
                    b.write.format("noop").mode("overwrite").save()
                    rec["exec"].setdefault(sh, []).append(round(time.perf_counter() - t0, 3))
            for k in ("construct_cold", "construct_warm", "exec"):
                rec[k] = {sh: {"min": min(v), "runs": v} for sh, v in rec[k].items()}
            out["rungs"][n] = rec
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
