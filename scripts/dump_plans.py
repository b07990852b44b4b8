"""Dump .explain('formatted') for the named queries to plans/<round>/.

Usage: python scripts/dump_plans.py <tag_suffix> q_a q_b ...
Writes plans/$SPARK_GRAFT_PLAN_ROUND/<query>_<tag_suffix>.txt (default
r10 — the round's judge-facing plan evidence). Measurement harness
only — not part of the engine.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from c_tran_data_pipeline_spark.plans import all_queries
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("dump-plans")
    registry = all_queries()
    outdir = _REPO / "plans" / os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r10")
    outdir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = registry[name].builder(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        (outdir / f"{name}_{tag}.txt").write_text(plan)
        print(f"wrote {name}_{tag}.txt ({len(plan)} chars)", flush=True)


if __name__ == "__main__":
    main()
