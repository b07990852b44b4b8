"""Calibrated min-of-N timer for a query subset — A/B harness.

Runs bench.py's fixed-work calibration unit, then min-of-N warm timings
per named query, and prints one JSON line with both so two runs (e.g.
HEAD vs a stashed tree) compare on calibrated numbers. Measurement
harness only — not part of the engine.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = int(os.environ.get("AB_REPS", "4"))


def main() -> None:
    import bench
    from c_tran_data_pipeline_spark.plans import all_queries
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("ab-time")
    registry = all_queries()
    registry["q_summaries"].builder(spark, SF_DIR).collect()
    bench._warm_page_cache(SF_DIR)
    bench._calibration_run(spark)
    cal_samples = [round(bench._calibration_run(spark), 3) for _ in range(3)]
    out = {"q": {}}
    for name in sys.argv[1:]:
        spec = registry[name]
        spec.builder(spark, SF_DIR).collect()  # warm
        runs = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            spec.builder(spark, SF_DIR).collect()
            runs.append(time.perf_counter() - t0)
        out["q"][name] = {"min": round(min(runs), 3)}
    cal_samples += [round(bench._calibration_run(spark), 3) for _ in range(2)]
    # calibrate on the pre+post median so a host-speed drift mid-session
    # doesn't flatter or punish the queries timed in between
    cal = round(statistics.median(cal_samples), 3)
    out["cal"] = cal
    out["cal_samples"] = cal_samples
    for name, rec in out["q"].items():
        rec["min_cal"] = round(rec["min"] / cal, 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
