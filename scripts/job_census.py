"""Per-query job/stage/task census at sf0.1 — the round-9 measurement
harness (guide §1: measure first).

For each headline query: one untimed warm-up, then a timed run inside a
dedicated job group. Records wall seconds, number of Spark jobs, stages
and tasks launched by the timed run. Queries whose wall time tracks the
JOB COUNT rather than the task count are scheduler/overhead-bound at
fixture scale — candidates for action-count reduction (fused jobs,
lazy checkpoints), which is the same lever that removes whole passes at
100 TB. Output: one JSON line per query to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    import bench
    from c_tran_data_pipeline_spark.plans import all_queries
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("job-census")
    sc = spark.sparkContext
    registry = all_queries()
    names = sys.argv[1:] or [
        n
        for n in bench.HEADLINE
        if n in registry
        and "baseline" not in registry[n].tags
        and "surface-pin" not in registry[n].tags
    ]
    registry["q_summaries"].builder(spark, SF_DIR).collect()  # session warm

    out = []
    for name in names:
        spec = registry[name]
        try:
            spec.builder(spark, SF_DIR).collect()  # warm-up (build-once costs)
        except Exception as exc:
            print(json.dumps({"q": name, "error": str(exc)[:200]}), flush=True)
            continue
        group = f"census-{name}"
        sc.setJobGroup(group, name)
        t0 = time.perf_counter()
        df = spec.builder(spark, SF_DIR)
        t1 = time.perf_counter()
        df.collect()
        t2 = time.perf_counter()
        wall = t2 - t0
        build = t1 - t0  # plan construction incl. any actions inside the builder
        sc.setJobGroup(None, None)
        tracker = sc.statusTracker()
        job_ids = tracker.getJobIdsForGroup(group)
        n_stages = 0
        n_tasks = 0
        for jid in job_ids:
            info = tracker.getJobInfo(jid)
            if info is None:
                continue
            for sid in info.stageIds:
                si = tracker.getStageInfo(sid)
                if si is None:
                    continue
                n_stages += 1
                n_tasks += si.numTasks
        rec = {
            "q": name,
            "sec": round(wall, 3),
            "build": round(build, 3),
            "jobs": len(job_ids),
            "stages": n_stages,
            "tasks": n_tasks,
        }
        out.append(rec)
        print(json.dumps(rec), flush=True)

    out.sort(key=lambda r: -r["sec"])
    total = sum(r["sec"] for r in out)
    jobs = sum(r["jobs"] for r in out)
    print(
        json.dumps(
            {"total_sec": round(total, 2), "total_jobs": jobs, "n": len(out)}
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
