"""cProfile the BUILD phase (spec.builder call) of selected queries.

Separates driver-side Python/Catalyst/py4j time from Spark job time for
queries the round-9 census showed to be build-dominated. Measurement
harness only — not part of the engine.
"""

from __future__ import annotations

import cProfile
import io
import pstats
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    from c_tran_data_pipeline_spark.plans import all_queries
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("profile-build")
    registry = all_queries()
    registry["q_summaries"].builder(spark, SF_DIR).collect()

    for name in sys.argv[1:]:
        spec = registry[name]
        spec.builder(spark, SF_DIR).collect()  # warm
        pr = cProfile.Profile()
        t0 = time.perf_counter()
        pr.enable()
        df = spec.builder(spark, SF_DIR)
        pr.disable()
        build = time.perf_counter() - t0
        t1 = time.perf_counter()
        df.collect()
        coll = time.perf_counter() - t1
        s = io.StringIO()
        ps = pstats.Stats(pr, stream=s).sort_stats("cumulative")
        ps.print_stats(18)
        print(f"==== {name}: build={build:.2f}s collect={coll:.2f}s")
        print("\n".join(s.getvalue().splitlines()[:40]), flush=True)


if __name__ == "__main__":
    main()
