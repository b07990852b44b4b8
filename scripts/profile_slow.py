"""Profile the slowest bench queries at sf0.1 with warm repeats.

Not part of the engine — a measurement harness (bench noise on this box
is +/-40%, so every number here is min-of-3 in one warm session).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SF_DIR = "/root/testdata/sf0.1"
NAMES = sys.argv[1:] or [
    "q_corpus_prep_neardup",
    "q_ann_neardup_lsh",
    "q_ann_ivf_topk",
    "q_dedup_minhash_lsh",
    "q_dedup_clusters",
    "q_breadcrumb_conform",
    "q_decontaminate",
]


def main() -> None:
    from c_tran_data_pipeline_spark.plans import all_queries
    from c_tran_data_pipeline_spark.session import get_spark

    spark = get_spark("profile")
    registry = all_queries()
    registry["q_summaries"].builder(spark, SF_DIR).collect()  # warm

    for name in NAMES:
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            registry[name].builder(spark, SF_DIR).collect()
            times.append(round(time.perf_counter() - t0, 3))
        print(f"{name}: min={min(times)} all={times}", flush=True)


if __name__ == "__main__":
    main()
