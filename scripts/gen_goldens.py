"""Regenerate the committed full-output goldens for the rows-only
queries pinned in tests/test_goldens_rowsonly.py. Run ONLY when a
deliberate semantic change moves the output (and say so in the commit):

    python scripts/gen_goldens.py [q_name ...]

Writes tests/goldens/<name>_sf0.01.json via the SAME canonicalization
the test applies (tests/golden_utils.py), so pin and regeneration can't
drift.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from tests.golden_utils import SORT_KEYS, canonical_rows  # noqa: E402

SF = "/root/testdata/sf0.01"


def main() -> None:
    from c_tran_data_pipeline_spark.plans import all_queries
    from c_tran_data_pipeline_spark.session import get_spark

    names = sys.argv[1:] or sorted(SORT_KEYS)
    spark = get_spark()
    out_dir = Path(_REPO) / "tests" / "goldens"
    for name in names:
        df = all_queries()[name].builder(spark, SF)
        cols = list(df.columns)
        rows = canonical_rows(name, cols, [list(r) for r in df.collect()])
        p = out_dir / f"{name}_sf0.01.json"
        with open(p, "w") as f:
            json.dump({"columns": cols, "rows": rows}, f)
        print(f"{name}: {len(rows)} rows -> {p}")


if __name__ == "__main__":
    main()
