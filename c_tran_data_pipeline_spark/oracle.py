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


def main() -> int:
    import sys

    from c_tran_data_pipeline_spark.plans import all_queries
    from c_tran_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF", "/root/testdata/sf0.01")
    names = sys.argv[1:] or list(all_queries())
    spark = get_spark("oracle-parity")
    failures = 0
    for n in names:
        r = compare_query(spark, n, sf_dir)
        status = "OK  " if r.ok else "FAIL"
        print(f"{status} {n}: spark={r.spark_rows} oracle={r.oracle_rows} {r.detail}")
        failures += 0 if r.ok else 1
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())


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
        "iterative/UDF) with the real assertion in tests/.",
        "",
        "| query | oracle | tags | demonstrates |",
        "|---|---|---|---|",
    ]
    for name, spec in sorted(all_queries().items()):
        kind = "exact" if spec.oracle else "rows-only"
        doc = " ".join((spec.doc or "").split())
        lines.append(f"| `{name}` | {kind} | {', '.join(spec.tags)} | {doc} |")
    with open(path, "w") as fh:
        fh.write("\n".join(lines) + "\n")
