"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the reference's tsvscript.py:29
hotspot analog) at sf0.001; ``queries()``/``oracle_sql()`` expose every
implemented operator from SURVEY.md §2 with its DuckDB oracle.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from c_tran_data_pipeline_spark.plans import all_queries

    return all_queries()["q_flagship_hotspot"].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from c_tran_data_pipeline_spark.plans import all_queries

    return {name: spec.builder for name, spec in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twins; omitted where non-SQL-expressible
    (driver then records a rows-only check)."""
    from c_tran_data_pipeline_spark.plans import all_queries

    return {name: spec.oracle for name, spec in all_queries().items() if spec.oracle is not None}
