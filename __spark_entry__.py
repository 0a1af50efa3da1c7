"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`hdfs_mr_spark` — the registry there pairs every
SURVEY.md §2 operator with its DuckDB oracle SQL.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-style pricing summary) on sf0.001."""
    import hdfs_mr_spark

    return hdfs_mr_spark.queries()["agg_groupby"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    import hdfs_mr_spark

    return hdfs_mr_spark.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each oracle-checkable query."""
    import hdfs_mr_spark

    return hdfs_mr_spark.oracles()
