"""Driver contract for the spark-graft builder (PySpark target).

Exposes the engine's query registry (gmall_flink_210726_spark/registry.py):
- ``entry(spark)``   — flagship query smoke check at sf0.001.
- ``queries()``      — every implemented operator as (spark, sf_dir) -> DataFrame.
- ``oracle_sql()``   — DuckDB-equivalent ANSI SQL per query (omitted only
  for genuinely non-SQL-expressible ops).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from gmall_flink_210726_spark.registry import load_all  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    specs = load_all()
    return specs["a1_event_stats_tumble10m"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in load_all().items() if spec.oracle}
