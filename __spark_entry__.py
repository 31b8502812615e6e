"""Driver contract for the spark-graft builder (PySpark target).

Backed by trace_data_pipeline_spark.plans — each catalog entry pairs a
Spark plan builder with its DuckDB oracle SQL — every entry carries
one (sequential kernels fold into recursive CTEs); golden tests pin
the kernels besides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from trace_data_pipeline_spark.plans import get_catalog  # noqa: E402

SMOKE_SF_DIR = "/root/testdata/sf0.001"
FLAGSHIP = "a1_daily_panel"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: the daily price/volume panel (A1+A2)."""
    return get_catalog()[FLAGSHIP].builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: q.builder for name, q in get_catalog().items()}


def oracle_sql() -> dict[str, str]:
    return {name: q.oracle for name, q in get_catalog().items() if q.oracle is not None}
