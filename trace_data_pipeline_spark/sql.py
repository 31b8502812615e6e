"""SQL surface: register the driver tables and every catalog query as
temp views, so the whole engine is reachable from `spark.sql(...)` —
the API-completeness path for users who query rather than compose
DataFrames.

Query views are lazy logical plans (no materialization): Catalyst
inlines them, so `spark.sql("SELECT ... FROM w1_decimal_shift WHERE
...")` still gets predicate pushdown into the underlying scans.

One documented exception: `a1s_streaming_daily_panel` has no lazy
form — building its view runs the streaming replay once per
(application, sf_dir); subsequent registrations hit the memo
(`plans/streaming_parity.py`).
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from trace_data_pipeline_spark.plans import get_catalog
from trace_data_pipeline_spark.sources import TABLES, load_table


def register_views(
    spark: SparkSession, sf_dir: str, include_queries: bool = True
) -> list[str]:
    """Create temp views for the base tables (and, optionally, every
    catalog query). Returns the view names registered."""
    names = []
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
        names.append(t)
    if include_queries:
        for name, q in get_catalog().items():
            q.builder(spark, sf_dir).createOrReplaceTempView(name)
            names.append(name)
    return names
