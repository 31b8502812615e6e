"""Bucketed storage for shuffle-free co-located joins.

The reference keys its whole pipeline on ``cusip_id`` and processes
250-CUSIP chunks in a driver loop (`create_daily_enhanced_trace.py:
491-756`), re-reading and re-merging per chunk. The Spark-native
posture is to make that layout a *storage property*: write the hot
fact/intermediate tables bucketed (and sorted) by the join key once,
and every later equi-join or aggregation on that key runs with NO
exchange on the bucketed side — at 100 TB that deletes the dominant
shuffle from every stage-1 enrichment join.

Local mode uses the in-memory session catalog; on a cluster the same
calls target the metastore. Bucket counts should be sized so one
bucket ≈ one task's worth of data at the target SF (e.g. 100 TB /
512 MB ≈ 200k buckets is too many files — prefer 4-16k buckets and
let multiple tasks read a bucket's row groups).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    bucket_cols: list[str],
    num_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist ``df`` as a parquet table bucketed by ``bucket_cols``.

    ``sort_cols`` additionally sorts within each bucket file, which
    lets downstream sort-merge joins skip the per-partition sort too.
    """
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(num_buckets, *bucket_cols)
    )
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(name)


def bucketed_join(
    spark: SparkSession,
    left_name: str,
    right_name: str,
    on: list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables bucketed on ``on``; plan carries no Exchange."""
    return spark.table(left_name).join(spark.table(right_name), on=on, how=how)


def exchanges_in_plan(df: DataFrame) -> int:
    """Count shuffle exchanges in the physical plan (test/diagnostic)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )
