"""Structured Streaming surface: the daily trade-panel aggregation as a
continuous pipeline.

The reference is pure batch (SGE jobs, SURVEY.md §2.8), but its
incremental CUSIP-chunk processing is morally a bounded micro-batch
stream, and TRACE trades arrive late by design (as-of records,
trd_rpt_dt ≥ trd_exctn_dt) — so watermark + update-mode windowed
aggregation is the semantically faithful continuous form of A1/A2.

The builder is engine-agnostic: pass a batch DataFrame and it produces
the identical plan (window() works in both), which is how the tests
prove stream/batch equivalence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_event_panel(
    events: DataFrame,
    ts_col: str = "ts",
    id_col: str = "user_id",
    value_col: str = "value",
    watermark: str | None = "2 hours",
) -> DataFrame:
    """Per (id, day) panel: count / sum / min / max of value.

    On a streaming frame the watermark bounds state: windows older than
    the watermark close and late rows beyond it are dropped — the
    streaming analog of the reference's chunk-complete-then-export
    cycle. Sums use exact decimal accumulation so results are stable
    under any micro-batch arrival order (same discipline as the batch
    plans).
    """
    df = events
    if watermark is not None and df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    cents = F.round(F.col(value_col) * 100, 0).cast("long")
    return (
        df.groupBy(F.window(ts_col, "1 day").alias("w"), F.col(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(cents).alias("sum_cents"),
            F.min(value_col).alias("min_value"),
            F.max(value_col).alias("max_value"),
        )
        .select(
            F.col("w.start").cast("date").alias("day"),
            id_col,
            "n_events",
            (F.col("sum_cents").cast("double") / 100.0).alias("sum_value"),
            "min_value",
            "max_value",
        )
    )


def stream_events_from_dir(
    spark,
    path: str,
    schema,
    max_files_per_trigger: int = 1,
):
    """File-source stream over a directory of parquet drops — the
    pattern for replaying historical panels through the streaming
    pipeline (each file is a micro-batch)."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )
