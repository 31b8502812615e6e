"""Streaming sinks: exactly-once parquet via foreachBatch.

Structured Streaming's file sink is append-only; pipelines that need
upserts or engine-specific writers use foreachBatch. Delivery is
at-least-once per micro-batch, so the write must be idempotent in
batch_id: writing each batch to its own `batch_id=N` directory with
overwrite makes a replayed batch rewrite the same files instead of
duplicating rows — the standard exactly-once recipe without a
transactional table format."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def idempotent_parquet_writer(out_dir: str):
    """foreachBatch callback: per-batch-id overwrite partition."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        (
            df.withColumn("_batch_id", F.lit(batch_id))
            .write.mode("overwrite")
            .parquet(f"{out_dir}/batch_id={batch_id}")
        )

    return write_batch
