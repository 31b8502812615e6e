"""Table registry over the driver's parquet test tables.

Mirrors the reference's scan layer (SURVEY.md §2.1 S1–S5): explicit
declared schemas, filters expressed on the DataFrame so Catalyst pushes
them into the parquet scan (the reference embeds them in SQL text —
`stage0/create_daily_enhanced_trace.py:499-508`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS). Spark <=4.0 only reads it
        # with the legacy nanosAsLong conf (raw long nanos we truncate to
        # microseconds ourselves — `div` keeps the quotient integral; `/`
        # promotes to double whose 2^53 mantissa misrounds epoch-ns by
        # 1us). Spark >=4.1 reads NANOS natively as TIMESTAMP_NTZ with the
        # same truncation DuckDB's ns->us cast applies, and ignores the
        # conf — branch on the schema that actually comes back.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        ts_type = dict(df.dtypes)["ts"]
        if ts_type == "bigint":
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}
