"""Parallelism pinning for Python grouped-map stages.

AQE coalesces shuffle partitions by *bytes*
(`spark.sql.adaptive.advisoryPartitionSizeInBytes`), which is the
right proxy for JVM relational work but a terrible one for
`applyInPandas`: a 60 MB partition is "one task" to AQE yet seconds of
single-threaded pandas compute. Left alone, a 32-core machine runs the
whole grouped-map stage on 1-2 tasks. An explicit
``repartition(n, key)`` is user-specified, so AQE leaves it alone; the
grouped-map's required hash distribution is already satisfied and no
further exchange is inserted.

On a cluster the same reasoning holds: pin the Python stage's width to
the executor-core count (the session's shuffle-partition setting),
not to AQE's byte heuristic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_min_parallelism(df: DataFrame, num_partitions: int | None = None) -> DataFrame:
    """Widen a narrow scan before CPU-heavy derivation (tokenize,
    shingle, hash, vector math).

    A small compressed parquet file yields one input split, so every
    downstream expression runs single-threaded regardless of core
    count. Round-robin repartition IFF the scan is narrower than the
    target; at production scale the scan already exceeds it and this is
    a no-op — no shuffle is ever forced onto an already-wide scan.

    Width is estimated from ``df.inputFiles()`` (driver-side file
    listing, no job): files >= target means at least that many splits.
    The earlier ``df.rdd.getNumPartitions()`` probe forced a full
    plan→RDD conversion on EVERY call — a measurable per-query toll.
    A multi-gigabyte single file is under-counted (it would split by
    ``spark.sql.files.maxPartitionBytes``), costing one avoidable
    shuffle — acceptable, since at that size the downstream CPU work
    the widening feeds dwarfs it.
    """
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    try:
        width = len(df.inputFiles())
    except Exception:  # non-file-backed plan — assume narrow
        width = 0
    if width >= num_partitions:
        return df
    return df.repartition(num_partitions)


def pin_group_parallelism(
    df: DataFrame, *keys: str, num_partitions: int | None = None
) -> DataFrame:
    """Hash-repartition ``df`` by ``keys`` into an AQE-proof explicit
    partition count, sized for a following CPU-bound grouped map."""
    if num_partitions is None:
        num_partitions = int(
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32")
        )
    return df.repartition(num_partitions, *keys)
