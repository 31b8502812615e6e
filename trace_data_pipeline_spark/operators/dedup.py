"""Order-aware dedup & source preference (SURVEY.md §2.3 J17, §2.6 O5).

pandas `sort + drop_duplicates(keep='first')` is order-dependent; the
deterministic Spark equivalent is row_number over a window with the
FULL ordering key, keeping rank 1. The source-preference dedup
(Enhanced ≻ Standard ≻ 144A, `stage1/stage1_pipeline.py:205-255`)
is the same pattern with the priority as the leading sort key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def keep_first(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[Column | str],
) -> DataFrame:
    """Per `keys` group keep the single row that sorts first by
    `order_by` (must be a total order within the group for determinism)."""
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_by]
    )
    rn = "__rn"
    return df.withColumn(rn, F.row_number().over(w)).filter(F.col(rn) == 1).drop(rn)


def prefer_sources(
    sources: Sequence[tuple[DataFrame, int]],
    keys: Sequence[str],
    tiebreak: Sequence[str] = (),
    priority_col: str = "db_type",
) -> DataFrame:
    """J17: union sources tagged with a priority; per key keep the row
    from the highest-priority (lowest number) source."""
    tagged = [df.withColumn(priority_col, F.lit(p)) for df, p in sources]
    unioned = tagged[0]
    for t in tagged[1:]:
        unioned = unioned.unionByName(t)
    order = [F.col(priority_col), *[F.col(c) for c in tiebreak]]
    return keep_first(unioned, keys, order)
