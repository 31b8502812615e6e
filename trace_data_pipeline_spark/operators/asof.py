"""As-of (backward/forward) join (SURVEY.md §2.3 J11/J12).

The reference uses pandas ``merge_asof(direction='backward',
by=cusip)`` for amount-outstanding and rating histories
(`stage1/stage1_pipeline.py:714-759, 877-902`). Spark has no native
as-of join; the scalable pattern is union-the-two-sides + a
last-non-null window:

    left rows tagged 1, right rows tagged 0 (exact matches visible)
    window: partitionBy(by) orderBy(on, tag) rows(-inf, 0)
    value := last(value, ignorenulls=True) over window

One shuffle on `by`, no join explosion, no per-group pandas — it scales
to arbitrarily large right sides (rating histories at 100 TB), unlike
the `applyInPandas`+merge_asof alternative which would require both
sides of a group to fit in one task's memory.

Tie semantics match merge_asof's default ``allow_exact_matches=True``:
a right row AT the left timestamp is taken (right sorts before left at
equal keys). Pass allow_exact=False for strict '<'.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | Sequence[str],
    value_cols: Sequence[str],
    direction: str = "backward",
    allow_exact: bool = True,
) -> DataFrame:
    """For each left row, attach `value_cols` from the latest right row
    with right.on <= left.on (backward) or earliest >= (forward),
    matching within `by` groups."""
    by = [by] if isinstance(by, str) else list(by)
    value_cols = list(value_cols)
    for v in value_cols:
        if v in left.columns:
            raise ValueError(f"value column {v!r} already exists on left")

    left_tag, right_tag = (1, 0) if allow_exact else (0, 1)
    l_tagged = left.withColumn(_TAG, F.lit(left_tag))
    for v in value_cols:
        l_tagged = l_tagged.withColumn(v, F.lit(None).cast(right.schema[v].dataType))
    r_tagged = right.select(
        *[F.col(c) for c in by],
        F.col(on),
        F.lit(right_tag).alias(_TAG),
        *[F.col(v) for v in value_cols],
    )
    for c in left.columns:
        if c not in by and c != on and c not in value_cols:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(left.schema[c].dataType))

    unioned = l_tagged.unionByName(r_tagged)

    if direction == "backward":
        w = Window.partitionBy(*by).orderBy(F.col(on).asc(), F.col(_TAG).asc())
        pick = F.last
    elif direction == "forward":
        w = Window.partitionBy(*by).orderBy(F.col(on).desc(), F.col(_TAG).asc())
        pick = F.last
    else:
        raise ValueError(f"unknown direction {direction!r}")
    w = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    filled = unioned.select(
        *[c for c in unioned.columns if c not in value_cols],
        *[pick(F.col(v), ignorenulls=True).over(w).alias(v) for v in value_cols],
    )
    return filled.filter(F.col(_TAG) == left_tag).drop(_TAG)
