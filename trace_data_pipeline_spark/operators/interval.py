"""Interval / range join (SURVEY.md §2.3 J15).

The reference maps SIC codes into Fama-French [sic_low, sic_high]
ranges (`stage1/helper_functions.py:435-455`), with unmatched/null
falling to an "Other" bucket. In Spark this is a non-equi join; against
a small broadcast range table Catalyst plans BroadcastNestedLoopJoin,
which is the right physical strategy when |ranges| is tiny and the fact
side is huge — no shuffle of the fact table at all.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join(
    facts: DataFrame,
    value: Column | str,
    ranges: DataFrame,
    lo_col: str,
    hi_col: str,
    payload_cols: Sequence[str],
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Left range join: attach `payload_cols` from the range row where
    lo <= value <= hi; missing / null value → `defaults` (the
    reference's industry-17/30 "Other" fallback)."""
    v = F.col(value) if isinstance(value, str) else value
    r = F.broadcast(ranges.select(lo_col, hi_col, *payload_cols))
    cond = (v >= r[lo_col]) & (v <= r[hi_col])
    # drop the RANGE side's bound columns by reference, not by name —
    # a name-based drop would also destroy a same-named facts column
    # (round-12 review)
    out = facts.join(r, cond, "left").drop(r[lo_col]).drop(r[hi_col])
    for c, d in (defaults or {}).items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(d)))
    return out
