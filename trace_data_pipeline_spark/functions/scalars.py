"""Scalar helpers (SURVEY.md §2.7).

The reference stores trade times as 'HH:MM:SS' strings and converts
them to seconds-after-midnight Int32
(`stage0/create_daily_enhanced_trace.py:128-163`); dates become tenors
via day-diff / 365.25 (`stage1/stage1_pipeline.py:374-375`). All are
pure column algebra — JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hhmmss_to_seconds(col: Column | str) -> Column:
    """'HH:MM:SS' string → seconds after midnight (null on parse failure).

    Mirrors `create_daily_enhanced_trace.py:128-163` including its
    null-on-invalid semantics (pandas `errors='coerce'`).
    """
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ":")
    valid = c.rlike(r"^\d{1,2}:\d{1,2}:\d{1,2}$")
    secs = (
        parts.getItem(0).cast("int") * 3600
        + parts.getItem(1).cast("int") * 60
        + parts.getItem(2).cast("int")
    )
    return F.when(valid, secs).otherwise(F.lit(None).cast("int"))


def seconds_after_midnight(ts: Column | str) -> Column:
    """Timestamp → seconds after midnight (int)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return (F.hour(c) * 3600 + F.minute(c) * 60 + F.second(c)).cast("int")


def round_ratio_half_up(numer: Column, denom: Column, scale: int) -> Column:
    """ROUND(numer/denom, scale) with exact decimal HALF_UP semantics in
    integer arithmetic: floor((2·N·10^s + D) / (2·D)) / 10^s.

    Needed where the true quotient can tie exactly at `scale` decimals
    (fixed-point sums over integer denominators — e.g. a mean of
    2-decimal prices over 8 trades): a float quotient then rounds
    differently per engine/partitioning. Both inputs must be exact
    integer columns (fixed-point sums), denom > 0, and 2·N·10^s must
    stay below 2^53 (the float division below is then exact enough that
    floor() can never land on the wrong side: the quotient is ≥ 1/(2·D)
    away from any integer it doesn't hit exactly).
    """
    s = 10**scale
    q = F.floor((numer * F.lit(2 * s) + denom) / (denom * F.lit(2)))
    return q.cast("double") / F.lit(float(s))


def years_between(later: Column | str, earlier: Column | str) -> Column:
    """Day difference / 365.25, the reference's tenor convention
    (`stage1/stage1_pipeline.py:374-375`)."""
    a = F.col(later) if isinstance(later, str) else later
    b = F.col(earlier) if isinstance(earlier, str) else earlier
    return F.datediff(a, b) / F.lit(365.25)
