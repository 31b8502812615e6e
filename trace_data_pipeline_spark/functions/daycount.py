"""Day-count accrual fractions (reference: `stage1/helper_functions.py`
day_count_basis ∈ {30/360, ACT/ACT, ACT/360, ACT/365} fed to QuantLib,
`SURVEY.md` W10 row).

All four bases are pure date/integer column algebra — no UDF, fully
codegen'd, and bit-exact against any engine that does the same integer
math (each division has exact integer operands, so the double result
is correctly rounded and identical everywhere).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def thirty_360_us(start: Column, end: Column) -> Column:
    """30/360 US (NASD): d1 clipped to 30; d2 clipped to 30 only when
    d1 (after clipping) is 30 and d2 is 31."""
    d1 = F.least(F.dayofmonth(start), F.lit(30))
    d2 = F.when(
        (F.dayofmonth(end) == 31) & (d1 == 30), F.lit(30)
    ).otherwise(F.dayofmonth(end))
    days = (
        (F.year(end) - F.year(start)) * 360
        + (F.month(end) - F.month(start)) * 30
        + (d2 - d1)
    )
    return days.cast("double") / F.lit(360.0)


def act_360(start: Column, end: Column) -> Column:
    return F.datediff(end, start).cast("double") / F.lit(360.0)


def act_365(start: Column, end: Column) -> Column:
    return F.datediff(end, start).cast("double") / F.lit(365.0)


def act_act_isda(start: Column, end: Column) -> Column:
    """ACT/ACT ISDA: actual days falling in each calendar year divided
    by that year's actual length (366 in leap years), summed over the
    years the period touches. The year loop is a sequence aggregate —
    bounded by the period's year span, still pure column algebra."""
    return F.aggregate(
        F.sequence(F.year(start), F.year(end)),
        F.lit(0.0),
        lambda acc, y: acc
        + F.greatest(
            F.lit(0),
            F.datediff(
                F.least(end, F.make_date(y + 1, F.lit(1), F.lit(1))),
                F.greatest(start, F.make_date(y, F.lit(1), F.lit(1))),
            ),
        ).cast("double")
        / F.when(
            ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0), F.lit(366.0)
        ).otherwise(F.lit(365.0)),
    )


def coupon_bracket(
    settle: Column, maturity: Column, period_months: Column, max_periods: int = 250
) -> tuple[Column, Column]:
    """(last, next) coupon dates around settlement, from the backward
    schedule anchored at maturity (the reference's QuantLib
    `Schedule(..., DateGeneration.Backward)`). Closed form, O(1) per
    row: the bracketing period index is `months_between/period` up to a
    sub-month day-of-month error, so probing the four indices around
    `floor(months_between(maturity, settle)/pm)` always contains the
    true bracket (mm/pm lies in (j_last-1-1/pm, j_last+1/pm], hence
    j_last ∈ {j0..j0+2} and j_next = j_last-1 ≥ j0-1). Out-of-range
    probes clamp to the schedule bounds [0, max_periods] — extra
    *valid* schedule dates can never displace a max(≤settle)/min(>settle)
    selection, and the clamp reproduces the bounded-schedule null
    semantics (settle before D(max_periods) → last=null, next=earliest
    generated date). Callers keep maturity day-of-month <= 28 so
    month-end clamping never differs between engines."""
    j0 = F.floor(F.months_between(maturity, settle) / period_months).cast("int")
    js = F.transform(
        F.array(F.lit(-1), F.lit(0), F.lit(1), F.lit(2)),
        lambda dj: F.greatest(F.lit(0), F.least(F.lit(max_periods), j0 + dj)),
    )
    dates = F.transform(js, lambda j: F.add_months(maturity, -(period_months * j)))
    last_cpn = F.array_max(F.filter(dates, lambda d: d <= settle))
    next_cpn = F.array_min(F.filter(dates, lambda d: d > settle))
    return last_cpn, next_cpn


def dcf_by_basis(basis: Column, start: Column, end: Column) -> Column:
    """Per-row day-count routing (reference:
    `stage1/helper_functions.py:83-93` mapping day_count_basis to a
    QuantLib day counter): '30/360' or '' → 30/360 US bond basis,
    'ACT/ACT' → ACT/ACT ISDA, 'ACT/360', and 'ACT/365'/'ACT/366' →
    ACT/365 fixed. Pure column algebra — the CASE costs nothing and
    every branch is the bit-exact engine-portable fraction."""
    return (
        F.when(basis.isin("30/360", ""), thirty_360_us(start, end))
        .when(basis == "ACT/ACT", act_act_isda(start, end))
        .when(basis == "ACT/360", act_360(start, end))
        .when(basis.isin("ACT/365", "ACT/366"), act_365(start, end))
    )


import datetime as _dt
import functools as _functools

_EPOCH = _dt.date(1970, 1, 1).toordinal()
# bit-test masks for word positions 0..63 as SIGNED 64-bit literals
# (1 << 63 is the long sign bit)
_BIT_MASKS = [(1 << i) if i < 63 else -(1 << 63) for i in range(64)]


@_functools.lru_cache(maxsize=8)
def _holiday_bitset(holidays: tuple) -> tuple[int, int, tuple[int, ...]]:
    """(first epoch-day, span length, packed 64-bit words) for a
    holiday set — the closure calendar as a bitmap over days."""
    days = sorted(d.toordinal() - _EPOCH for d in holidays)
    lo, hi = days[0], days[-1]
    n = hi - lo + 1
    words = [0] * ((n + 63) >> 6)
    for day in days:
        i = day - lo
        words[i >> 6] |= 1 << (i & 63)
    # keep the sign-bit representation consistent with _BIT_MASKS
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    return lo, n, tuple(words)


def add_business_days(start: Column, n: int = 2) -> Column:
    """Trade date + n business days (weekend roll only — the reference's
    T+2 settlement uses the NYSE calendar; holiday lists join in via
    the F9 calendar semi-join when exact parity with it matters).
    dayofweek: 1=Sunday..7=Saturday. Bounded fold, pure column algebra."""
    d = start
    for _ in range(n):
        d = F.date_add(d, 1)
        # land on Sat -> +2, Sun -> +1
        d = F.when(F.dayofweek(d) == 7, F.date_add(d, 2)).otherwise(
            F.when(F.dayofweek(d) == 1, F.date_add(d, 1)).otherwise(d)
        )
    return d
