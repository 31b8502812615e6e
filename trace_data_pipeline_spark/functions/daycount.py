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


def is_session_col(d: Column, holidays: Column) -> Column:
    """True when `d` is a trading session: a weekday not contained in
    `holidays` (an array<date> literal — dimension-sized, bind it ONCE
    per plan with F.lit(list) and reuse the column). The AND is
    row-lazy, so weekend probes never pay the array scan."""
    return (~F.dayofweek(d).isin(1, 7)) & ~F.array_contains(holidays, d)


def roll_fwd_col(d: Column, holidays: Column, max_steps: int = 6) -> Column:
    """First session >= d (QuantLib's Following). A lazily-evaluated
    CASE probe: the common weekday row costs ONE holiday lookup; the
    bound of 6 exceeds the longest observed consecutive-closure run on
    the NYSE calendar (4: Hurricane Sandy's Mon-Tue after a weekend)."""
    c = F.when(is_session_col(d, holidays), d)
    for k in range(1, max_steps + 1):
        dk = F.date_add(d, k)
        c = c.when(is_session_col(dk, holidays), dk)
    return c.otherwise(F.date_add(d, max_steps + 1))


def roll_bwd_col(d: Column, holidays: Column, max_steps: int = 6) -> Column:
    """First session <= d (QuantLib's Preceding)."""
    c = F.when(is_session_col(d, holidays), d)
    for k in range(1, max_steps + 1):
        dk = F.date_sub(d, k)
        c = c.when(is_session_col(dk, holidays), dk)
    return c.otherwise(F.date_sub(d, max_steps + 1))


def adjust_mf_col(d: Column, holidays: Column) -> Column:
    """ModifiedFollowing against the holiday-array calendar: next
    session, unless that crosses a month boundary — then the previous
    session (QuantLib's payment/termination convention the reference
    passes throughout `stage1/helper_functions.py:125-152`). A <= 7-day
    forward roll can never land in the same month of a different year,
    so the month() equality is the full crossing test. Pure column
    algebra — the array-join twin for fact-side adjustment is
    `operators/temporal.py::modified_following_calendar`; this form
    exists so PER-FLOW schedule dates inside array lambdas can adjust
    without exploding the fact table."""
    fwd = roll_fwd_col(d, holidays)
    return F.when(F.month(fwd) == F.month(d), fwd).otherwise(
        roll_bwd_col(d, holidays)
    )


def add_business_days_cal(start: Column, n: int, holidays: Column) -> Column:
    """Trade date + n sessions against the holiday-array calendar —
    QuantLib `calendar.advance(d, n, Days)` (T+2 settlement,
    `stage1/helper_functions.py:74`): n strict next-session steps."""
    d = start
    for _ in range(n):
        d = roll_fwd_col(F.date_add(d, 1), holidays)
    return d


def dcf_by_basis_signed(basis: Column, start: Column, end: Column) -> Column:
    """dcf_by_basis extended to reversed spans. 30/360's signed formula
    and the flat ACT datediff quotients are ALREADY correct for
    end < start (and 30/360's day-clipping is argument-asymmetric, so
    swapping would change it); only the ACT/ACT ISDA year-segment sum —
    which clamps reversed segments to zero — needs the antisymmetric
    extension. Needed for the stepwise first-flow time when settlement
    precedes the first accrual start (a trade before the dated date):
    t1 = dcf(start, pay) - dcf(start, settle) with a NEGATIVE second
    term."""
    return F.when(
        (basis == "ACT/ACT") & (end < start), -act_act_isda(end, start)
    ).otherwise(dcf_by_basis(basis, start, end))


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
