"""Pure-Python port of the reference's QuantLib bond contract.

The reference prices every trade through ``GetNewVarsPy``
(`stage1/helper_functions.py:44-255`): build a QuantLib
ZeroCouponBond / FixedRateBond from the FISD row, solve the compounded
yield off the clean price at T+2 settlement, and emit the 9-output
record (ytm, prclean, prfull, acclast, accpmt, accall, Macaulay /
modified duration, convexity). QuantLib is a native black box this
container doesn't ship, so this module re-implements that contract in
pure Python — schedule generation, day counts, stepwise compounded
discounting, accrued interest, the duration/convexity definitions, and
the branch logic — as an in-test oracle for the Spark engine
(`operators/bond_record.py::attach_full_record` and the w10h stub
path).

Fidelity notes (all behaviors below mirror public QuantLib semantics,
re-derived from its documented API, not copied code):

- Schedule: ``ql.Schedule(dated, maturity, Period(freq), calendar,
  ModifiedFollowing, ModifiedFollowing, DateGeneration.Backward,
  False)`` — dates are maturity - k*tenor (month arithmetic with
  day-of-month clamping), a short first stub is prepended when the
  dated date is off the grid, and every date is business-day adjusted.
- Calendar: parameterized. Every calendar-touching function takes a
  ``holidays`` set; empty (the default) is the weekend-only roll the
  pre-r16 differential grids were restricted to, and
  ``frozenset(functions.nyse_calendar.nyse_holidays(...))`` reproduces
  the reference's ql.UnitedStates(NYSE) — T+2 settlement advance and
  ModifiedFollowing schedule adjustment both route through it, so the
  r16 grids extend to holiday-adjacent settlements and holiday-moved
  schedule dates.
- Discounting: QuantLib's ``CashFlows::npv(leg, InterestRate(y, dcc,
  Compounded, freq))`` accumulates time STEPWISE — each cash flow's
  discount time is the day-count fraction from the previous flow (or
  from settlement, as coupon-period remainder for the first one), and
  factors multiply. Durations/convexity use the same stepwise times.
- Coupon amounts: ``rate * dcf(accrual_start, accrual_end) * 100`` per
  QuantLib's FixedRateLeg — under ACT bases a "regular" coupon is NOT
  rate/m (e.g. ACT/360 semiannual pays ~rate*181/360); this is the one
  axis where the engine's uniform rate/m model deviates (quantified by
  the bounded differential in test_reference_differential.py).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from datetime import date, timedelta

ONE_DAY = timedelta(days=1)


# ---------------------------------------------------------------- calendar
# Every calendar function takes an optional holiday set; empty = the
# weekend-only calendar the pre-r16 differential grid was restricted
# to, the NYSE closure set = the reference's ql.UnitedStates(NYSE).
NO_HOLIDAYS: frozenset[date] = frozenset()


def is_business_day(d: date, holidays: frozenset[date] = NO_HOLIDAYS) -> bool:
    return d.weekday() < 5 and d not in holidays


def adjust_mf(d: date, holidays: frozenset[date] = NO_HOLIDAYS) -> date:
    """ModifiedFollowing: next business day, unless that crosses a
    month boundary — then the previous business day."""
    f = d
    while not is_business_day(f, holidays):
        f += ONE_DAY
    if f.month != d.month:
        f = d
        while not is_business_day(f, holidays):
            f -= ONE_DAY
    return f


def advance_business_days(
    d: date, n: int, holidays: frozenset[date] = NO_HOLIDAYS
) -> date:
    """QuantLib ``calendar.advance(d, n, Days, ...)``: n business-day
    steps (the convention argument is moot — the result is already a
    business day)."""
    out = d
    for _ in range(n):
        out += ONE_DAY
        while not is_business_day(out, holidays):
            out += ONE_DAY
    return out


# ------------------------------------------------------------- date algebra
def _days_in_month(y: int, m: int) -> int:
    if m == 12:
        return 31
    return (date(y, m + 1, 1) - date(y, m, 1)).days


def add_months(d: date, k: int) -> date:
    """Month arithmetic with day-of-month clamping (QuantLib
    ``Date + Period(k, Months)`` and Spark ``add_months`` agree on
    day-of-month <= 28, which the test grids keep to)."""
    y, m = divmod(d.year * 12 + (d.month - 1) + k, 12)
    m += 1
    return date(y, m, min(d.day, _days_in_month(y, m)))


# --------------------------------------------------------------- day counts
def _is_leap(y: int) -> bool:
    return (y % 4 == 0 and y % 100 != 0) or y % 400 == 0


def dcf(basis: str, start: date, end: date) -> float:
    """Day-count fraction, mirroring the reference's basis routing
    (`stage1/helper_functions.py:83-93`): 30/360 US bond basis,
    ACT/ACT ISDA, ACT/360, ACT/365 fixed."""
    if basis in ("30/360", ""):
        d1 = min(start.day, 30)
        d2 = 30 if (end.day == 31 and d1 == 30) else end.day
        return (
            (end.year - start.year) * 360
            + (end.month - start.month) * 30
            + (d2 - d1)
        ) / 360.0
    if basis == "ACT/ACT":
        if end <= start:
            return 0.0 if end == start else -dcf(basis, end, start)
        total = 0.0
        for y in range(start.year, end.year + 1):
            seg = (
                min(end, date(y + 1, 1, 1)) - max(start, date(y, 1, 1))
            ).days
            if seg > 0:
                total += seg / (366.0 if _is_leap(y) else 365.0)
        return total
    if basis == "ACT/360":
        return (end - start).days / 360.0
    if basis in ("ACT/365", "ACT/366"):
        return (end - start).days / 365.0
    raise ValueError(f"invalid day_count_basis {basis!r}")


# ----------------------------------------------------------------- schedule
def backward_schedule(
    dated: date,
    maturity: date,
    period_months: int,
    adjust: bool = True,
    holidays: frozenset[date] = NO_HOLIDAYS,
) -> list[date]:
    """QuantLib ``Schedule(..., DateGeneration.Backward,
    endOfMonth=False)``: unadjusted dates are maturity - k*tenor for
    k = 0, 1, ...; generation stops at the first date <= dated; the
    dated date is prepended when the grid misses it (short first
    stub); then every date is ModifiedFollowing-adjusted."""
    dates = [maturity]
    k = 1
    while True:
        d = add_months(maturity, -period_months * k)
        if d < dated:
            break
        dates.append(d)
        if d == dated:
            break
        k += 1
    if dates[-1] != dated:
        dates.append(dated)
    dates.reverse()
    if adjust:
        dates = [adjust_mf(d, holidays) for d in dates]
        # adjustment can collapse neighbours; dedupe preserving order
        out = [dates[0]]
        for d in dates[1:]:
            if d != out[-1]:
                out.append(d)
        dates = out
    return dates


# ------------------------------------------------------------ bond + record
@dataclass
class Flow:
    """One leg cash flow. Coupons carry their accrual period; the
    redemption has accrual_start None."""

    pay: date
    amount: float
    accrual_start: date | None = None
    accrual_end: date | None = None


def fixed_rate_leg(
    schedule: list[date], rate: float, basis: str, face: float = 100.0
) -> list[Flow]:
    flows = [
        Flow(
            pay=schedule[i],
            amount=face * rate * dcf(basis, schedule[i - 1], schedule[i]),
            accrual_start=schedule[i - 1],
            accrual_end=schedule[i],
        )
        for i in range(1, len(schedule))
    ]
    flows.append(Flow(pay=schedule[-1], amount=face))
    return flows


def _stepwise_times(
    flows: list[Flow], settle: date, basis: str
) -> list[float]:
    """Cumulative discount times per QuantLib's stepwise accumulation:
    flow i's incremental time is dcf(previous flow date, flow date);
    the first coupon mid-period contributes its REMAINING fraction
    dcf(accrual_start, pay) - dcf(accrual_start, settle)."""
    times: list[float] = []
    t = 0.0
    last = settle
    for f in flows:
        if f.accrual_start is not None and last != f.accrual_start:
            step = dcf(basis, f.accrual_start, f.pay) - dcf(
                basis, f.accrual_start, last
            )
        else:
            step = dcf(basis, last, f.pay)
        t += step
        times.append(t)
        last = f.pay
    return times


def npv(flows: list[Flow], times: list[float], y: float, m: int) -> float:
    """PV of the leg at nominal yield y compounded m times/year. PV
    grows without bound as (1 + y/m) -> 0+; a float overflow deep in
    the bisection bracket (long monthly legs probed at the -0.999*m
    endpoint) is the MATHEMATICAL +inf, not a solver failure — so
    saturate instead of letting OverflowError abort the solve (it is
    an ArithmeticError subclass and would wrongly take the NaN exit
    for bonds QuantLib prices fine, e.g. forward-dated issues)."""
    try:
        return sum(
            f.amount * (1.0 + y / m) ** (-t * m)
            for f, t in zip(flows, times)
        )
    except OverflowError:
        return float("inf")


def solve_yield(
    flows: list[Flow],
    times: list[float],
    dirty: float,
    m: int,
    lo: float | None = None,
    hi: float | None = None,
    tol: float = 1e-12,
) -> float:
    """Bisection to machine tolerance (QuantLib uses a guarded Newton
    at 1e-10; both converge to the same unique root of the monotone
    PV). The root exists for any positive dirty price on the open
    domain (1 + y/m) > 0 — deeply negative yields (short stubs priced
    far above the remaining flows) are genuine solutions, not solver
    failures. The default hi bracket is +10 PER PERIOD (10*m nominal)
    — the engine solver's upper clamp — so both sides take the NaN
    exit together beyond it; QuantLib's auto-expanding Brent would
    chase arbitrarily large roots (deep discounts days from maturity
    annualize without bound), and a FIXED nominal ceiling below the
    clamp (the pre-r16 12.0) wrongly NaN'd semiannual roots the
    engine reports (caught by the random dated-schedule
    differential)."""
    if lo is None:
        lo = -0.999 * m
    if hi is None:
        hi = 10.0 * m
    f_lo = npv(flows, times, lo, m) - dirty
    f_hi = npv(flows, times, hi, m) - dirty
    if not (f_lo > 0 > f_hi):
        raise ArithmeticError("yield not bracketed")
    for _ in range(200):
        mid = 0.5 * (lo + hi)
        f_mid = npv(flows, times, mid, m) - dirty
        if abs(f_mid) < tol or (hi - lo) < 1e-15:
            return mid
        if f_mid > 0:
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def record_from_flows(
    flows: list[Flow],
    times: list[float],
    clean: float,
    accrued: float,
    m: int,
) -> dict:
    """Solve + the 9-output record off an assembled leg."""
    dirty = clean + accrued
    y = solve_yield(flows, times, dirty, m)
    p = npv(flows, times, y, m)
    mac = (
        sum(
            f.amount * t * (1.0 + y / m) ** (-t * m)
            for f, t in zip(flows, times)
        )
        / p
    )
    mod = mac / (1.0 + y / m)
    conv = (
        sum(
            f.amount
            * t
            * (t + 1.0 / m)
            * (1.0 + y / m) ** (-t * m - 2)
            for f, t in zip(flows, times)
        )
        / p
    )
    return {
        "ytm": y,
        "prclean": p - accrued,
        "prfull": p,
        "acclast": accrued,
        "mac_dur": mac,
        "mod_dur": mod,
        "convexity": conv,
    }


NAN_RECORD = {
    k: float("nan")
    for k in (
        "ytm",
        "prclean",
        "prfull",
        "acclast",
        "accpmt",
        "accall",
        "mac_dur",
        "mod_dur",
        "convexity",
    )
}


def get_new_vars_contract(
    pr: float,
    coupon: float,
    coupon_type: str,
    interest_frequency: str,
    day_count_basis: str,
    maturity: date,
    trd_exctn_dt: date,
    dated_date: date | None,
    offering_date: date,
    holidays: frozenset[date] = NO_HOLIDAYS,
) -> dict:
    """The full GetNewVarsPy branch logic
    (`stage1/helper_functions.py:44-255`), returning the 9-output
    record (NaN-filled on the reference's bond-is-None / pre-maturity /
    solver-failure exits) plus the settlement date under ``"settle"``.
    Pass ``holidays=frozenset(nyse_holidays(...))`` for the reference's
    ql.UnitedStates(NYSE) calendar — settlement advance AND every
    schedule adjustment route through it."""
    start = dated_date if dated_date is not None else offering_date
    settle = advance_business_days(trd_exctn_dt, 2, holidays)

    # interest frequency mapping (helper_functions.py:96-111)
    freq_map = {"1": 1, "2": 2, "4": 4, "12": 12}
    if interest_frequency in freq_map:
        m = freq_map[interest_frequency]
    elif interest_frequency in ("0", "99"):
        m = 2 if (coupon is not None and coupon > 0 and not math.isnan(coupon)) else 0
    else:
        raise ValueError(f"invalid interest_frequency {interest_frequency!r}")

    coupon_missing = coupon is None or math.isnan(coupon)
    is_zero = coupon_type == "Z" or (
        coupon_type == "F" and (coupon_missing or coupon == 0) and pr < 100.0
    )

    out = dict(NAN_RECORD)
    out["settle"] = settle
    if not (settle < maturity and math.isfinite(pr)):
        return out

    if is_zero:
        # ZeroCouponBond: one redemption at the payment-adjusted
        # maturity; accrued 0; yield at annual compounding. A maturity
        # that MF-rolls BACKWARD to/under settlement leaves no live
        # cash flow — QuantLib's bondYield throws on the empty leg and
        # the reference's except returns the NaN record.
        pay = adjust_mf(maturity, holidays)
        if pay <= settle:
            return out
        flows = [Flow(pay=pay, amount=100.0)]
        times = [dcf(day_count_basis, settle, pay)]
        try:
            rec = record_from_flows(flows, times, pr, 0.0, 1)
        except ArithmeticError:
            return out
        out.update(rec)
        out["accpmt"] = 0.0
        out["accall"] = out["acclast"]
        return out

    if coupon_type == "F" and not coupon_missing and coupon > 0 and m >= 1:
        rate = coupon / 100.0
        schedule = backward_schedule(start, maturity, 12 // m, holidays=holidays)
        flows = fixed_rate_leg(schedule, rate, day_count_basis)
        # accrued at settlement: the coupon whose accrual period
        # contains settlement, accrued from its start (QuantLib
        # Bond::accruedAmount)
        accrued = 0.0
        for f in flows:
            if (
                f.accrual_start is not None
                and f.accrual_start < settle <= f.accrual_end
            ):
                # settle == accrual_end means the coupon pays today:
                # accruedAmount is 0 (the NEXT period has accrued
                # nothing), matching QuantLib's ex-coupon-free logic
                if settle != f.accrual_end:
                    accrued = 100.0 * rate * dcf(
                        day_count_basis, f.accrual_start, settle
                    )
        accpmt = sum(f.amount for f in flows if f.pay <= settle)
        remaining = [f for f in flows if f.pay > settle]
        times = _stepwise_times(remaining, settle, day_count_basis)
        try:
            rec = record_from_flows(remaining, times, pr, accrued, m)
        except ArithmeticError:
            return out
        out.update(rec)
        out["accpmt"] = accpmt
        out["accall"] = out["acclast"] + accpmt
        return out

    # bond is None
    return out
