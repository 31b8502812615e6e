"""Vectorized numpy schedule engine for the quantlib-model bond record.

The r16 default record (NYSE-calendar settlement, ModifiedFollowing
per-date adjustment, per-flow rate*dcf amounts, stepwise times) was
first built as Catalyst column algebra — a `transform` lambda per
schedule date. Higher-order functions are INTERPRETED row-at-a-time,
and every calendar probe paid either an O(|holidays|) boxed
array_contains scan or (bitset-as-literal) a multi-megabyte expression
tree, putting w10e at 17-21 s for 150k rows at sf0.1. This module
moves the ENTIRE schedule derivation into the Arrow kernel as
vectorized int64 matrix arithmetic: civil-date conversions via the
standard public-domain days_from_civil/civil_from_days algorithms,
month arithmetic with day-of-month clamping (Spark add_months /
DuckDB INTERVAL semantics), the packed holiday BITSET probed with
numpy gathers, and the four day-count bases as exact integer ratios.

Parity posture: every day count is a ratio of exact integers, and the
date arithmetic is integer-only — so engine/oracle agreement reduces
to INTEGER equality, engine-independent by construction. Sum orders
mirror the DuckDB oracle's list folds (np.cumsum and ascending-year
ACT/ACT loops are the same left folds). The only floating transcends
are the solver's pow() calls, shared with the whole W10 family.

The reference's own shape is the same: QuantLib builds these
schedules in C++ per row behind an `itertuples` loop
(`stage1/helper_functions.py:44-255`); this kernel is that per-row
native engine, Arrow-batched and vectorized.
"""

from __future__ import annotations

import numpy as np

from trace_data_pipeline_spark.functions.daycount import (
    _BIT_MASKS,  # noqa: F401  (shared representation notes)
    _holiday_bitset,
)

# ------------------------------------------------------------------ dates

_DIM = np.array([31, 28, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31])


def days_to_civil(z):
    """Epoch-day int64 array -> (year, month, day) int64 arrays
    (public-domain civil-from-days algorithm)."""
    z = np.asarray(z, dtype=np.int64) + 719468
    era = np.floor_divide(z, 146097)
    doe = z - era * 146097
    yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
    y = yoe + era * 400
    doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
    mp = (5 * doy + 2) // 153
    d = doy - (153 * mp + 2) // 5 + 1
    m = np.where(mp < 10, mp + 3, mp - 9)
    y = np.where(m <= 2, y + 1, y)
    return y, m, d


def civil_to_days(y, m, d):
    """(year, month, day) int64 arrays -> epoch-day int64 array
    (public-domain days-from-civil algorithm)."""
    y = np.asarray(y, dtype=np.int64)
    m = np.asarray(m, dtype=np.int64)
    d = np.asarray(d, dtype=np.int64)
    y2 = np.where(m <= 2, y - 1, y)
    era = np.floor_divide(y2, 400)
    yoe = y2 - era * 400
    mp = np.where(m > 2, m - 3, m + 9)
    doy = (153 * mp + 2) // 5 + d - 1
    doe = yoe * 365 + yoe // 4 - yoe // 100 + doy
    return era * 146097 + doe - 719468


def _is_leap(y):
    return ((y % 4 == 0) & (y % 100 != 0)) | (y % 400 == 0)


def days_in_month(y, m):
    dim = _DIM[np.asarray(m, dtype=np.int64) - 1]
    return np.where((m == 2) & _is_leap(y), 29, dim)


def add_months_days(z, k):
    """Spark add_months / DuckDB `- INTERVAL n MONTH` semantics over
    epoch-day arrays: month index shifts, day-of-month clamps to the
    target month's length."""
    y, m, d = days_to_civil(z)
    ym = y * 12 + (m - 1) + np.asarray(k, dtype=np.int64)
    y2 = np.floor_divide(ym, 12)
    m2 = ym - y2 * 12 + 1
    d2 = np.minimum(d, days_in_month(y2, m2))
    return civil_to_days(y2, m2, d2)


# --------------------------------------------------------------- calendar


class NpCalendar:
    """The holiday closure set as a numpy bitset over epoch days —
    the same packing `daycount.bind_session_calendar` binds JVM-side,
    probed here with vectorized gathers."""

    def __init__(self, holidays):
        lo, n, words = _holiday_bitset(tuple(holidays))
        self.lo = lo
        self.n = n
        # unsigned view so >> never smears the sign bit
        self.words = np.array(words, dtype=np.int64).view(np.uint64)

    def is_session(self, z):
        """Weekday and not a holiday. Epoch day 0 = Thursday, so
        Monday-indexed weekday = (z + 3) % 7."""
        z = np.asarray(z, dtype=np.int64)
        weekday = (z + 3) % 7 < 5
        idx = z - self.lo
        in_span = (idx >= 0) & (idx < self.n)
        safe = np.where(in_span, idx, 0)
        bits = (self.words[safe >> 6] >> (safe & 63).astype(np.uint64)) & 1
        return weekday & ~(in_span & (bits == 1))

    def _roll(self, z, step: int, max_steps: int) -> "np.ndarray":
        """Shrinking-active-set roll: ~70%% of dates are already
        sessions and exit before the loop, so the per-iteration work
        is proportional to the OFFENDERS still rolling, not the input
        (the naive full-width where() loop paid 7 passes over every
        element and dominated build_flows)."""
        cur = np.asarray(z, dtype=np.int64).copy()
        idx = np.nonzero(~self.is_session(cur))[0]
        for _ in range(max_steps + 1):
            if idx.size == 0:
                break
            cur[idx] += step
            idx = idx[~self.is_session(cur[idx])]
        return cur

    def roll_fwd(self, z, max_steps: int = 6):
        """First session >= z (bounded like the column twin)."""
        return self._roll(z, 1, max_steps)

    def roll_bwd(self, z, max_steps: int = 6):
        return self._roll(z, -1, max_steps)

    def adjust_mf(self, z):
        """ModifiedFollowing: next session unless that crosses a month
        boundary, then previous session (computed only for the crossed
        subset — a fraction of a percent of dates)."""
        z = np.asarray(z, dtype=np.int64)
        fwd = self.roll_fwd(z)
        moved = np.nonzero(fwd != z)[0]
        if moved.size == 0:
            return fwd
        _, m0, _ = days_to_civil(z[moved])
        _, m1, _ = days_to_civil(fwd[moved])
        crossed = moved[m0 != m1]
        if crossed.size:
            fwd[crossed] = self.roll_bwd(z[crossed])
        return fwd

    def advance_bd(self, z, n: int = 2):
        """n strict next-session steps (T+n settlement)."""
        cur = np.asarray(z, dtype=np.int64)
        for _ in range(n):
            cur = self.roll_fwd(cur + 1)
        return cur


# -------------------------------------------------------------- day counts

B_30_360 = 0
B_ACT_ACT = 1
B_ACT_360 = 2
B_ACT_365 = 3


def _jan1(y):
    """Epoch days of Jan 1 of year y, closed form (equals
    civil_to_days(y, 1, 1); pinned by a property test)."""
    ym1 = y - 1
    return 365 * ym1 + ym1 // 4 - ym1 // 100 + ym1 // 400 - 719162


def _dcf_actact(a, b, ya=None, yb=None):
    """ACT/ACT ISDA over epoch-day arrays, mirroring the engine/oracle
    year-segment fold EXACTLY (ascending years, per-year clamp to >= 0,
    segment/yearlen added left to right). Handles only a <= b — the
    signed wrapper routes reversed spans."""
    if ya is None:
        ya, _, _ = days_to_civil(a)
    if yb is None:
        yb, _, _ = days_to_civil(b)
    out = np.zeros(a.shape, dtype=float)
    span = int((yb - ya).max()) if a.size else -1
    for k in range(span + 1):
        y = ya + k
        active = y <= yb
        seg = np.minimum(b, _jan1(y + 1)) - np.maximum(a, _jan1(y))
        seg = np.maximum(seg, 0)
        denom = np.where(_is_leap(y), 366.0, 365.0)
        out = out + np.where(active, seg / denom, 0.0)
    return out


def dcf_basis(basis, a, b, ca=None, cb=None):
    """Per-element day-count fraction routed by the int basis code,
    computed SUBSET-wise (np.select would evaluate every formula —
    including the year-loop ACT/ACT fold — over every cell; routing
    by basis cuts the fold to its own rows and keeps its year span
    tight). ca/cb optionally carry precomputed (y, m, d) civil tuples
    for a/b — schedule matrices convert once and slice, instead of
    re-deriving civils per dcf call (the conversion dominated the
    kernel profile). 30/360 is the signed US bond-basis formula; flat
    ACT bases are signed day ratios; ACT/ACT is antisymmetric (the
    reversed span negates the swapped fold —
    daycount.dcf_by_basis_signed)."""
    basis = np.asarray(basis, dtype=np.int64)
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    out = np.zeros(a.shape, dtype=float)
    flat = (b - a).astype(float)
    sel = basis == B_ACT_360
    if sel.any():
        out[sel] = flat[sel] / 360.0
    sel = basis == B_ACT_365
    if sel.any():
        out[sel] = flat[sel] / 365.0
    sel = basis == B_30_360
    if sel.any():
        ya, ma, da = (
            (c[sel] for c in ca) if ca is not None
            else days_to_civil(a[sel])
        )
        yb, mb, db = (
            (c[sel] for c in cb) if cb is not None
            else days_to_civil(b[sel])
        )
        d1 = np.minimum(da, 30)
        d2 = np.where((db == 31) & (d1 == 30), 30, db)
        out[sel] = ((yb - ya) * 360 + (mb - ma) * 30 + (d2 - d1)) / 360.0
    sel = basis == B_ACT_ACT
    if sel.any():
        aa_, bb_ = a[sel], b[sel]
        ya = ca[0][sel] if ca is not None else days_to_civil(aa_)[0]
        yb = cb[0][sel] if cb is not None else days_to_civil(bb_)[0]
        rev = bb_ < aa_
        lo = np.where(rev, bb_, aa_)
        hi = np.where(rev, aa_, bb_)
        val = _dcf_actact(
            lo, hi, np.where(rev, yb, ya), np.where(rev, ya, yb)
        )
        out[sel] = np.where(rev, -val, val)
    return out


# ---------------------------------------------------------------- schedule


def build_flows(
    cal: NpCalendar,
    basis,
    maturity,
    pm,
    settle,
    n_hist=None,
    dated=None,
    coupon_ok=None,
):
    """The full quantlib-model schedule for a batch of coupon bonds:
    ModifiedFollowing-adjusted backward schedule (grid-regular via
    n_hist periods, or from a REAL dated date with a short-first-stub
    prepend), settlement bracketing, accrued/paid fractions, and the
    remaining per-period day-count steps.

    Returns (acc_pos, acc_signed, paid_frac, rem_steps, rem_n):
    rem_steps is a (rows x K) matrix of remaining per-period dcf steps
    (the solver cumsums them into stepwise times, minus acc_signed),
    rem_n the per-row live count; acc_pos is the clamped accrued
    fraction (zero before the schedule start — QuantLib's
    accruedAmount), acc_signed the raw stepwise complement term. All
    fractions are day counts — multiply by the coupon %.

    A ModifiedFollowing-collapsed stub keeps its zero-length first
    step (amount 0, time step 0): value-identical to the reference's
    neighbour dedupe — every sum term it adds is an exact zero.
    Padding cells repeat the adjusted maturity, so their steps are
    exact zeros too and the live mask only gates counting.

    Rows with coupon_ok False (zero-coupon / invalid) get rem_n = 0
    and zero fractions — callers overlay their own flows."""
    rows = maturity.size
    basis = np.asarray(basis, dtype=np.int64)
    maturity = np.asarray(maturity, dtype=np.int64)
    settle = np.asarray(settle, dtype=np.int64)
    pm = np.asarray(pm, dtype=np.int64)
    ok = (
        np.ones(rows, dtype=bool)
        if coupon_ok is None
        else np.asarray(coupon_ok, dtype=bool)
    )
    ok = ok & (pm >= 1)
    pm_safe = np.maximum(pm, 1)

    if dated is None:
        n_per = np.where(ok, np.asarray(n_hist, dtype=np.int64), 0)
        n_per = np.maximum(n_per, 0)
        stub = np.zeros(rows, dtype=bool)
    else:
        dated = np.asarray(dated, dtype=np.int64)
        ym_mat = (lambda c: c[0] * 12 + c[1] - 1)(days_to_civil(maturity))
        ym_dt = (lambda c: c[0] * 12 + c[1] - 1)(days_to_civil(dated))
        mm = ym_mat - ym_dt
        q = np.floor_divide(mm, pm_safe)
        jj = np.full(rows, -1, dtype=np.int64)
        for cand in (q + 1, q, q - 1):
            c = np.maximum(cand, 0)
            good = (jj < 0) & (
                add_months_days(maturity, -pm_safe * c) >= dated
            )
            jj = np.where(good, c, jj)
        ok = ok & (jj >= 0)
        jj = np.where(ok, jj, 0)
        on_grid = add_months_days(maturity, -pm_safe * jj) == dated
        stub = ok & ~on_grid
        n_per = np.where(ok, jj + stub, 0)

    k_max = int(n_per.max()) if rows else 0
    j_idx = np.arange(k_max + 1, dtype=np.int64)
    live = j_idx[None, :] <= n_per[:, None]
    # unadjusted dates: column j holds maturity - pm*(n_grid - g)
    # months where g is the grid index (stub rows shift the grid right
    # by one and put the dated date in column 0); padding columns
    # clamp to g = n_grid, i.e. repeat the maturity
    grid_j = j_idx[None, :] - stub[:, None].astype(np.int64)
    n_grid = (n_per - stub)[:, None]
    g = np.clip(grid_j, 0, np.maximum(n_grid, 0))
    # month-index arithmetic straight off the per-ROW maturity civil —
    # a full days->civil->days round trip per CELL dominated the
    # kernel profile (memory-bound int64 passes over the matrix)
    my, mmn, md = days_to_civil(maturity)
    ymg = (my * 12 + mmn - 1)[:, None] - pm_safe[:, None] * (n_grid - g)
    y2 = np.floor_divide(ymg, 12)
    m2 = ymg - y2 * 12 + 1
    d2 = np.minimum(md[:, None], days_in_month(y2, m2))
    ud = civil_to_days(y2, m2, d2)
    if dated is not None:
        ud = np.where(grid_j < 0, dated[:, None], ud)
    D = cal.adjust_mf(ud.reshape(-1)).reshape(ud.shape)
    # one civil pass over the adjusted matrix, sliced by both dcf sides
    Dc = days_to_civil(D.reshape(-1))
    Dc = tuple(c.reshape(D.shape) for c in Dc)

    cnt = ((D <= settle[:, None]) & live).sum(axis=1)
    cntc = np.maximum(cnt, 1)
    start = D[np.arange(rows), np.minimum(cntc - 1, k_max)]
    acc_raw = dcf_basis(basis, start, settle)
    acc_pos = np.where(ok, np.maximum(acc_raw, 0.0), 0.0)
    acc_signed = np.where(ok, acc_raw, 0.0)

    if k_max:
        b_flat = np.repeat(basis, k_max)
        steps = dcf_basis(
            b_flat,
            D[:, :-1].reshape(-1),
            D[:, 1:].reshape(-1),
            ca=tuple(np.ascontiguousarray(c[:, :-1]).reshape(-1) for c in Dc),
            cb=tuple(np.ascontiguousarray(c[:, 1:]).reshape(-1) for c in Dc),
        ).reshape(rows, k_max)
        step_live = j_idx[None, 1:] <= n_per[:, None]
        steps = np.where(step_live, steps, 0.0)
        csteps = np.cumsum(steps, axis=1)
    else:
        steps = np.zeros((rows, 0))
        csteps = steps
    # paid coupons: periods 1..cnt-1 — cumsum is the oracle's left fold
    paid_n = np.clip(cnt - 1, 0, k_max)
    paid_frac = np.where(
        ok & (paid_n > 0),
        csteps[np.arange(rows), np.maximum(paid_n - 1, 0)]
        if k_max
        else 0.0,
        0.0,
    )
    # remaining steps: periods cntc..n_per, left-shifted per row
    rem_n = np.where(ok, np.maximum(n_per - cntc + 1, 0), 0)
    k_rem = int(rem_n.max()) if rows else 0
    rem = np.zeros((rows, k_rem))
    if k_rem:
        src_idx = (cntc - 1)[:, None] + np.arange(k_rem)[None, :]
        src_clip = np.minimum(src_idx, max(k_max - 1, 0))
        gathered = steps[np.arange(rows)[:, None], src_clip]
        rem = np.where(
            np.arange(k_rem)[None, :] < rem_n[:, None], gathered, 0.0
        )
    return acc_pos, acc_signed, paid_frac, rem, rem_n
