"""W10: bond analytics — price → yield, duration, convexity.

The reference wraps QuantLib row-by-row behind joblib
(`stage1/helper_functions.py:44-255`): build a fixed-coupon bond,
solve yield from the daily price, emit ytm/durations/convexity, NaN on
failure. QuantLib is a native black box, so this module provides a
closed-form level-coupon engine with the same shape:

- per-period cash flows cf_t = 100·c (+100 at maturity), discount
  v = 1/(1+y);
- 25 fixed Newton iterations from y₀ = 0.03, clamped to [-0.9, 10];
- Macaulay/modified duration and convexity from the discounted-flow
  sums, semiannual-annualized.

Everything is a deterministic arithmetic sequence (fixed iteration
count, sequential term accumulation), so a DuckDB recursive-CTE oracle
can replay it bit-for-bit — the fixed-point iteration converges to
machine precision, which washes out libm pow() differences between
engines.

Runs as an Arrow-batched pandas UDF (the reference's own pattern:
analytics are a scalar row UDF; the surrounding joins/aggregations stay
relational). If QuantLib is importable it could be swapped in behind
the same signature; this container does not ship it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

NEWTON_ITERS = 25
Y0 = 0.03
Y_MIN, Y_MAX = -0.9, 10.0

_SCHEMA = StructType(
    [
        StructField("ytm", DoubleType()),
        StructField("mac_dur", DoubleType()),
        StructField("mod_dur", DoubleType()),
        StructField("convexity", DoubleType()),
        StructField("pv_residual", DoubleType()),
    ]
)


def _sums(
    c: "np.ndarray",
    n: "np.ndarray",
    y: "np.ndarray",
    n_max: int,
    q: "np.ndarray | None" = None,
    red: "np.ndarray | None" = None,
    cf1: "np.ndarray | None" = None,
) -> tuple["np.ndarray", "np.ndarray", "np.ndarray", "np.ndarray"]:
    """Row-vectorized, per-row t-SEQUENTIAL accumulation of the four
    discounted-flow sums (the t-order matters for parity with the
    oracle's list_sum; rows with t > n contribute exact zeros).

    `q` is the fractional time (in periods) from settlement to the FIRST
    remaining flow: flow t is discounted at exponent t - 1 + q, weighted
    by t - 1 + q, with convexity weight (t - 1 + q)(t + q). q = 1 (flow
    dates on the period grid) reproduces the whole-period t, t(t+1)
    weights exactly.

    `red` is the per-row redemption amount paid with the final flow
    (default 100 = redemption at par). Yield-to-call legs redeem at the
    call price instead: same schedule truncated at the call period.

    `cf1` overrides the FIRST flow's coupon amount per 100 face
    (default c·100 = a regular coupon). An odd short/long first coupon
    (backward-generated schedule whose dated date is off the grid)
    pays coupon_rate·dcf(dated, first_cpn) instead — the stub is a
    cash-flow amount, not a second schedule engine, exactly like the
    w10f call-leg redemption."""
    import numpy as np

    m = y.size
    if q is None:
        q = np.ones(m)
    if red is None:
        red = np.full(m, 100.0)
    v = 1.0 / (1.0 + y)
    pv = np.zeros(m)
    dpv = np.zeros(m)
    wsum = np.zeros(m)
    csum = np.zeros(m)
    with np.errstate(all="ignore"):
        vq = np.power(v, q)  # v^q; v^(t-1+q) accumulates from here
        vp = vq / v
        coup_reg = c * 100.0
        for t in range(1, n_max + 1):
            vp = vp * v  # v^(t-1+q)
            tau = t - 1.0 + q
            coup = (
                cf1 if (t == 1 and cf1 is not None) else coup_reg
            )
            cf = np.where(t == n, coup + red, np.where(t < n, coup, 0.0))
            pv += cf * vp
            dpv += -tau * cf * (vp * v)
            wsum += tau * cf * vp
            csum += tau * (tau + 1.0) * cf * vp
    return pv, dpv, wsum, csum


def _solve_frame(
    price: pd.Series,
    coupon_pp: pd.Series,
    n_periods: pd.Series,
    m: "np.ndarray",
    q: "np.ndarray | None" = None,
    red: "np.ndarray | None" = None,
    cf1: "np.ndarray | None" = None,
) -> pd.DataFrame:
    """Shared solver: per-period Newton fit, annualized by the per-row
    compounding frequency m (periods/year). Zero-coupon is the c = 0
    special case — one cash flow at t = n. With `q`, the price being fit
    is the DIRTY price and flows sit at fractional period offsets
    t - 1 + q from settlement (q = remaining fraction of the current
    coupon period)."""
    import numpy as np

    p = price.to_numpy(dtype=float)
    c = coupon_pp.to_numpy(dtype=float)
    n = n_periods.to_numpy(dtype="int64")
    valid = (n >= 1) & (p > 0.0) & (m >= 1) & np.isfinite(p)
    if q is not None:
        # q ≤ 1 for coupon bonds mid-period; a zero-coupon row passes its
        # whole remaining life (in periods) as q with n = 1
        valid &= np.isfinite(q) & (q > 0.0)
    n_max = int(n[valid].max()) if valid.any() else 0

    if q is None:
        y = np.full(p.size, Y0)
    else:
        # frequency-scaled seed: 0.03 PER PERIOD is a 36%/yr start for
        # monthly bonds and Newton can bounce off the clamp; 0.06/m is
        # the same seed at m = 2 (so the whole-period contract is
        # unchanged) and keeps high-frequency rows in the basin. Seed
        # only where the mask holds (r15 ADVICE: a masked-invalid
        # freq <= 0 row must not emit a RuntimeWarning under
        # warnings-as-errors callers).
        with np.errstate(all="ignore"):
            y = np.where(valid, 0.06 / np.maximum(m.astype(float), 1.0), 0.0)
    for _ in range(NEWTON_ITERS):
        pv, dpv, _, _ = _sums(c, n, y, n_max, q, red, cf1)
        with np.errstate(all="ignore"):
            step = np.where(valid, (pv - p) / dpv, 0.0)
        y = np.clip(y - step, Y_MIN, Y_MAX)
    pv, _, wsum, csum = _sums(c, n, y, n_max, q, red, cf1)
    with np.errstate(all="ignore"):
        v = 1.0 / (1.0 + y)
        mf = m.astype(float)
        mac_years = wsum / pv / mf
        out = pd.DataFrame(
            {
                "ytm": y * mf,
                "mac_dur": mac_years,
                "mod_dur": mac_years / (1.0 + y),
                "convexity": csum * v * v / pv / (mf * mf),
                "pv_residual": pv - p,
            }
        )
    out.loc[~valid] = float("nan")
    return out


@F.pandas_udf(_SCHEMA)
def bond_analytics(
    price: pd.Series, coupon_pp: pd.Series, n_periods: pd.Series
) -> pd.DataFrame:
    """price: clean price per 100 face on a coupon date; coupon_pp:
    per-period coupon rate (decimal); n_periods: whole periods to
    maturity. Returns annualized (semiannual) ytm, Macaulay/modified
    duration in years, convexity in years², and the PV residual
    (≈0 when the solver converged). NaN rows on invalid input — the
    reference's NaN-on-failure contract."""
    import numpy as np

    return _solve_frame(price, coupon_pp, n_periods, np.full(len(price), 2))


@F.pandas_udf(_SCHEMA)
def bond_analytics_freq(
    price: pd.Series, coupon_pp: pd.Series, n_periods: pd.Series, freq: pd.Series
) -> pd.DataFrame:
    """Frequency-general variant: freq = compounding periods/year (the
    reference's interest_frequency {1,2,4,12}; pass c = 0 for the
    zero-coupon {0,99} codes, with n in compounding periods)."""
    return _solve_frame(price, coupon_pp, n_periods, freq.to_numpy(dtype="int64"))


@F.pandas_udf(_SCHEMA)
def bond_analytics_red(
    price: pd.Series,
    coupon_pp: pd.Series,
    n_periods: pd.Series,
    redemption: pd.Series,
) -> pd.DataFrame:
    """Redemption-general semiannual variant for yield-to-call legs
    (reference: `fisd_mergedredemption` call schedules — the reference
    consumes only the `callable` flag, `stage1/stage1_pipeline.py:806-812`;
    this closes the schedule corner): the bond is assumed called at
    period n with the coupon plus the CALL PRICE instead of par. Same
    fixed Newton sequence, so the same recursive-CTE oracle replays it
    with `red` substituted in the terminal flow."""
    import numpy as np

    return _solve_frame(
        price,
        coupon_pp,
        n_periods,
        np.full(len(price), 2),
        red=redemption.to_numpy(dtype=float),
    )


@F.pandas_udf(_SCHEMA)
def bond_analytics_frac(
    dirty: pd.Series,
    coupon_pp: pd.Series,
    n_periods: pd.Series,
    freq: pd.Series,
    q_frac: pd.Series,
) -> pd.DataFrame:
    """Mid-period variant for the unified W10 record (reference:
    `stage1/helper_functions.py:44-255` prices off SettlementDate inside
    a coupon period): fits the DIRTY price with remaining flows at
    fractional period offsets t - 1 + q (q = day-count fraction of the
    current period still to run). The returned pv_residual is
    dirty-price residual; clean price = dirty - accrued is recovered by
    the caller as column algebra."""
    return _solve_frame(
        dirty,
        coupon_pp,
        n_periods,
        freq.to_numpy(dtype="int64"),
        q_frac.to_numpy(dtype=float),
    )


@F.pandas_udf(_SCHEMA)
def bond_analytics_stub(
    dirty: pd.Series,
    coupon_pp: pd.Series,
    n_periods: pd.Series,
    freq: pd.Series,
    q_frac: pd.Series,
    first_cf: pd.Series,
) -> pd.DataFrame:
    """Odd-first-coupon variant (the last QuantLib-fidelity corner of
    W10): a backward-generated schedule whose dated date is NOT on the
    coupon grid carries a short (or on-grid-degenerate full) first
    accrual period (reference: `ql.Schedule(..., Backward)` inside
    `stage1/helper_functions.py:125-152`). The irregular first coupon
    pays `first_cf` per 100 face — coupon_rate·dcf(dated, first_cpn)
    under the bond's day-count basis, computed as column algebra by
    the caller — while every later flow is the regular c·100. With
    first_cf = c·100 and q on the grid this degenerates exactly to
    `bond_analytics_frac` (pinned by a golden test)."""
    return _solve_frame(
        dirty,
        coupon_pp,
        n_periods,
        freq.to_numpy(dtype="int64"),
        q_frac.to_numpy(dtype=float),
        cf1=first_cf.to_numpy(dtype=float),
    )


def _solve_times_matrices(p, m, t_mat, cf_mat, n) -> pd.DataFrame:
    """Shared fixed-contract solve over padded per-flow (times,
    amounts) matrices: 25 Newton steps from y/m = 0.06/m, per-period
    clamp [-0.9, 10], t-SEQUENTIAL term accumulation (the DuckDB
    list-algebra oracle replays it bit-for-bit), all-NaN on
    non-convergence or invalid rows."""
    import numpy as np

    rows = p.size
    n_max = t_mat.shape[1] if rows else 0
    valid = (n >= 1) & (p > 0.0) & (m >= 1) & np.isfinite(p)
    valid &= np.isfinite(t_mat).all(axis=1) & (t_mat >= 0).all(axis=1)

    mf = m.astype(float)
    # per-period seed, as in _solve_frame; masked rows seed 0 so a
    # freq <= 0 row never trips a divide warning (r15 ADVICE)
    with np.errstate(all="ignore"):
        x = np.where(valid, 0.06 / np.maximum(mf, 1.0), 0.0)

    def _pv_dpv(xv):
        pv = np.zeros(rows)
        dpv = np.zeros(rows)
        with np.errstate(all="ignore"):
            base = 1.0 + xv
            for j in range(n_max):
                live = j < n
                tm = t_mat[:, j] * mf
                v = np.where(live, np.power(base, -tm), 0.0)
                pv += cf_mat[:, j] * v
                dpv += np.where(
                    live,
                    -tm * cf_mat[:, j] * np.power(base, -tm - 1.0),
                    0.0,
                )
        return pv, dpv

    for _ in range(NEWTON_ITERS):
        pv, dpv = _pv_dpv(x)
        with np.errstate(all="ignore"):
            step = np.where(valid, (pv - p) / dpv, 0.0)
        x = np.clip(x - step, Y_MIN, Y_MAX)
    pv = np.zeros(rows)
    wsum = np.zeros(rows)
    csum = np.zeros(rows)
    with np.errstate(all="ignore"):
        base = 1.0 + x
        for j in range(n_max):
            live = j < n
            t = t_mat[:, j]
            v = np.where(live, np.power(base, -t * mf), 0.0)
            pv += cf_mat[:, j] * v
            wsum += t * cf_mat[:, j] * v
            csum += t * (t + 1.0 / mf) * cf_mat[:, j] * v
        mac = wsum / pv
        out = pd.DataFrame(
            {
                "ytm": x * mf,
                "mac_dur": mac,
                "mod_dur": mac / base,
                "convexity": csum / (base * base) / pv,
                "pv_residual": pv - p,
            }
        )
    out.loc[~valid] = float("nan")
    return out


@F.pandas_udf(_SCHEMA)
def bond_analytics_times(
    dirty: pd.Series,
    freq: pd.Series,
    times: pd.Series,
    amounts: pd.Series,
) -> pd.DataFrame:
    """ACT-exact variant (closes the r15 contract-differential gap for
    ACT bases): fits the dirty price to flows at EXPLICIT per-flow
    times (years from settlement, QuantLib's stepwise accumulation —
    closed-form under ACT additivity) with EXPLICIT per-flow amounts
    (rate x dcf(accrual start, end) per 100 face, QuantLib's
    FixedRateLeg — NOT the uniform rate/m quote convention of
    `bond_analytics_frac`). times/amounts are equal-length arrays per
    row; discounting is (1 + y/m)^(-t*m).

    Same fixed contract as the rest of the family — 25 Newton steps
    from y/m = 0.06/m, clamped per-period to [-0.9, 10], t-SEQUENTIAL
    term accumulation so the DuckDB list-algebra oracle replays it
    bit-for-bit, all-NaN on non-convergence."""
    import numpy as np

    p = dirty.to_numpy(dtype=float)
    m = freq.to_numpy(dtype="int64")
    rows = len(p)
    n = np.array([0 if v is None else len(v) for v in times])
    n_max = int(n.max()) if rows else 0
    t_mat = np.zeros((rows, n_max))
    cf_mat = np.zeros((rows, n_max))
    for i, (tv, av) in enumerate(zip(times, amounts)):
        if tv is None or av is None or len(tv) != len(av):
            n[i] = 0
            continue
        t_mat[i, : len(tv)] = np.asarray(tv, dtype=float)
        cf_mat[i, : len(av)] = np.asarray(av, dtype=float)
    return _solve_times_matrices(p, m, t_mat, cf_mat, n)


_RECORD_SCHEMA = StructType(
    [
        StructField("ytm", DoubleType()),
        StructField("mac_dur", DoubleType()),
        StructField("mod_dur", DoubleType()),
        StructField("convexity", DoubleType()),
        StructField("pv_residual", DoubleType()),
        StructField("acclast", DoubleType()),
        StructField("accpmt", DoubleType()),
    ]
)


def make_record_kernel(holidays: tuple, mode: str):
    """Factory for the quantlib-model record kernel: ONE Arrow pass
    per batch computing NYSE-calendar T+2 settlement, the
    ModifiedFollowing-adjusted backward schedule (grid-regular via
    n periods, or mode='dated' from a real dated date with stub
    prepend), accrued/paid amounts, and the per-flow Newton solve —
    all vectorized int64/float64 matrix arithmetic
    (operators/bond_schedule.py; see its docstring for why this lives
    in the kernel rather than Catalyst column algebra). The holiday
    tuple and mode are bound at creation; inputs per row are scalars
    only (price, coupon %, freq, period months, basis code, maturity /
    trade / schedule-param epoch days, zero and valid flags), so the
    Arrow transfer is a handful of primitive columns."""
    import numpy as np

    from trace_data_pipeline_spark.operators.bond_schedule import (
        NpCalendar,
        build_flows,
        dcf_basis,
    )

    cal = NpCalendar(holidays)
    dated_mode = mode == "dated"

    @F.pandas_udf(_RECORD_SCHEMA)
    def record_kernel(
        price: pd.Series,
        coupon_pct: pd.Series,
        freq: pd.Series,
        period_m: pd.Series,
        basis_code: pd.Series,
        mat_days: pd.Series,
        trade_days: pd.Series,
        sched_val: pd.Series,
        is_zero: pd.Series,
        ok_flag: pd.Series,
    ) -> pd.DataFrame:
        p = price.to_numpy(dtype=float)
        c_in = coupon_pct.to_numpy(dtype=float)
        m = freq.to_numpy(dtype="int64")
        pm = period_m.to_numpy(dtype="int64")
        bas = basis_code.to_numpy(dtype="int64")
        mat = mat_days.to_numpy(dtype="int64")
        trd = trade_days.to_numpy(dtype="int64")
        sv = sched_val.to_numpy(dtype="int64")
        isz = is_zero.to_numpy(dtype=bool)
        okf = ok_flag.to_numpy(dtype=bool)
        rows = p.size

        settle = cal.advance_bd(trd, 2)
        ok = okf & (settle < mat)
        coupon_ok = ok & ~isz
        acc_pos, acc_sgn, paid, rem, rem_n = build_flows(
            cal, bas, mat, pm, settle,
            n_hist=None if dated_mode else sv,
            dated=sv if dated_mode else None,
            coupon_ok=coupon_ok,
        )
        zsel = ok & isz
        if zsel.any():
            zpay = cal.adjust_mf(mat)
            zt = dcf_basis(bas, settle, zpay)
            if rem.shape[1] == 0:
                rem = np.zeros((rows, 1))
            rem[zsel, 0] = np.where(zpay[zsel] > settle[zsel], zt[zsel], 0.0)
            rem_n = np.where(
                zsel, np.where(zpay > settle, 1, 0), rem_n
            )
        c = np.where(isz, 0.0, np.nan_to_num(c_in))
        acclast = c * acc_pos
        accpmt = c * paid
        dirty = p + acclast
        if rem.shape[1] == 0:
            rem = np.zeros((rows, 1))
        t_mat = np.cumsum(rem, axis=1) - acc_sgn[:, None]
        cf_mat = c[:, None] * rem
        has = rem_n >= 1
        cf_mat[has, np.maximum(rem_n[has] - 1, 0)] += 100.0
        out = _solve_times_matrices(dirty, m, t_mat, cf_mat, rem_n)
        out["acclast"] = np.where(ok, acclast, float("nan"))
        out["accpmt"] = np.where(ok, accpmt, float("nan"))
        return out

    return record_kernel
