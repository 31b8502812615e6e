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


def _flow_matrices(c, n, n_max, q, red, cf1):
    """(CF, TAU) per-flow matrices for `_solve_frame` — the same
    elementwise expressions the historical `_sums` column loop built
    per t, hoisted out of the Newton iterations (they do not depend on
    the yield; the loop recomputed them 26 times).

    CF[:, t-1] = coupon cash flow at period t per 100 face: c·100 per
    period (cf1 overriding t = 1 — the odd-first-coupon stub), plus
    `red` (redemption, default 100; call price on call legs) at t = n,
    zero past n. TAU[:, t-1] = t - 1 + q, the fractional period offset
    of flow t from settlement (`q` = remaining fraction of the current
    period; 1 on the grid)."""
    import numpy as np

    t_idx = np.arange(1, n_max + 1)
    TAU = (t_idx - 1.0)[None, :] + q[:, None]
    coup_reg = c * 100.0
    COUP = np.broadcast_to(coup_reg[:, None], (c.size, n_max)).copy()
    if cf1 is not None and n_max >= 1:
        COUP[:, 0] = cf1
    T = t_idx[None, :]
    N = n[:, None]
    CF = np.where(T == N, COUP + red[:, None], np.where(T < N, COUP, 0.0))
    return CF, TAU


def _sums(
    c: "np.ndarray",
    n: "np.ndarray",
    y: "np.ndarray",
    n_max: int,
    q: "np.ndarray | None" = None,
    red: "np.ndarray | None" = None,
    cf1: "np.ndarray | None" = None,
) -> tuple["np.ndarray", "np.ndarray", "np.ndarray", "np.ndarray"]:
    """The four discounted-flow folds (pv, dpv, wsum, csum) at yield
    `y` — the kernel contract the oracle fragments pin against
    (tests/test_bond_math.py). Since r16 this is a thin wrapper over
    the hoisted matrices `_solve_frame` iterates with; the fold order
    (per-row sequential cumsum), the discount recurrence and the
    multiplication grouping are the historical column loop's, so the
    floats are unchanged."""
    import numpy as np

    m = y.size
    if q is None:
        q = np.ones(m)
    if red is None:
        red = np.full(m, 100.0)
    if n_max == 0:
        z = np.zeros(m)
        return z, z.copy(), z.copy(), z.copy()
    with np.errstate(all="ignore"):
        CF, TAU = _flow_matrices(c, n, n_max, q, red, cf1)
        v = 1.0 / (1.0 + y)
        VP = _vp_matrix(v, q, n_max)
        pv = np.cumsum(CF * VP, axis=1)[:, -1] + 0.0
        dpv = (
            np.cumsum((-TAU * CF) * (VP * v[:, None]), axis=1)[:, -1] + 0.0
        )
        wsum = np.cumsum((TAU * CF) * VP, axis=1)[:, -1] + 0.0
        csum = (
            np.cumsum(((TAU * (TAU + 1.0)) * CF) * VP, axis=1)[:, -1] + 0.0
        )
    return pv, dpv, wsum, csum


def _vp_matrix(v, q, n_max):
    """v^(t-1+q) columns via the exact multiplicative recurrence the
    `_sums` loop used (vp_1 = (v^q / v)·v, vp_t = vp_{t-1}·v — NOT
    np.power(v, TAU), which rounds differently): one np.power plus a
    per-row cumprod, which IS the sequential left-to-right product."""
    import numpy as np

    vq = np.power(v, q)
    A = np.broadcast_to(v[:, None], (v.size, n_max)).copy()
    A[:, 0] = (vq / v) * v
    return np.cumprod(A, axis=1)


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
    qv = np.ones(p.size) if q is None else q
    rv = np.full(p.size, 100.0) if red is None else red
    # r16 (guide §4.2): the historical `_sums` column loop re-derived
    # the cash-flow and time matrices on every Newton call and summed
    # four folds where the iteration needs two. Hoist CF/TAU, run the
    # discount-factor recurrence as a per-row cumprod, fold with
    # cumsum (the same sequential left fold, so every float is
    # bit-identical), and iterate only the SHRINKING ACTIVE SET of
    # rows not yet at their fixed point — same contract, 25 steps max.
    if n_max:
        CF, TAU = _flow_matrices(c, n, n_max, qv, rv, cf1)
    else:
        CF = TAU = np.zeros((p.size, 0))
    act = np.nonzero(valid)[0]
    with np.errstate(all="ignore"):
        it = 0
        while it < NEWTON_ITERS and act.size:
            w = int(n[act].max()) if act.size else 0
            w = min(max(w, 0), n_max)
            ya = y[act]
            v = 1.0 / (1.0 + ya)
            if w:
                VP = _vp_matrix(v, qv[act], w)
                cfa = CF[act, :w]
                pva = np.cumsum(cfa * VP, axis=1)[:, -1] + 0.0
                dva = (
                    np.cumsum(
                        (-TAU[act, :w] * cfa) * (VP * v[:, None]), axis=1
                    )[:, -1]
                    + 0.0
                )
            else:
                pva = np.zeros(act.size)
                dva = np.zeros(act.size)
            yn = np.clip(ya - (pva - p[act]) / dva, Y_MIN, Y_MAX)
            moved = yn != ya
            moved &= ~(np.isnan(yn) & np.isnan(ya))
            y[act] = yn
            act = act[moved]
            it += 1
        v = 1.0 / (1.0 + y)
        if n_max:
            VP = _vp_matrix(v, qv, n_max)
            CV = CF * VP
            pv = np.cumsum(CV, axis=1)[:, -1] + 0.0
            wsum = np.cumsum((TAU * CF) * VP, axis=1)[:, -1] + 0.0
            csum = (
                np.cumsum(((TAU * (TAU + 1.0)) * CF) * VP, axis=1)[:, -1]
                + 0.0
            )
        else:
            pv = np.zeros(p.size)
            wsum = np.zeros(p.size)
            csum = np.zeros(p.size)
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
    non-convergence or invalid rows.

    r16 optimization (guide §4.2): the per-column Python loop became
    whole-matrix expressions — per-element np.power calls and the
    left-fold accumulation order (np.cumsum along axis=1 IS the
    sequential fold the column loop did) are unchanged, so every
    float is bit-identical — and the Newton loop runs over a
    SHRINKING ACTIVE SET: a row whose x repeats exactly is at its
    fixed point (the iteration is deterministic, so every later
    iterate is the same x) and drops out. Most rows converge in 6-10
    of the 25 contractual steps, so the pow()-heavy matrix passes run
    on a fraction of the rows/iterations the dense loop paid for."""
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

    # Newton touches only valid rows (invalid rows' steps were masked
    # to 0 before — their x never moved, so skipping them is exact).
    act = np.nonzero(valid)[0]
    live_full = np.arange(n_max)[None, :] < n[:, None]
    with np.errstate(all="ignore"):
        it = 0
        while it < NEWTON_ITERS and act.size:
            # width shrinks with the surviving rows: columns past the
            # active rows' max live count held exact zeros in the fold
            w = int(n[act].max())
            tm = t_mat[act, :w] * mf[act, None]
            cf = cf_mat[act, :w]
            live = live_full[act, :w]
            base = 1.0 + x[act]
            v = np.where(live, np.power(base[:, None], -tm), 0.0)
            # trailing `+ 0.0`: the column loop accumulated from a +0.0
            # seed, so a fold whose value is zero is +0.0 there; cumsum
            # alone could carry -0.0 through an all-negative-zero
            # prefix. x + 0.0 is the identity on every other float.
            pv = (
                np.cumsum(cf * v, axis=1)[:, -1] + 0.0
                if w
                else np.zeros(act.size)
            )
            dv = np.where(
                live, -tm * cf * np.power(base[:, None], -tm - 1.0), 0.0
            )
            dpv = (
                np.cumsum(dv, axis=1)[:, -1] + 0.0
                if w
                else np.zeros(act.size)
            )
            xn = np.clip(x[act] - (pv - p[act]) / dpv, Y_MIN, Y_MAX)
            moved = xn != x[act]
            # NaN rows iterate NaN -> NaN: fixed point too
            moved &= ~(np.isnan(xn) & np.isnan(x[act]))
            x[act] = xn
            act = act[moved]
            it += 1
    pv = np.zeros(rows)
    wsum = np.zeros(rows)
    csum = np.zeros(rows)
    with np.errstate(all="ignore"):
        base = 1.0 + x
        if n_max:
            v = np.where(
                live_full, np.power(base[:, None], -(t_mat * mf[:, None])), 0.0
            )
            # the column loop multiplied left-to-right — (t*cf)*v, not
            # t*(cf*v) — and float multiplication is not associative;
            # keep its exact grouping
            pv = np.cumsum(cf_mat * v, axis=1)[:, -1] + 0.0
            wsum = np.cumsum((t_mat * cf_mat) * v, axis=1)[:, -1] + 0.0
            csum = np.cumsum(
                ((t_mat * (t_mat + 1.0 / mf[:, None])) * cf_mat) * v, axis=1
            )[:, -1] + 0.0
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


def _record_batch(cal, dated_mode, p, c_in, m, pm, bas, mat, trd, sv, isz, okf):
    """The quantlib-model record for one numpy row batch: NYSE T+2
    settlement, ModifiedFollowing backward schedule (grid-regular or
    dated with stub prepend), accrued/paid amounts, per-flow Newton.
    Pure function of its arrays — every row's outputs depend only on
    that row's inputs, which is what lets `_record_batch_bucketed`
    split a batch by schedule width without changing a bit."""
    import numpy as np

    from trace_data_pipeline_spark.operators.bond_schedule import (
        build_flows,
        dcf_basis,
    )

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


def _record_batch_bucketed(
    cal, dated_mode, p, c_in, m, pm, bas, mat, trd, sv, isz, okf
):
    """Split one Arrow batch into schedule-width buckets before the
    matrix work (guide §2.3 "don't compute what you throw away",
    applied inside the kernel): the schedule/solve matrices are padded
    to the WIDEST row of the batch, and a monthly 16-year bond next to
    quarterly 7-year ones drags every row's calendar, day-count and
    pow() passes to ~190 columns where the batch median needs ~30.
    Sorting rows by (estimated) period count and processing a few
    equal-count slices keeps each slice's padding near its own max.
    Row-independent math (see `_record_batch`) makes the split exact;
    the estimate only has to ORDER rows well, not be right."""
    import numpy as np

    rows = p.size
    arrays = (p, c_in, m, pm, bas, mat, trd, sv, isz, okf)
    n_buckets = min(8, rows // 1024)
    if n_buckets <= 1:
        return _record_batch(cal, dated_mode, *arrays)
    pm_safe = np.maximum(pm, 1)
    if dated_mode:
        est = np.maximum(mat - sv, 0) // (30 * pm_safe) + 2
    else:
        est = sv
    est = np.where(okf & ~isz, est, 0)
    order = np.argsort(-est, kind="stable")
    bounds = np.linspace(0, rows, n_buckets + 1).astype(np.int64)
    out = pd.DataFrame(
        index=np.arange(rows),
        columns=[f.name for f in _RECORD_SCHEMA.fields],
        dtype=float,
    )
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        idx = order[lo:hi]
        part = _record_batch(
            cal, dated_mode, *(a[idx] for a in arrays)
        )
        out.iloc[idx] = part.to_numpy()
    return out


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
    from trace_data_pipeline_spark.operators.bond_schedule import (
        NpCalendar,
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
        return _record_batch_bucketed(
            cal,
            dated_mode,
            price.to_numpy(dtype=float),
            coupon_pct.to_numpy(dtype=float),
            freq.to_numpy(dtype="int64"),
            period_m.to_numpy(dtype="int64"),
            basis_code.to_numpy(dtype="int64"),
            mat_days.to_numpy(dtype="int64"),
            trade_days.to_numpy(dtype="int64"),
            sched_val.to_numpy(dtype="int64"),
            is_zero.to_numpy(dtype=bool),
            ok_flag.to_numpy(dtype=bool),
        )

    return record_kernel
