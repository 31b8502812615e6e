"""W10 unified analytics record — the reference's GetNewVarsPy surface
(`stage1/helper_functions.py:44-255`) as ONE reusable operator.

Given a frame carrying (clean price, annual coupon %, interest_frequency
code, day_count_basis, maturity, schedule history length, trade date),
attaches the full 9-output record: ytm, prclean, prfull, acclast,
accpmt, accall, mac_dur, mod_dur, convexity.

Two pricing models, selected by `model=`:

- ``"quantlib"`` (default, r16): the reference-faithful model. T+2
  settlement advanced over the NYSE holiday calendar
  (`ql.UnitedStates(NYSE).advance`, helper_functions.py:74), every
  backward-schedule date ModifiedFollowing-adjusted against the same
  calendar (the Schedule/FixedRateBond conventions at :125-152),
  per-flow coupon amounts rate x dcf(accrual_start, accrual_end)
  (QuantLib's FixedRateLeg — under ACT bases a regular coupon is NOT
  rate/m), and stepwise per-flow discount times. Contract-exact on all
  9 outputs across all four day-count bases, including holiday-moved
  settlements and schedule dates (tests/ql_contract.py differential).
- ``"quote"``: the pre-r16 uniform rate/m quote-convention model with
  weekend-only settlement roll — kept for callers that price off the
  quoted convention rather than the reference's leg; its documented
  deviations (ACT amounts, holiday-blind roll) live on
  `_attach_quote_record`.

Spark shape (both models): one pass, zero shuffles, zero joins — at
100 TB this pipelines with whatever partitioning the input already
has. The quantlib model runs the ENTIRE schedule-and-solve in ONE
Arrow kernel (`bond_math.make_record_kernel` over
`operators/bond_schedule.py`): vectorized int64 date matrices,
bitset-probed NYSE calendar, exact-integer day counts, cumsum
stepwise times, per-flow Newton. Inputs are a handful of scalar
columns per row; the JVM side keeps only the branch logic, the cheap
rounding/gating projections — and the calendar is data baked into the
kernel closure, never a join. (The first implementation expressed the
schedule as Catalyst higher-order-function column algebra;
interpreted lambdas plus per-probe holiday scans ran 4-10x slower
than the kernel and literal-bound bitsets ballooned planning — see
bond_schedule's module docstring for the history.)

Shared semantics per the reference:
- day_count_basis ∈ {30/360, ACT/ACT, ACT/360, ACT/365} routed per row;
- interest_frequency '1'/'2'/'4'/'12', with '0'/'99'/null defaulting to
  semiannual when coupon > 0 (helper_functions.py:104-109);
- coupon_type 'Z' — and zero-coupon-eligible 'F' rows (no coupon,
  priced below par) — priced as a single flow with annual compounding
  at the payment-adjusted maturity;
- 'F' with no coupon at/above par → bond is None → all-null record;
- settlement at/after (unadjusted) maturity → all-null record;
- solver non-convergence → all-null record (the try/except RuntimeError
  → NaN contract).

Assumes a regular schedule (dated_date ON the coupon grid, expressed as
`hist_m` months of history before maturity, hist_m divisible by the
period). The reference's irregular first-stub accruals are handled by
the dedicated odd-first-coupon path (`bond_math.bond_analytics_stub` /
the `w10h_odd_first_coupon` plan), not by this record operator.

Remaining documented deviations of the DEFAULT model (r16 differential
status — everything else is exact):

- Holiday span: the default calendar is the rule-derived NYSE closure
  list for 2002-2060 (`functions/nyse_calendar.py`); schedule dates
  outside that span adjust weekend-only. Pass `holidays=` to widen.
- Yields below -90% per period (price far above the remaining flows,
  settlement in the last period) return the all-null record: the
  solver's -0.9 clamp keeps discount powers inside float range.
  QuantLib's root exists down to (1+y/m) > 0; the reference would
  report it when its solver converges.
- An unrecognized interest-frequency code degrades the row to the
  all-null record where the reference raises ValueError.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trace_data_pipeline_spark.functions.daycount import (
    add_business_days,
    coupon_bracket,
    dcf_by_basis,
)
from trace_data_pipeline_spark.functions.nyse_calendar import nyse_holidays
from trace_data_pipeline_spark.operators.bond_math import (
    bond_analytics_frac,
    make_record_kernel,
)

RECORD_COLS = (
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

# Default calendar span: the reference's TRACE sample starts 2002; 2060
# covers every maturity in sample with slack. Bonds whose dated dates
# precede 2002 accrue their pre-2002 periods on weekend-adjusted dates
# (documented deviation above).
_DEFAULT_HOLIDAY_SPAN = (2002, 2060)


def _freq_and_branches(
    p: Column, c_pct: Column, coupon_type: str, ifreq: str, dcb: str
) -> tuple[Column, Column, Column]:
    """(m_c, is_zero, basis_ok) — the GetNewVarsPy branch logic shared
    by both models. The reference raises ValueError on an unrecognized
    interest frequency (helper_functions.py:104-109); here the row
    degrades to the all-null record instead of failing the job: only
    '0'/'99'/null take the semiannual default, anything else leaves
    m_c null, which the validity gate folds in."""
    m_c = (
        F.when(F.col(ifreq) == "1", 1)
        .when(F.col(ifreq) == "2", 2)
        .when(F.col(ifreq) == "4", 4)
        .when(F.col(ifreq) == "12", 12)
        .when(
            F.col(ifreq).isNull() | F.col(ifreq).isin("0", "99"),
            F.when(c_pct > 0, 2),
        )
        .cast("int")
    )
    # the reference's zero branch takes F-type rows whose coupon is 0,
    # NaN *or missing* when priced below par (helper_functions.py:
    # `x.coupon == 0 or np.isnan(x.coupon)`); null/NaN must not fall
    # through to the coupon-bond branch
    c_missing = c_pct.isNull() | F.isnan(c_pct.cast("double"))
    is_zero = (F.col(coupon_type) == "Z") | (
        (F.col(coupon_type) == "F")
        & ((c_pct == 0.0) | c_missing)
        & (p < 100.0)
    )
    # unrecognized day-count basis (dcf_by_basis has no otherwise) must
    # yield the all-null record, not a silently inconsistent partial one
    basis_ok = F.col(dcb).isin(
        "30/360", "", "ACT/ACT", "ACT/360", "ACT/365", "ACT/366"
    )
    return m_c, is_zero, basis_ok


def attach_full_record(
    df: DataFrame,
    price: str = "p",
    coupon_pct: str = "c_pct",
    coupon_type: str = "ctype",
    ifreq: str = "ifreq",
    dcb: str = "dcb",
    maturity: str = "maturity",
    hist_m: str = "hist_m",
    trade_d: str = "trade_d",
    model: str = "quantlib",
    holidays: Sequence[dt.date] | None = None,
    dated: str | None = None,
) -> DataFrame:
    """Attach the 9 analytics columns (RECORD_COLS) to `df`. See the
    module docstring for the two models; `holidays` overrides the
    default NYSE closure list (quantlib model only).

    `dated` (quantlib model only) names a DATED-DATE column and
    replaces the grid-regular `hist_m` parameterization with the
    reference's ACTUAL schedule contract (`ql.Schedule(dated,
    maturity, ..., Backward)`, helper_functions.py:125-152): coupon
    dates generate backward from maturity, and a dated date OFF the
    grid is prepended as a short first stub whose coupon pays
    rate*dcf(dated, first_cpn) — which the per-flow amounts model
    prices natively (the stub is just the first period's day-count
    step). This is the column a FISD row actually carries; `hist_m`
    remains for synthetic grid-regular inputs."""
    if model == "quote":
        if dated is not None:
            raise ValueError("dated schedules need model='quantlib'")
        return _attach_quote_record(
            df, price, coupon_pct, coupon_type, ifreq, dcb, maturity,
            hist_m, trade_d,
        )
    if model != "quantlib":
        raise ValueError(f"unknown model {model!r}")
    if holidays is None:
        holidays = nyse_holidays(*_DEFAULT_HOLIDAY_SPAN)

    p, c_pct = F.col(price), F.col(coupon_pct)
    m_c, is_zero, basis_ok = _freq_and_branches(
        p, c_pct, coupon_type, ifreq, dcb
    )
    basis = F.col(dcb)
    # The ENTIRE schedule derivation — NYSE T+2 settlement,
    # ModifiedFollowing adjustment, stub handling, day counts, accrued
    # and paid amounts, stepwise times — runs INSIDE one Arrow kernel
    # as vectorized int64 matrix arithmetic
    # (operators/bond_schedule.py). The first implementation built it
    # as Catalyst HOF column algebra; interpreted lambdas plus
    # per-probe holiday scans put w10e at 17-21 s for 150k rows at
    # sf0.1 where the kernel form prices the same batch in a few
    # seconds, and literal-bound bitsets ballooned planning into
    # multi-megabyte task binaries. Inputs stay scalar-per-row, so
    # this remains one scan, zero shuffles, zero joins.
    mode = "dated" if dated is not None else "hist"
    kernel = make_record_kernel(tuple(holidays), mode)
    basis_code = (
        F.when(basis.isin("30/360", ""), 0)
        .when(basis == "ACT/ACT", 1)
        .when(basis == "ACT/360", 2)
        .otherwise(3)
        .cast("int")
    )
    st = df.withColumn("__m_c", m_c).withColumn("__is_zero", is_zero)
    st = st.withColumn(
        "__valid",
        basis_ok
        & (
            F.col("__is_zero")
            | (
                (F.col(coupon_type) == "F")
                & (c_pct > 0)
                & F.col("__m_c").isNotNull()
            )
        ),
    ).withColumn(
        "__m", F.when(F.col("__is_zero"), 1).otherwise(F.col("__m_c"))
    ).withColumn("__pm", (12 / F.col("__m_c")).cast("int"))
    if dated is None:
        sched_val = (F.col(hist_m) / F.col("__pm")).cast("int")
    else:
        sched_val = F.unix_date(F.col(dated)).cast("int")
    solved = st.withColumn(
        "__r",
        kernel(
            p,
            F.coalesce(c_pct.cast("double"), F.lit(0.0)),
            F.coalesce(F.col("__m"), F.lit(0)),
            F.coalesce(F.col("__pm"), F.lit(0)),
            basis_code,
            F.unix_date(F.col(maturity)).cast("int"),
            F.unix_date(F.col(trade_d)).cast("int"),
            F.coalesce(sched_val, F.lit(0)),
            F.col("__is_zero"),
            F.coalesce(F.col("__valid"), F.lit(False)),
        ),
    )
    # non-convergence gate: |pv residual| is ~1e-9 for a converged row
    # and astronomically large for a clamp-bounced one — the 1e-6
    # branch can never flip between engines. Invalid rows (bad basis /
    # frequency, settlement at/past maturity, empty remaining leg,
    # rolled-back zero maturity) come back all-NaN from the kernel and
    # fail the gate, matching the reference's exception exit.
    v = F.abs(F.col("__r.pv_residual")) <= 1e-6
    pd_ = (p + F.col("__r.acclast")) + F.col("__r.pv_residual")
    out = (
        solved.withColumn(
            "ytm", F.when(v, F.round(F.col("__r.ytm") * 1.0, 6) + 0.0)
        )
        .withColumn(
            "prclean", F.when(v, F.round(pd_ - F.col("__r.acclast"), 6))
        )
        .withColumn("prfull", F.when(v, F.round(pd_, 6)))
        .withColumn("acclast", F.when(v, F.round(F.col("__r.acclast"), 6)))
        .withColumn("accpmt", F.when(v, F.round(F.col("__r.accpmt"), 6)))
        .withColumn(
            "accall",
            F.when(
                v,
                F.round(F.col("__r.acclast") + F.col("__r.accpmt"), 6),
            ),
        )
        .withColumn("mac_dur", F.when(v, F.round(F.col("__r.mac_dur"), 6)))
        .withColumn("mod_dur", F.when(v, F.round(F.col("__r.mod_dur"), 6)))
        .withColumn(
            "convexity", F.when(v, F.round(F.col("__r.convexity"), 6))
        )
    )
    return out.drop(
        "__m_c", "__is_zero", "__valid", "__m", "__pm", "__r"
    )


def _attach_quote_record(
    df: DataFrame,
    price: str,
    coupon_pct: str,
    coupon_type: str,
    ifreq: str,
    dcb: str,
    maturity: str,
    hist_m: str,
    trade_d: str,
) -> DataFrame:
    """The quote-convention model (pre-r16 default): uniform rate/m
    coupon amounts, (t - 1 + q)-period discount times, weekend-only T+2
    roll, unadjusted schedule dates. Exact vs the QuantLib contract on
    30/360 weekday grids; under ACT bases it prices the QUOTED
    convention, deviating from the reference's per-flow leg (measured
    bounds in test_reference_differential.py::
    test_w10_quote_model_act_bases_bounded)."""
    p, c_pct = F.col(price), F.col(coupon_pct)
    m_c, is_zero, basis_ok = _freq_and_branches(
        p, c_pct, coupon_type, ifreq, dcb
    )
    st = (
        df.withColumn("__settle", add_business_days(F.col(trade_d), 2))
        .withColumn("__m_c", m_c)
        .withColumn("__is_zero", is_zero)
        .withColumn(
            "__valid",
            basis_ok
            & (
                is_zero
                | (
                    (F.col(coupon_type) == "F")
                    & (c_pct > 0)
                    & m_c.isNotNull()
                )
            ),
        )
    )
    st = st.withColumn(
        "__m", F.when(F.col("__is_zero"), 1).otherwise(F.col("__m_c"))
    ).withColumn(
        "__pm",
        F.when(F.col("__is_zero"), F.lit(None)).otherwise(
            (12 / F.col("__m_c")).cast("int")
        ),
    )
    last_cpn, next_cpn = coupon_bracket(
        F.col("__settle"), F.col(maturity), F.col("__pm"), max_periods=250
    )
    coupon_row = F.col("__valid") & ~F.col("__is_zero")
    sched = st.withColumn("__last", F.when(coupon_row, last_cpn)).withColumn(
        "__next", F.when(coupon_row, next_cpn)
    )
    basis = F.col(dcb)
    months_left = (F.year(maturity) - F.year("__last")) * 12 + (
        F.month(maturity) - F.month("__last")
    )
    j_last = (months_left / F.col("__pm")).cast("int")
    par = (
        sched.withColumn(
            "__acclast",
            F.when(F.col("__is_zero"), F.lit(0.0)).otherwise(
                c_pct * dcf_by_basis(basis, F.col("__last"), F.col("__settle"))
            ),
        )
        .withColumn(
            "__q",
            F.when(
                F.col("__is_zero"),
                F.lit(1.0)
                * dcf_by_basis(basis, F.col("__settle"), F.col(maturity)),
            ).otherwise(
                # remaining fraction of the current coupon period as the
                # COMPLEMENT of the accrued fraction — QuantLib's
                # stepwise first-flow time is yearFraction(last, next) -
                # yearFraction(last, settle), which differs from
                # yearFraction(settle, next) under 30/360 when
                # settlement lands on day 29-31 (30/360 is not additive
                # through such a date; r15 contract differential)
                (
                    dcf_by_basis(basis, F.col("__last"), F.col("__next"))
                    - dcf_by_basis(basis, F.col("__last"), F.col("__settle"))
                )
                / dcf_by_basis(basis, F.col("__last"), F.col("__next"))
            ),
        )
        .withColumn("__n", F.when(F.col("__is_zero"), 1).otherwise(j_last))
        .withColumn(
            "__accpmt",
            F.when(F.col("__is_zero"), F.lit(0.0)).otherwise(
                ((F.col(hist_m) / F.col("__pm")).cast("int") - j_last).cast(
                    "double"
                )
                * c_pct
                / F.col("__m")
            ),
        )
        .withColumn(
            "__c",
            F.when(F.col("__is_zero"), F.lit(0.0)).otherwise(
                c_pct / (100.0 * F.col("__m"))
            ),
        )
        .withColumn("__pd", p + F.col("__acclast"))
    )
    # __n is null when settlement falls before the bounded backward
    # schedule (coupon_bracket's 250-period window) — coalesce keeps the
    # NaN out of the Arrow int64 cast (which would fail the whole job),
    # and the gate below nulls the record for such rows
    solved = par.withColumn(
        "__r",
        bond_analytics_frac(
            F.coalesce(F.col("__pd"), p),
            F.coalesce(F.col("__c"), F.lit(0.0)),
            F.coalesce(F.when(F.col("__valid"), F.col("__n")), F.lit(0)),
            F.coalesce(F.col("__m"), F.lit(1)),
            F.coalesce(F.col("__q"), F.lit(1.0)),
        ),
    )
    # non-convergence gate: |pv residual| is ~1e-9 for a converged row
    # and astronomically large for a clamp-bounced one — the 1e-6 branch
    # can never flip between engines
    v = (
        F.col("__valid")
        & F.col("__n").isNotNull()
        & (F.abs(F.col("__r.pv_residual")) <= 1e-6)
    )
    out = (
        solved.withColumn(
            "ytm", F.when(v, F.round(F.col("__r.ytm") * 1.0, 6) + 0.0)
        )
        .withColumn(
            "prclean",
            F.when(
                v,
                F.round(
                    F.col("__pd") + F.col("__r.pv_residual") - F.col("__acclast"),
                    6,
                ),
            ),
        )
        .withColumn(
            "prfull",
            F.when(v, F.round(F.col("__pd") + F.col("__r.pv_residual"), 6)),
        )
        .withColumn("acclast", F.when(v, F.round(F.col("__acclast"), 6)))
        .withColumn("accpmt", F.when(v, F.round(F.col("__accpmt"), 6)))
        .withColumn(
            "accall",
            F.when(v, F.round(F.col("__acclast") + F.col("__accpmt"), 6)),
        )
        .withColumn("mac_dur", F.when(v, F.round(F.col("__r.mac_dur"), 6)))
        .withColumn("mod_dur", F.when(v, F.round(F.col("__r.mod_dur"), 6)))
        .withColumn(
            "convexity", F.when(v, F.round(F.col("__r.convexity"), 6))
        )
    )
    return out.drop(
        "__calw", "__calm", "__settle", "__m_c", "__is_zero", "__valid", "__m", "__pm",
        "__last", "__next", "__acclast", "__q", "__n", "__accpmt", "__c",
        "__pd", "__r",
    )
