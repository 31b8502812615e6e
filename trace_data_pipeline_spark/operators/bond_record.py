"""W10 unified analytics record — the reference's GetNewVarsPy surface
(`stage1/helper_functions.py:44-255`) as ONE reusable operator.

Given a frame carrying (clean price, annual coupon %, interest_frequency
code, day_count_basis, maturity, schedule history length, trade date),
attaches the full 9-output record: ytm, prclean, prfull, acclast,
accpmt, accall, mac_dur, mod_dur, convexity.

Spark shape: settlement roll, backward coupon bracket (O(1) probe),
day-count routing, and the accrued trio are all codegen'd column
algebra in one projection; the only Python is the Arrow-batched Newton
solve of the dirty price with flows at fractional period offsets. One
pass, zero shuffles, zero joins — at 100 TB this pipelines with
whatever partitioning the input already has.

Semantics per the reference:
- T+2 settlement (weekend roll; the holiday-exact variant is the F9
  calendar semi-join / `add_business_days_calendar`);
- day_count_basis ∈ {30/360, ACT/ACT, ACT/360, ACT/365} routed per row;
- interest_frequency '1'/'2'/'4'/'12', with '0'/'99' defaulting to
  semiannual when coupon > 0 (helper_functions.py:104-109);
- coupon_type 'Z' — and zero-coupon-eligible 'F' rows (no coupon,
  priced below par) — priced as a single flow with annual compounding;
- 'F' with no coupon at/above par → bond is None → all-null record;
- solver non-convergence → all-null record (the try/except RuntimeError
  → NaN contract).

Assumes a regular schedule (dated_date ON the coupon grid, expressed as
`hist_m` months of history before maturity). The reference's irregular
first-stub accruals are handled by the dedicated odd-first-coupon path
(`bond_math.bond_analytics_stub` / the `w10h_odd_first_coupon` plan),
not by this record operator.

Differential status vs the QuantLib contract (r15,
tests/ql_contract.py + test_reference_differential.py): on 30/360 with
weekday schedules all 9 outputs are EXACT to solver/rounding tolerance,
including the stepwise first-flow time through a day-29-31 settlement
(the complement-form q below). Documented deviations:

- ACT bases: QuantLib's FixedRateLeg pays rate*dcf(start, end) per
  period and discounts at stepwise ACT times (ACT/360 semiannual pays
  ~rate*181/360, not rate/2); this operator keeps the uniform rate/m
  quote-convention model. Measured gap over the quoted regime
  (|ytm| < 50%): |Δytm| < 1e-2 (< 9e-4 beyond 1y to run), durations/
  convexity < 3.5% rel, accrued EXACT, prices re-fit exactly. For
  QuantLib-exact ACT output use `bond_math.bond_analytics_times` /
  the `w10i_act_exact_record` plan — per-flow amounts and times,
  contract-exact on all 9 outputs (r15 differential).
- Yields below -90% per period (price far above the remaining flows,
  settlement in the last period) return the all-null record: the
  solver's -0.9 clamp keeps (1+y)^-250 inside float range. QuantLib's
  root exists down to (1+y/m) > 0; the reference would report it when
  its solver converges.
- Settlement rolls weekends only (NYSE holidays via the F9 calendar
  join when exact parity matters), and coupon dates are kept
  unadjusted — ModifiedFollowing on a weekend coupon date shifts
  QuantLib's accrual amounts/times by the roll.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from trace_data_pipeline_spark.functions.daycount import (
    add_business_days,
    coupon_bracket,
    dcf_by_basis,
)
from trace_data_pipeline_spark.operators.bond_math import bond_analytics_frac

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
) -> DataFrame:
    """Attach the 9 analytics columns (RECORD_COLS) to `df`."""
    p, c_pct = F.col(price), F.col(coupon_pct)
    # the reference raises ValueError on an unrecognized interest
    # frequency (helper_functions.py:104-109); here the row degrades to
    # the all-null record instead of failing the job: only '0'/'99'/null
    # take the semiannual default, anything else leaves m_c null, which
    # __valid below folds in
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
    # where null accrued/q coalesce into solver defaults
    basis_ok = F.col(dcb).isin(
        "30/360", "", "ACT/ACT", "ACT/360", "ACT/365", "ACT/366"
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
        "__settle", "__m_c", "__is_zero", "__valid", "__m", "__pm",
        "__last", "__next", "__acclast", "__q", "__n", "__accpmt", "__c",
        "__pd", "__r",
    )
