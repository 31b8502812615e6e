"""Sanity vectors for the W10 closed-form bond engine."""

from __future__ import annotations

import pandas as pd
import pytest

from pyspark.sql import functions as F

from trace_data_pipeline_spark.operators.bond_math import bond_analytics


def _solve(spark, rows):
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["p", "c", "n"]))
    out = df.withColumn("r", bond_analytics(F.col("p"), F.col("c"), F.col("n")))
    return out.select("p", "c", "n", "r.*").collect()


def test_par_bond_yields_coupon(spark):
    """A bond priced at par yields exactly its coupon; Macaulay duration
    of a 1-period bond is half a year (one semiannual period)."""
    rows = _solve(spark, [(100.0, 0.025, 10), (100.0, 0.025, 1)])
    for r in rows:
        assert r["ytm"] == pytest.approx(0.05, abs=1e-10)
        assert r["pv_residual"] == pytest.approx(0.0, abs=1e-8)
    one = next(r for r in rows if r["n"] == 1)
    assert one["mac_dur"] == pytest.approx(0.5, abs=1e-10)


def test_discount_premium_monotonicity(spark):
    """Price below par → yield above coupon; above par → below; longer
    maturity → longer duration."""
    rows = _solve(
        spark, [(90.0, 0.02, 10), (110.0, 0.02, 10), (90.0, 0.02, 20)]
    )
    by = {(r["p"], r["n"]): r for r in rows}
    assert by[(90.0, 10)]["ytm"] > 0.04 > by[(110.0, 10)]["ytm"]
    assert by[(90.0, 20)]["mac_dur"] > by[(90.0, 10)]["mac_dur"]
    zero = _solve(spark, [(78.0, 0.0, 10)])[0]
    # zero-coupon Macaulay duration = time to maturity exactly
    assert zero["mac_dur"] == pytest.approx(5.0, abs=1e-10)
    assert zero["mod_dur"] < zero["mac_dur"]


def test_invalid_inputs_yield_nan(spark):
    """NaN-on-failure contract (reference helper_functions.py:242-243)."""
    rows = _solve(spark, [(0.0, 0.02, 10), (100.0, 0.02, 0)])
    for r in rows:
        assert r["ytm"] is None or r["ytm"] != r["ytm"]


def test_t2_settlement_weekend_roll(spark):
    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.functions.daycount import add_business_days

    cases = spark.createDataFrame(
        [
            ("2024-01-02",),  # Tue -> Thu
            ("2024-01-04",),  # Thu -> Mon (rolls over the weekend)
            ("2024-01-05",),  # Fri -> Tue
            ("2024-01-06",),  # Sat -> Tue (first +1 lands Sun -> Mon, then Tue)
        ],
        "d string",
    ).select(F.col("d").cast("date").alias("d"))
    got = [
        str(r.s)
        for r in cases.select(add_business_days(F.col("d"), 2).alias("s"))
        .orderBy("s")
        .collect()
    ]
    assert got == ["2024-01-04", "2024-01-08", "2024-01-09", "2024-01-09"]


def test_t2_calendar_roll_differs_on_holiday_straddle(spark):
    """Golden: Thursday 2024-01-11 T+2 — the weekend-only fold lands on
    Monday 2024-01-15; the calendar-aware roll sees that Monday as a
    holiday and settles Tuesday 2024-01-16."""
    import pyspark.sql.functions as F

    from trace_data_pipeline_spark.functions.daycount import add_business_days
    from trace_data_pipeline_spark.operators.temporal import (
        add_business_days_calendar,
    )

    trades = spark.createDataFrame(
        [("2024-01-11",), ("2024-01-10",)], ["trade_d"]
    ).select(F.col("trade_d").cast("date"))
    cal = (
        spark.range(0, 40)
        .select(
            F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int"))
            .alias("session_date")
        )
        .filter(
            ~F.dayofweek("session_date").isin(1, 7)
            & (F.col("session_date") != F.lit("2024-01-15").cast("date"))
        )
    )
    got = {
        str(r["trade_d"]): (str(r["settle_dt"]), str(r["weekend_only"]))
        for r in add_business_days_calendar(trades, "trade_d", cal, n=2)
        .withColumn("weekend_only", add_business_days(F.col("trade_d"), 2))
        .collect()
    }
    # Wed 01-10: both roll to Fri 01-12 — no holiday in the way
    assert got["2024-01-10"] == ("2024-01-12", "2024-01-12")
    # Thu 01-11: weekend-only says Mon 01-15; the calendar skips the holiday
    assert got["2024-01-11"] == ("2024-01-16", "2024-01-15")


def test_full_record_branches(spark):
    """w10e operator: coupon row, zero-coupon row, bond-None row, and
    the accrued identity accall = acclast + accpmt."""
    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.operators.bond_record import (
        RECORD_COLS,
        attach_full_record,
    )

    rows = [
        # F semiannual 4%: regular coupon bond
        (1, "F", "2", 4.0, "30/360", "2030-06-15", 96, "2024-03-11", 95.0),
        # Z zero-coupon below par
        (2, "Z", "0", 0.0, "ACT/365", "2032-06-15", 96, "2024-03-11", 70.0),
        # F, no coupon, priced above par -> bond None -> all-null
        (3, "F", "0", 0.0, "ACT/360", "2030-06-15", 96, "2024-03-11", 120.0),
        # F, no coupon, below par -> zero-eligible
        (4, "F", "99", 0.0, "ACT/ACT", "2031-06-15", 96, "2024-03-11", 80.0),
    ]
    df = spark.createDataFrame(
        rows,
        "k int, ctype string, ifreq string, c_pct double, dcb string,"
        " maturity string, hist_m int, trade_d string, p double",
    ).select(
        "k", "ctype", "ifreq", "c_pct", "dcb",
        F.col("maturity").cast("date").alias("maturity"),
        "hist_m",
        F.col("trade_d").cast("date").alias("trade_d"),
        "p",
    )
    got = {
        r["k"]: r
        for r in attach_full_record(df).select("k", *RECORD_COLS).collect()
    }
    cpn = got[1]
    assert cpn["ytm"] is not None and cpn["ytm"] > 0.04  # priced below par
    assert abs(cpn["prclean"] - 95.0) < 1e-4  # round-trip of input price
    assert abs(cpn["prfull"] - (95.0 + cpn["acclast"])) < 1e-4
    assert cpn["acclast"] > 0  # mid-period settle accrues
    assert abs(cpn["accall"] - (cpn["acclast"] + cpn["accpmt"])) < 1e-9
    assert 0 < cpn["mod_dur"] < cpn["mac_dur"]

    zero = got[2]
    assert zero["acclast"] == 0.0 and zero["accpmt"] == 0.0
    assert zero["ytm"] is not None and zero["ytm"] > 0
    # zero-coupon Macaulay duration == time to maturity in years (~8.26)
    assert 8.0 < zero["mac_dur"] < 8.6
    assert abs(zero["prclean"] - 70.0) < 1e-4

    none_row = got[3]
    assert all(none_row[c] is None for c in RECORD_COLS)

    zf = got[4]
    assert zf["ytm"] is not None and zf["acclast"] == 0.0


def test_golden_textbook_vectors(spark):
    """Golden pins against standard textbook bond mathematics (nominal
    annual yield compounded m times/year — the reference's QuantLib
    `stage1/helper_functions.py:44-255` convention), NOT against the
    engine's own oracle replay:

    1. 3y 10% semiannual priced 95.082676 -> ytm 12% (the classic
       price-at-12%-yield worked example);
    2. 10y 6% semiannual AT PAR -> ytm = coupon, Macaulay duration
       (1+i)/i·(1-(1+i)^-n) periods = 7.661900 years (the par-bond
       duration closed form);
    3. 8y zero at 5% annual -> D = T years, D_mod = T/(1+y),
       convexity = T(T+1)/(1+y)^2;
    4. 5y 8% quarterly at 10% -> frequency generality.

    All constants derive from the direct closed-form PV/weight sums —
    an independent arithmetic path from the engine's Newton iteration."""
    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.operators.bond_math import (
        bond_analytics_freq,
    )

    rows = [
        # (k, price, coupon_per_period, n_periods, m, exp_ytm, mac, mod, conv)
        (1, 95.082676, 0.05, 6, 2, 0.12, 2.654846, 2.504572, 7.925044),
        (2, 100.0, 0.03, 20, 2, 0.06, 7.661900, 7.438737, 68.774822),
        (3, 67.683936, 0.0, 8, 1, 0.05, 8.0, 7.619048, 65.306122),
        (4, 92.205419, 0.02, 20, 4, 0.10, 4.127793, 4.027116, 19.277919),
    ]
    df = spark.createDataFrame(
        rows,
        "k int, p double, c double, n int, m int,"
        " e_ytm double, e_mac double, e_mod double, e_conv double",
    )
    got = {
        r["k"]: r
        for r in df.withColumn(
            "r", bond_analytics_freq("p", "c", "n", "m")
        ).select("k", "r.*").collect()
    }
    for k, _p, _c, _n, _m, e_ytm, e_mac, e_mod, e_conv in rows:
        r = got[k]
        assert abs(r["ytm"] - e_ytm) < 1e-6, (k, r["ytm"], e_ytm)
        assert abs(r["mac_dur"] - e_mac) < 1e-5, (k, r["mac_dur"], e_mac)
        assert abs(r["mod_dur"] - e_mod) < 1e-5, (k, r["mod_dur"], e_mod)
        assert abs(r["convexity"] - e_conv) < 1e-4, (k, r["convexity"], e_conv)
        assert abs(r["pv_residual"]) < 1e-6


def test_full_record_degrades_to_null_not_job_failure(spark):
    """ADVICE round 3: rows the reference would raise on (unknown basis
    / unknown frequency) and rows past the bounded backward schedule
    (monthly bond >250 months to maturity -> null coupon bracket) must
    produce the all-null record — never a partial record, never a
    failed job from NaN hitting the Arrow int64 cast."""
    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.operators.bond_record import (
        RECORD_COLS,
        attach_full_record,
    )

    rows = [
        # monthly coupon, ~36 years to maturity: 432 periods. The QUOTE
        # model's 250-period backward window nulls it; the default
        # quantlib model builds the full schedule like the reference
        # and SOLVES it (asserted below).
        (1, "F", "12", 5.0, "30/360", "2060-06-15", 480, "2024-03-11", 95.0),
        # unrecognized day-count basis
        (2, "F", "2", 4.0, "BUS/252", "2030-06-15", 96, "2024-03-11", 95.0),
        # unrecognized interest frequency code
        (3, "F", "6", 4.0, "30/360", "2030-06-15", 96, "2024-03-11", 95.0),
        # control: a healthy coupon row in the same frame still solves
        (4, "F", "2", 4.0, "30/360", "2030-06-15", 96, "2024-03-11", 95.0),
    ]
    df = spark.createDataFrame(
        rows,
        "k int, ctype string, ifreq string, c_pct double, dcb string,"
        " maturity string, hist_m int, trade_d string, p double",
    ).select(
        "k", "ctype", "ifreq", "c_pct", "dcb",
        F.col("maturity").cast("date").alias("maturity"),
        "hist_m",
        F.col("trade_d").cast("date").alias("trade_d"),
        "p",
    )
    got = {
        r["k"]: r
        for r in attach_full_record(df).select("k", *RECORD_COLS).collect()
    }
    for k in (2, 3):
        assert all(got[k][c] is None for c in RECORD_COLS), (
            f"row {k} must be the ALL-null record, got {got[k]}"
        )
    assert got[4]["ytm"] is not None and got[4]["prclean"] is not None
    # default model: the 432-period schedule is in contract and solves
    assert got[1]["ytm"] is not None
    assert abs(got[1]["prclean"] - 95.0) < 1e-4

    quote = {
        r["k"]: r
        for r in attach_full_record(df, model="quote")
        .select("k", *RECORD_COLS)
        .collect()
    }
    for k in (1, 2, 3):
        assert all(quote[k][c] is None for c in RECORD_COLS), (
            f"quote row {k} must be the ALL-null record, got {quote[k]}"
        )
    assert quote[4]["ytm"] is not None


def test_golden_leap_year_act_act_straddle(spark):
    """QuantLib-edge golden (r4 verdict item 6): an ACT/ACT ISDA
    accrual period STRADDLING Feb 29. Semiannual 6% bond, coupons
    Dec-15/Jun-15, trade Mon 2024-03-11 -> T+2 settle 2024-03-13:

      acclast = 6 x (17/365 + 72/366)        = 1.459780
                 (17 days of 2023 at 365, 72 days of leap-2024 at 366
                  -- a single-year basis would give 6 x 89/365 = 1.463014,
                  so the pin detects any leap-handling regression)
      q       = (94/366) / (17/365 + 166/366) = 0.5135305
      price   = PV at nominal 8% (y=0.04/period, flows at q, q+1, q+2)
                minus acclast                  = 97.63795893451329

    All constants hand-derived from calendar day counts + closed-form
    PV -- an independent arithmetic path from the engine's fractional
    Newton solver. Pinned on the QUOTE model: the constants assume the
    UNADJUSTED Jun-15/Dec-15 grid (Jun-15-2024 is a Saturday the
    default quantlib model MF-adjusts); the default model's ACT/ACT
    leap handling is pinned by the exact contract differential
    instead."""
    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.operators.bond_record import (
        RECORD_COLS,
        attach_full_record,
    )

    df = spark.createDataFrame(
        [(1, "F", "2", 6.0, "ACT/ACT", "2025-06-15", 24, "2024-03-11",
          97.63795893451329)],
        "k int, ctype string, ifreq string, c_pct double, dcb string,"
        " maturity string, hist_m int, trade_d string, p double",
    ).select(
        "k", "ctype", "ifreq", "c_pct", "dcb",
        F.col("maturity").cast("date").alias("maturity"),
        "hist_m",
        F.col("trade_d").cast("date").alias("trade_d"),
        "p",
    )
    r = (
        attach_full_record(df, model="quote")
        .select(*RECORD_COLS)
        .collect()[0]
    )
    assert abs(r["acclast"] - 1.459780) < 1e-6, r["acclast"]
    assert abs(r["ytm"] - 0.08) < 1e-6, r["ytm"]
    assert abs(r["prclean"] - 97.637959) < 1e-5
    assert abs(r["prfull"] - (97.63795893451329 + 1.4597799236469795)) < 1e-4
    assert abs(r["mac_dur"] - 1.212832) < 1e-5, r["mac_dur"]
    # hist_m 24 = 4 whole periods, j_last = 3 -> one banked coupon
    assert abs(r["accpmt"] - 3.0) < 1e-9


def test_golden_monthly_250_period_boundary(spark):
    """The ADVICE-r3 crash case pinned at its exact BOUNDARY (QUOTE
    model): its backward schedule is bounded at 250 periods, so a
    monthly bond 243 months from settlement still solves while one 255
    months out falls off the window and must yield the ALL-null record
    (never a crash, never a partial record) -- and the boundary must
    not over-null the in-window row. The default quantlib model has no
    such window (the reference builds the whole schedule) and must
    solve BOTH rows."""
    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.operators.bond_record import (
        RECORD_COLS,
        attach_full_record,
    )

    rows = [
        # settle 2024-03-13; maturity 2044-06-15 -> ~243 months: inside
        (1, "F", "12", 5.0, "30/360", "2044-06-15", 480, "2024-03-11", 95.0),
        # maturity 2045-06-15 -> ~255 months > 250: outside -> all-null
        (2, "F", "12", 5.0, "30/360", "2045-06-15", 480, "2024-03-11", 95.0),
    ]
    df = spark.createDataFrame(
        rows,
        "k int, ctype string, ifreq string, c_pct double, dcb string,"
        " maturity string, hist_m int, trade_d string, p double",
    ).select(
        "k", "ctype", "ifreq", "c_pct", "dcb",
        F.col("maturity").cast("date").alias("maturity"),
        "hist_m",
        F.col("trade_d").cast("date").alias("trade_d"),
        "p",
    )
    got = {
        r["k"]: r
        for r in attach_full_record(df, model="quote")
        .select("k", *RECORD_COLS)
        .collect()
    }
    inside = got[1]
    assert inside["ytm"] is not None and inside["ytm"] > 0.05  # below par
    assert abs(inside["prclean"] - 95.0) < 1e-4
    assert all(got[2][c] is None for c in RECORD_COLS), got[2]

    full = {
        r["k"]: r
        for r in attach_full_record(df).select("k", *RECORD_COLS).collect()
    }
    for k in (1, 2):
        assert full[k]["ytm"] is not None and full[k]["ytm"] > 0.05
        assert abs(full[k]["prclean"] - 95.0) < 1e-4


def test_irregular_first_coupon_out_of_contract(spark):
    """Odd-first-coupon schedules are OUT OF CONTRACT (module
    docstring: the schedule is the regular backward grid expressed as
    hist_m months of history; the reference's irregular first-stub
    accruals are out of scope). A hist_m that is NOT a multiple of the
    period (21 months on a semiannual grid = an odd 3-month first
    stub) is treated as floor(21/6) = 3 whole periods: the stub
    contributes NO banked-coupon accrual. This golden pins that
    documented approximation so any silent behavior change surfaces.
    The IN-CONTRACT odd-stub path is `bond_analytics_stub` / the
    `w10h_odd_first_coupon` entry (tests below)."""
    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.operators.bond_record import (
        RECORD_COLS,
        attach_full_record,
    )

    df = spark.createDataFrame(
        [(1, "F", "2", 6.0, "ACT/ACT", "2025-06-15", 21, "2024-03-11",
          97.63795893451329)],
        "k int, ctype string, ifreq string, c_pct double, dcb string,"
        " maturity string, hist_m int, trade_d string, p double",
    ).select(
        "k", "ctype", "ifreq", "c_pct", "dcb",
        F.col("maturity").cast("date").alias("maturity"),
        "hist_m",
        F.col("trade_d").cast("date").alias("trade_d"),
        "p",
    )
    r = attach_full_record(df).select(*RECORD_COLS).collect()[0]
    # identical bond to the leap golden except the off-grid history:
    # floor(21/6)=3 whole periods == j_last -> zero banked coupons,
    # while the true odd-stub accrual would be positive
    assert r["ytm"] is not None
    assert r["accpmt"] == 0.0
    assert abs(r["acclast"] - 1.459780) < 1e-6  # grid accrual unchanged


def test_yield_to_worst_callable_goldens(spark):
    """w10f goldens: the to-worst economics over one next-call exercise.

    Premium callable — 8%/yr coupon priced at 110, callable at 100 in
    2 years (4 semiannual periods) vs 10 years to maturity: losing the
    above-market coupon early makes ytc < ytm, so ytw = ytc < ytm.

    Discount callable — same schedule priced at 90: early redemption at
    par ABOVE the purchase price accelerates the pull-to-par gain, so
    ytc > ytm and ytw = ytm (the call is the investor-friendly leg).
    """
    from trace_data_pipeline_spark.operators.bond_math import (
        bond_analytics,
        bond_analytics_red,
    )

    df = spark.createDataFrame(
        [("premium", 110.0), ("discount", 90.0)], "tag string, p double"
    )
    out = (
        df.withColumn("rm", bond_analytics(F.col("p"), F.lit(0.04), F.lit(20)))
        .withColumn(
            "rc",
            bond_analytics_red(F.col("p"), F.lit(0.04), F.lit(4), F.lit(100.0)),
        )
        .select(
            "tag",
            F.col("rm.ytm").alias("ytm"),
            F.col("rc.ytm").alias("ytc"),
            F.least(F.col("rm.ytm"), F.col("rc.ytm")).alias("ytw"),
            F.col("rm.pv_residual").alias("res_m"),
            F.col("rc.pv_residual").alias("res_c"),
        )
    )
    got = {r["tag"]: r for r in out.collect()}
    for r in got.values():
        assert abs(r["res_m"]) < 1e-8 and abs(r["res_c"]) < 1e-8
    prem, disc = got["premium"], got["discount"]
    assert prem["ytc"] < prem["ytm"] < 0.08  # premium: call leg is worst
    assert prem["ytw"] == prem["ytc"]
    assert disc["ytc"] > disc["ytm"] > 0.08  # discount: maturity leg is worst
    assert disc["ytw"] == disc["ytm"]


def test_yield_to_worst_call_at_premium_redemption(spark):
    """A call price above par shifts the call leg's redemption flow: a
    par-priced 6% bond callable at 103 in 1 year must show ytc > ytm
    (the holder pockets the 3-point premium), and the redemption wiring
    must reproduce the closed-form one-period identity at n = 2:
    solving 100 = 3/(1+y) + 106/(1+y)^2... use n_call = 2 so the
    engine's schedule has a coupon then coupon+103."""
    from trace_data_pipeline_spark.operators.bond_math import (
        bond_analytics,
        bond_analytics_red,
    )

    df = spark.createDataFrame([(100.0,)], "p double")
    r = (
        df.withColumn("rm", bond_analytics(F.col("p"), F.lit(0.03), F.lit(20)))
        .withColumn(
            "rc",
            bond_analytics_red(F.col("p"), F.lit(0.03), F.lit(2), F.lit(103.0)),
        )
        .select("rm.*", F.col("rc.ytm").alias("ytc"))
        .collect()[0]
    )
    # par bond at par yields its coupon exactly on the maturity leg
    assert r["ytm"] == pytest.approx(0.06, abs=1e-10)
    assert r["ytc"] > r["ytm"]
    # closed form: y solves 3(1+y)^-1 + 106(1+y)^-2 = 100 (per-period),
    # y = (3 + sqrt(9 + 4*100*106)) / 200 - 1 annualized x2
    import math

    y_pp = (3.0 + math.sqrt(9.0 + 4.0 * 100.0 * 106.0)) / 200.0 - 1.0
    assert r["ytc"] == pytest.approx(2.0 * y_pp, abs=1e-9)


def test_modified_following_goldens(spark):
    """ModifiedFollowing convention goldens against the rule calendar,
    including years past the module's 2030 default range:

    - a session date stands (Fri 2031-10-31);
    - Sat 2029-06-30: next session is Mon JULY 2 -> crosses the month,
      rolls BACK to Fri 2029-06-29;
    - Sat 2031-08-09: next session Mon 2031-08-11, same month -> FORWARD;
    - Christmas 2031 (Thu) mid-month: holiday -> forward to Fri 26;
    - New Year's-adjacent: Wed 2031-12-31 is a session -> stands.
    """
    import datetime as dt

    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.functions.nyse_calendar import (
        nyse_sessions_df,
    )
    from trace_data_pipeline_spark.operators.temporal import (
        modified_following_calendar,
    )

    cal = nyse_sessions_df(spark, dt.date(2029, 1, 1), dt.date(2032, 12, 31))
    cases = spark.createDataFrame(
        [
            ("2031-10-31",),
            ("2029-06-30",),
            ("2031-08-09",),
            ("2031-12-25",),
            ("2031-12-31",),
        ],
        "d string",
    ).select(F.col("d").cast("date").alias("d"))
    got = {
        str(r["d"]): str(r["adj_dt"])
        for r in modified_following_calendar(cases, "d", cal).collect()
    }
    assert got["2031-10-31"] == "2031-10-31"  # Friday session stands
    assert got["2029-06-30"] == "2029-06-29"  # month-end Sat -> backward
    assert got["2031-08-09"] == "2031-08-11"  # mid-month Sat -> forward
    assert got["2031-12-25"] == "2031-12-26"  # holiday Thu -> Fri
    assert got["2031-12-31"] == "2031-12-31"  # year-end Wed session stands


def test_yield_to_worst_schedule_multi_call(spark):
    """w10g semantics golden: for a premium callable with TWO call
    dates at par, the EARLIEST call is the worst (the above-market
    coupon is lost soonest), so ytw must equal the 2-period call
    yield, strictly below the 6-period call yield, strictly below
    ytm. Plus the definitional invariants on the full catalog frame:
    ytw <= ytm always; worst_is_call = 1 exactly when a call leg is
    strictly worse."""
    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.operators.bond_math import (
        bond_analytics,
        bond_analytics_red,
    )
    from trace_data_pipeline_spark.plans import get_catalog

    df = spark.createDataFrame([(112.0,)], "p double")
    r = (
        df.withColumn("rm", bond_analytics(F.col("p"), F.lit(0.04), F.lit(20)))
        .withColumn("c1", bond_analytics_red(F.col("p"), F.lit(0.04), F.lit(2), F.lit(100.0)))
        .withColumn("c2", bond_analytics_red(F.col("p"), F.lit(0.04), F.lit(6), F.lit(100.0)))
        .select(
            F.col("rm.ytm").alias("ytm"),
            F.col("c1.ytm").alias("y_call_early"),
            F.col("c2.ytm").alias("y_call_late"),
        )
        .collect()[0]
    )
    assert r["y_call_early"] < r["y_call_late"] < r["ytm"]

    out = (
        get_catalog()["w10g_yield_to_worst_schedule"]
        .builder(spark, "/root/testdata/sf0.001")
        .cache()
    )
    assert out.filter(F.col("ytw") > F.col("ytm") + 1e-9).count() == 0
    # worst_is_call consistency: flag set  => ytw <= ytm (a call won on
    # the UNROUNDED yields; a marginal win can round to the same 6dp
    # value, so strict < would be data-dependent at larger TEST_SF_DIR
    # scales — ADVICE r9); flag clear => ytw == ytm (rounded at the
    # same 6dp)
    assert (
        out.filter((F.col("worst_is_call") == 1) & (F.col("ytw") > F.col("ytm"))).count()
        == 0
    )
    assert (
        out.filter((F.col("worst_is_call") == 0) & (F.col("ytw") != F.col("ytm"))).count()
        == 0
    )
    # non-callable rows carry no call yield
    assert out.filter((F.col("n_calls") == 0) & F.col("ytc_worst").isNotNull()).count() == 0
    out.unpersist()


def test_odd_first_coupon_textbook_golden(spark):
    """w10h golden: the classic 30/360 short-first-stub example,
    round-tripped through an INDEPENDENT textbook PV (plain-Python
    sum, no Newton). 8% semiannual bond, maturity 2030-12-15, backward
    grid ... 2029-06-15 / 2029-12-15, dated 2029-08-01 (off-grid),
    settled 2029-10-01 inside the stub:
      odd first coupon = 8 x 134/360 = 2.977_7  (< regular 4.0)
      accrued at settle = 8 x 60/360  = 1.333_3  (from DATED date)
      q = 74/180 of a regular period remains to the first flow.
    Price the bond at a known 6% yield with the independent PV; the
    engine must recover ytm = 0.06 and the same duration sums."""
    from trace_data_pipeline_spark.operators.bond_math import (
        bond_analytics_stub,
    )

    cf1 = 8.0 * 134.0 / 360.0
    acc = 8.0 * 60.0 / 360.0
    q = 74.0 / 180.0
    assert cf1 < 4.0  # short stub pays less than a regular coupon
    y = 0.03  # per semiannual period (6%/yr)
    v = 1.0 / (1.0 + y)
    flows = [(0 + q, cf1), (1 + q, 4.0), (2 + q, 104.0)]
    dirty = sum(cf * v**t for t, cf in flows)
    wsum = sum(t * cf * v**t for t, cf in flows)
    mac_years = wsum / dirty / 2.0

    df = spark.createDataFrame(
        pd.DataFrame(
            [[dirty, 0.04, 3, 2, q, cf1]],
            columns=["pd", "c", "n", "m", "q", "cf1"],
        )
    )
    r = (
        df.withColumn(
            "r",
            bond_analytics_stub(
                F.col("pd"), F.col("c"), F.col("n"), F.col("m"),
                F.col("q"), F.col("cf1"),
            ),
        )
        .select("r.*")
        .collect()[0]
    )
    assert r["ytm"] == pytest.approx(0.06, abs=1e-9)
    assert r["pv_residual"] == pytest.approx(0.0, abs=1e-8)
    assert r["mac_dur"] == pytest.approx(mac_years, abs=1e-9)
    assert r["mod_dur"] == pytest.approx(mac_years / 1.03, abs=1e-9)
    # clean price the entry would report: dirty - accrued-from-dated
    assert dirty - acc < dirty  # accrual runs from the dated date


def test_odd_first_coupon_on_grid_degenerates_to_regular(spark):
    """w10h golden: with the dated date ON the grid under 30/360 the
    stub machinery must vanish — cf1 = regular coupon, q = 1 — and the
    record must equal both the fractional and the whole-period engines
    to machine precision."""
    from trace_data_pipeline_spark.operators.bond_math import (
        bond_analytics,
        bond_analytics_frac,
        bond_analytics_stub,
    )

    # dated = settle = 2029-06-15 (grid point), first 2029-12-15:
    # dcf360 = 180/360 = 0.5 -> cf1 = 8 * 0.5 = 4.0 = c*100; q = 1
    p, c, n, m = 97.25, 0.04, 3, 2
    df = spark.createDataFrame(
        pd.DataFrame(
            [[p, c, n, m, 1.0, 4.0]],
            columns=["pd", "c", "n", "m", "q", "cf1"],
        )
    )
    stub = (
        df.withColumn(
            "r",
            bond_analytics_stub(
                F.col("pd"), F.col("c"), F.col("n"), F.col("m"),
                F.col("q"), F.col("cf1"),
            ),
        )
        .select("r.*")
        .collect()[0]
    )
    frac = (
        df.withColumn(
            "r",
            bond_analytics_frac(
                F.col("pd"), F.col("c"), F.col("n"), F.col("m"), F.col("q")
            ),
        )
        .select("r.*")
        .collect()[0]
    )
    whole = (
        df.withColumn(
            "r", bond_analytics(F.col("pd"), F.col("c"), F.col("n"))
        )
        .select("r.*")
        .collect()[0]
    )
    for k in ("ytm", "mac_dur", "mod_dur", "convexity"):
        assert stub[k] == pytest.approx(frac[k], abs=1e-12)
        # whole-period engine seeds Newton differently (0.03 vs 0.06/m);
        # both converge to machine precision, so 1e-10 closes the gap
        assert stub[k] == pytest.approx(whole[k], abs=1e-10)


def test_odd_first_coupon_catalog_invariants(spark):
    """w10h over the synthetic catalog at sf0.001: stub fractions are
    in (0, 1], off-grid rows are genuinely short stubs, on-grid rows
    (o_orderkey % 11 == 0, 30/360) carry stub_frac == 1, and accrued
    never exceeds the odd coupon's full-period ceiling."""
    from trace_data_pipeline_spark.plans import get_catalog

    out = (
        get_catalog()["w10h_odd_first_coupon"]
        .builder(spark, "/root/testdata/sf0.001")
        .cache()
    )
    assert out.filter((F.col("stub_frac") <= 0) | (F.col("stub_frac") > 1.000001)).count() == 0
    # every 11th key is on-grid; under 30/360 that is exactly frac 1
    on_grid_360 = out.filter(
        (F.col("o_orderkey") % 44 == 0) & (F.col("o_orderkey") % 11 == 0)
    )
    assert on_grid_360.count() > 0
    assert on_grid_360.filter(F.col("stub_frac") != 1.0).count() == 0
    # short stubs dominate the off-grid rows
    assert out.filter(F.col("stub_frac") < 1.0).count() > 0
    # solver converged everywhere on this grid (parity also pins this)
    assert out.filter(F.col("ytm").isNull()).count() == 0
    out.unpersist()


def test_cfh_oracle_fragment_symmetric_with_engine_kernel():
    """r10 ADVICE: the w10h oracle's cash-flow CASE (`_CFH`) must stay
    SYMMETRIC with the engine's `_sums` kernel at every n — including
    the n = 1 single-flow corner, unreachable by today's synthesis
    (n = n_hist + 1 >= 3) but a latent parity trap if the fragment is
    ever reused. Pin the PV the fragment computes in DuckDB against the
    kernel's, per n in {1, 2, 5}: at n = 1 both must pay the odd first
    coupon PLUS the 100 redemption."""
    import duckdb
    import numpy as np

    from trace_data_pipeline_spark.operators.bond_math import _sums
    from trace_data_pipeline_spark.plans.bond_plan import _CFH

    c, y, q, cf1 = 0.025, 0.031, 0.63, 1.7
    con = duckdb.connect()
    for n in (1, 2, 5):
        [(pv_oracle,)] = con.execute(
            f"""
            SELECT list_sum(list_transform(range(1, n + 1),
              t -> {_CFH} * power(1.0 / (1.0 + y),
                                  CAST(t AS DOUBLE) - 1.0 + q)))
            FROM (SELECT CAST({n} AS INT) AS n, CAST({c} AS DOUBLE) AS c,
                         CAST({y} AS DOUBLE) AS y, CAST({q} AS DOUBLE) AS q,
                         CAST({cf1} AS DOUBLE) AS cf1)
            """
        ).fetchall()
        pv_engine, _, _, _ = _sums(
            np.array([c]),
            np.array([n]),
            np.array([y]),
            n,
            q=np.array([q]),
            cf1=np.array([cf1]),
        )
        assert pv_oracle == pytest.approx(pv_engine[0], abs=1e-12), n
    # the n = 1 corner really pays redemption: strictly more than the
    # stub coupon alone discounted at the stub offset
    [(pv1,)] = con.execute(
        f"""
        SELECT list_sum(list_transform(range(1, n + 1),
          t -> {_CFH} * power(1.0 / (1.0 + y),
                              CAST(t AS DOUBLE) - 1.0 + q)))
        FROM (SELECT 1 AS n, CAST({c} AS DOUBLE) AS c,
                     CAST({y} AS DOUBLE) AS y, CAST({q} AS DOUBLE) AS q,
                     CAST({cf1} AS DOUBLE) AS cf1)
        """
    ).fetchall()
    assert pv1 > cf1 * (1.0 / (1.0 + y)) ** q
    con.close()


def test_duration_convexity_are_price_derivatives(spark):
    """Black-box check of the GetNewVarsPy-shaped contract
    (`stage1/helper_functions.py:54-250`): QuantLib DEFINES modified
    duration as -(1/P_full)·dP_full/dy and convexity as
    (1/P_full)·d²P_full/dy², with Macaulay = modified·(1+y/f). Those
    relations are checked numerically against the engine's OWN
    price→yield map (central differences over perturbed clean prices;
    accrued is yield-independent so dP_clean/dy = dP_full/dy), across
    frequencies, day counts, and discount/premium prices — no QuantLib
    and no schedule re-derivation, so the check is not circular."""
    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.operators.bond_record import (
        attach_full_record,
    )

    # two step sizes: a small one for the FIRST derivative (duration)
    # and a larger one for the SECOND (convexity) — the second
    # difference's numerator is ~y''·h², and at h=0.5 it sits near the
    # Newton solver's fixed-iteration ytm precision (~1e-7)
    h, h2 = 0.5, 3.0
    rows = []
    k = 0
    for freq, f in (("1", 1.0), ("2", 2.0), ("4", 4.0)):
        for dcb in ("30/360", "ACT/ACT", "ACT/360", "ACT/365"):
            for p in (88.0, 101.5):
                k += 1
                for i, dp in enumerate((-h, 0.0, h, -h2, h2)):
                    rows.append(
                        (k, "F", freq, 5.25, dcb, "2031-09-20", 96,
                         "2024-03-11", p + dp, f, i)
                    )
    df = spark.createDataFrame(
        rows,
        "k int, ctype string, ifreq string, c_pct double, dcb string,"
        " maturity string, hist_m int, trade_d string, p double,"
        " f double, i int",
    ).select(
        "k", "ctype", "ifreq", "c_pct", "dcb",
        F.col("maturity").cast("date").alias("maturity"),
        "hist_m",
        F.col("trade_d").cast("date").alias("trade_d"),
        "p", "f", "i",
    )
    recs = {}
    for r in attach_full_record(df).collect():
        recs.setdefault(r["k"], {})[r["i"]] = r
    assert len(recs) == 24
    for k, tri in recs.items():
        y0, y1, y2 = (tri[i]["ytm"] for i in (0, 1, 2))
        mid = tri[1]
        assert None not in (y0, y1, y2), k
        pf, mod, mac, conv, f = (
            mid["prfull"], mid["mod_dur"], mid["mac_dur"],
            mid["convexity"], mid["f"],
        )
        # Macaulay = modified × (1 + y/f) — up to the Newton solver's
        # ytm tolerance propagating through the two sums
        assert abs(mac - mod * (1 + y1 / f)) <= 1e-6 * mac, k
        # dy/dP = -1/(P_full · D_mod)
        dydp = (y2 - y0) / (2 * h)
        assert abs(dydp - (-1.0 / (pf * mod))) <= 2e-3 * abs(dydp), (
            k, dydp, -1.0 / (pf * mod),
        )
        # convexity = (1/P_full)·d²P/dy², via the inverse-function rule
        # P'' = -y''·(P')³ with P' = 1/y' — wide-step second difference
        yl, yr = tri[3]["ytm"], tri[4]["ytm"]
        d2ydp2 = (yr - 2 * y1 + yl) / (h2 * h2)
        dpdy = 1.0 / ((yr - yl) / (2 * h2))
        d2pdy2 = -d2ydp2 * dpdy**3
        assert abs(d2pdy2 / pf - conv) <= 2e-2 * conv, (
            k, d2pdy2 / pf, conv,
        )
