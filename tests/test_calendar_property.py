"""Randomized differential tests for the calendar adjusters against
pure-Python re-statements of the QuantLib conventions the reference
passes through its schedule construction
(`stage1/helper_functions.py:44-255`): ModifiedFollowing and T+n
`advance`. The existing goldens pin five hand-picked cases; these
sweep a random ~6-month calendar (weekends plus random extra
closures, so multi-day gaps and month-boundary gaps occur by
construction) across EVERY calendar day in the span."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd

from trace_data_pipeline_spark.operators.temporal import (
    add_business_days_calendar,
    modified_following_calendar,
)


def _random_calendar(seed: int):
    """Sessions = weekdays of Mar-Aug 2021 minus ~8% random closures;
    gaps of 3-4 days around closured Mondays/Fridays arise naturally."""
    rng = np.random.default_rng(seed)
    days = pd.date_range("2021-03-01", "2021-08-31", freq="D").date
    sessions = [
        d for d in days
        if d.weekday() < 5 and rng.uniform() >= 0.08
    ]
    return days, sessions


def test_modified_following_matches_reference_convention(spark):
    days, sessions = _random_calendar(20260816)
    sset = set(sessions)

    def mf(d: dt.date) -> dt.date:
        if d in sset:
            return d
        nxt = min(s for s in sessions if s > d)
        if nxt.month == d.month and nxt.year == d.year:
            return nxt
        return max(s for s in sessions if s < d)

    # every day in the span except the tail after the last session
    # (the operator documents null-past-horizon; the convention needs
    # a next session to exist)
    probe = [d for d in days if sessions[0] < d <= sessions[-1]]
    expected = {d: mf(d) for d in probe}

    cal = spark.createDataFrame(
        pd.DataFrame({"session_date": sessions}), "session_date date"
    )
    df = spark.createDataFrame(
        pd.DataFrame({"d": probe}), "d date"
    ).repartition(4)
    got = modified_following_calendar(df, "d", cal).toPandas()
    assert len(got) == len(probe)
    mismatches = {
        r.d: (r.adj_dt, expected[r.d])
        for r in got.itertuples()
        if r.adj_dt != expected[r.d]
    }
    assert not mismatches, f"MF disagreements: {mismatches}"


def test_t_plus_n_matches_reference_convention(spark):
    days, sessions = _random_calendar(20260817)

    def advance(d: dt.date, n: int) -> dt.date | None:
        # QuantLib advance(d, n, Days): step to the n-th session
        # STRICTLY after d-or-its-roll — the operator's interval table
        # gives lead(start, n) of the half-open interval containing d,
        # i.e. the n-th session after the last session <= d
        anchor = max((s for s in sessions if s <= d), default=None)
        if anchor is None:
            return None
        idx = sessions.index(anchor) + n
        return sessions[idx] if idx < len(sessions) else None

    probe = [d for d in days if sessions[0] <= d <= sessions[-3]]
    for n in (1, 2, 3):
        expected = {d: advance(d, n) for d in probe}
        cal = spark.createDataFrame(
            pd.DataFrame({"session_date": sessions}), "session_date date"
        )
        df = spark.createDataFrame(
            pd.DataFrame({"d": probe}), "d date"
        ).repartition(4)
        got = add_business_days_calendar(df, "d", cal, n=n).toPandas()
        mismatches = {
            r.d: (r.settle_dt, expected[r.d])
            for r in got.itertuples()
            if r.settle_dt != expected[r.d]
        }
        assert not mismatches, f"T+{n} disagreements: {mismatches}"


def test_np_schedule_engine_matches_contract_calendar():
    """The vectorized date engine (operators/bond_schedule.py) vs the
    pure-Python contract port over 4000 random dates with the NYSE
    closure set: civil round trip, closed-form Jan-1, add_months
    clamping, ModifiedFollowing adjustment, T+2 advance, and all four
    day-count bases (signed spans included) — element-for-element."""
    import datetime as dt
    import random

    import numpy as np

    from tests.ql_contract import (
        add_months as c_add_months,
        adjust_mf as c_adjust,
        advance_business_days as c_advance,
        dcf as c_dcf,
    )
    from trace_data_pipeline_spark.functions.nyse_calendar import (
        nyse_holidays,
    )
    from trace_data_pipeline_spark.operators.bond_schedule import (
        NpCalendar,
        add_months_days,
        civil_to_days,
        days_to_civil,
        dcf_basis,
    )

    rng = random.Random(20260817)
    hols = frozenset(nyse_holidays(2002, 2060))
    cal = NpCalendar(tuple(hols))
    epoch = dt.date(1970, 1, 1).toordinal()
    dates = [
        dt.date(2002, 1, 1) + dt.timedelta(days=rng.randrange(0, 21000))
        for _ in range(4000)
    ]
    z = np.array([d.toordinal() - epoch for d in dates], dtype=np.int64)

    y, m, d = days_to_civil(z)
    assert (civil_to_days(y, m, d) == z).all()
    for i in (0, 17, 999):
        assert (int(y[i]), int(m[i]), int(d[i])) == (
            dates[i].year, dates[i].month, dates[i].day,
        )

    ks = np.array([rng.randrange(-240, 240) for _ in dates])
    am = add_months_days(z, ks)
    for i in range(0, 4000, 7):
        want = c_add_months(dates[i], int(ks[i]))
        assert int(am[i]) == want.toordinal() - epoch, (dates[i], ks[i])

    adj = cal.adjust_mf(z)
    adv = cal.advance_bd(z, 2)
    sess = cal.is_session(z)
    for i in range(0, 4000, 3):
        d0 = dates[i]
        assert bool(sess[i]) == (d0.weekday() < 5 and d0 not in hols), d0
        assert int(adj[i]) == c_adjust(d0, hols).toordinal() - epoch, d0
        assert int(adv[i]) == c_advance(d0, 2, hols).toordinal() - epoch, d0

    b = z[::-1].copy()  # random signed spans
    for code, name in ((0, "30/360"), (1, "ACT/ACT"), (2, "ACT/360"),
                       (3, "ACT/365")):
        got = dcf_basis(np.full(z.size, code), z, b)
        for i in range(0, 4000, 11):
            want = c_dcf(name, dates[i],
                         dt.date.fromordinal(int(b[i]) + epoch))
            assert got[i] == want, (name, dates[i])
