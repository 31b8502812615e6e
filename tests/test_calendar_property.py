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
