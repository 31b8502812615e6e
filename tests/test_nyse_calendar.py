"""Golden tests: the rule-derived NYSE calendar must reproduce the
published closure lists (public record) for sample years spanning the
tricky rules — Saturday New Year's, first Juneteenth observance,
weekend-shifted July 4th / Christmas, Hurricane Sandy, funerals."""

from __future__ import annotations

import datetime as dt

from trace_data_pipeline_spark.functions.nyse_calendar import (
    easter_sunday,
    nyse_holidays,
    nyse_sessions,
)


def _year(y):
    return [d for d in nyse_holidays(y, y)]


def test_2004_holidays_including_reagan_and_saturday_christmas():
    assert _year(2004) == [
        dt.date(2004, 1, 1),    # New Year's (Thu)
        dt.date(2004, 1, 19),   # MLK
        dt.date(2004, 2, 16),   # Washington's Birthday
        dt.date(2004, 4, 9),    # Good Friday
        dt.date(2004, 5, 31),   # Memorial Day
        dt.date(2004, 6, 11),   # Reagan funeral (special closure)
        dt.date(2004, 7, 5),    # July 4 fell Sunday -> Monday
        dt.date(2004, 9, 6),    # Labor Day
        dt.date(2004, 11, 25),  # Thanksgiving
        dt.date(2004, 12, 24),  # Christmas fell Saturday -> Friday
    ]


def test_2012_holidays_including_hurricane_sandy():
    assert _year(2012) == [
        dt.date(2012, 1, 2),    # Jan 1 fell Sunday -> Monday
        dt.date(2012, 1, 16),   # MLK
        dt.date(2012, 2, 20),   # Washington's Birthday
        dt.date(2012, 4, 6),    # Good Friday
        dt.date(2012, 5, 28),   # Memorial Day
        dt.date(2012, 7, 4),    # Independence Day (Wed)
        dt.date(2012, 9, 3),    # Labor Day
        dt.date(2012, 10, 29),  # Hurricane Sandy
        dt.date(2012, 10, 30),  # Hurricane Sandy
        dt.date(2012, 11, 22),  # Thanksgiving
        dt.date(2012, 12, 25),  # Christmas (Tue)
    ]


def test_2022_holidays_first_juneteenth_saturday_new_years():
    # Jan 1 2022 fell Saturday: NYSE does NOT observe it (Dec 31 2021
    # was a full session) — the year has no New Year's closure at all.
    assert _year(2022) == [
        dt.date(2022, 1, 17),   # MLK
        dt.date(2022, 2, 21),   # Washington's Birthday
        dt.date(2022, 4, 15),   # Good Friday
        dt.date(2022, 5, 30),   # Memorial Day
        dt.date(2022, 6, 20),   # Juneteenth (Jun 19 Sunday -> Monday)
        dt.date(2022, 7, 4),    # Independence Day
        dt.date(2022, 9, 5),    # Labor Day
        dt.date(2022, 11, 24),  # Thanksgiving
        dt.date(2022, 12, 26),  # Christmas (Dec 25 Sunday -> Monday)
    ]


def test_juneteenth_not_observed_before_2022():
    assert dt.date(2021, 6, 18) not in _year(2021)  # Jun 19 2021 = Sat
    assert all(d.month != 6 or d.day < 15 for d in _year(2021))


def test_easter_computus_known_dates():
    assert easter_sunday(2004) == dt.date(2004, 4, 11)
    assert easter_sunday(2008) == dt.date(2008, 3, 23)  # early Easter
    assert easter_sunday(2011) == dt.date(2011, 4, 24)  # late Easter
    assert easter_sunday(2024) == dt.date(2024, 3, 31)


def test_session_count_2023():
    # NYSE had exactly 250 trading days in 2023 (public record)
    assert len(nyse_sessions(dt.date(2023, 1, 1), dt.date(2023, 12, 31))) == 250


def test_sessions_df_matches_driver_side_list(spark):
    import datetime as _dt

    from trace_data_pipeline_spark.functions.nyse_calendar import (
        nyse_sessions_df,
    )

    start, end = _dt.date(2024, 1, 1), _dt.date(2024, 3, 15)
    got = sorted(
        r["session_date"]
        for r in nyse_sessions_df(spark, start, end).collect()
    )
    assert got == nyse_sessions(start, end)
    # spot-check: MLK Day 2024-01-15 and Washington's 2024-02-19 excluded
    assert _dt.date(2024, 1, 15) not in got
    assert _dt.date(2024, 2, 19) not in got
    assert _dt.date(2024, 1, 16) in got


def test_extrapolated_2029_2032_window_matches_independent_literals():
    """Golden closure-date pin for the extrapolated years the w11b
    oracle exercises (2029-06-01..2032-06-30): the engine's rule output
    must equal the INDEPENDENTLY derived literal list embedded in the
    oracle (textbook Butcher computus + published NYSE rule 7.2
    schedule — see plans/enrichment.py). A bug in the engine's rule
    extrapolation (wrong Good Friday, wrong observed shift) now fails
    HERE even though the oracle no longer calls nyse_holidays()."""
    from trace_data_pipeline_spark.plans.enrichment import (
        _W11B_HOLIDAYS_2029_2032,
    )

    lo, hi = dt.date(2029, 6, 1), dt.date(2032, 6, 30)
    got = [
        d.isoformat() for d in nyse_holidays(2029, 2032) if lo <= d <= hi
    ]
    assert got == list(_W11B_HOLIDAYS_2029_2032)
    # rule-by-rule spot pins inside the window (public knowledge):
    # Good Fridays from the public Easter table (Easter 2030-04-21,
    # 2031-04-13, 2032-03-28)
    assert "2030-04-19" in got and "2031-04-11" in got
    assert "2032-03-26" in got
    # Juneteenth 2032 falls on a Saturday -> observed Friday 06-18
    assert "2032-06-18" in got and "2032-06-19" not in got
    # Independence Day 2031 is itself a Friday -> unshifted
    assert "2031-07-04" in got
