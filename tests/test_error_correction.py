"""Golden-vector tests for the W1 decimal-shift corrector and the W2
bounce-back filter — the two grouped-map state operators that have no
SQL oracle.

W1 vectors come from the reference's worked examples
(`stage0/README_decimal_shift_corrector.md:246-370`). The README
narrates idealized anchors; expectations here are recomputed under the
actual algorithm (short series fall back to the forward median), and
each example's accept/reject OUTCOME matches the README's.
"""

from __future__ import annotations

import pandas as pd
import pytest

from trace_data_pipeline_spark.operators.bounceback import bounce_back_filter
from trace_data_pipeline_spark.operators.decimal_shift import decimal_shift_corrector


def _series_df(spark, prices, id_="X"):
    pdf = pd.DataFrame(
        {
            "cusip_id": id_,
            "trd_exctn_dt": "2024-01-15",
            "seq": range(len(prices)),
            "rptd_pr": [float(p) for p in prices],
        }
    )
    return spark.createDataFrame(pdf)


def _run_w1(spark, prices, **kw):
    out = decimal_shift_corrector(
        _series_df(spark, prices), order_cols=("seq",), **kw
    )
    rows = out.orderBy("seq").collect()
    return (
        [r["dec_shift_flag"] for r in rows],
        [r["dec_shift_factor"] for r in rows],
        [r["suggested_price"] for r in rows],
    )


def _run_w2(spark, prices, **kw):
    out = bounce_back_filter(
        _series_df(spark, prices), order_cols=("seq",), **kw
    )
    return [r["filtered_error"] for r in out.orderBy("seq").collect()]


# ------------------------------------------------------------------ W1


def test_w1_example1_basic_10x_shift(spark):
    """README example 1: 985.0 in a ~99 series → corrected to 98.5."""
    flags, factors, prices = _run_w1(spark, [98.5, 99.0, 985.0, 98.8, 99.2])
    assert flags == [0, 0, 1, 0, 0]
    assert factors[2] == 0.1
    assert prices[2] == pytest.approx(98.5)
    # untouched rows keep their own price and factor 1.0
    assert prices[0] == 98.5 and factors[0] == 1.0


def test_w1_example2_genuine_jump_preserved(spark):
    """README example 2: a genuine downgrade drop is NOT corrected."""
    flags, _, prices = _run_w1(spark, [95.0, 94.5, 85.0, 84.8, 85.5])
    assert flags == [0, 0, 0, 0, 0]
    assert prices == [95.0, 94.5, 85.0, 84.8, 85.5]


def test_w1_example3_par_proximity(spark):
    """README example 3 in context: 1000.0 near par corrects to 100.0
    (needs enough history for the centered anchor, as in production)."""
    series = [99.5, 99.7, 99.8, 100.0, 1000.0, 100.2, 99.9, 100.1, 99.6, 100.3]
    flags, factors, prices = _run_w1(spark, series)
    assert flags == [0, 0, 0, 0, 1, 0, 0, 0, 0, 0]
    assert factors[4] == 0.1
    assert prices[4] == pytest.approx(100.0)


def test_w1_example4_improvement_gate_rejects(spark):
    """README example 4: volatile series — no factor improves enough;
    nothing is corrected."""
    flags, _, _ = _run_w1(spark, [80.0, 120.0, 85.0, 115.0])
    assert flags == [0, 0, 0, 0]


def test_w1_clean_mode_overwrites_price(spark):
    out = decimal_shift_corrector(
        _series_df(spark, [98.5, 99.0, 985.0, 98.8, 99.2]),
        order_cols=("seq",),
        mode="clean",
    )
    prices = [r["rptd_pr"] for r in out.orderBy("seq").collect()]
    assert prices == pytest.approx([98.5, 99.0, 98.5, 98.8, 99.2])


def test_w1_row_count_and_factor_domain(spark):
    """Property: row count preserved; factors drawn from the candidate
    set ∪ {1.0}; suggested = price × factor always."""
    series = [98.5, 99.0, 985.0, 0.985, 99.2, 9850.0, 98.8, 99.0, 99.1, 98.9]
    flags, factors, prices = _run_w1(spark, series)
    assert len(flags) == len(series)
    assert set(factors) <= {0.1, 0.01, 10.0, 100.0, 1.0}
    for raw, fac, sug in zip(series, factors, prices):
        assert sug == pytest.approx(raw * fac)


# ------------------------------------------------------------------ W2


def test_w2_spike_and_revert_flagged(spark):
    """A +86 jump followed by an immediate opposite move flags only the
    spike row."""
    assert _run_w2(spark, [98.5, 99.0, 185.0, 98.8, 99.2]) == [0, 0, 1, 0, 0]


def test_w2_genuine_level_shift_not_flagged(spark):
    """A persistent drop (credit event) never bounces back — no flags."""
    series = [95.0, 94.5, 60.0, 59.8, 60.5, 60.2, 59.9, 60.1]
    assert _run_w2(spark, series) == [0] * len(series)


def test_w2_par_plateau_run(spark):
    """A ≥3-row run pinned at exactly 100.0, far from the anchor, is
    flagged wholesale; cooldown suppresses follow-on flags."""
    series = [70.0, 70.5, 100.0, 100.0, 100.0, 70.2, 70.4]
    assert _run_w2(spark, series) == [0, 0, 1, 1, 1, 0, 0]


def test_w2_short_par_run_kept(spark):
    """A 2-row par run (< par_min_run) is NOT flagged."""
    series = [70.0, 70.5, 100.0, 100.0, 70.2, 70.4]
    assert _run_w2(spark, series) == [0] * len(series)


def test_w2_blame_reassignment_and_plateau(spark):
    """Candidate opens on row 2 (far from anchor) but row 1 deviates
    even more from ITS anchor → the flag moves back, and the plateau
    extension carries it through row 2."""
    assert _run_w2(spark, [100.0, 170.0, 172.0, 100.5]) == [0, 1, 1, 0]


def test_w2_clean_mode_drops_flagged(spark):
    out = bounce_back_filter(
        _series_df(spark, [98.5, 99.0, 185.0, 98.8, 99.2]),
        order_cols=("seq",),
        mode="clean",
    )
    assert out.count() == 4
    assert "filtered_error" not in out.columns
