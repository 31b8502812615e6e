"""Golden-vector tests for the W7 ultra-distressed sub-filters
(reference semantics: `stage1/helper_functions.py:766-1273`)."""

from __future__ import annotations

import pandas as pd

from trace_data_pipeline_spark.operators.distressed import ultra_distressed_filter


def _panel(spark, prices, **extra_cols):
    pdf = pd.DataFrame(
        {
            "cusip_id": "X",
            "d": range(len(prices)),
            "pr": [float(p) for p in prices],
            **{k: [float(x) for x in v] for k, v in extra_cols.items()},
        }
    )
    return spark.createDataFrame(pdf)


def _flags(spark, prices, col, **kw):
    out = ultra_distressed_filter(
        _panel(spark, prices),
        id_col="cusip_id",
        order_cols=("d",),
        price_col="pr",
        price_cols=(),
        **kw,
    )
    return [r[col] for r in out.orderBy("d").collect()]


def test_w7_anomaly_ultra_low_print(spark):
    """A 0.05 print amid ~50s: neighbors' median ≥ 3× → anomalous."""
    got = _flags(spark, [50.0, 50.5, 0.05, 51.0, 50.8], "flag_anomalous_price")
    assert got == [0, 0, 1, 0, 0]


def test_w7_anomaly_needs_ratio(spark):
    """An ultra-low print among other lows (ratio < 3) is NOT flagged."""
    got = _flags(spark, [0.08, 0.09, 0.05, 0.09, 0.08], "flag_anomalous_price")
    assert got == [0, 0, 0, 0, 0]


def test_w7_spike_with_recovery(spark):
    """30.0 amid ~4s, reverting below 2× the prior median → spike."""
    got = _flags(spark, [4.0, 4.2, 30.0, 4.1, 4.3], "flag_upward_spike")
    assert got == [0, 0, 1, 0, 0]


def test_w7_spike_without_recovery_kept(spark):
    """A jump that never recovers is a genuine repricing — no flag."""
    got = _flags(spark, [4.0, 4.2, 30.0, 29.8, 30.1], "flag_upward_spike")
    assert got == [0, 0, 0, 0, 0]


def test_w7_plateau_round_run(spark):
    """A 3-day run at exactly 0.05 (round number) is a plateau."""
    got = _flags(
        spark, [45.0, 46.0, 0.05, 0.05, 0.05, 47.0], "flag_plateau_sequence"
    )
    assert got == [0, 0, 1, 1, 1, 0]


def test_w7_plateau_needs_eligibility(spark):
    """Equal runs above the ultra-low threshold and off round numbers
    are left alone."""
    got = _flags(spark, [45.0, 46.0, 21.0, 21.0, 47.0], "flag_plateau_sequence")
    assert got == [0, 0, 0, 0, 0]


def test_w7_plateau_whole_series_not_suspicious(spark):
    """An all-identical non-round ultra-low series has no pre/post
    context → not suspicious → no flags."""
    got = _flags(spark, [0.04, 0.04, 0.04, 0.04], "flag_plateau_sequence")
    assert got == [0, 0, 0, 0]


def test_w7_round_dp_makes_plateaus_exact(spark):
    """The reference pre-rounds to 4dp: 0.050001 vs 0.049999 become an
    exact-equality run."""
    got = _flags(
        spark, [45.0, 0.050001, 0.049999, 46.0], "flag_plateau_sequence"
    )
    assert got == [0, 1, 1, 0]


def test_w7_intraday_inconsistency(spark):
    """Row-local filter: any price < 20 and (hi-lo)/mean > 0.75."""
    df = _panel(
        spark,
        [30.0, 31.0],
        pr_first=[30.0, 31.0],
        pr_last=[40.0, 31.2],
        pr_hi=[50.0, 31.5],
        pr_lo=[10.0, 30.8],
    )
    out = ultra_distressed_filter(
        df,
        id_col="cusip_id",
        order_cols=("d",),
        price_col="pr",
        price_cols=("pr_first", "pr_last", "pr_hi", "pr_lo"),
    )
    rows = out.orderBy("d").collect()
    assert [r["flag_intraday_inconsistent"] for r in rows] == [1, 0]
    assert rows[0]["flag_refined_any"] == 1
