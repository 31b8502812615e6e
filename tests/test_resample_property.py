"""Randomized differential test: resample_ffill vs pandas
reindex().ffill() — the reference's `resample('D').last().ffill()`
treasury-curve alignment (`stage1/helper_functions.py:750-754`). The
catalog entry (a14) checks one fixed shape against DuckDB; this pins
the operator over 30 seeded random series per run, including the
corners that shape never hits: ids with no observation on the first
spine date (leading nulls stay null), multiple value columns filling
independently, and observations OFF the spine — per the documented
contract they never contribute, even when an id's every observation
precedes the spine (its rows stay all-null rather than filling from a
pre-spine print, unlike a pandas resample over the data's own range).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from trace_data_pipeline_spark.operators.temporal import resample_ffill


def test_resample_ffill_matches_pandas(spark):
    rng = np.random.default_rng(20260816)
    spine_dates = pd.date_range("2021-03-01", periods=20, freq="D").date
    rows = []
    for g in range(30):
        k = f"id{g:02d}"
        n = int(rng.integers(1, 12))
        # ~25% of observations land OFF the spine (before/after it) —
        # the operator must ignore them entirely
        all_days = pd.date_range("2021-02-20", periods=40, freq="D").date
        days = rng.choice(len(all_days), size=n, replace=False)
        for d in days:
            a = None if rng.uniform() < 0.3 else round(float(rng.uniform()), 6)
            b = None if rng.uniform() < 0.3 else round(float(rng.uniform()), 6)
            rows.append((k, all_days[d], a, b))
    daily_pd = pd.DataFrame(rows, columns=["k", "d", "a", "b"])

    # pandas reference: per id, keep only on-spine observations,
    # reindex onto the spine, forward-fill each column independently
    expected = {}
    spine_set = set(spine_dates)
    for k, grp in daily_pd.groupby("k"):
        on_spine = grp[grp["d"].isin(spine_set)].set_index("d")
        re = on_spine.reindex(spine_dates)[["a", "b"]].ffill()
        expected[k] = re

    daily = spark.createDataFrame(
        daily_pd, "k string, d date, a double, b double"
    ).repartition(5)
    spine = spark.createDataFrame(
        pd.DataFrame({"d": spine_dates}), "d date"
    )
    got = (
        resample_ffill(daily, id_col="k", date_col="d",
                       value_cols=["a", "b"], spine=spine)
        .toPandas()
        .sort_values(["k", "d"])
    )
    assert len(got) == 30 * len(spine_dates)
    for k, grp in got.groupby("k"):
        g = grp.set_index("d")[["a", "b"]]
        g.index = pd.Index([pd.Timestamp(d).date() for d in g.index], name="d")
        pd.testing.assert_frame_equal(
            g.sort_index(), expected[k].sort_index(),
            check_exact=True, check_names=False,
        )
