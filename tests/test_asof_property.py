"""Randomized differential test: asof_join vs pandas merge_asof — the
EXACT function the reference uses for its rating/amount-outstanding
attaches (`stage1/stage1_pipeline.py:714-759`), so agreement here IS
reference parity for J11/J12, including the corners the catalog data
never exhibits: duplicate right timestamps (merge_asof takes the
last-positioned row backward / first-positioned forward — reproduced
by a position-monotone tiebreak), genuine nulls in the matched row
(whole-row semantics must carry them), empty right groups, and exact
matches under both allow_exact settings.

One Spark job per (direction, allow_exact) configuration covers 40
independently-randomized key groups (seeded — deterministic across
runs); the right side is repartitioned to stress partition-order
independence of the tiebreak."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from trace_data_pipeline_spark.operators.asof import asof_join


def _random_case(seed: int):
    """40 key groups of random left probes / right observations with
    ~30% null values and heavy timestamp collisions (ts drawn from a
    small range so ties are common)."""
    rng = np.random.default_rng(seed)
    lrows, rrows = [], []
    for g in range(40):
        k = f"k{g:02d}"
        for t in rng.integers(0, 15, size=int(rng.integers(1, 6))):
            lrows.append((k, int(t)))
        for t in rng.integers(0, 15, size=int(rng.integers(0, 8))):
            v = None if rng.uniform() < 0.3 else round(float(rng.uniform()), 6)
            rrows.append((k, int(t), v))
    left = pd.DataFrame(lrows, columns=["k", "t"])
    left["row_id"] = np.arange(len(left))
    right = pd.DataFrame(rrows, columns=["k", "t", "v"])
    # merge_asof needs a global sort on the `on` key; a STABLE sort
    # preserves generation order among equal timestamps, so position
    # in the sorted frame (= seq) is exactly the order merge_asof
    # breaks ties by
    right = right.sort_values("t", kind="stable").reset_index(drop=True)
    right["seq"] = np.arange(len(right))
    return left, right


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("allow_exact", [True, False])
def test_asof_matches_merge_asof(spark, direction, allow_exact):
    left_pd, right_pd = _random_case(20260816)

    expected = pd.merge_asof(
        left_pd.sort_values("t", kind="stable"),
        right_pd[["k", "t", "v"]],
        on="t",
        by="k",
        direction=direction,
        allow_exact_matches=allow_exact,
    ).set_index("row_id")["v"]

    left = spark.createDataFrame(left_pd, "k string, t long, row_id long")
    right = spark.createDataFrame(
        right_pd, "k string, t long, v double, seq long"
    ).repartition(7)
    out = asof_join(
        left,
        right,
        on="t",
        by="k",
        value_cols=["v"],
        direction=direction,
        allow_exact=allow_exact,
        tiebreak_cols=["seq"],
    )
    got = (
        out.toPandas().set_index("row_id")["v"].reindex(expected.index)
    )
    pd.testing.assert_series_equal(
        got, expected, check_names=False, check_exact=True
    )
