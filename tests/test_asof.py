"""asof_join unit contracts (round-12 review hardening): whole-row
payload semantics, deterministic tiebreaks among equal-timestamp right
rows, and both directions — the properties the j11/j12 parity data
cannot exhibit (it has no nulls and no duplicate right timestamps)."""

from __future__ import annotations

import pytest

from trace_data_pipeline_spark.operators.asof import asof_join


def _rows(df):
    return {tuple(r) for r in df.collect()}


def test_asof_whole_row_no_column_mixing(spark):
    """All attached values must come from ONE right row: the matched
    row's genuine null rides along instead of an older vintage's value
    (per-column last-non-null would return amt=100, rating='BB')."""
    left = spark.createDataFrame([("A", 3)], "k string, t int")
    right = spark.createDataFrame(
        [("A", 1, 100, None), ("A", 2, None, "BB")],
        "k string, t int, amt int, rating string",
    )
    out = asof_join(
        left, right, on="t", by="k", value_cols=["amt", "rating"]
    )
    assert _rows(out) == {("A", 3, None, "BB")}


def test_asof_tiebreak_deterministic(spark):
    """Duplicate right timestamps: the greatest tiebreak wins backward,
    the least wins forward (merge_asof's input-position analog)."""
    left = spark.createDataFrame([("A", 5)], "k string, t int")
    right = spark.createDataFrame(
        [("A", 5, "first", 1), ("A", 5, "second", 2)],
        "k string, t int, v string, seq int",
    )
    back = asof_join(
        left, right, on="t", by="k", value_cols=["v"], tiebreak_cols=["seq"]
    )
    assert _rows(back) == {("A", 5, "second")}
    fwd = asof_join(
        left,
        right,
        on="t",
        by="k",
        value_cols=["v"],
        direction="forward",
        tiebreak_cols=["seq"],
    )
    assert _rows(fwd) == {("A", 5, "first")}


def test_asof_tiebreak_stable_across_partitions(spark):
    """Duplicate right timestamps spread over ≥2 partitions must yield
    the same (greatest-tiebreak) row as single-partition input — the
    failure mode the call-site tiebreaks exist to prevent: without one,
    F.last over equal sort keys is partition-order-dependent."""
    left = spark.createDataFrame(
        [("A", 10), ("B", 10)], "k string, t int"
    )
    dup_rows = [
        (k, 10, f"{k}-v{seq}", seq) for k in ("A", "B") for seq in range(1, 9)
    ]
    expected = {("A", 10, "A-v8"), ("B", 10, "B-v8")}
    for nparts in (1, 4, 8):
        right = spark.createDataFrame(
            dup_rows, "k string, t int, v string, seq int"
        ).repartition(nparts)
        out = asof_join(
            left, right, on="t", by="k", value_cols=["v"], tiebreak_cols=["seq"]
        )
        assert _rows(out) == expected, f"nparts={nparts}"


def test_asof_directions_and_exactness(spark):
    left = spark.createDataFrame(
        [("A", 2), ("A", 4), ("B", 1)], "k string, t int"
    )
    right = spark.createDataFrame(
        [("A", 2, 20.0), ("A", 3, 30.0)], "k string, t int, v double"
    )
    back = asof_join(left, right, on="t", by="k", value_cols=["v"])
    assert _rows(back) == {("A", 2, 20.0), ("A", 4, 30.0), ("B", 1, None)}
    strict = asof_join(
        left, right, on="t", by="k", value_cols=["v"], allow_exact=False
    )
    assert _rows(strict) == {("A", 2, None), ("A", 4, 30.0), ("B", 1, None)}
    fwd = asof_join(
        left, right, on="t", by="k", value_cols=["v"], direction="forward"
    )
    assert _rows(fwd) == {("A", 2, 20.0), ("A", 4, None), ("B", 1, None)}
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="t", by="k", value_cols=["v"], direction="x")


def test_asof_value_collision_guard(spark):
    left = spark.createDataFrame([("A", 1, 9.0)], "k string, t int, v double")
    right = spark.createDataFrame([("A", 1, 1.0)], "k string, t int, v double")
    with pytest.raises(ValueError, match="already exists"):
        asof_join(left, right, on="t", by="k", value_cols=["v"])
