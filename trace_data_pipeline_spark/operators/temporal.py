"""Temporal dimension maintenance: linker forward-extension (J14) and
spine resample + forward-fill (A14).

The reference extends its monthly equity linker past its last observed
month by snapshotting the final month and cartesian-joining it with
future month-ends (`stage1/helper_functions.py:549-621`), and
daily-resamples + forward-fills the treasury curve
(`helper_functions.py:750-754`). Both are shuffle-light in Spark: the
snapshot and the future spine are tiny (broadcast), and the fill is one
window over the by-key partitioning.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def forward_extend(
    dim: DataFrame,
    date_col: str,
    spine: DataFrame,
) -> DataFrame:
    """J14: extend a slowly-changing dimension to future spine dates by
    replicating its latest snapshot. `spine` holds a `date_col` column
    of panel dates; dates past the dimension's max get the snapshot
    rows via a broadcast cross join."""
    mx = dim.agg(F.max(date_col).alias("__mx"))
    snap = (
        dim.join(F.broadcast(mx), F.col(date_col) == F.col("__mx"))
        .drop(date_col, "__mx")
    )
    future = (
        spine.select(date_col)
        .distinct()
        .join(F.broadcast(mx), F.col(date_col) > F.col("__mx"))
        .select(date_col)
    )
    ext = snap.crossJoin(F.broadcast(future))
    return dim.unionByName(ext.select(*dim.columns))


def resample_ffill(
    daily: DataFrame,
    id_col: str,
    date_col: str,
    value_cols: Sequence[str],
    spine: DataFrame,
) -> DataFrame:
    """A14: align per-id sparse observations onto a shared date spine
    and forward-fill each value column. One shuffle on id; the fill is
    `last(col, ignorenulls=True)` over an unbounded-preceding window —
    the Spark idiom for pandas resample('D').last().ffill().

    Spine contract (round-12 review): only observations whose date is
    ON the spine contribute — the grid left-join discards off-spine
    rows, so e.g. a Saturday print does not feed Monday's fill on a
    business-day spine (pandas resampling over the data's own range
    would carry it). The reference's treasury-curve use feeds daily
    observations to a daily spine, where the two agree; pass a spine
    that contains every observation date when off-spine rows must
    count.

    Uniqueness contract (round-13 review): `daily` must be unique per
    (id_col, date_col) — a duplicate observation date would join the
    grid twice and make the `F.last` fill partition-order-dependent.
    Both call sites pre-reduce to one row per (id, date) (a14 via
    last_by groupBy, the xlsx curve via its one-row-per-date parse);
    reduce yours the same way before calling."""
    # the dates side is bounded (~10k rows for 30 years of daily spine)
    # — broadcast it explicitly rather than relying on AQE to notice
    grid = (
        daily.select(id_col)
        .distinct()
        .crossJoin(F.broadcast(spine.select(date_col).distinct()))
        .select(date_col, id_col)
    )
    joined = grid.join(daily, on=[id_col, date_col], how="left")
    w = (
        Window.partitionBy(id_col)
        .orderBy(date_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    for c in value_cols:
        joined = joined.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return joined


def add_business_days_calendar(
    df: DataFrame,
    date_col: str,
    calendar: DataFrame,
    n: int = 2,
    cal_date_col: str = "session_date",
    out_col: str = "settle_dt",
) -> DataFrame:
    """T+n settlement against an explicit trading calendar (the
    reference's QuantLib NYSE `advance(trade, n, Days)` with holiday
    awareness, `stage1/helper_functions.py:44-255`) — unlike the
    weekend-only `functions.daycount.add_business_days` fold, this
    rolls over holidays too.

    Build: consecutive sessions define half-open intervals
    [s_i, s_{i+1}); any trade date inside one settles at lead(s, n)
    of the interval's start — covers both on-session trades and
    weekend/holiday trade dates with the same expression. The interval
    table is |calendar| rows and broadcasts; the fact side streams
    through one BroadcastNestedLoopJoin (no shuffle).

    Trade dates at/after the last n sessions get a null settle — feed
    a calendar extending past the data's horizon."""
    sess = calendar.select(
        F.to_date(cal_date_col).alias("__s")
    ).distinct()
    # |calendar| is dimension-sized (252 rows/year); the single-partition
    # window is deliberate
    w = Window.orderBy("__s")
    iv = sess.select(
        "__s",
        F.lead("__s", 1).over(w).alias("__next"),
        F.lead("__s", n).over(w).alias(out_col),
    )
    d = F.to_date(date_col)
    joined = df.join(
        F.broadcast(iv),
        (d >= F.col("__s")) & ((d < F.col("__next")) | F.col("__next").isNull()),
        "left",
    )
    return joined.drop("__s", "__next")


def modified_following_calendar(
    df: DataFrame,
    date_col: str,
    calendar: DataFrame,
    cal_date_col: str = "session_date",
    out_col: str = "adj_dt",
) -> DataFrame:
    """ModifiedFollowing business-day adjustment against an explicit
    trading calendar — QuantLib's payment/termination-date convention
    the reference passes throughout its schedule construction
    (`stage1/helper_functions.py:125-152`): a date already on a
    session stands; otherwise roll FORWARD to the next session, unless
    that crosses a month boundary, in which case roll BACKWARD to the
    previous session.

    Build: the calendar expands to a day spine over its span with each
    day's next/previous session attached (two running min/max windows
    over the dimension-sized spine — single-partition by design, like
    the settlement interval table), then the fact side equi-joins the
    spine broadcast on the calendar DATE — a BroadcastHashJoin, no
    fact shuffle, no range condition. Dates outside the calendar's
    span get a null adjustment — feed a calendar covering the
    schedule horizon (the NYSE rule calendar extrapolates to any year;
    see functions/nyse_calendar.py)."""
    sess = calendar.select(F.to_date(cal_date_col).alias("__s")).distinct()
    span = sess.agg(
        F.min("__s").alias("__lo"), F.max("__s").alias("__hi")
    )
    days = span.select(
        F.explode(F.sequence("__lo", "__hi")).alias("__d")
    ).join(
        sess.withColumn("__is_sess", F.lit(True)),
        F.col("__d") == F.col("__s"),
        "left",
    )
    wb = Window.orderBy("__d").rowsBetween(Window.unboundedPreceding, 0)
    wf = Window.orderBy("__d").rowsBetween(0, Window.unboundedFollowing)
    spine = days.select(
        "__d",
        F.max(F.when(F.col("__is_sess"), F.col("__d"))).over(wb).alias("__prev"),
        F.min(F.when(F.col("__is_sess"), F.col("__d"))).over(wf).alias("__next"),
    )
    adj = F.when(
        F.trunc("__next", "month") == F.trunc("__d", "month"),
        F.col("__next"),
    ).otherwise(F.col("__prev"))
    joined = df.join(
        F.broadcast(spine), F.to_date(date_col) == F.col("__d"), "left"
    )
    return joined.withColumn(out_col, adj).drop("__d", "__prev", "__next")
