"""Pure window operators (SURVEY.md §2.5 W3–W6, §2.2 F15).

These are the reference's error screens that ARE expressible as
Catalyst window expressions — no pandas UDF needed. All windows
partition by the entity id and order by a TOTAL key (date, time,
sequence) so results are deterministic under shuffle (SURVEY §7
watch list: the reference leaned on stable mergesort; Spark must
carry the full tiebreak in the window spec).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _w(id_cols: Sequence[str], order_by: Sequence[Column | str]):
    return Window.partitionBy(*[F.col(c) for c in id_cols]).orderBy(
        *[F.col(c) if isinstance(c, str) else c for c in order_by]
    )


def group_diff(
    df: DataFrame,
    value_col: str,
    id_cols: Sequence[str],
    order_by: Sequence[Column | str],
    out_col: str = "diff",
) -> DataFrame:
    """W4: one-step difference per group (pandas groupby().diff())."""
    w = _w(id_cols, order_by)
    return df.withColumn(out_col, F.col(value_col) - F.lag(value_col, 1).over(w))


def initial_price_error_filter(
    df: DataFrame,
    price_col: str,
    id_cols: Sequence[str],
    order_by: Sequence[Column | str],
    n_initial: int = 3,
    jump_threshold: float = 50.0,
    mode: str = "clean",
    flag_col: str = "initial_error",
) -> DataFrame:
    """W3 (`create_daily_enhanced_trace.py:1223-1320`): within each
    group's first `n_initial` rows, find the first jump with
    |Δprice| > threshold; all rows BEFORE that jump are bad initial
    prints. mode='clean' drops them, mode='flag' keeps + flags (the
    reference's output_type='uncleaned' re-run, `:2402-2780`)."""
    w = _w(id_cols, order_by)
    rn = F.row_number().over(w)
    jump = F.abs(F.col(price_col) - F.lag(price_col, 1).over(w)) > jump_threshold
    jump_rn = F.when((rn <= n_initial) & jump, rn)
    first_jump = F.min(jump_rn).over(
        Window.partitionBy(*[F.col(c) for c in id_cols])
    )
    flagged = df.withColumn("__rn", rn).withColumn("__fj", first_jump)
    is_bad = F.col("__fj").isNotNull() & (F.col("__rn") < F.col("__fj"))
    if mode == "clean":
        return flagged.filter(~is_bad).drop("__rn", "__fj")
    return flagged.withColumn(flag_col, is_bad.cast("int")).drop("__rn", "__fj")


def consecutive_log_return_filter(
    df: DataFrame,
    price_col: str,
    id_cols: Sequence[str],
    order_by: Sequence[Column | str],
    threshold: float = -0.25,
) -> DataFrame:
    """W6 (`create_daily_enhanced_trace.py:1377-1395`): drop rows where
    the product of the consecutive log-price changes (into and out of
    the row) is at or below `threshold` — a spike-revert signature. The
    reference keeps `product > -0.25` STRICTLY, so a product exactly at
    the threshold is dropped. Null products (series edges) are kept."""
    w = _w(id_cols, order_by)
    logp = F.log(F.col(price_col))
    d_in = logp - F.lag(logp, 1).over(w)
    d_out = F.lead(logp, 1).over(w) - logp
    prod = d_in * d_out
    return df.withColumn("__prod", prod).filter(
        F.col("__prod").isNull() | (F.col("__prod") > threshold)
    ).drop("__prod")


def price_flags(
    df: DataFrame,
    price_col: str,
    id_cols: Sequence[str],
    order_by: Sequence[Column | str],
    high_threshold: float = 300.0,
    dip_jump: float = 35.0,
) -> DataFrame:
    """F15 (`stage1/stage1_pipeline.py:1742-1806`): prc_high = price
    above threshold; prc_dip = the group's SECOND observation flagged
    when the first price change exceeds `dip_jump` in absolute value."""
    w = _w(id_cols, order_by)
    rn = F.row_number().over(w)
    first_change = F.abs(F.col(price_col) - F.lag(price_col, 1).over(w))
    return (
        df.withColumn("prc_high", (F.col(price_col) > high_threshold).cast("int"))
        .withColumn(
            "prc_dip",
            ((rn == 2) & (first_change > dip_jump)).cast("int"),
        )
    )
