"""W1: decimal-shift price corrector.

Detects prices recorded with a misplaced decimal (10.5 keyed as 105.0 /
1050.0) by testing multiplicative factors against a rolling
unique-median anchor, accepting a correction only when it passes the
reference's five gates (`stage0/create_daily_enhanced_trace.py:764-963`;
spec `stage0/README_decimal_shift_corrector.md:25-110`).

Spark-first decomposition — the only part that genuinely needs Python
is the rolling-median fallback chain, so that is ALL the Python there
is:

1. dedup to unique (id, date, price) rows (keep first in trade order) —
   a row_number window, JVM-side;
2. per-id rolling anchor over the deduped mini-frame via applyInPandas
   (ships only key+order columns through Arrow, not the fact table);
3. m:1 join of the anchor back to all rows on (id, date, price);
4. factor testing and acceptance gates as pure column algebra
   (whole-stage codegen; no UDF).

At scale the cost is one shuffle for the dedup window, one for the
grouped-map, and one shuffle join — each keyed on id, so AQE can reuse
the partitioning; group state never exceeds a single bond's history.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from trace_data_pipeline_spark.operators.parallelism import pin_group_parallelism

EPS = 1e-12

# fixed-width order-key pack (r17, guide §2.2/§5 "keep aggregates
# hash-based"): 10^20 > the full shifted-long range (2^64 ≈ 1.85e19),
# so pack = micros * 10^20 + (event + 2^63 + 1) is strictly
# lexicographic; |micros| ≤ 2.53e17 for every legal Spark timestamp
# (0001-01-01..9999-12-31), so |pack| < 2.6e37 < 10^38-1 — decimal(38,0)
# never overflows
_ORD_SHIFT = 10**20
_ORD_OFF = 2**63


def _anchor_kernel(price_name: str, order_names: list[str], window: int):
    """Per-id pandas kernel: centered / forward / backward rolling
    medians over the (already deduped) price sequence, composed
    center → forward → backward → global-median."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_names, kind="mergesort").reset_index(drop=True)
        s = pdf[price_name].astype(float)
        center = s.rolling(2 * window + 1, center=True, min_periods=window + 1).median()
        fwd = s[::-1].rolling(window + 1, min_periods=1).median()[::-1]
        back = s.rolling(window + 1, min_periods=1).median()
        anchor = center.fillna(fwd).fillna(back)
        if anchor.isna().any():
            anchor = anchor.fillna(float(np.nanmedian(s.to_numpy())))
        out = pdf.copy()
        out["anchor_price"] = anchor.astype(float)
        return out

    return kernel


def _fixed_width_order_key(slim: DataFrame, order_cols: list[str]):
    """Strictly order-isomorphic fixed-width encoding of the order
    tuple, or None when the column shape is unsupported.

    Same decimal(38,0)-pack idea as functions/ordered.packed_order_key
    (which a1/d31's min_by keys ride), generalized to null fields and
    the FULL signed long domain — the 2^63-shifted second component
    needs a 20-digit budget, one past packed_order_key's ≤19 contract,
    which the tighter |micros| ≤ 2.53e17 first-component bound pays for.

    Supported shape: (timestamp, integral) — the stage-0 callers'
    (ts, event_id). pack = micros(ts) * 10^20 + (event_id + 2^63 + 1),
    computed in exact decimal(38,0) arithmetic (bounds proved at
    _ORD_SHIFT's definition). Null fields encode below every real
    value (nulls-first), matching min(struct)'s field ordering, so the
    keep-first dedup picks the identical row; the downstream pandas
    sort sees nulls first rather than pandas' NaT-last — order columns
    are non-null in every caller's data, and only the SORT POSITION of
    a null-order row could differ, never which row survives dedup."""
    from pyspark.sql.types import (
        ByteType,
        IntegerType,
        LongType,
        ShortType,
        TimestampType,
    )

    if len(order_cols) != 2:
        return None
    t_type = slim.schema[order_cols[0]].dataType
    e_type = slim.schema[order_cols[1]].dataType
    if not isinstance(t_type, TimestampType):
        return None
    if not isinstance(e_type, (ByteType, ShortType, IntegerType, LongType)):
        return None
    t = F.col(order_cols[0])
    e = F.col(order_cols[1]).cast("long")
    # -5e17 sits below every legal Spark micros value (min ≈ -6.3e16)
    t_enc = (
        F.when(t.isNull(), F.lit(-(5 * 10**17)))
        .otherwise(F.unix_micros(t))
        .cast("decimal(18,0)")
    )
    # shifted event: [1, 2^64] for real values, 0 for null — < 10^20.
    # Literals above 2^63 must be python Decimals (a bare int literal
    # goes through java.lang.Long and overflows).
    import decimal

    off = F.lit(decimal.Decimal(_ORD_OFF + 1))
    shift = F.lit(decimal.Decimal(_ORD_SHIFT))
    e_enc = F.when(e.isNull(), F.lit(0).cast("decimal(21,0)")).otherwise(
        e.cast("decimal(20,0)") + off.cast("decimal(20,0)")
    )
    return (
        (t_enc * shift.cast("decimal(21,0)")).cast("decimal(38,0)") + e_enc
    ).cast("decimal(38,0)")


def rolling_unique_anchor(
    df: DataFrame,
    id_col: str,
    date_col: str,
    price_col: str,
    order_cols: Sequence[str],
    window: int = 5,
) -> DataFrame:
    """Anchor table: one row per unique (id, date, price) with its
    rolling unique-median anchor. `order_cols` must totally order each
    id's trades (the reference's 6-key stable sort)."""
    order_cols = list(order_cols)
    slim = df.select(id_col, date_col, price_col, *order_cols)
    # keep-first as a hash AGGREGATE, not a row_number window (r16,
    # guide §2.2): the lexicographically-first order tuple IS the
    # window's rank-1 row since the slim frame's only non-key columns
    # ARE the order columns — and the aggregate collapses duplicate
    # triples map-side (partial aggregation), so the exchange ships
    # |unique triples| instead of |rows| with no per-partition sort.
    packed = _fixed_width_order_key(slim, order_cols)
    if packed is not None:
        # r17 (guide §2.2/§5): min over a FIXED-WIDTH decimal(38,0)
        # pack of the order tuple — a struct min buffer is not
        # UnsafeRow-mutable and demoted the whole aggregate pair to
        # SortAggregate; the decimal buffer keeps it HashAggregate.
        # The kernel only ever SORTS by the order columns (the anchor
        # output never emits them), so an order-isomorphic key is
        # exactly equivalent.
        dedup = slim.groupBy(id_col, date_col, price_col).agg(
            F.min(packed).alias("__w1_ord")
        )
        kernel_order = ["__w1_ord"]
    else:
        dedup = (
            slim.groupBy(id_col, date_col, price_col)
            .agg(
                F.min(
                    F.struct(*[F.col(c) for c in order_cols])
                ).alias("__first")
            )
            .select(
                id_col,
                date_col,
                price_col,
                *[F.col(f"__first.{c}").alias(c) for c in order_cols],
            )
        )
        kernel_order = order_cols
    schema = StructType(
        [dedup.schema[c] for c in dedup.columns]
        + [StructField("anchor_price", DoubleType())]
    )
    kernel = _anchor_kernel(price_col, kernel_order, window)
    anchored = (
        pin_group_parallelism(dedup, id_col)
        .groupBy(id_col)
        .applyInPandas(kernel, schema=schema)
    )
    return anchored.select(id_col, date_col, price_col, "anchor_price")


def decimal_shift_corrector(
    df: DataFrame,
    id_col: str = "cusip_id",
    date_col: str = "trd_exctn_dt",
    price_col: str = "rptd_pr",
    order_cols: Sequence[str] = ("trd_exctn_tm",),
    factors: Sequence[float] = (0.1, 0.01, 10.0, 100.0),
    tol_pct_good: float = 0.02,
    tol_abs_good: float = 8.0,
    tol_pct_bad: float = 0.05,
    low_pr: float = 5.0,
    high_pr: float = 300.0,
    window: int = 5,
    improvement_frac: float = 0.2,
    par_snap: bool = True,
    par_band: float = 15.0,
    mode: str = "flag",
) -> DataFrame:
    """Append dec_shift_flag / dec_shift_factor / suggested_price
    (mode='flag'), or overwrite price_col where flagged (mode='clean').

    Gate semantics match the reference bit-for-bit, including its eps
    slop and the strict-< factor preference (earliest factor wins ties).
    """
    anchors = rolling_unique_anchor(
        df, id_col, date_col, price_col, list(order_cols), window
    )
    out = df.join(anchors, on=[id_col, date_col, price_col], how="left")

    # No fallback anchor for rows that missed the dedup table: only
    # null-price rows miss the join (null keys don't match), and a
    # null price nulls every gate input below — flag 0, factor 1.0,
    # suggested_price null — whatever the anchor is. (NaN corner
    # audited: a NaN price CAN flip raw_rel>tol to TRUE under a NaN
    # anchor, but the accept conjunction still nulls out → flag 0
    # either way.) The per-(id, date) median window this replaces
    # (r16) forced one more full-fact Exchange on a column the output
    # provably never reads.
    out = out.withColumn("__anchor", F.col("anchor_price").cast("double"))
    anchor = F.col("__anchor")
    price = F.col(price_col).cast("double")
    raw_rel = F.abs(price - anchor) / anchor

    # factor selection as ONE sorted candidate array. An iterative
    # when()-fold would nest each accumulator inside the next and blow
    # the expression tree up exponentially (observed: 3 MiB codegen
    # binaries, 10× runtime). Sort key (rel, position) reproduces the
    # reference's strict-< earliest-factor tie preference.
    cands = F.array(
        *[
            F.struct(
                F.when(
                    (price * F.lit(float(f)) >= F.lit(low_pr))
                    & (price * F.lit(float(f)) <= F.lit(high_pr)),
                    F.abs(price * F.lit(float(f)) - anchor) / anchor,
                ).alias("rel"),
                F.lit(i).alias("pos"),
                F.lit(float(f)).alias("factor"),
                (price * F.lit(float(f))).alias("price"),
            )
            for i, f in enumerate(factors)
        ]
    )
    out = out.withColumn(
        "__best",
        F.get(  # get(): null on empty (ANSI-safe), no plausible factor
            F.array_sort(
                F.filter(cands, lambda x: x["rel"].isNotNull() & ~F.isnan(x["rel"]))
            ),
            0,
        ),
    )
    best_rel = F.col("__best.rel")
    best_factor = F.col("__best.factor")
    best_price = F.col("__best.price")

    abs_good = F.abs(best_price - anchor) <= F.lit(tol_abs_good + EPS)
    par_ok = (
        (F.abs(anchor - 100.0) <= F.lit(par_band))
        & (F.abs(best_price - 100.0) <= F.lit(par_band))
        if par_snap
        else F.lit(False)
    )
    accepted = (
        (raw_rel > F.lit(tol_pct_bad - EPS))
        & ((best_rel <= F.lit(tol_pct_good + EPS)) | abs_good | par_ok)
        & (best_rel <= F.lit(improvement_frac) * raw_rel + F.lit(EPS))
    )
    flag = F.when(accepted, F.lit(1)).otherwise(F.lit(0))

    out = (
        out.withColumn("dec_shift_flag", flag)
        .withColumn(
            "dec_shift_factor",
            F.when(flag == 1, best_factor).otherwise(F.lit(1.0)),
        )
        .withColumn(
            "suggested_price", F.when(flag == 1, best_price).otherwise(price)
        )
        .drop("anchor_price", "__anchor", "__best")
    )
    if mode == "clean":
        out = out.withColumn(
            price_col,
            F.when(F.col("dec_shift_flag") == 1, F.col("suggested_price")).otherwise(
                F.col(price_col)
            ),
        )
    return out
