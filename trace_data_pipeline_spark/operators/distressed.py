"""W7: ultra-distressed price filters.

Four sub-filters over a daily price panel, flagging artifacts common in
distressed-bond data (`stage1/helper_functions.py:766-1273`, config
`stage1/_stage1_settings.py:67-94`):

1. anomalous ultra-low / suspicious-round prints whose valid neighbors
   (±lookback/lookforward obs) trade ≥ ratio× higher (median);
2. upward spikes ≥ ratio× the median of lower prior prints that recover
   within the lookforward window;
3. plateaus — runs (≥ min days) of EXACTLY equal ultra-low/round prices
   with a ≥ ratio× pre/post neighbor or a round-number level;
4. intraday inconsistency — rows with any price column below a level
   and (hi−lo)/mean above a threshold.

Spark-first split: 1–3 need each id's ordered series → one
applyInPandas grouped map (numpy kernels; per-group state is one bond's
daily history). 4 is row-local → pure column algebra, JVM-side.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ByteType, StructField, StructType

from trace_data_pipeline_spark.operators.parallelism import pin_group_parallelism

ROUND_NUMBERS = (0.001, 0.01, 0.05, 0.10, 0.25, 0.50, 0.75, 1.00)


def _median(a: np.ndarray) -> float:
    a = np.sort(a)
    m = a.size
    return float(a[m // 2]) if m % 2 else float((a[m // 2 - 1] + a[m // 2]) * 0.5)


def _is_round(
    p: np.ndarray,
    valid: np.ndarray,
    tol: float,
    round_numbers: tuple = ROUND_NUMBERS,
) -> np.ndarray:
    out = np.zeros(p.size, dtype=bool)
    for r in round_numbers:
        out |= np.abs(p - r) < tol
    return out & valid


def _anomaly_flags(
    p: np.ndarray,
    eligible: np.ndarray,
    valid: np.ndarray,
    lookback: int,
    lookforward: int,
    min_ratio: float,
) -> np.ndarray:
    n = p.size
    flags = np.zeros(n, dtype=np.int8)
    for i in np.nonzero(eligible & valid)[0]:
        lo, hi = max(0, i - lookback), min(n, i + lookforward + 1)
        window = np.concatenate([p[lo:i], p[i + 1 : hi]])
        wvalid = np.concatenate([valid[lo:i], valid[i + 1 : hi]])
        surr = window[wvalid & (window > p[i])]
        if surr.size and _median(surr) / (p[i] + 1e-10) >= min_ratio:
            flags[i] = 1
    return flags


def _spike_flags(
    p: np.ndarray,
    eligible: np.ndarray,
    valid: np.ndarray,
    lookback: int,
    lookforward: int,
    min_ratio: float,
    recovery_ratio: float,
) -> np.ndarray:
    n = p.size
    flags = np.zeros(n, dtype=np.int8)
    for i in np.nonzero(eligible & valid)[0]:
        lo = max(0, i - lookback)
        pre = p[lo:i][valid[lo:i] & (p[lo:i] < p[i])]
        if not pre.size:
            continue
        med = _median(pre)
        if p[i] / (med + 1e-10) < min_ratio:
            continue
        hi = min(n, i + lookforward + 1)
        ahead = p[i + 1 : hi][valid[i + 1 : hi]]
        if np.any(ahead <= med * recovery_ratio):
            flags[i] = 1
    return flags


def _plateau_flags(
    p: np.ndarray,
    eligible: np.ndarray,
    valid: np.ndarray,
    min_days: int,
    pre_post_ratio: float,
    is_round: np.ndarray,
) -> np.ndarray:
    n = p.size
    flags = np.zeros(n, dtype=np.int8)
    i = 0
    while i < n:
        if not (valid[i] and eligible[i]):
            i += 1
            continue
        j = i + 1
        while j < n and p[j] == p[i]:
            j += 1
        if j - i >= min_days:
            suspicious = bool(is_round[i])
            if i > 0 and valid[i - 1] and p[i - 1] / (p[i] + 1e-10) >= pre_post_ratio:
                suspicious = True
            if j < n and valid[j] and p[j] / (p[i] + 1e-10) >= pre_post_ratio:
                suspicious = True
            if suspicious:
                flags[i:j] = 1
        i = j
    return flags


def ultra_distressed_filter(
    df: DataFrame,
    id_col: str = "cusip_id",
    order_cols: Sequence[str] = ("trd_exctn_dt",),
    price_col: str = "pr",
    price_cols: Sequence[str] = ("prc_ew", "prc_vw", "prc_first", "prc_last"),
    ultra_low_threshold: float = 0.10,
    min_normal_price_ratio: float = 3.0,
    high_spike_threshold: float = 5.0,
    min_spike_ratio: float = 3.0,
    recovery_ratio: float = 2.0,
    plateau_ultra_low_threshold: float = 0.15,
    min_plateau_days: int = 2,
    round_tolerance: float = 0.0001,
    lookback: int = 5,
    lookforward: int = 5,
    pre_post_price_ratio: float = 3.0,
    intraday_range_threshold: float = 0.75,
    intraday_price_threshold: float = 20.0,
    round_dp: int | None = 4,
    suspicious_round_numbers: Sequence[float] = ROUND_NUMBERS,
) -> DataFrame:
    """Append the four flag columns + flag_refined_any.

    round_dp: the reference pre-rounds every price column to 4dp (its
    exact-equality plateau detection depends on it); pass None when the
    input is already fixed-point to keep the plan bit-exact across
    engines.
    """
    if round_dp is not None:
        for c in [price_col, *price_cols]:
            if c in df.columns:
                df = df.withColumn(c, F.round(c, round_dp))

    order_names = list(order_cols)
    # the reference's production config passes its OWN list (e.g.
    # ULTRA_DISTRESSED_CONFIG omits 0.75) — a module constant here
    # would silently flag differently than the pipeline it mirrors
    rnd_tuple = tuple(suspicious_round_numbers)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_names, kind="mergesort").reset_index(drop=True)
        p = pdf[price_col].astype(float).to_numpy()
        n = p.size
        out = pdf.copy()
        a = np.zeros(n, dtype=np.int8)
        s = np.zeros(n, dtype=np.int8)
        pl = np.zeros(n, dtype=np.int8)
        if n >= min(3, min_plateau_days):
            valid = ~np.isnan(p)
            rnd = _is_round(p, valid, round_tolerance, rnd_tuple)
            if n >= 3:
                a = _anomaly_flags(
                    p,
                    (p < ultra_low_threshold) | rnd,
                    valid,
                    lookback,
                    lookforward,
                    min_normal_price_ratio,
                )
                s = _spike_flags(
                    p,
                    (p > high_spike_threshold) | (rnd & (p > 0.50)),
                    valid,
                    lookback,
                    lookforward,
                    min_spike_ratio,
                    recovery_ratio,
                )
            if n >= min_plateau_days:
                pl = _plateau_flags(
                    p,
                    (p < plateau_ultra_low_threshold) | rnd,
                    valid,
                    min_plateau_days,
                    pre_post_price_ratio,
                    rnd,
                )
        out["flag_anomalous_price"] = a
        out["flag_upward_spike"] = s
        out["flag_plateau_sequence"] = pl
        return out

    schema = StructType(
        [df.schema[c] for c in df.columns]
        + [
            StructField("flag_anomalous_price", ByteType()),
            StructField("flag_upward_spike", ByteType()),
            StructField("flag_plateau_sequence", ByteType()),
        ]
    )
    out = (
        pin_group_parallelism(df, id_col)
        .groupBy(id_col)
        .applyInPandas(kernel, schema=schema)
    )

    # filter 4 is row-local: stay JVM-side; null-aware like the
    # reference (stats over the non-null subset, ≥2 values required)
    cols = [F.col(c) for c in price_cols if c in df.columns]
    if len(cols) >= 2:
        vals = F.array_compact(F.array(*[c.cast("double") for c in cols]))
        cnt = F.size(vals)
        # try_divide, not `/`: AND does not guarantee short-circuit, so
        # an all-null row (cnt=0) would hit ANSI divide-by-zero even
        # though the cnt>=2 conjunct already excludes it
        mean = F.try_divide(
            F.aggregate(vals, F.lit(0.0), lambda acc, x: acc + x),
            cnt.cast("double"),
        )
        rng = F.array_max(vals) - F.array_min(vals)
        low = F.array_min(vals) < F.lit(intraday_price_threshold)
        intraday = F.when(
            (cnt >= 2)
            & low
            & (mean > 0)
            & (F.try_divide(rng, mean) > F.lit(intraday_range_threshold)),
            F.lit(1),
        ).otherwise(F.lit(0))
    else:
        intraday = F.lit(0)
    out = out.withColumn("flag_intraday_inconsistent", intraday.cast("byte"))

    any_flag = (
        (F.col("flag_anomalous_price") == 1)
        | (F.col("flag_upward_spike") == 1)
        | (F.col("flag_plateau_sequence") == 1)
        | (F.col("flag_intraday_inconsistent") == 1)
    )
    return out.withColumn(
        "flag_refined_any", F.when(any_flag, F.lit(1)).otherwise(F.lit(0)).cast("byte")
    )
