"""W2: bounce-back price-error filter.

Flags one-off erroneous prints: a large one-step move (or a print far
from a trailing unique-median anchor) that "bounces back" within a few
rows — an opposite-signed jump or a return to the pre-move anchor.
Includes blame reassignment (flag the previous row when it deviates
more), bounded plateau extension, a par-spike heuristic for runs pinned
at exactly 100.0, and a post-flag cooldown.

Semantics mirror `stage0/create_daily_enhanced_trace.py:965-1221`
(params `stage0/_trace_settings.py:69-83`) bit-for-bit, including eps
slop. This is an inherently sequential per-id state machine — the one
class of operator that cannot be expressed in DataFrame algebra — so it
runs as an applyInPandas grouped map: one shuffle on id, per-group
state bounded by a single bond's history, numpy inside the kernel.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import ByteType, StructField, StructType

from trace_data_pipeline_spark.operators.parallelism import pin_group_parallelism

EPS = 1e-12


def _trailing_unique_median(p: np.ndarray, window: int) -> np.ndarray:
    """Strictly-backward anchor: median of the UNIQUE values among the
    previous `window` rows (the current row excluded via the shift).

    Vectorized as one (n, window) sliding view: each row is sorted
    (NaNs last), deduped by adjacent inequality — np.unique's own
    algorithm, so value selection is identical — and the median taken
    as (lo + hi) * 0.5 of the middle unique ranks, which reproduces
    np.median bit-for-bit (odd count: (v+v)*0.5 == v in IEEE; even:
    same add-then-halve as np.mean of the two middle values). The
    per-row Python loop this replaces paid ~3 small numpy calls per
    element (guide §4.2: batch the work, don't loop it)."""
    n = p.size
    out = np.full(n, np.nan)
    if n <= 1:
        return out
    buf = np.concatenate([np.full(window, np.nan), p[:-1]])
    m = np.lib.stride_tricks.sliding_window_view(buf, window)  # (n, window)
    s = np.sort(m, axis=1)  # NaNs sort to the end
    isval = ~np.isnan(s)
    uniq = isval.copy()
    uniq[:, 1:] &= s[:, 1:] != s[:, :-1]
    u = uniq.sum(axis=1)
    rank = np.cumsum(uniq, axis=1) - 1
    k_lo = ((u - 1) // 2)[:, None]
    k_hi = (u // 2)[:, None]
    vals = np.where(uniq, s, 0.0)
    v_lo = np.where(uniq & (rank == k_lo), vals, 0.0).sum(axis=1)
    v_hi = np.where(uniq & (rank == k_hi), vals, 0.0).sum(axis=1)
    med = (v_lo + v_hi) * 0.5
    np.copyto(out, med, where=u > 0)
    out[0] = np.nan
    return out


def _scan_group(
    p: np.ndarray,
    *,
    threshold_abs: float,
    lookahead: int,
    max_span: int,
    window: int,
    back_to_anchor_tol: float,
    candidate_slack_abs: float,
    reassignment_margin_abs: float,
    par_spike: bool,
    par_level: float,
    par_equal_tol: float,
    par_min_run: int,
    par_cooldown: int,
) -> np.ndarray:
    """The sequential scan over one id's time-ordered prices.

    A row the original per-row loop merely stepped past (no jump, no
    anchor deviation, no par hit) changes no state — cooldown only
    ever SKIPS rows — so the scan iterates the precomputed candidate
    set instead of every row (guide §4.2). The candidate masks are the
    loop's own predicates, hoisted and vectorized; the data-dependent
    state machine (lookahead, blame, plateau, cooldown) is unchanged
    and consumes the same scalars it always did."""
    n = p.size
    flags = np.zeros(n, dtype=np.int8)
    d = np.empty(n)
    d[0] = np.nan
    d[1:] = p[1:] - p[:-1]
    base = _trailing_unique_median(p, window + 1)

    thr = max(0.0, threshold_abs - candidate_slack_abs)
    back_abs = back_to_anchor_tol * threshold_abs

    base_ok = ~np.isnan(base)
    dev = np.abs(p - base)  # NaN where either side is NaN
    at_par_arr = ~np.isnan(p) & (np.abs(p - par_level) <= par_equal_tol)
    with np.errstate(invalid="ignore"):
        jump_m = ~np.isnan(d) & (np.abs(d) >= thr - EPS)
        far_m = base_ok & (dev >= thr - EPS)
        par_m = (
            at_par_arr & base_ok & (dev >= back_abs - EPS)
            if par_spike
            else np.zeros(n, dtype=bool)
        )

    def at_par(x: float) -> bool:
        return not np.isnan(x) and abs(x - par_level) <= par_equal_tol

    cooldown_until, resume = -1, 0
    for i in np.nonzero(jump_m | far_m | par_m)[0]:
        if i < resume:
            continue
        if i <= cooldown_until and not at_par_arr[i]:
            continue

        jump = bool(jump_m[i])
        par_hit = bool(par_m[i])
        par_only = par_hit and not jump

        # look ahead for the bounce: an opposite big move, or a return
        # to the pre-move anchor (par-only candidates skip this path)
        stop_at = None
        if not par_only:
            for j in range(i + 1, min(n - 1, i + lookahead) + 1):
                opposite = (
                    not np.isnan(d[i])
                    and not np.isnan(d[j])
                    and np.sign(d[j]) == -np.sign(d[i])
                    and abs(d[j]) >= thr - EPS
                )
                returned = bool(base_ok[i]) and (
                    abs(p[j] - base[i]) <= back_abs + EPS
                )
                if opposite or returned:
                    stop_at = j
                    break

        if stop_at is not None:
            start = i
            # blame reassignment: previous row deviating even more from
            # ITS anchor owns the error
            if i > 0 and base_ok[i - 1] and base_ok[i]:
                dev_prev = abs(p[i - 1] - base[i - 1])
                dev_curr = abs(p[i] - base[i])
                if (
                    dev_prev - dev_curr >= reassignment_margin_abs - EPS
                    and dev_prev >= back_abs - EPS
                ):
                    start = i - 1
            if not par_hit or at_par_arr[start]:
                flags[start] = 1
            # plateau extension: keep flagging while still displaced
            for k in range(start + 1, min(stop_at, start + max_span) + 1):
                if par_hit:
                    if at_par_arr[k]:
                        flags[k] = 1
                elif bool(base_ok[start]) and (
                    abs(p[k] - base[start]) >= back_abs - EPS
                ):
                    flags[k] = 1
                else:
                    break
            if par_hit:
                cooldown_until = max(cooldown_until, stop_at + par_cooldown)
            resume = stop_at + 1
            continue

        # persistent par block with no quick correction: flag runs of
        # at least par_min_run consecutive par prints
        if par_hit:
            run_end = i
            while run_end + 1 < n and at_par_arr[run_end + 1]:
                run_end += 1
            if run_end - i + 1 >= par_min_run:
                flags[i : run_end + 1] = 1
                cooldown_until = max(cooldown_until, run_end + par_cooldown)
                resume = run_end + 1
                continue

    return flags


def bounce_back_filter(
    df: DataFrame,
    id_col: str = "cusip_id",
    price_col: str = "rptd_pr",
    order_cols: Sequence[str] = ("trd_exctn_dt", "trd_exctn_tm"),
    threshold_abs: float = 35.0,
    lookahead: int = 5,
    max_span: int = 5,
    window: int = 5,
    back_to_anchor_tol: float = 0.25,
    candidate_slack_abs: float = 1.0,
    reassignment_margin_abs: float = 5.0,
    par_spike_heuristic: bool = True,
    par_level: float = 100.0,
    par_equal_tol: float = 1e-8,
    par_min_run: int = 3,
    par_cooldown_after_flag: int = 2,
    mode: str = "flag",
) -> DataFrame:
    """Append `filtered_error` (0/1) per row (mode='flag'), or drop the
    flagged rows (mode='clean')."""
    order_names = list(order_cols)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_names, kind="mergesort").reset_index(drop=True)
        flags = _scan_group(
            pdf[price_col].astype(float).to_numpy(),
            threshold_abs=threshold_abs,
            lookahead=lookahead,
            max_span=max_span,
            window=window,
            back_to_anchor_tol=back_to_anchor_tol,
            candidate_slack_abs=candidate_slack_abs,
            reassignment_margin_abs=reassignment_margin_abs,
            par_spike=par_spike_heuristic,
            par_level=par_level,
            par_equal_tol=par_equal_tol,
            par_min_run=par_min_run,
            par_cooldown=par_cooldown_after_flag,
        )
        out = pdf.copy()
        out["filtered_error"] = flags
        return out

    schema = StructType(
        [df.schema[c] for c in df.columns]
        + [StructField("filtered_error", ByteType())]
    )
    out = (
        pin_group_parallelism(df, id_col)
        .groupBy(id_col)
        .applyInPandas(kernel, schema=schema)
    )
    if mode == "clean":
        out = out.filter(out["filtered_error"] == 0).drop("filtered_error")
    return out
