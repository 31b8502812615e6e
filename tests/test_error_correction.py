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


# ------------------------------------------- W2 kernel vectorization


def test_w2_kernel_matches_per_row_reference_scan():
    """r16 optimization gate: `_scan_group` iterates only precomputed
    candidate rows and `_trailing_unique_median` runs as one sliding
    sort — both must stay BIT-identical to the straightforward per-row
    reference scan below (the pre-r16 implementation) on stress grids
    with jumps, par runs, plateaus, duplicates and NaNs."""
    import numpy as np

    from trace_data_pipeline_spark.operators.bounceback import (
        EPS,
        _scan_group,
        _trailing_unique_median,
    )

    def ref_median(p, window):
        out = np.full(p.size, np.nan)
        for i in range(1, p.size):
            seg = p[max(0, i - window) : i]
            seg = seg[~np.isnan(seg)]
            if seg.size:
                out[i] = float(np.median(np.unique(seg)))
        return out

    def ref_scan(p, *, threshold_abs, lookahead, max_span, window,
                 back_to_anchor_tol, candidate_slack_abs,
                 reassignment_margin_abs, par_spike, par_level,
                 par_equal_tol, par_min_run, par_cooldown):
        n = p.size
        flags = np.zeros(n, dtype=np.int8)
        d = np.empty(n)
        d[0] = np.nan
        d[1:] = p[1:] - p[:-1]
        base = ref_median(p, window + 1)
        thr = max(0.0, threshold_abs - candidate_slack_abs)
        back_abs = back_to_anchor_tol * threshold_abs

        def at_par(x):
            return not np.isnan(x) and abs(x - par_level) <= par_equal_tol

        i, cooldown_until = 0, -1
        while i < n:
            if i <= cooldown_until and not at_par(p[i]):
                i += 1
                continue
            jump = not np.isnan(d[i]) and abs(d[i]) >= thr - EPS
            far = not np.isnan(base[i]) and abs(p[i] - base[i]) >= thr - EPS
            par_hit = (
                par_spike and at_par(p[i]) and not np.isnan(base[i])
                and abs(p[i] - base[i]) >= back_abs - EPS
            )
            par_only = par_hit and not jump
            if not (jump or far or par_hit):
                i += 1
                continue
            stop_at = None
            if not par_only:
                for j in range(i + 1, min(n - 1, i + lookahead) + 1):
                    opposite = (
                        not np.isnan(d[i]) and not np.isnan(d[j])
                        and np.sign(d[j]) == -np.sign(d[i])
                        and abs(d[j]) >= thr - EPS
                    )
                    returned = not np.isnan(base[i]) and (
                        abs(p[j] - base[i]) <= back_abs + EPS
                    )
                    if opposite or returned:
                        stop_at = j
                        break
            if stop_at is not None:
                start = i
                if i > 0 and not np.isnan(base[i - 1]) and not np.isnan(base[i]):
                    dev_prev = abs(p[i - 1] - base[i - 1])
                    dev_curr = abs(p[i] - base[i])
                    if (
                        dev_prev - dev_curr >= reassignment_margin_abs - EPS
                        and dev_prev >= back_abs - EPS
                    ):
                        start = i - 1
                if not par_hit or at_par(p[start]):
                    flags[start] = 1
                for k in range(start + 1, min(stop_at, start + max_span) + 1):
                    if par_hit:
                        if at_par(p[k]):
                            flags[k] = 1
                    elif not np.isnan(base[start]) and (
                        abs(p[k] - base[start]) >= back_abs - EPS
                    ):
                        flags[k] = 1
                    else:
                        break
                if par_hit:
                    cooldown_until = max(cooldown_until, stop_at + par_cooldown)
                i = stop_at + 1
                continue
            if par_hit:
                run_end = i
                while run_end + 1 < n and at_par(p[run_end + 1]):
                    run_end += 1
                if run_end - i + 1 >= par_min_run:
                    flags[i : run_end + 1] = 1
                    cooldown_until = max(cooldown_until, run_end + par_cooldown)
                    i = run_end + 1
                    continue
            i += 1
        return flags

    rng = np.random.default_rng(16)
    kw = dict(
        threshold_abs=35.0, lookahead=5, max_span=5, window=5,
        back_to_anchor_tol=0.25, candidate_slack_abs=1.0,
        reassignment_margin_abs=5.0, par_spike=True, par_level=100.0,
        par_equal_tol=1e-8, par_min_run=3, par_cooldown=2,
    )
    for trial in range(120):
        n = int(rng.integers(1, 250))
        p = 60 + np.cumsum(rng.normal(0, 1.5, n))
        idx = rng.choice(n, max(1, n // 25), replace=False)
        p[idx] *= rng.choice([0.1, 10.0, 100.0], idx.size)
        for s in rng.choice(n, max(1, n // 30), replace=False):
            p[s : s + int(rng.integers(1, 6))] = 100.0
        for s in rng.choice(n, max(1, n // 40), replace=False):
            p[s : s + int(rng.integers(2, 7))] = p[s]
        p[rng.choice(n, max(1, n // 20), replace=False)] = np.nan
        variants = [kw, dict(kw, par_spike=False),
                    dict(kw, threshold_abs=1.0, candidate_slack_abs=2.0)]
        for v in variants:
            assert np.array_equal(ref_scan(p.copy(), **v), _scan_group(p.copy(), **v)), (
                f"scan mismatch trial={trial}"
            )
        ma = ref_median(p, 6)
        mb = _trailing_unique_median(p, 6)
        assert np.array_equal(
            ma.view(np.uint64), mb.view(np.uint64)
        ), f"median bit mismatch trial={trial}"


def test_w1_null_price_rows_pass_through_unflagged(spark):
    """r16: the per-(id,date) median fallback anchor was removed — a
    null price misses the anchor join (null keys don't match) and must
    still come out flag 0 / factor 1.0 / suggested null, with its
    group's other rows corrected exactly as before."""
    prices = [100.0, 101.0, None, 1010.0, 100.5, None, 99.5]
    pdf = pd.DataFrame(
        {
            "cusip_id": "X",
            "trd_exctn_dt": "2024-01-15",
            "seq": range(len(prices)),
            "rptd_pr": [float(p) if p is not None else None for p in prices],
        }
    )
    out = decimal_shift_corrector(
        spark.createDataFrame(pdf), order_cols=("seq",)
    )
    rows = {r["seq"]: r for r in out.collect()}
    assert len(rows) == len(prices)
    for s in (2, 5):
        assert rows[s]["dec_shift_flag"] == 0
        assert rows[s]["dec_shift_factor"] == 1.0
        assert rows[s]["suggested_price"] is None
    assert rows[3]["dec_shift_flag"] == 1  # the 10x row still corrects
    assert rows[3]["dec_shift_factor"] == 0.1


def test_w1_packed_order_key_matches_struct_dedup(spark):
    """r17: the keep-first dedup mins a fixed-width decimal(38,0) pack
    of the (ts, event_id) order tuple instead of min(struct(...)) so
    the aggregate stays hash-based. The pack must be strictly
    order-isomorphic: on a frame with duplicate (id, date, price)
    triples, ts ties broken by event_id, negative prices/ids and
    boundary event_ids, the anchors must equal the frozen struct-path
    reference EXACTLY — and the plan must carry a HashAggregate with
    no SortAggregate."""
    import datetime as dt

    from pyspark.sql import functions as F

    from trace_data_pipeline_spark.operators.decimal_shift import (
        rolling_unique_anchor,
    )

    base = dt.datetime(2024, 3, 1, 12, 0, 0)
    rows = []
    # two ids, several dates, duplicate triples with shuffled orders
    for uid in ("A", "B"):
        for day in range(4):
            d = f"2024-03-0{day + 1}"
            for px, pairs in [
                (100.0 + day, [(5, 2), (5, 1), (3, 9)]),  # ts tie -> event_id
                (101.5 + day, [(7, 0), (2, 2**62)]),       # big event_id
                (9.75, [(1, 3)]),
            ]:
                for toff, eid in pairs:
                    rows.append(
                        (uid, d, px, base + dt.timedelta(seconds=toff), eid)
                    )
    df = spark.createDataFrame(
        rows, "cusip_id string, trd_exctn_dt string, rptd_pr double, "
        "ts timestamp, event_id long"
    )
    fast = rolling_unique_anchor(
        df, "cusip_id", "trd_exctn_dt", "rptd_pr", ["ts", "event_id"]
    )
    # the frozen r16 reference: min(struct) dedup + the same kernel
    from pyspark.sql.types import DoubleType, StructField, StructType

    from trace_data_pipeline_spark.operators.decimal_shift import (
        _anchor_kernel,
    )
    from trace_data_pipeline_spark.operators.parallelism import (
        pin_group_parallelism,
    )

    slim = df.select("cusip_id", "trd_exctn_dt", "rptd_pr", "ts", "event_id")
    dedup = (
        slim.groupBy("cusip_id", "trd_exctn_dt", "rptd_pr")
        .agg(F.min(F.struct("ts", "event_id")).alias("__first"))
        .select(
            "cusip_id",
            "trd_exctn_dt",
            "rptd_pr",
            F.col("__first.ts").alias("ts"),
            F.col("__first.event_id").alias("event_id"),
        )
    )
    schema = StructType(
        [dedup.schema[c] for c in dedup.columns]
        + [StructField("anchor_price", DoubleType())]
    )
    ref = (
        pin_group_parallelism(dedup, "cusip_id")
        .groupBy("cusip_id")
        .applyInPandas(
            _anchor_kernel("rptd_pr", ["ts", "event_id"], 5), schema=schema
        )
        .select("cusip_id", "trd_exctn_dt", "rptd_pr", "anchor_price")
    )
    key = ["cusip_id", "trd_exctn_dt", "rptd_pr"]
    got = {tuple(r[k] for k in key): r["anchor_price"]
           for r in fast.collect()}
    want = {tuple(r[k] for k in key): r["anchor_price"]
            for r in ref.collect()}
    assert got == want
    assert len(got) == len({(r[0], r[1], r[2]) for r in rows})  # deduped
    plan = fast._jdf.queryExecution().executedPlan().toString()
    assert "SortAggregate" not in plan
    assert "HashAggregate" in plan
