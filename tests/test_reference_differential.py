"""Differential tests against the reference's OWN error filters.

The strongest parity evidence available: extract the reference's
`decimal_shift_corrector` (W1), `flag_price_change_errors` (W2) and
`flag_initial_price_errors` (W3) function definitions from
`stage0/create_daily_enhanced_trace.py` via ast (NO module import — the
module's top level opens WRDS connections and imports packages this
container doesn't ship), execute them in a minimal namespace, and
assert row-exact agreement with the Spark operators on randomized
panels full of the corners the goldens enumerate one at a time:
planted decimal shifts, spikes, par plateaus, duplicate prints, null
prices, and tiny groups.

Skipped when the reference tree is absent so the repo stays
standalone. Nothing from the reference is copied into the repo — the
source is read at test time only.
"""

from __future__ import annotations

import ast
import functools
import os
import pathlib
from typing import Optional

import numpy as np
import pandas as pd
import pytest

from trace_data_pipeline_spark.operators.bounceback import bounce_back_filter
from trace_data_pipeline_spark.operators.decimal_shift import decimal_shift_corrector
from trace_data_pipeline_spark.operators.windows import initial_price_error_filter

_REF = pathlib.Path(os.environ.get("TDP_REFERENCE_DIR", "/root/reference"))
_SRC = _REF / "stage0" / "create_daily_enhanced_trace.py"

pytestmark = pytest.mark.skipif(
    not _SRC.exists(), reason="reference tree not available"
)


@functools.lru_cache(maxsize=None)
def _ref_fn(name: str):
    """Compile ONE top-level function def out of the reference module.

    `compile` runs with the postponed-annotations flag (the reference
    file declares `from __future__ import annotations`), so the
    extracted def never evaluates its type annotations and the exec
    namespace only needs pandas/numpy.
    """
    import __future__ as _fut

    tree = ast.parse(_SRC.read_text())
    node = next(
        n
        for n in tree.body
        if isinstance(n, ast.FunctionDef) and n.name == name
    )
    mod = ast.Module(body=[node], type_ignores=[])
    code = compile(
        ast.fix_missing_locations(mod),
        str(_SRC),
        "exec",
        flags=_fut.annotations.compiler_flag,
    )
    ns = {"pd": pd, "np": np, "Optional": Optional}
    exec(code, ns)
    return ns[name]


def _panel(seed: int, n_ids: int = 24) -> pd.DataFrame:
    """Randomized TRACE-like panel with planted pathologies.

    Per id: a positive random walk, ~8% decimal-shift corruptions
    (x10/x100/x0.1/x0.01), ~5% one-off spikes (the W2 candidates),
    optional exact-100.0 par plateaus, ~12% duplicate prints (stress
    the unique-median anchors), ~2% null prices, and group sizes from
    2 to 60 rows (tiny groups stress min_periods / first-n logic).
    (trd_exctn_dt, trd_exctn_tm) strictly orders each id's rows, so
    the reference's stable [id, date(, time)] sort and the kernels'
    order_cols sort agree and the comparison is order-unambiguous.
    """
    rng = np.random.default_rng(seed)
    rows = []
    for g in range(n_ids):
        cid = f"C{g:03d}"
        n = int(rng.integers(2, 60))
        base = float(rng.uniform(8.0, 280.0))
        prices = np.maximum(base + np.cumsum(rng.normal(0.0, 2.0, size=n)), 0.6)
        for i in range(n):
            u = rng.uniform()
            if u < 0.08:
                prices[i] *= float(rng.choice([10.0, 100.0, 0.1, 0.01]))
            elif u < 0.13:
                prices[i] = max(
                    0.6,
                    prices[i]
                    + float(rng.choice([-1.0, 1.0])) * float(rng.uniform(35, 90)),
                )
        if rng.uniform() < 0.35:
            s = int(rng.integers(0, n))
            plateau = int(rng.integers(1, 6))
            prices[s : s + plateau] = 100.0
        for i in range(1, n):
            if rng.uniform() < 0.12:
                prices[i] = prices[i - 1]
        dates = np.sort(rng.integers(0, 5, size=n))
        for i in range(n):
            p = None if rng.uniform() < 0.02 else float(prices[i])
            rows.append((cid, int(dates[i]), i, p))
    pdf = pd.DataFrame(
        rows, columns=["cusip_id", "trd_exctn_dt", "trd_exctn_tm", "rptd_pr"]
    )
    pdf["row_id"] = np.arange(len(pdf))
    # the reference functions assume caller-sorted input
    # (clean_trace_chunk sorts by [id, date, time] before calling them)
    return pdf.sort_values(
        ["cusip_id", "trd_exctn_dt", "trd_exctn_tm"], kind="mergesort"
    ).reset_index(drop=True)


def _spark_result(spark, pdf: pd.DataFrame, op, **kwargs) -> pd.DataFrame:
    sdf = spark.createDataFrame(
        pdf,
        schema="cusip_id string, trd_exctn_dt int, trd_exctn_tm int, "
        "rptd_pr double, row_id long",
    )
    # scatter input rows so the kernels' own ordering, not arrival
    # order, must produce the reference sequence
    out = op(sdf.repartition(7, "trd_exctn_tm"), **kwargs)
    res = out.toPandas().sort_values("row_id").reset_index(drop=True)
    return res


def _assert_col_equal(got: pd.Series, want: pd.Series, label: str):
    g = got.to_numpy(dtype=float)
    w = want.to_numpy(dtype=float)
    both_nan = np.isnan(g) & np.isnan(w)
    close = np.isclose(g, w, rtol=0, atol=1e-9)
    bad = ~(both_nan | close)
    assert not bad.any(), (
        f"{label}: {int(bad.sum())} mismatches, first at row "
        f"{int(np.argmax(bad))}: got={g[bad][:5]} want={w[bad][:5]}"
    )


@pytest.mark.parametrize("seed", [20260816, 977])
def test_w1_decimal_shift_matches_reference(spark, seed):
    pdf = _panel(seed)
    ref = _ref_fn("decimal_shift_corrector")(
        pdf.copy(),
        id_col="cusip_id",
        date_col="trd_exctn_dt",
        time_col="trd_exctn_tm",
        price_col="rptd_pr",
    )
    ref = ref.sort_values("row_id").reset_index(drop=True)
    got = _spark_result(
        spark,
        pdf,
        decimal_shift_corrector,
        id_col="cusip_id",
        date_col="trd_exctn_dt",
        price_col="rptd_pr",
        # must be disjoint from date_col (the anchor selects both);
        # trd_exctn_tm increases across each id's whole history, so it
        # alone reproduces the reference's [id, date, time] order
        order_cols=("trd_exctn_tm",),
    )
    _assert_col_equal(got["dec_shift_flag"], ref["dec_shift_flag"], "flag")
    _assert_col_equal(got["dec_shift_factor"], ref["dec_shift_factor"], "factor")
    _assert_col_equal(got["suggested_price"], ref["suggested_price"], "price")
    # the panels must actually exercise the corrector
    assert int(ref["dec_shift_flag"].sum()) > 0


@pytest.mark.parametrize("seed", [20260816, 977])
def test_w2_bounce_back_matches_reference(spark, seed):
    pdf = _panel(seed)
    ref = _ref_fn("flag_price_change_errors")(
        pdf.copy(),
        id_col="cusip_id",
        date_col="trd_exctn_dt",
        time_col="trd_exctn_tm",
        price_col="rptd_pr",
    )
    ref = ref.sort_values("row_id").reset_index(drop=True)
    got = _spark_result(
        spark,
        pdf,
        bounce_back_filter,
        id_col="cusip_id",
        price_col="rptd_pr",
        order_cols=("trd_exctn_dt", "trd_exctn_tm"),
    )
    _assert_col_equal(got["filtered_error"], ref["filtered_error"], "flag")
    assert int(ref["filtered_error"].sum()) > 0


@pytest.mark.parametrize("seed", [20260816, 977])
def test_w3_initial_price_matches_reference(spark, seed):
    pdf = _panel(seed)
    ref = _ref_fn("flag_initial_price_errors")(
        pdf.copy(),
        id_col="cusip_id",
        date_col="trd_exctn_dt",
        price_col="rptd_pr",
    )
    ref = ref.sort_values("row_id").reset_index(drop=True)
    got = _spark_result(
        spark,
        pdf,
        initial_price_error_filter,
        price_col="rptd_pr",
        id_cols=["cusip_id"],
        order_by=["trd_exctn_dt", "trd_exctn_tm"],
        mode="flag",
        flag_col="initial_error_flag",
    )
    _assert_col_equal(
        got["initial_error_flag"], ref["initial_error_flag"], "flag"
    )
