"""Local replica of the driver's DuckDB-oracle differential check:
row count + sorted-column schema + value comparison (exact, after the
plans' own rounding discipline)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from trace_data_pipeline_spark.sources import TABLES


def duckdb_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con.execute(sql).df()


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_numeric_dtype(col):
            df[c] = col.astype("float64")
        else:
            df[c] = col.astype(object)
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def _assert_no_negative_zero(df: pd.DataFrame, side: str, name: str) -> None:
    """A -0.0 prints differently from 0.0 (CSV/byte hashes diverge even
    though == holds); plans must normalize with `+ 0.0` on both sides."""
    import numpy as np

    for c in df.columns:
        col = df[c]
        if pd.api.types.is_float_dtype(col):
            bad = (col == 0) & (np.copysign(1.0, col.fillna(1.0)) < 0)
            assert not bad.any(), f"{name}: {side} column {c!r} contains -0.0"


def _render(df: pd.DataFrame) -> pd.DataFrame:
    """String rendering with dtypes PRESERVED — the driver's value hash
    is rendering-sensitive, so an int64 `123` vs a float64 `123.0` is a
    mismatch even though the float-canonical compare passes (round 1:
    DuckDB SUM(BIGINT)→HUGEINT→float64 broke two driver rows that the
    float-coerced check waved through)."""
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        col = df[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            df[c] = col.astype("datetime64[us]").astype(str)
        else:
            df[c] = col.astype(str)
    return df


def _canon_order(df: pd.DataFrame):
    """Row order of the float-canonical sort (so both checks compare
    the same row alignment)."""
    coerced = df[sorted(df.columns)].copy()
    for c in coerced.columns:
        col = coerced[c]
        if pd.api.types.is_datetime64_any_dtype(col):
            coerced[c] = col.astype("datetime64[us]").astype(str)
        elif pd.api.types.is_numeric_dtype(col):
            coerced[c] = col.astype("float64")
        else:
            coerced[c] = col.astype(object)
    return coerced.sort_values(list(coerced.columns), na_position="last").index


def assert_parity(spark_df, oracle_pdf: pd.DataFrame, name: str = "") -> dict:
    a_raw = spark_df.toPandas()
    b_raw = oracle_pdf
    a = canon(a_raw)
    b = canon(b_raw)
    _assert_no_negative_zero(a, "spark", name)
    _assert_no_negative_zero(b, "oracle", name)
    assert sorted(a.columns) == sorted(b.columns), (
        f"{name}: column mismatch {sorted(a.columns)} vs {sorted(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs oracle {len(b)}"
    pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True, obj=name)
    # second gate: driver-style rendering equality (dtype-sensitive)
    ar = _render(a_raw.loc[_canon_order(a_raw)].reset_index(drop=True))
    br = _render(b_raw.loc[_canon_order(b_raw)].reset_index(drop=True))
    neq = ar.ne(br)
    if neq.any().any():
        cols = [c for c in ar.columns if neq[c].any()]
        samples = {
            c: (ar[c][neq[c]].iloc[0], br[c][neq[c]].iloc[0]) for c in cols[:4]
        }
        raise AssertionError(
            f"{name}: rendering mismatch (spark vs oracle dtype/format) in "
            f"columns {cols}; first diffs {samples}"
        )
    # summary for the PARITY artifact (r5 verdict item 2): both sides
    # just proved render-identical, so one hash describes them both —
    # the same md5-of-rendered-CSV shape the driver records
    import hashlib

    return {
        "rows": int(len(a)),
        "value_hash": hashlib.md5(
            ar.to_csv(index=False).encode()
        ).hexdigest(),
    }
