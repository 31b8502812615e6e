"""Oracle differential tests: every catalog query vs its DuckDB twin —
a local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from tests.conftest import TEST_SF_DIR
from tests.parity import assert_parity, duckdb_oracle
from trace_data_pipeline_spark.plans import get_catalog

CATALOG = get_catalog()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_oracle_parity(spark, name, parity_recorder):
    q = CATALOG[name]
    df = q.builder(spark, TEST_SF_DIR)
    if q.oracle is None:
        n = df.count()
        assert n >= 0
        parity_recorder(name, {"rows": int(n), "value_hash": None, "oracle": False})
        return
    oracle = duckdb_oracle(q.oracle, TEST_SF_DIR)
    # VACUITY GATE (r4 verdict: d30 passed green on 0 rows for a
    # round): a parity match over an empty frame proves nothing —
    # every oracle-backed entry must compare at least one real row.
    # Audited r5: the minimum legitimate count is 1 (a9/a10 are
    # single-row cross-sectional summaries).
    assert len(oracle) > 0, f"{name}: oracle returned 0 rows — vacuous fixture"
    evidence = assert_parity(df, oracle, name=name)
    parity_recorder(name, {**evidence, "oracle": True})


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(CATALOG)
