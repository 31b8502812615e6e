"""Oracle differential tests: every catalog query vs its DuckDB twin —
a local replica of the driver's CORRECTNESS gate."""

from __future__ import annotations

import pytest

from tests.conftest import TEST_SF_DIR
from tests.parity import assert_parity, duckdb_oracle
from trace_data_pipeline_spark.plans import get_catalog

CATALOG = get_catalog()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_oracle_parity(spark, name):
    q = CATALOG[name]
    df = q.builder(spark, TEST_SF_DIR)
    if q.oracle is None:
        assert df.count() >= 0
        return
    assert_parity(df, duckdb_oracle(q.oracle, TEST_SF_DIR), name=name)


def test_entry_contract(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, os_ = e.queries(), e.oracle_sql()
    assert set(os_) <= set(qs)
    assert len(qs) == len(CATALOG)
