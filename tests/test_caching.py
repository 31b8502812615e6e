"""The cache registry must actually free what catalog builders persist.

Regression test for the weakref bug: builders persist frames local to the
builder function, so only a strong-reference registry survives until
`release_caches()` is called by bench.py/run.py.
"""

from __future__ import annotations

import pytest

from trace_data_pipeline_spark.operators.caching import (
    release_caches,
    tracked_persist,
)


def _persist_inside_builder(spark):
    # mimics a catalog builder: the persisted wrapper is function-local
    df = tracked_persist(spark.range(100).withColumnRenamed("id", "k"))
    return df.groupBy().count()


def test_release_caches_frees_builder_persists(spark):
    release_caches()  # clean slate
    out = _persist_inside_builder(spark)
    out.collect()
    assert release_caches() >= 1
    assert release_caches() == 0  # registry drained


def test_release_after_catalog_entry(spark, sf_dir):
    """A real cache-using catalog entry must leave releasable caches."""
    import __spark_entry__ as entry_mod

    release_caches()
    q = entry_mod.queries()["d4_minhash_lsh_pairs"]
    q(spark, sf_dir).collect()
    assert release_caches() >= 1


@pytest.fixture
def sf_dir():
    from tests.conftest import TEST_SF_DIR

    return TEST_SF_DIR
