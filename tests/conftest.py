from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEST_SF_DIR = os.environ.get("TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from trace_data_pipeline_spark.session import get_spark

    s = get_spark(
        app_name="trace-spark-tests",
        cpus=8,
        shuffle_partitions=8,
        driver_memory="8g",
    )
    yield s
