"""Bucketed-write demo: the same join, with and without bucketing.

Proves the scale claim directly on the physical plan: joining two
tables bucketed on the key has zero shuffle exchanges, while the
plain parquet join shuffles both sides.
"""

from __future__ import annotations

import pytest

from tests.conftest import TEST_SF_DIR
from trace_data_pipeline_spark.operators.bucketing import (
    bucketed_join,
    exchanges_in_plan,
    write_bucketed,
)
from trace_data_pipeline_spark.sources import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    orders = load_table(spark, TEST_SF_DIR, "orders")
    lineitem = load_table(spark, TEST_SF_DIR, "lineitem").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(
        orders,
        "orders_b",
        str(base / "orders_b"),
        ["o_orderkey"],
        num_buckets=4,
        sort_cols=["o_orderkey"],
    )
    write_bucketed(
        lineitem,
        "lineitem_b",
        str(base / "lineitem_b"),
        ["o_orderkey"],
        num_buckets=4,
        sort_cols=["o_orderkey"],
    )
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # Disable broadcast so the planner must pick SMJ — the exchange-free
    # plan then comes from the bucketing, not from a broadcast.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "lineitem_b", "orders_b", on=["o_orderkey"])
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan[:2000]
        assert exchanges_in_plan(joined) == 0, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_plain_join_shuffles_both_sides(spark):
    # Force the shuffle comparison: disable broadcast for this check.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders = load_table(spark, TEST_SF_DIR, "orders")
        lineitem = load_table(spark, TEST_SF_DIR, "lineitem").withColumnRenamed(
            "l_orderkey", "o_orderkey"
        )
        joined = lineitem.join(orders, on="o_orderkey")
        assert exchanges_in_plan(joined) >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_values_match_plain(spark, bucketed_tables):
    bucketed = bucketed_join(spark, "lineitem_b", "orders_b", on=["o_orderkey"])
    plain = (
        load_table(spark, TEST_SF_DIR, "lineitem")
        .withColumnRenamed("l_orderkey", "o_orderkey")
        .join(load_table(spark, TEST_SF_DIR, "orders"), on="o_orderkey")
    )
    assert bucketed.count() == plain.count()
