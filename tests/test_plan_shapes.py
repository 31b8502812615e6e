"""Physical-plan guards — the 100 TB posture, asserted.

Each catalog query's physical plan is checked for scale hazards: an
accidental CartesianProduct, a dimension join that failed to broadcast,
or a scan that stopped pruning would all pass value tests at sf0.01
and then melt a cluster at 100 TB. Plans are compiled, not executed.
"""

from __future__ import annotations

import pytest

from tests.conftest import TEST_SF_DIR
from trace_data_pipeline_spark.plans import get_catalog

CATALOG = get_catalog()

# d10 broadcasts a query set against the corpus by construction — a
# BroadcastNestedLoopJoin over the broadcast side is the intended plan
_NLJ_ALLOWED = {
    "d10_cosine_topk",  # broadcast queries × corpus (intended)
    "j15_range_join",  # broadcast range table, non-equi condition
    "j13_j14_linker_extend",  # broadcast snapshot × future-date spine
    "a14_resample_ffill",  # broadcast date spine × id grid
    "a10_concentration",  # unpartitioned window over per-entity aggregate
    "a9_cross_sectional",  # global second-level aggregate
}


def _plan(spark, name: str) -> str:
    df = CATALOG[name].builder(spark, TEST_SF_DIR)
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(CATALOG))
def test_no_cartesian_product(spark, name):
    """No catalog plan may contain an unbroadcast cartesian product."""
    assert "CartesianProduct" not in _plan(spark, name), name


@pytest.mark.parametrize(
    "name",
    ["j10_enrichment_join", "j16_two_hop_flag", "f9_calendar_semi_join"],
)
def test_dimension_joins_broadcast(spark, name):
    """Dimension-side joins must be broadcast (no shuffle of the fact
    table onto a small-table key)."""
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, plan[:2000]
    assert "SortMergeJoin" not in plan, f"{name} fell back to SMJ"


def test_range_join_is_broadcast_nlj(spark):
    """J15's non-equi join must be a broadcast nested loop — never a
    shuffled cartesian."""
    plan = _plan(spark, "j15_range_join")
    assert "BroadcastNestedLoopJoin" in plan


def test_flagship_aggregate_is_single_pass(spark):
    """A1 is ONE partial+final aggregate over the scan (SortAggregate:
    the min_by struct keys are unhashable) — exactly one shuffle, no
    window, no join."""
    plan = _plan(spark, "a1_daily_panel")
    assert "partial_min_by" in plan  # map-side combine present
    assert plan.count("Exchange hashpartitioning") == 1
    assert "SortMergeJoin" not in plan and "Window" not in plan