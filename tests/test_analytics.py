from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import analytics

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(analytics.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        analytics.QUERIES[name](spark, SF_CORRECT), oracle, analytics.ORACLES[name]
    )


def test_rollup_has_grand_total(spark):
    rows = analytics.monitor_rollup_cube(spark, SF_CORRECT).collect()
    grand = [r for r in rows if r.grouping_level == 3]
    assert len(grand) == 1 and grand[0].n_events == 10000


def test_range_join_is_equi_join(spark):
    from iris_project_database_refresh_spark.operators.analytics import range_join_binned

    plan = (
        range_join_binned(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the whole point of binning: an ordinary equi-join, not a
    # nested-loop over the BETWEEN predicate
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_salted_rollup_plan_has_two_phases(spark):
    plan = (
        analytics.events_salted_rollup(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # phase 1 groups on (event_type, _salt): the salt must reach the
    # first exchange; phase 2 merges on event_type alone
    assert "_salt" in plan
    assert plan.count("Exchange") == 2


def test_interval_overlap_is_equi_join(spark):
    df = analytics.interval_overlap_join(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    rows = df.collect()
    assert rows
    # overlap length is positive and bounded by the shorter family
    assert all(0 < r.overlap_s <= analytics.OVL_B_LEN_S for r in rows)
