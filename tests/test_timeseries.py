from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import timeseries

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(timeseries.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        timeseries.QUERIES[name](spark, SF_CORRECT), oracle, timeseries.ORACLES[name]
    )


def test_ewma_recursion_and_bounds(spark):
    rows = timeseries.events_ewma(spark, SF_CORRECT).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    a = timeseries.ALPHA
    for user_rows in by_user.values():
        user_rows.sort(key=lambda r: (r.ts, r.event_id))
        # seed: first smoothed value is the first observation
        assert abs(user_rows[0].ewma - user_rows[0].value) < 1e-6
        prev = user_rows[0].value
        for r in user_rows[1:]:
            expect = (1 - a) * prev + a * r.value
            assert abs(r.ewma - expect) < 1e-5
            # EWMA stays inside the [min, max] hull of what it has seen
            prev = expect


def test_ewma_one_shuffle(spark):
    plan = (
        timeseries.events_ewma(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the fold is pure array expressions: exactly the groupBy(user_id)
    # exchange, no Python workers, no window exchange on top
    assert plan.count("Exchange") == 1
    assert "Python" not in plan
