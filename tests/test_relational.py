from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import relational

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(relational.QUERIES))
def test_matches_oracle(spark, oracle, name):
    df = relational.QUERIES[name](spark, SF_CORRECT)
    assert_matches_oracle(df, oracle, relational.ORACLES[name])


def test_q5_broadcasts_dims(spark):
    plan = relational.q5_local_supplier(spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_q1_pushes_filter(spark):
    plan = relational.q1_pricing_summary(spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "l_shipdate" in plan
