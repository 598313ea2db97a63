from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import relational_full

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(relational_full.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        relational_full.QUERIES[name](spark, SF_CORRECT),
        oracle,
        relational_full.ORACLES[name],
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_q21_single_fact_shuffle(spark):
    # The EXISTS/NOT-EXISTS rewrite must not self-join lineitem: exactly
    # one scan of the fact table, supplier broadcast.
    plan = _plan(relational_full.q21_waiting_suppliers(spark, SF_CORRECT))
    assert plan.count("lineitem.parquet") == 1
    assert "BroadcastHashJoin" in plan


def test_q2_dims_broadcast(spark):
    plan = _plan(relational_full.q2_min_cost_supplier(spark, SF_CORRECT))
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_q16_anti_join_broadcast(spark):
    plan = _plan(relational_full.q16_supplier_part_counts(spark, SF_CORRECT))
    assert "LeftAnti, BuildRight" in plan


def test_q11_total_is_lazy_broadcast(spark):
    # The global total must enter the plan as a broadcast 1-row
    # aggregate joined in (no driver-side collect baking a literal).
    df = relational_full.q11_important_values(spark, SF_CORRECT)
    plan = _plan(df)
    assert "BroadcastNestedLoopJoin" in plan
    assert plan.count("lineitem.parquet") == 2  # per-part + total branches
