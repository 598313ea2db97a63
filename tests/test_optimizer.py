from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import optimizer

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(optimizer.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        optimizer.QUERIES[name](spark, SF_CORRECT), oracle, optimizer.ORACLES[name]
    )


def test_selectivity_bin_aligned_predicates_are_exact(spark):
    rows = {
        r["pred_id"]: r
        for r in optimizer.selectivity_estimate_audit(spark, SF_CORRECT).collect()
    }
    assert len(rows) == len(optimizer.PREDICATES)
    # bin-aligned ranges sum whole bins — uniform interpolation is exact
    for pid in (0, 4):
        assert rows[pid]["est_rows"] == rows[pid]["actual_rows"]
        assert rows[pid]["q_error_milli"] == 1000
    # every estimate within 2x of truth on this smooth column
    for r in rows.values():
        assert r["q_error_milli"] < 2000
        assert r["est_rows"] >= 0 and r["actual_rows"] >= 0


def test_cube_greedy_trajectory_invariants(spark):
    rows = sorted(
        optimizer.cube_materialize_greedy(spark, SF_CORRECT).collect(),
        key=lambda r: r["round"],
    )
    assert [r["round"] for r in rows] == [1, 2, 3]
    masks = [r["mask"] for r in rows]
    assert len(set(masks)) == 3 and all(0 <= m <= 6 for m in masks)
    # greedy on a submodular benefit: marginal gains never increase
    benefits = [r["benefit"] for r in rows]
    assert benefits == sorted(benefits, reverse=True)
    # each positive-benefit pick strictly lowers the workload cost
    totals = [r["total_cost_after"] for r in rows]
    for i in range(1, len(totals)):
        if benefits[i] > 0:
            assert totals[i] < totals[i - 1]
    # dims label decodes the mask
    for r in rows:
        n_dims = bin(r["mask"]).count("1")
        assert (r["dims"] == "apex") == (n_dims == 0)
        if n_dims:
            assert len(r["dims"].split(",")) == n_dims


def test_join_order_pick_matches_true_costs(spark):
    rows = {
        r["join_order"]: r
        for r in optimizer.join_order_cost_audit(spark, SF_CORRECT).collect()
    }
    assert set(rows) == {"lineitem_orders_first", "orders_customer_first"}
    # exactly one chosen order, and on uniform TPC-H keys the estimate's
    # pick agrees with the true intermediate sizes
    assert sum(r["chosen"] for r in rows.values()) == 1
    chosen = next(r for r in rows.values() if r["chosen"] == 1)
    assert chosen["actual_intermediate"] == min(
        r["actual_intermediate"] for r in rows.values()
    )
    for r in rows.values():
        assert r["q_error_milli"] >= 1000
