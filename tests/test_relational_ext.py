from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import relational_ext

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(relational_ext.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        relational_ext.QUERIES[name](spark, SF_CORRECT), oracle, relational_ext.ORACLES[name]
    )


def test_q4_uses_semi_join(spark):
    plan = (
        relational_ext.q4_order_priority(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan


def test_q6_filters_pushed(spark):
    plan = (
        relational_ext.q6_revenue_change(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "l_shipdate" in plan and "l_quantity" in plan


def test_backlog_conserves_orders(spark):
    """Sweep-line invariant: total opened == total closed == orders with
    lines, and the backlog returns to zero at the end of the horizon."""
    from iris_project_database_refresh_spark.operators.relational_ext import (
        orders_open_backlog,
    )

    rows = sorted(orders_open_backlog(spark, SF_CORRECT).collect(), key=lambda r: r.day)
    assert sum(r.n_opened for r in rows) == sum(r.n_closed for r in rows)
    assert rows[-1].open_backlog == 0
    assert all(r.open_backlog >= 0 for r in rows)


def test_copurchase_lift_sane(spark):
    from iris_project_database_refresh_spark.operators.relational_ext import (
        BASKET_MIN_PAIR,
        BASKET_TOP,
        part_copurchase_lift,
    )

    rows = part_copurchase_lift(spark, SF_CORRECT).collect()
    assert len(rows) == BASKET_TOP
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_ab >= BASKET_MIN_PAIR
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert r.lift > 0
    supports = [r.n_ab for r in rows]
    assert supports == sorted(supports, reverse=True)


def test_trade_matrix_complete_and_stochastic(spark):
    from iris_project_database_refresh_spark.operators.relational_ext import (
        nation_trade_matrix,
    )

    rows = nation_trade_matrix(spark, SF_CORRECT).collect()
    # full 25x25 bilateral matrix at this SF
    assert len(rows) == 625
    shares = {}
    for r in rows:
        shares.setdefault(r.supp_nation, 0.0)
        shares[r.supp_nation] += r.export_share
    assert all(abs(s - 1.0) < 1e-3 for s in shares.values())


def test_wilson_bound_below_rate(spark):
    from iris_project_database_refresh_spark.operators.relational_ext import (
        brand_return_rates,
    )

    rows = brand_return_rates(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert 0 <= r.wilson_lower <= r.return_rate <= 1
        assert r.n_returned <= r.n_lines
