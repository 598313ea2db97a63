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


def test_supplier_busy_coverage_oracle(spark, oracle):
    from .conftest import assert_matches_oracle
    from iris_project_database_refresh_spark.operators.analytics import (
        BUSY_COVERAGE_SQL,
        supplier_busy_coverage,
    )

    df = supplier_busy_coverage(spark, SF_CORRECT)
    assert_matches_oracle(df, oracle, BUSY_COVERAGE_SQL)
    rows = df.collect()
    # coverage is a UNION: covered days can never exceed the span and
    # never undershoot the longest single spell
    for r in rows:
        assert r.longest_spell_days <= r.covered_days
        assert r.covered_days <= (r.last_busy - r.first_busy).days
        assert r.n_spells >= 1


def test_supplier_busy_coverage_merges_touching_intervals(spark):
    """Half-open adjacency ([1,3) then [3,5)) must merge into one spell."""
    import datetime as dt

    from pyspark.sql import Row

    from iris_project_database_refresh_spark.operators import analytics as a

    base = dt.date(2024, 1, 1)
    rows = [
        Row(l_suppkey=1, l_shipdate=dt.datetime(2024, 1, 1), l_quantity=1.0, l_orderkey=1, l_linenumber=1),   # [1, 3)
        Row(l_suppkey=1, l_shipdate=dt.datetime(2024, 1, 3), l_quantity=1.0, l_orderkey=2, l_linenumber=1),   # [3, 5) touches
        Row(l_suppkey=1, l_shipdate=dt.datetime(2024, 1, 10), l_quantity=2.0, l_orderkey=3, l_linenumber=1),  # [10, 13) gap
        Row(l_suppkey=2, l_shipdate=dt.datetime(2024, 2, 1), l_quantity=5.0, l_orderkey=4, l_linenumber=1),   # [1, 7)
        Row(l_suppkey=2, l_shipdate=dt.datetime(2024, 2, 2), l_quantity=1.0, l_orderkey=5, l_linenumber=1),   # nested
    ]
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows).write.parquet(f"{d}/lineitem.parquet")
        out = {r.l_suppkey: r for r in a.supplier_busy_coverage(spark, d).collect()}
    assert out[1].n_spells == 2 and out[1].covered_days == 4 + 3
    assert out[1].longest_spell_days == 4
    assert out[2].n_spells == 1 and out[2].covered_days == 6
    assert base  # silence lint
