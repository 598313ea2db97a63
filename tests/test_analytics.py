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
