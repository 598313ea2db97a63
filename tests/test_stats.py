from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import stats

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(stats.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        stats.QUERIES[name](spark, SF_CORRECT), oracle, stats.ORACLES[name]
    )


def test_mann_kendall_semantics(spark):
    """S must equal n_pos - n_neg, and a direct Python recompute of the
    S statistic and tie term from the daily series must agree."""
    from pyspark.sql import functions as F

    from iris_project_database_refresh_spark.sources.tables import load_table

    rows = {r.event_type: r for r in stats.events_mann_kendall(spark, SF_CORRECT).collect()}
    daily = (
        load_table(spark, SF_CORRECT, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").alias("d"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.d, r.cnt))
    for et, pts in series.items():
        pts.sort()
        xs = [c for _, c in pts]
        n = len(xs)
        s = sum(
            (1 if xs[j] > xs[i] else -1 if xs[j] < xs[i] else 0)
            for i in range(n)
            for j in range(i + 1, n)
        )
        got = rows[et]
        assert got.n_days == n
        assert got.s_stat == s
        assert got.s_stat == got.n_pos - got.n_neg
        from collections import Counter

        tie_term = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(xs).values()
        )
        import math

        var18 = n * (n - 1) * (2 * n + 5) - tie_term
        assert got.var_milli == math.floor((var18 / 18.0) * 1000.0)
        # trend verdict consistent with the z column
        if got.z_milli is not None:
            if got.z_milli > stats.MK_Z_MILLI:
                assert got.trend == "increasing"
            elif got.z_milli < -stats.MK_Z_MILLI:
                assert got.trend == "decreasing"
            else:
                assert got.trend == "no_trend"


def test_granger_bidirectional_frame(spark):
    """All 20 ordered pairs present; self-pairs absent; improvement in
    [0, 10000] where defined (SSE_f <= SSE_r always for nested OLS)."""
    rows = stats.events_leadlag_granger(spark, SF_CORRECT).collect()
    pairs = {(r.leader_type, r.target_type) for r in rows}
    assert len(pairs) == len(rows)
    types = {r.leader_type for r in rows} | {r.target_type for r in rows}
    assert pairs == {(a, b) for a in types for b in types if a != b}
    for r in rows:
        if r.improvement_bp is not None:
            assert 0 <= r.improvement_bp <= 10000
            assert r.leads == (1 if r.improvement_bp > stats.GRANGER_BAR_BP else 0)


def test_woe_shares_and_iv_consistency(spark):
    from iris_project_database_refresh_spark.operators.stats import feature_binning_woe
    from .conftest import SF_CORRECT as sf

    rows = feature_binning_woe(spark, sf).collect()
    assert len(rows) == 8
    for r in rows:
        # smoothed shares stay in (0, 1e6); WoE sign tracks the share gap
        assert 0 < r["good_share_micro"] < 1_000_000
        assert 0 < r["bad_share_micro"] < 1_000_000
        if r["good_share_micro"] > r["bad_share_micro"]:
            assert r["woe_e4"] >= 0
        # IV contribution = share gap x WoE: never negative beyond
        # quantization dust (gap and WoE share a sign)
        assert r["iv_contrib_e10"] >= -10_000
