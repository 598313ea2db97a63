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


def test_isotonic_calibration_is_pav(spark):
    """The minimax-formula fit must equal a plain-python
    pool-adjacent-violators replay over the same level grid (same IEEE
    divisions), be monotone non-decreasing, and preserve the weighted
    mean (the PAV invariant)."""
    from iris_project_database_refresh_spark.operators.stats import (
        events_isotonic_calibration,
    )

    rows = sorted(
        events_isotonic_calibration(spark, SF_CORRECT).collect(),
        key=lambda r: r.score,
    )
    assert rows
    fits = [r.iso_fit_bp for r in rows]
    assert all(0 <= f <= 10000 for f in fits)
    assert fits == sorted(fits), "isotonic fit is not monotone"

    # independent PAV replay from the raw per-level (n, sy) grid
    import math

    from pyspark.sql import functions as F

    from iris_project_database_refresh_spark.functions.text import md5_int32
    from iris_project_database_refresh_spark.operators.stats import ISO_LEVELS
    from iris_project_database_refresh_spark.sources.tables import load_table

    ev = load_table(spark, SF_CORRECT, "events").select("user_id", "event_type")
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("y")
    )
    lv = (
        users.select(
            F.pmod(md5_int32(F.col("user_id").cast("string")), ISO_LEVELS).alias(
                "score"
            ),
            "y",
        )
        .groupBy("score")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy"))
        .collect()
    )
    grid = [(r.n, r.sy) for r in sorted(lv, key=lambda r: r.score)]
    pools: list[list[float]] = []  # [w, s]
    for n, sy in grid:
        pools.append([n, sy])
        while len(pools) > 1 and pools[-2][1] / pools[-2][0] >= pools[-1][1] / pools[-1][0]:
            w2, s2 = pools.pop()
            pools[-1][0] += w2
            pools[-1][1] += s2
    # expand pools back to levels
    replay = []
    it = iter(grid)
    for w, s in pools:
        covered = 0
        fit = math.floor(s / w * 10000 + 0.5)
        while covered < w:
            n, _ = next(it)
            covered += n
            replay.append(fit)
        assert covered == w, "pool boundaries must align with levels"
    assert fits == replay

    # PAV invariant: weighted mean preserved (bp rounding tolerance)
    total_n = sum(n for n, _ in grid)
    mean_y = sum(sy for _, sy in grid) / total_n * 10000
    mean_fit = sum(f * r.n_users for f, r in zip(fits, rows)) / total_n
    assert abs(mean_fit - mean_y) < 1.0
