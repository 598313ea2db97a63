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


def test_cusum_alarm_semantics(spark):
    """Every alarm row's CUSUM must exceed the threshold, and the
    statistic is reproducible from the daily series by a direct fold."""
    import pyspark.sql.functions as F

    from iris_project_database_refresh_spark.operators.timeseries import (
        CUSUM_H_DIV,
        events_cusum_alarm,
    )
    from iris_project_database_refresh_spark.sources.tables import load_table

    rows = events_cusum_alarm(spark, SF_CORRECT).collect()
    assert rows
    daily = (
        load_table(spark, SF_CORRECT, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("x"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.x))
    for et, pts in series.items():
        pts.sort()
        target = sum(x for _, x in pts) // len(pts)
        s = 0
        expect = {}
        for day, x in pts:
            s = max(0, s + (x - target))
            if s > target // CUSUM_H_DIV:
                expect[day] = s
        got = {r.day: r.cusum for r in rows if r.event_type == et}
        assert got == expect


def test_croston_fold_replay(spark):
    """The Croston state for a few parts replays exactly in Python from
    the weekly demand series."""
    from iris_project_database_refresh_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    got = {r.l_partkey: r for r in timeseries.part_croston_demand(spark, SF_CORRECT).collect()}
    li = load_table(spark, SF_CORRECT, "lineitem")
    weekly = (
        li.groupBy(
            "l_partkey",
            F.expr(
                f"datediff(cast(date_trunc('day', l_shipdate) as date),"
                f" cast('{timeseries.CROSTON_EPOCH}' as date)) div 7"
            ).alias("w"),
        )
        .agg(F.sum(F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("bigint")).alias("c"))
        .collect()
    )
    series: dict[int, list] = {}
    for r in weekly:
        series.setdefault(r.l_partkey, []).append((r.w, r.c))
    checked = 0
    for pk in sorted(series)[:5]:
        pts = sorted(series[pk])
        if len(pts) < 3:
            continue
        z = pts[0][1] * 1000
        p = (pts[1][0] - pts[0][0]) * 1000
        pw = pts[1][0]
        for w, c in pts[2:]:
            z = (200 * c * 1000 + 800 * z) // 1000
            p = (200 * (w - pw) * 1000 + 800 * p) // 1000
            pw = w
        r = got[pk]
        assert (r.size_milli, r.interval_milli) == (z, p)
        assert r.croston_rate_milli == z * 1000 // p
        checked += 1
    assert checked >= 3


def test_demand_classify_consistent(spark):
    """Class labels must be the deterministic function of the adi/cv2
    columns they ship beside."""
    for r in timeseries.part_demand_classify(spark, SF_CORRECT).collect():
        lo_adi = r.adi_milli < timeseries.SBC_ADI_MILLI
        lo_cv = r.cv2_bp < timeseries.SBC_CV2_BP
        expect = (
            "smooth" if lo_adi and lo_cv
            else "intermittent" if not lo_adi and lo_cv
            else "erratic" if lo_adi
            else "lumpy"
        )
        assert r.demand_class == expect


def test_holt_winters_fold_replay(spark):
    """The HW vector-state fold replays exactly in Python from the
    daily count series."""
    from iris_project_database_refresh_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    got = {r.event_type: r for r in timeseries.events_holt_winters(spark, SF_CORRECT).collect()}
    daily = (
        load_table(spark, SF_CORRECT, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.x))

    def tdiv(a, b):
        q = abs(a) // b
        return q if a >= 0 else -q

    for et, pts in series.items():
        pts.sort()
        xs = [x for _, x in pts]
        if len(xs) < 2 * timeseries.HW_PERIOD:
            assert et not in got
            continue
        l = sum(xs[:7]) * 1000 // 7
        b = 0
        s = [xs[j] * 1000 - l for j in range(7)]
        rr = [xs[j] for j in range(7)]
        sae = nsae = 0
        for i in range(7, len(xs)):
            x = xs[i]
            slot = i % 7
            sae += abs(x * 1000 - (l + b + s[slot]))
            nsae += abs(x - rr[slot]) * 1000
            lnew = tdiv(200 * (x * 1000 - s[slot]) + 800 * (l + b), 1000)
            bnew = tdiv(100 * (lnew - l) + 900 * b, 1000)
            snew = tdiv(300 * (x * 1000 - lnew) + 700 * s[slot], 1000)
            l, b = lnew, bnew
            s[slot] = snew
            rr[slot] = x
        r = got[et]
        assert (r.level_milli, r.trend_milli) == (l, b)
        assert [getattr(r, f"season{j}_milli") for j in range(7)] == s
        assert (r.hw_sae_milli, r.snaive_sae_milli) == (sae, nsae)


def test_burst_viterbi_python_replay(spark):
    """The two-fold Viterbi replays exactly in Python: same emissions,
    same DP, same traceback."""
    import math

    from iris_project_database_refresh_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    got = {}
    for r in timeseries.events_burst_viterbi(spark, SF_CORRECT).collect():
        got.setdefault(r.event_type, set()).add((r.day, r.x))

    daily = (
        load_table(spark, SF_CORRECT, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("x"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.day, r.x))
    G = timeseries.BURST_GAMMA_MILLI
    for et, pts in series.items():
        pts.sort()
        xs = [x for _, x in pts]
        lam0 = sum(xs) // len(xs)
        lam1 = lam0 + 2 * math.floor(math.sqrt(float(lam0)))

        def e(lam, x):
            return math.floor((float(lam) - x * math.log(float(lam))) * 1000)

        c0, c1 = e(lam0, xs[0]), e(lam1, xs[0]) + G
        parents = []
        for x in xs[1:]:
            p0 = 0 if c0 <= c1 else 1
            p1 = 0 if c0 + G <= c1 else 1
            c0, c1 = min(c0, c1) + e(lam0, x), min(c0 + G, c1) + e(lam1, x)
            parents.append((p0, p1))
        cur = 0 if c0 <= c1 else 1
        labels = [cur]
        for p0, p1 in reversed(parents):
            cur = p0 if cur == 0 else p1
            labels.append(cur)
        labels.reverse()
        expect = {
            (pts[i][0], pts[i][1]) for i in range(len(pts)) if labels[i] == 1
        }
        assert got.get(et, set()) == expect


def test_sax_words_use_full_alphabet(spark):
    from iris_project_database_refresh_spark.operators.timeseries import (
        SAX_TOP,
        events_sax_motifs,
    )
    from .conftest import SF_CORRECT as sf

    rows = events_sax_motifs(spark, sf).collect()
    assert len(rows) == SAX_TOP
    seen = set()
    for r in rows:
        assert len(r["sax"]) == r["n_hours"] <= 24
        seen |= set(r["sax"])
        assert set(r["sax"]) <= set("abcd")
    assert seen == set("abcd")  # quartile breakpoints spread the alphabet


def test_dtw_pairs_matches_textbook_dp(spark):
    """The prefix-sum/prefix-min unrolled DP must equal the classic
    O(n^2) three-way-min DTW recursion replayed in Python on the same
    integer series — proves the algebraic unrolling IS DTW, not just
    cross-engine-consistent."""
    from pyspark.sql import functions as F

    rows = {
        (r.type_a, r.type_b): r
        for r in timeseries.events_dtw_pairs(spark, SF_CORRECT).collect()
    }
    assert rows
    daily = (
        timeseries.load_table(spark, SF_CORRECT, "events")
        .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
        .agg(F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)")).alias("v"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in sorted(daily, key=lambda r: (r.event_type, r.day)):
        series.setdefault(r.event_type, []).append(r.v)

    def dtw(a, b):
        INF = 1 << 50
        prev = [0] + [INF] * len(b)
        for i in range(1, len(a) + 1):
            cur = [INF] * (len(b) + 1)
            for j in range(1, len(b) + 1):
                c = abs(a[i - 1] - b[j - 1])
                cur[j] = c + min(prev[j], prev[j - 1], cur[j - 1])
            prev = cur
        return prev[len(b)]

    for (ta, tb), r in rows.items():
        want = dtw(series[ta], series[tb])
        assert r.dtw_cost == want, (ta, tb, r.dtw_cost, want)
        assert r.n_a == len(series[ta]) and r.n_b == len(series[tb])
        assert r.dtw_per_step == want // max(r.n_a, r.n_b)
