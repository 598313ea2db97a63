from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iris_project_database_refresh_spark.operators import olap
from iris_project_database_refresh_spark.sources.tables import load_table

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(olap.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        olap.QUERIES[name](spark, SF_CORRECT), oracle, olap.ORACLES[name]
    )


def test_gapfill_spine_is_contiguous_and_lossless(spark):
    """The spine covers every hour in each user's [min, max] span with
    no gaps, and filling never invents or drops events."""
    out = olap.events_gapfill(spark, SF_CORRECT)
    ev = load_table(spark, SF_CORRECT, "events")

    n_total = out.agg(F.sum("n_events")).first()[0]
    assert n_total == ev.count()

    spans = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_hours"),
        (
            (F.unix_timestamp(F.max("hour")) - F.unix_timestamp(F.min("hour"))) / 3600 + 1
        ).alias("expected"),
    )
    bad = spans.where(F.col("n_hours") != F.col("expected")).count()
    assert bad == 0

    # forward fill leaves no NULLs after each user's first active hour
    w_null = out.where(F.col("filled_value").isNull()).count()
    assert w_null == 0


def test_pivot_counts_sum_to_table_size(spark):
    out = olap.events_pivot(spark, SF_CORRECT)
    total = out.select(
        sum(F.sum(f"{t}_n") for t in olap.EVENT_TYPES).alias("n")
    ).first()["n"]
    assert total == load_table(spark, SF_CORRECT, "events").count()


def test_quartiles_are_balanced_and_ordered(spark):
    rows = {r.quartile: r for r in olap.user_spend_quartiles(spark, SF_CORRECT).collect()}
    assert sorted(rows) == [1, 2, 3, 4]
    # ntile balance: bucket sizes differ by at most 1
    sizes = [rows[q].n_users for q in sorted(rows)]
    assert max(sizes) - min(sizes) <= 1
    # buckets are ordered ranges
    for q in (1, 2, 3):
        assert rows[q].hi <= rows[q + 1].lo


def test_outlier_fences_are_sane(spark):
    for r in olap.outlier_iqr(spark, SF_CORRECT).collect():
        assert 0 < r.n_outliers < r.n_total


def test_fuzzy_match_no_false_negatives(spark):
    """Every planted perturbation (edits at positions >= 6, within the
    blocking contract) must be recovered, with the planted distance."""
    from iris_project_database_refresh_spark.operators import catalog

    out = catalog.fuzzy_match_names(spark, SF_CORRECT)
    docs = load_table(spark, SF_CORRECT, "documents")
    assert out.count() == docs.count()
    by_dist = {r.dist: r["count"] for r in out.groupBy("dist").count().collect()}
    n, per = docs.count(), docs.count() // 5
    assert by_dist[0] == n - 3 * per  # m in {3, 4} plus unperturbed remainder
    assert by_dist[1] == 2 * per  # substitution (m=0) + deletion (m=1)
    assert by_dist[2] == per  # double substitution (m=2)


def test_pivot_has_no_values_discovery_job(spark):
    """Explicit pivot values: the plan must scan events exactly once
    (no separate distinct-values job is even *planned* — discovery
    happens eagerly at DataFrame-construction time otherwise)."""
    plan = (
        olap.events_pivot(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 1


def test_window_suite_single_window_operator(spark):
    """All six analytic functions share one window spec, so Catalyst
    must evaluate them in ONE Window operator over one sort."""
    plan = (
        olap.events_window_suite(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Window") == 1 or plan.count("RunningWindowFunction") <= 1
    assert plan.count("Exchange") == 1


def test_histogram_covers_all_rows(spark):
    import pyspark.sql.functions as F

    rows = olap.events_histogram(spark, SF_CORRECT).collect()
    from iris_project_database_refresh_spark.sources.tables import load_table

    per_type = {
        r.event_type: r.n
        for r in load_table(spark, SF_CORRECT, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {}
    for r in rows:
        assert 0 <= r.bin < olap.HIST_BINS
        got[r.event_type] = got.get(r.event_type, 0) + r.n
    assert got == per_type


def test_equidepth_bins_balanced(spark):
    rows = olap.events_histogram_equidepth(spark, SF_CORRECT).collect()
    per_type = {}
    for r in rows:
        assert 0 <= r.bin < olap.DEPTH_BINS
        assert r.bin_min <= r.bin_max
        per_type.setdefault(r.event_type, []).append(r.n)
    for counts in per_type.values():
        # equal-depth: every bin within a few rows of n/bins (edge ties)
        assert max(counts) - min(counts) <= max(counts) * 0.1 + 5


def test_quantile_sketch_error_is_bin_bounded(spark):
    """The histogram-sketch estimate must land within one bin width of
    the exact percentile — the sketch's a-priori error bound."""
    import pyspark.sql.functions as F

    from iris_project_database_refresh_spark.sources.tables import load_table

    rows = olap.quantile_hist_sketch(spark, SF_CORRECT).collect()
    assert rows
    ev = load_table(spark, SF_CORRECT, "events").select(
        "event_type", F.floor(F.col("value") * 100 + F.lit(0.5)).alias("v_c")
    )
    spans = {
        r.event_type: (r.hi - r.lo + 1) / 100.0
        for r in ev.groupBy("event_type")
        .agg(F.min("v_c").alias("lo"), F.max("v_c").alias("hi"))
        .collect()
    }
    for r in rows:
        # two widths: the ceiling-rank bin selection vs the exact
        # percentile's (n-1)*p interpolation can differ by one bin
        width = spans[r.event_type] / olap.SKETCH_BINS
        assert abs(r.est_q - r.exact_q) <= 2 * width + 0.02, (r, width)
