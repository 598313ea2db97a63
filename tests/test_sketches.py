from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iris_project_database_refresh_spark.operators import sketches
from iris_project_database_refresh_spark.sources.tables import load_table

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(sketches.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        sketches.QUERIES[name](spark, SF_CORRECT), oracle, sketches.ORACLES[name]
    )


def test_kmv_estimate_is_in_sketch_error_range(spark):
    """KMV with K=32 has relative standard error ~ 1/sqrt(K-2) ≈ 0.18;
    every group estimate should land within a few multiples of that."""
    rows = sketches.approx_distinct_kmv(spark, SF_CORRECT).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.kmv_est > 0
        assert r.rel_err <= 0.6  # ~3.3 RSE — generous but real bound


def test_cms_never_underestimates(spark):
    rows = sketches.heavy_hitters_cms(spark, SF_CORRECT).collect()
    assert len(rows) == sketches.CMS_TOPK
    for r in rows:
        assert r.cms_n >= r.exact_n
        assert r.overcount == r.cms_n - r.exact_n


def test_stratified_sample_quota_and_coverage(spark):
    out = sketches.stratified_sample(spark, SF_CORRECT)
    per = {r.source: r.n for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()}
    docs = load_table(spark, SF_CORRECT, "documents")
    sources = {r.source for r in docs.select("source").distinct().collect()}
    # every stratum present, none over quota
    assert set(per) == sources
    assert all(n <= sketches.STRATUM_N for n in per.values())
    # it is a strict sample at this SF (quota < stratum size)
    assert out.count() < docs.count()


def test_priority_sample_favors_heavy_docs(spark):
    """Weight-proportional selection: the sampled docs' mean n_chars
    must exceed the corpus mean (priority q = w/u ranks heavy docs up)."""
    docs = load_table(spark, SF_CORRECT, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).first()[0]
    sample = sketches.weighted_sample_priority(spark, SF_CORRECT)
    assert sample.count() == sketches.PRIORITY_K
    sample_mean = sample.agg(F.avg("n_chars")).first()[0]
    assert sample_mean > corpus_mean


def test_sampling_windows_use_group_limit(spark):
    """Both rank-limited samplers must compile to WindowGroupLimit /
    TakeOrderedAndProject — partial top-N before any shuffle — not a
    full per-partition sort of the corpus."""
    strat = sketches.stratified_sample(spark, SF_CORRECT)
    assert "WindowGroupLimit" in strat._jdf.queryExecution().executedPlan().toString()
    pri = sketches.weighted_sample_priority(spark, SF_CORRECT)
    assert "TakeOrderedAndProject" in pri._jdf.queryExecution().executedPlan().toString()


def test_hll_estimate_within_sketch_error(spark):
    rows = sketches.approx_distinct_hll(spark, SF_CORRECT).collect()
    assert rows
    # sigma ~ 1.04/sqrt(64) ~ 13%; 3 sigma bound with n/m ~ 2.3 headroom
    for r in rows:
        assert r.rel_err < 0.40
        assert r.hll_est > 0


def test_hll_is_duplicate_insensitive(spark):
    """max-register sketches must not move when the stream repeats:
    doubling every event leaves all registers — and the estimate —
    unchanged (what makes HLL distinct-counting, not counting)."""
    from iris_project_database_refresh_spark.sources.tables import load_table

    ev = load_table(spark, SF_CORRECT, "events")
    doubled = ev.unionAll(ev)
    doubled.createOrReplaceTempView("hll_doubled_events")
    base = {r.event_type: r.hll_est for r in sketches.approx_distinct_hll(spark, SF_CORRECT).collect()}

    # rebuild the sketch over the doubled stream via the same expressions
    from pyspark.sql import functions as F
    from iris_project_database_refresh_spark.functions.text import md5_int32

    hashed = doubled.select(
        "event_type", md5_int32(F.col("user_id").cast("string")).alias("h")
    ).select("event_type", (F.col("h") % sketches.HLL_M).alias("bucket"),
             F.expr(f"h div {sketches.HLL_M}").alias("rest"))
    rho = F.when(F.col("rest") == 0, F.lit(27)).otherwise(F.lit(27) - F.length(F.bin("rest")))
    regs = hashed.select("event_type", "bucket", rho.alias("rho")).groupBy(
        "event_type", "bucket").agg(F.max("rho").alias("reg"))
    per = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), 30 - reg)")).alias("s"),
        F.count(F.lit(1)).alias("n"))
    est = {
        r.event_type: round(sketches._HLL_NUM / (r.s + (sketches.HLL_M - r.n) * 2**30), 2)
        for r in per.collect()
    }
    assert est == base


def test_join_size_cms_never_underestimates(spark):
    """CM inner-product one-sided guarantee: the estimate (and every
    per-row estimate) bounds the true join cardinality from above, and
    the true cardinality equals the materialized join's row count."""
    import pyspark.sql.functions as F

    from iris_project_database_refresh_spark.sources.tables import load_table

    rows = sketches.join_size_cms(spark, SF_CORRECT).collect()
    assert rows and all(r.est_d >= r.exact_join_rows for r in rows)
    assert all(r.overcount >= 0 for r in rows)
    ev = load_table(spark, SF_CORRECT, "events")
    v = ev.where(F.col("event_type") == "view").select("user_id")
    p = ev.where(F.col("event_type") == "purchase").select("user_id")
    assert rows[0].exact_join_rows == v.join(p, "user_id").count()


def test_hll_merge_is_exact(spark):
    """max-merge associativity: daily sketches merged must give exactly
    the one-pass estimate for every type."""
    rows = sketches.hll_merge_days(spark, SF_CORRECT).collect()
    assert rows and all(r.merge_exactly_equal == 1 for r in rows)
    assert all(r.n_daily_sketches > 1 for r in rows)  # the merge is real
