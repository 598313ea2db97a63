from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iris_project_database_refresh_spark.operators import search

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(search.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(search.QUERIES[name](spark, SF_CORRECT), oracle, search.ORACLES[name])


def test_bm25_is_a_ranked_topk(spark):
    rows = search.bm25_search(spark, SF_CORRECT).collect()
    assert len(rows) == search.TOP_K
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(s > 0 for s in scores)


def test_rrf_fuses_both_rankers(spark):
    out = search.hybrid_search_rrf(spark, SF_CORRECT)
    rows = out.collect()
    assert len(rows) == search.TOP_K
    # the fused list must contain docs ranked by each side
    assert any(r.rank_lex is not None for r in rows)
    assert any(r.rank_sem is not None for r in rows)
    # RRF score equals the sum of the per-ranker contributions
    for r in rows:
        want = sum(
            1.0 / (search.RRF_K + rank)
            for rank in (r.rank_lex, r.rank_sem)
            if rank is not None
        )
        assert abs(r.rrf_score - want) < 1e-6


def test_bm25_tokenizes_once(spark):
    """The per-doc projection is pinned: the corpus scan must not appear
    twice in the executed plan (stats + scoring share one pass)."""
    plan = (
        search.bm25_search(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("FileScan parquet") == 0  # subsumed by the pinned RDD


def test_wand_split_is_consistent(spark):
    from .conftest import SF_CORRECT as sf

    rows = sorted(
        search.search_wand_upper_bounds(spark, sf).collect(),
        key=lambda r: (r["ub_r6"], r["term"]),
    )
    assert len(rows) == len(search.QUERY_TERMS)
    # prefix sums are cumulative over the ascending-UB order
    acc = 0.0
    for r in rows:
        acc = round(acc + r["ub_r6"], 6)
        assert abs(r["prefix_ub_r6"] - acc) < 1e-9
        assert r["essential"] == (1 if r["prefix_ub_r6"] > r["theta_r6"] else 0)
    # the largest-UB term must always be essential (else the query is
    # unanswerable: even all terms together could not reach theta)
    assert rows[-1]["essential"] == 1


def test_rbo_bounds_and_overlap_monotonicity(spark):
    row = search.search_rank_biased_overlap(spark, SF_CORRECT).collect()[0]
    assert 0.0 <= row["rbo_r6"] <= 1.0
    assert row["overlap_5"] <= row["overlap_10"] <= row["overlap_20"]
    assert row["overlap_20"] == row["n_common"]
    # identical lists would give RBO ~ 1 - 0.9^20; sanity: ours below that
    assert row["rbo_r6"] <= round(1 - 0.9 ** 20, 6) + 1e-9
