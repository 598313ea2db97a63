from __future__ import annotations

from iris_project_database_refresh_spark.operators import tfidf

from .conftest import SF_CORRECT, assert_matches_oracle


def test_matches_oracle(spark, oracle):
    assert_matches_oracle(
        tfidf.top_terms_tfidf(spark, SF_CORRECT), oracle, tfidf.TOP_TERMS_SQL
    )


def test_exactly_top_k_per_source(spark):
    rows = tfidf.top_terms_tfidf(spark, SF_CORRECT).collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r.term_rank)
    assert all(sorted(v) == list(range(1, tfidf.TOP_TERMS + 1)) for v in by_source.values())


def test_textrank_mass_conservation_and_shape(spark):
    from iris_project_database_refresh_spark.operators.tfidf import (
        TEXTRANK_SCALE,
        TEXTRANK_TOP,
        keyword_extract_textrank,
    )
    from .conftest import SF_CORRECT as sf

    rows = keyword_extract_textrank(spark, sf).collect()
    assert len(rows) == TEXTRANK_TOP
    for r in rows:
        # damped update keeps ranks near SCALE: base 0.15 + vote mass
        assert r["rank_scaled"] > TEXTRANK_SCALE * 15 // 100
        assert r["degree"] >= 1
    # ordered output
    vals = [r["rank_scaled"] for r in rows]
    assert vals == sorted(vals, reverse=True)
