from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iris_project_database_refresh_spark.operators import scrub

from .conftest import SF_CORRECT, SF_SMOKE, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(scrub.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        scrub.QUERIES[name](spark, SF_CORRECT), oracle, scrub.ORACLES[name]
    )


def test_scrub_removes_all_pii(spark):
    rows = scrub.scrub_pii(spark, SF_SMOKE).collect()
    for r in rows:
        assert "@" not in r["scrubbed"]
        assert "http" not in r["scrubbed"].replace("<URL>", "")
        assert r["n_emails"] >= 1 and r["n_urls"] >= 1 and r["n_phones"] >= 1
        assert r["chars_removed"] >= 0 or "<EMAIL>" in r["scrubbed"]


def test_scrub_is_scan_only(spark):
    plan = (
        scrub.scrub_pii(spark, SF_SMOKE)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan  # pure per-row regex, zero shuffle


def test_quantize_roundtrip_error_bounded(spark):
    rows = scrub.embed_quantize(spark, SF_SMOKE).collect()
    for r in rows:
        # symmetric int8: |err| <= scale/254 + fp noise
        assert r["max_abs_err"] <= r["scale"] / 254 + 1e-6
        # qvec ships as a comma-joined string (driver contract: no
        # top-level array columns)
        assert all(-127 <= int(q) <= 127 for q in r["qvec"].split(","))


def test_collocations_min_count(spark):
    rows = scrub.collocations_pmi(spark, SF_CORRECT).collect()
    assert rows
    assert all(r["c12"] >= scrub.MIN_PAIR_COUNT for r in rows)
    # top-k is sorted by pmi desc
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)


def test_collocations_unigrams_broadcast(spark):
    plan = (
        scrub.collocations_pmi(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan and "SortMergeJoin" not in plan


def test_url_canonicalization_merges_planted_variants(spark):
    """Groups of 7 consecutive doc_ids share a page identity: the six
    cosmetic variants (case, www., :80, utm params, fragment, trailing
    slash) must merge into ONE canonical URL, while the genuinely different
    query (?id=1) must stay its own page."""
    from .conftest import SF_CORRECT

    rows = scrub.QUERIES["dedup_url_normalize"](spark, SF_CORRECT).collect()
    by_url = {r.canonical_url: r for r in rows}
    assert "http://example.com/Docs/0" in by_url
    assert by_url["http://example.com/Docs/0"].n_urls == 6  # all cosmetic variants merged
    assert by_url["http://example.com/Docs/0?id=1"].n_urls == 1  # real param kept separate
    for url in by_url:
        assert "utm_" not in url and "#" not in url and "www." not in url and ":80" not in url


def test_canary_recall_and_decoys(spark):
    """Planted canaries are all recovered in their own documents; the
    decoy set reports zero hits."""
    from iris_project_database_refresh_spark.operators import scrub

    from .conftest import SF_CORRECT

    rows = {r.is_planted: r for r in scrub.text_canary_scan(spark, SF_CORRECT).collect()}
    p, d = rows[1], rows[0]
    assert p.n_found == p.n_canaries == p.found_in_expected_doc
    assert p.total_hits == p.n_canaries  # exactly once each
    assert d.n_canaries == scrub.CANARY_DECOYS
    assert d.n_found == 0 and d.total_hits == 0
