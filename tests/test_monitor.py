from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import monitor

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(monitor.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        monitor.QUERIES[name](spark, SF_CORRECT), oracle, monitor.ORACLES[name]
    )


def test_llm_costs_json_roundtrip_consistency(spark):
    """The rollup's totals reconcile with the planted-array ground truth:
    every event contributes 1 + event_id % 3 calls, so n_calls summed
    over all (stage, model) groups equals that sum exactly, and
    total_tokens == total_input + total_output per row."""
    from pyspark.sql import functions as F

    from iris_project_database_refresh_spark.sources.tables import load_table

    rows = monitor.monitor_llm_costs(spark, SF_CORRECT).collect()
    ev = load_table(spark, SF_CORRECT, "events")
    want_calls = ev.select(
        F.sum(F.col("event_id") % monitor.MAX_CALLS + 1).alias("s")
    ).collect()[0]["s"]
    assert sum(r.n_calls for r in rows) == want_calls
    for r in rows:
        assert r.total_tokens == r.total_input_tokens + r.total_output_tokens
        assert r.total_cost > 0


def test_embed_batch_log_partitions_every_doc_once(spark):
    """Batch ledger invariants: batches are ≤ EMBED_BATCH docs, doc
    counts sum to the corpus size, every vector lands in exactly one
    batch, and doc-id spans never overlap within a source."""
    rows = monitor.embed_batch_log(spark, SF_CORRECT).collect()
    assert all(1 <= r.n_docs <= monitor.EMBED_BATCH for r in rows)
    assert all(r.n_vectors <= r.n_docs for r in rows)
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for batches in by_source.values():
        batches.sort(key=lambda r: r.batch_seq)
        # consecutive batch_seq, non-overlapping ordered spans
        assert [b.batch_seq for b in batches] == list(range(len(batches)))
        for prev, nxt in zip(batches, batches[1:]):
            assert prev.last_doc < nxt.first_doc
    n_docs_total = sum(r.n_docs for r in rows)
    n_vecs_total = sum(r.n_vectors for r in rows)
    from iris_project_database_refresh_spark.sources.tables import load_table

    assert n_docs_total == load_table(spark, SF_CORRECT, "documents").count()
    assert n_vecs_total == load_table(spark, SF_CORRECT, "embeddings").count()


def test_llm_call_attempts_ledger_invariants(spark):
    """Retry-ledger arithmetic: attempts = calls + retries, successes +
    terminal failures = calls, backoff only where retries exist, and the
    planted mix produces both terminal failures and multi-attempt
    successes; cost columns agree with the monitor_llm_costs rollup."""
    rows = monitor.llm_call_attempts(spark, SF_CORRECT).collect()
    assert rows
    assert any(r.n_terminal_failures > 0 for r in rows)
    assert any(r.total_retries > 0 for r in rows)
    for r in rows:
        assert r.n_success + r.n_terminal_failures == r.n_calls
        assert r.total_attempts == r.n_calls + r.total_retries
        assert (r.total_backoff_seconds > 0) == (r.total_retries > 0)
    costs = monitor.monitor_llm_costs(spark, SF_CORRECT).collect()
    per_stage = {}
    for c in costs:
        per_stage[c.stage_name] = per_stage.get(c.stage_name, 0) + c.total_tokens
    for r in rows:
        assert r.total_tokens == per_stage[r.stage_name]


def test_cost_forecast_arithmetic(spark):
    """Projection and flag must be the deterministic function of the
    mtd/elapsed/budget columns they ship beside; the flag must
    discriminate (some stage over, some under)."""
    from iris_project_database_refresh_spark.operators import monitor

    from .conftest import SF_CORRECT

    rows = monitor.monitor_cost_forecast(spark, SF_CORRECT).collect()
    assert len(rows) == 5
    flags = set()
    for r in rows:
        assert r.daily_rate_micro == r.mtd_micro // r.days_elapsed
        assert r.projected_micro == r.mtd_micro + r.daily_rate_micro * (
            monitor.MONTH_DAYS - r.days_elapsed
        )
        assert r.over_budget == (1 if r.projected_micro > r.budget_micro else 0)
        flags.add(r.over_budget)
    assert flags == {0, 1}


def test_join_ivm_delta_rule_exact(spark):
    from iris_project_database_refresh_spark.operators.monitor import join_ivm_delta
    from .conftest import SF_CORRECT as sf

    rows = join_ivm_delta(spark, sf).collect()
    assert len(rows) == 25  # every nation present
    # the inclusion-exclusion delta rule reproduces the full recompute
    assert all(r["ivm_matches"] == 1 for r in rows)


def test_page_resume_ledger_prefix_semantics(spark):
    """The resume contract of stage_00's sequential write cursor: durable
    progress = longest completed page prefix. Re-derive a sample of
    documents' per-page outcomes with hashlib and check every reported
    field; plus global invariants on all rows."""
    import hashlib

    rows = monitor.page_resume_ledger(spark, SF_CORRECT).collect()
    assert rows

    def ok(doc_id: int, p: int) -> bool:
        h = hashlib.md5(f"{doc_id}:pg:{p}".encode()).hexdigest()[:8]
        return int(h, 16) % 10 < 8

    for r in rows:
        assert 1 <= r.total_pages
        assert 0 <= r.done_prefix <= r.total_pages
        if r.is_complete:
            assert r.done_prefix == r.total_pages
            assert r.first_failed_page is None and r.resume_from is None
        else:
            assert r.resume_from == r.done_prefix + 1
            assert r.first_failed_page == r.done_prefix + 1
        assert r.remaining_bp == (r.total_pages - r.done_prefix) * 10000 // r.total_pages

    for r in rows[:40]:
        outcomes = [ok(r.doc_id, p) for p in range(1, r.total_pages + 1)]
        prefix = 0
        while prefix < len(outcomes) and outcomes[prefix]:
            prefix += 1
        assert r.done_prefix == prefix, (r.doc_id, prefix, r.done_prefix)
        lost = sum(outcomes[prefix + 1 :]) if prefix < len(outcomes) else 0
        assert r.lost_after_gap == lost, (r.doc_id, lost, r.lost_after_gap)
