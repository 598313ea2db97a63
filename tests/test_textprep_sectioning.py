"""Oracle parity for the document-structuring modules that previously
relied on the driver simulation alone: sectioning (heading hierarchy,
breakpoint chunking, page assignment), chapters, textprep (tag strip,
forced splits, normalization) and packing."""

from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import (
    chapters,
    packing,
    sectioning,
    textprep,
)

from .conftest import SF_CORRECT, assert_matches_oracle

ALL = {**sectioning.QUERIES, **chapters.QUERIES, **textprep.QUERIES, **packing.QUERIES}
ORACLES = {**sectioning.ORACLES, **chapters.ORACLES, **textprep.ORACLES, **packing.ORACLES}


@pytest.mark.parametrize("name", sorted(ALL))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(ALL[name](spark, SF_CORRECT), oracle, ORACLES[name])


def test_normalize_restores_original_text(spark):
    """The planted dirt must clean back to the original text for every
    document — the invariant that makes the cleanup trustworthy."""
    rows = textprep.text_normalize(spark, SF_CORRECT).collect()
    assert rows and all(r.restored == 1 for r in rows)
    assert all(r.n_removed > 0 for r in rows)  # the dirt was really planted


def test_best_fit_beats_nothing_and_respects_capacity(spark):
    """FFD invariants: bins can never beat the concat lower bound,
    fill can never exceed 100%, and every doc was placed (token
    conservation vs the sized corpus)."""
    import pyspark.sql.functions as F

    from iris_project_database_refresh_spark.functions.text import tokens
    from iris_project_database_refresh_spark.operators.packing import PACK_C, pack_best_fit
    from iris_project_database_refresh_spark.sources.tables import load_table

    rows = pack_best_fit(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r.bins_ffd >= r.bins_concat_lower_bound
        assert 0 < r.fill_bp <= 10000
    want_tokens = (
        load_table(spark, SF_CORRECT, "documents")
        .select(F.size(tokens(F.col("text"))).alias("n"))
        .where((F.col("n") > 0) & (F.col("n") <= PACK_C))
        .agg(F.sum("n"))
        .collect()[0][0]
    )
    assert sum(r.total_tokens for r in rows) == want_tokens


def test_epoch_shuffle_reshuffles_across_epochs(spark):
    """Same corpus, different epochs -> different shard assignment for
    most docs (the reshuffle contract); within an epoch the plan is a
    pure function of (seed, doc_id) so a second run is identical."""
    from iris_project_database_refresh_spark.operators.packing import epoch_shuffle_plan

    a = sorted(map(tuple, epoch_shuffle_plan(spark, SF_CORRECT).collect()))
    b = sorted(map(tuple, epoch_shuffle_plan(spark, SF_CORRECT).collect()))
    assert a == b  # reproducible
    by_epoch = {}
    for r in a:
        by_epoch.setdefault(r[0], {})[r[1]] = r[4]
    # shard fingerprints differ between the two epochs (reshuffled)
    assert by_epoch[1] != by_epoch[2]


def test_reward_margin_ece_oracle(spark, oracle):
    from .conftest import SF_CORRECT, assert_matches_oracle
    from iris_project_database_refresh_spark.operators.textprep import (
        REWARD_ECE_SQL,
        reward_margin_ece,
    )

    df = reward_margin_ece(spark, SF_CORRECT)
    assert_matches_oracle(df, oracle, REWARD_ECE_SQL)
    rows = {r.bin_id: r for r in df.collect()}
    assert rows and set(rows) <= set(range(9))
    # confidence bins are 250bp wide starting at 5000
    for b, r in rows.items():
        assert 5000 + 250 * b <= r.avg_conf_bp <= 5000 + 250 * (b + 1)
        assert 0 <= r.observed_bp <= 10000


def test_recursive_split_covers_every_branch(spark):
    """The plant is tuned (RS_BLOCK/SPLIT_TH/doc-varied periods) so the
    sf0.01 corpus exercises EVERY recursion arm of the reference's
    recursive_split_section: sections that fit, sections split down to
    H2 and H3 (split_remainder anchors), oversized sections with <2
    subheadings (kept as-is), and oversized H3 leaves at max level.
    A plant drift that kills a branch makes the operator untested there
    — so the full branch set is pinned, plus structural invariants."""
    rows = sectioning.section_recursive_split(spark, SF_CORRECT).collect()
    branches = {(r.level, r.stop_reason) for r in rows}
    assert branches == {
        (1, "fits"),
        (1, "no_subheadings"),
        (1, "split_remainder"),
        (2, "fits"),
        (2, "no_subheadings"),
        (2, "split_remainder"),
        (3, "fits"),
        (3, "max_level"),
    }
    # an H3 cut exists only under a split H2 — never 'split_remainder'
    # at level 3 (max level cannot split), never 'max_level' below it
    assert not any(r.level < 3 and r.stop_reason == "max_level" for r in rows)
    # sec_idx is contiguous 1..n per doc and every doc yields >= 1 piece
    by_doc: dict[int, list[int]] = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r.sec_idx)
    assert len(by_doc) == 500
    for doc, idxs in by_doc.items():
        assert sorted(idxs) == list(range(1, len(idxs) + 1)), doc
    # parent linkage: level-1 pieces have no parent, deeper pieces do
    for r in rows:
        assert (r.parent_title == "") == (r.level == 1)
        assert r.piece_tokens >= 1


def test_pack_fragmentation_invariants(spark):
    """cross + within partition the L^2 attention pairs (up to the two
    independent floor truncations); boundaries = docs - 1; purity is the
    max-doc share."""
    rows = packing.pack_attention_fragmentation(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert 998 <= r.cross_doc_milli + r.within_doc_milli <= 1000
        assert r.n_boundaries == r.n_docs - 1
        assert 0 <= r.pad_tokens < 64
        assert r.largest_doc_share_milli <= 1000
        if r.n_docs == 1:
            assert r.cross_doc_milli == 0 and r.largest_doc_share_milli == 1000


def test_summary_budget_audit_contract(spark):
    """Count identities per (source, level) and a hashlib re-derivation
    of the level assignment; within_bp guard behaves on empty
    non-exempt groups; every level target maps to the documented
    budgets (stage3 detail_level contract)."""
    import hashlib

    rows = chapters.summary_budget_audit(spark, SF_CORRECT).collect()
    assert rows
    targets = {"concise": 40, "standard": 90, "detailed": 180}
    for r in rows:
        assert r.detail_level in targets
        want_lvl = ["concise", "standard", "detailed"][
            int(hashlib.md5(r.source.encode()).hexdigest()[:8], 16) % 3
        ]
        assert r.detail_level == want_lvl, (r.source, r.detail_level, want_lvl)
        assert r.n_docs == r.n_exempt + r.n_under + r.n_within + r.n_over
        non_exempt = r.n_docs - r.n_exempt
        if non_exempt > 0:
            assert r.within_bp == r.n_within * 10000 // non_exempt
        assert 0 <= r.n_desc_violations <= r.n_docs
        # the simulated summarizer can overshoot by at most 130% of target
        assert r.max_summary_tokens <= targets[r.detail_level] * 130 // 100
    # the jittered plant must actually exercise the audit: some unders
    # and overs exist corpus-wide (otherwise the gate tests nothing)
    assert sum(r.n_under for r in rows) > 0
    assert sum(r.n_over for r in rows) > 0
