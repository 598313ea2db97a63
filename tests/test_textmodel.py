from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iris_project_database_refresh_spark.operators import textmodel

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(textmodel.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        textmodel.QUERIES[name](spark, SF_CORRECT), oracle, textmodel.ORACLES[name]
    )


def test_bpe_merge_consumes_the_pair(spark):
    rows = textmodel.bpe_merge_step(spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= textmodel.TOP_PAIRS
    new_symbol = rows[0].new_symbol
    assert all(r.new_symbol == new_symbol for r in rows)
    # greedy non-overlapping application: the merged pair cannot survive
    # as an adjacent (a, b) pair anywhere after the merge
    a, b = new_symbol[0], new_symbol[1:]
    assert all(r.pair != f"{a} {b}" for r in rows)
    # counts are sorted desc with pair tie-break
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_bigram_logprob_is_conditional(spark):
    df = textmodel.quality_bigram_logprob(spark, SF_CORRECT)
    rows = df.collect()
    assert all(r.mean_log10_prob < 0 for r in rows)
    assert all(r.min_log10_prob <= r.mean_log10_prob for r in rows)
    # every multi-token doc contributes len(tokens)-1 bigrams
    from iris_project_database_refresh_spark.functions.text import tokens
    from iris_project_database_refresh_spark.sources.tables import load_table

    nt = {
        r.doc_id: r.n
        for r in load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", F.size(tokens(F.col("text"))).alias("n"))
        .collect()
    }
    for r in rows:
        assert r.n_bigrams == nt[r.doc_id] - 1


def test_tokenizer_segment_greedy_reference(spark, oracle):
    """Greedy longest-match must agree with a direct Python reference
    on every distinct word (guards both engines' fold implementations)."""
    import pyspark.sql.functions as F

    vocab_rows = oracle.execute(
        """
        WITH vocab_words AS (
          SELECT word, count(*) AS wcnt
          FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS word
                FROM documents) GROUP BY word),
        subs AS (
          SELECT sub, sum(wcnt) AS n
          FROM (SELECT wcnt, unnest(flatten(list_transform(generate_series(2, 4),
                l -> CASE WHEN length(word) >= l
                     THEN list_transform(generate_series(1, length(word) - l + 1), i -> substr(word, i, l))
                     ELSE [] END))) AS sub FROM vocab_words) GROUP BY sub)
        SELECT sub FROM subs ORDER BY n DESC, sub LIMIT 64
        """
    ).fetchall()
    V = {r[0] for r in vocab_rows}

    def greedy(w: str) -> int:
        pos, n = 0, 0
        while pos < len(w):
            for l in (4, 3, 2):
                if pos + l <= len(w) and w[pos : pos + l] in V:
                    pos += l
                    break
            else:
                pos += 1
            n += 1
        return n

    docs = textmodel.tokenizer_segment(spark, SF_CORRECT).collect()
    from iris_project_database_refresh_spark.functions.text import tokens
    from iris_project_database_refresh_spark.sources.tables import load_table

    words = {
        r.doc_id: r.ws
        for r in load_table(spark, SF_CORRECT, "documents")
        .select("doc_id", tokens(F.col("text")).alias("ws"))
        .collect()
    }
    for r in docs:
        assert r.n_pieces == sum(greedy(w) for w in words[r.doc_id])
        assert r.n_words == len(words[r.doc_id])


def test_good_turing_identities(spark):
    """N_{r+1} consistency: each row's n_r_next equals the n_r of the
    row at r+1 where present; r* is null exactly when n_r_next = 0; the
    unseen mass is N_1/N in micro."""
    from .conftest import SF_CORRECT

    rows = {r.r: r for r in textmodel.good_turing_counts(spark, SF_CORRECT).collect()}
    for r, row in rows.items():
        if r + 1 in rows:
            assert row.n_r_next == rows[r + 1].n_r
        if row.n_r_next == 0:
            assert row.r_star_milli is None
        else:
            assert row.r_star_milli == (r + 1) * row.n_r_next * 1000 // row.n_r
    one = rows.get(1)
    if one is not None:
        assert one.p_unseen_micro == one.n_r * 1000000 // one.n_tokens


def test_unigram_prune_scores_oracle(spark, oracle):
    from .conftest import SF_CORRECT, assert_matches_oracle
    from iris_project_database_refresh_spark.operators.textmodel import (
        UNIGRAM_PRUNE_SQL,
        UNIGRAM_PRUNE_TOPK,
        unigram_prune_scores,
    )

    df = unigram_prune_scores(spark, SF_CORRECT)
    assert_matches_oracle(df, oracle, UNIGRAM_PRUNE_SQL)
    rows = df.collect()
    assert len(rows) == UNIGRAM_PRUNE_TOPK
    # prune shortlist = ascending loss delta (most-negative first:
    # pieces RARER than their character factorization predicts are the
    # safest removals); every piece appears in the corpus
    deltas = [r.delta_llq for r in rows]
    assert deltas == sorted(deltas)
    assert all(r.piece_count >= 1 for r in rows)


def test_unigram_viterbi_is_optimal(spark):
    """The DP must find the TRUE maximum-score segmentation: for every
    distinct corpus word, exhaustively enumerate all 1..3-piece
    segmentations under the planted vocab/scores and compare both the
    optimum score and the piece count the operator reports (via a
    per-word replay of its own fold)."""
    import hashlib
    from itertools import product

    from iris_project_database_refresh_spark.operators.textmodel import _vocab

    words = [r.word for r in _vocab(spark, SF_CORRECT).collect()]
    assert words

    def h32(p: str) -> int:
        return int(hashlib.md5(p.encode()).hexdigest()[:8], 16)

    def in_vocab(p: str) -> bool:
        return len(p) == 1 or h32(p) % 4 == 0

    def score(p: str) -> int:
        return -2200 + 320 * len(p) + h32(p) % 97

    def best_exhaustive(w: str):
        n = len(w)
        best = None
        # compositions of n into parts 1..3
        def walk(pos, parts, acc):
            nonlocal best
            if pos == n:
                if best is None or (acc, -parts) > (best[0], -best[1]):
                    best = (acc, parts)
                return
            for j in (1, 2, 3):
                if pos + j <= n and in_vocab(w[pos : pos + j]):
                    walk(pos + j, parts + 1, acc + score(w[pos : pos + j]))
        walk(0, 0, 0)
        return best

    def viterbi(w: str):
        n = len(w)
        BIG = 1_000_000
        best = [0]
        jarr = []
        for i in range(1, n + 1):
            cands = [-1, -1, -1]
            for j in (1, 2, 3):
                if i >= j and in_vocab(w[i - j : i]):
                    cands[j - 1] = (best[i - j] + score(w[i - j : i]) + BIG) * 8 + j
            v = max(cands)
            best.append(v // 8 - BIG)
            jarr.append(v % 8)
        pos, n_pieces = n, 0
        while pos > 0:
            pos -= jarr[pos - 1]
            n_pieces += 1
        return best[n], n_pieces

    for w in words:
        exh_score, _ = best_exhaustive(w)
        dp_score, dp_pieces = viterbi(w)
        assert dp_score == exh_score, w
        assert dp_pieces >= 1
