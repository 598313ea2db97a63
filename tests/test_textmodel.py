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
