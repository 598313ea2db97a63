from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import advanced

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(advanced.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(advanced.QUERIES[name](spark, SF_CORRECT), oracle, advanced.ORACLES[name])


def test_ivf_recall_vs_exact(spark):
    from iris_project_database_refresh_spark.operators.embeddings import knn_brute_force

    exact = {(r.query_id, r.neighbor_id) for r in knn_brute_force(spark, SF_CORRECT).collect()}
    ivf = {(r.query_id, r.neighbor_id) for r in advanced.knn_ivf(spark, SF_CORRECT).collect()}
    assert ivf, "IVF returned nothing"
    # probing 4/16 cells must surface a reasonable share of the exact top-k
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.2, f"IVF recall {recall:.2f} suspiciously low"


def test_winnow_covers_shared_substrings(spark):
    """Two docs sharing a long substring must share ≥1 fingerprint —
    check via the planted 90%-prefix near-copies in the dedup corpus."""
    import pyspark.sql.functions as F

    from iris_project_database_refresh_spark.operators.dedup import _corpus
    from iris_project_database_refresh_spark.operators.advanced import _TH, _GRAMS, _WINNOWED

    d = (
        _corpus(spark, SF_CORRECT)
        .withColumn("th", F.expr(_TH))
        .withColumn("grams", F.expr(_GRAMS))
        .withColumn("fps", F.expr(_WINNOWED))
        .select("doc_id", "fps")
    )
    pairs = (
        d.where(F.col("doc_id") < 100000)
        .alias("a")
        .join(
            d.where((F.col("doc_id") >= 200000)).alias("b"),
            F.col("b.doc_id") == F.col("a.doc_id") + 200000,
        )
        .select(F.size(F.array_intersect("a.fps", "b.fps")).alias("shared"))
        .collect()
    )
    assert pairs and all(r.shared >= 1 for r in pairs)


def test_lpt_within_four_thirds(spark):
    """Graham's bound: the LPT makespan is within 4/3 of the lower
    bound, loads partition the total, counts partition the docs."""
    from iris_project_database_refresh_spark.operators import packing

    from .conftest import SF_CORRECT

    rows = packing.shard_makespan_lpt(spark, SF_CORRECT).collect()
    assert len(rows) == packing.LPT_SHARDS
    total = rows[0].lower_bound  # lower bound >= ceil(total/W)
    makespan = max(r.shard_bytes for r in rows)
    assert makespan * 3 <= rows[0].lower_bound * 4 + 3
    assert sum(r.shard_docs for r in rows) == rows[0].n_docs
