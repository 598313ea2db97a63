"""Cross-engine pins for the round-7 corpus-scaled parameters.

The LSH plane count and the SemDeDup cell count are computed from the
corpus row count in BOTH engines (Python int math on the Spark side,
a SQL CTE on the DuckDB side). These tests evaluate the two formulas
against each other across the corpus-size range — including every
boundary where the integer ceil-div or bit-length steps — so a drift
in either formula fails fast without a Spark session.
"""

from __future__ import annotations

import duckdb
import pytest

from iris_project_database_refresh_spark.operators.clustering import (
    KMEANS_K,
    SEMDEDUP_CELL_TARGET,
)
from iris_project_database_refresh_spark.operators.embeddings import (
    LSH_BUCKET_TARGET,
    LSH_PLANES,
    _lsh_planes,
)

NS = [
    1, 2, 100, 249, 250, 251, 499, 500, 501, 999, 1000, 2000, 2249, 2250,
    2251, 4000, 4001, 8000, 32000, 10**6, 10**9,
]


@pytest.mark.parametrize("n", NS)
def test_lsh_planes_matches_oracle_cte(n):
    sql = f"""
    SELECT greatest({LSH_PLANES}, CASE WHEN m <= 1 THEN 0
           ELSE length(bin(m - 1)) END) AS np
    FROM (SELECT CAST(({n} + {LSH_BUCKET_TARGET - 1}) // {LSH_BUCKET_TARGET} AS BIGINT) AS m)
    """
    assert _lsh_planes(n) == duckdb.sql(sql).fetchone()[0]


@pytest.mark.parametrize("n", NS)
def test_lsh_planes_bounds_bucket_size(n):
    np_ = _lsh_planes(n)
    assert np_ >= LSH_PLANES
    # enough buckets that the TARGET bound holds (expected occupancy)
    assert (1 << np_) * LSH_BUCKET_TARGET >= n


@pytest.mark.parametrize("n", NS)
def test_semdedup_cells_match_oracle(n):
    k_py = max(KMEANS_K, n // SEMDEDUP_CELL_TARGET)
    sql = f"SELECT greatest({KMEANS_K}, {n} // {SEMDEDUP_CELL_TARGET}) AS k"
    assert k_py == duckdb.sql(sql).fetchone()[0]


def test_params_unchanged_at_test_sfs():
    """At every committed test corpus size the dynamic parameters sit at
    their floors, so driver-verified outputs are bit-unchanged."""
    for n in (500, 2000):  # sf0.001/sf0.01 embeddings = 500, sf0.1 = 2000
        assert _lsh_planes(n) == LSH_PLANES
        assert max(KMEANS_K, n // SEMDEDUP_CELL_TARGET) == KMEANS_K
