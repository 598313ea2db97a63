"""Cross-engine pins for the round-7 corpus-scaled parameters.

The LSH plane count and the SemDeDup cell count are computed from the
corpus row count in BOTH engines (Python int math on the Spark side,
a SQL CTE on the DuckDB side). These tests evaluate the two formulas
against each other across the corpus-size range — including every
boundary where the integer ceil-div or bit-length steps — so a drift
in either formula fails fast without a Spark session.
"""

from __future__ import annotations

import re

import duckdb
import pytest

from iris_project_database_refresh_spark.operators.clustering import (
    KMEANS_K,
    SEMDEDUP_CELL_TARGET,
    _semantic_dedup_sql,
)
from iris_project_database_refresh_spark.operators.embeddings import (
    LSH_BUCKET_TARGET,
    LSH_PLANES,
    _lsh_planes,
    _npl_sql,
)

NS = [
    1, 2, 100, 249, 250, 251, 499, 500, 501, 999, 1000, 2000, 2249, 2250,
    2251, 4000, 4001, 8000, 32000, 10**6, 10**9,
]

# The pin must exercise the EXACT strings the production oracles run
# (r7 ADVICE: a re-inlined copy can drift silently). Both probes are
# built by substituting a literal-count relation for the corpus scan in
# the production SQL; if the production fragment changes shape, the
# substitution/extraction fails loudly and the pin goes red.


def _npl_probe_sql(n: int) -> str:
    cte = _npl_sql().replace("FROM embeddings", f"FROM range({n})")
    assert cte != _npl_sql(), "npl CTE no longer scans embeddings — update pin"
    return f"WITH {cte} SELECT np FROM npl"


def _kk_probe_sql(n: int) -> str:
    m = re.search(
        r"kk AS \(\s*(SELECT greatest\(.*?\) AS k) FROM vecs", _semantic_dedup_sql()
    )
    assert m, "kk CTE shape changed in _semantic_dedup_sql — update pin"
    return m.group(1) + f" FROM range({n})"


@pytest.mark.parametrize("n", NS)
def test_lsh_planes_matches_oracle_cte(n):
    assert _lsh_planes(n) == duckdb.sql(_npl_probe_sql(n)).fetchone()[0]


@pytest.mark.parametrize("n", NS)
def test_lsh_planes_bounds_bucket_size(n):
    np_ = _lsh_planes(n)
    assert np_ >= LSH_PLANES
    # enough buckets that the TARGET bound holds (expected occupancy)
    assert (1 << np_) * LSH_BUCKET_TARGET >= n


@pytest.mark.parametrize("n", NS)
def test_semdedup_cells_match_oracle(n):
    k_py = max(KMEANS_K, n // SEMDEDUP_CELL_TARGET)
    assert k_py == duckdb.sql(_kk_probe_sql(n)).fetchone()[0]


def test_params_unchanged_at_test_sfs():
    """At every committed test corpus size the dynamic parameters sit at
    their floors, so driver-verified outputs are bit-unchanged."""
    for n in (500, 2000):  # sf0.001/sf0.01 embeddings = 500, sf0.1 = 2000
        assert _lsh_planes(n) == LSH_PLANES
        assert max(KMEANS_K, n // SEMDEDUP_CELL_TARGET) == KMEANS_K


# --- combinatorial-banding rungs (round-8 scale fix) ------------------------
#
# The simhash/phash banded joins scale their JOIN KEY with the corpus
# (combo of c bands out of B) instead of widening the fingerprint, so
# the answer set — and the brute-force oracle — is identical at every
# rung. These pins hold the ladder's exactness invariant and the
# selection boundaries; tests/test_dedup.py holds the Spark-side
# pair-set invariance.

from iris_project_database_refresh_spark.operators.dedup import (  # noqa: E402
    HAMMING_TAU,
    SIMHASH_BITS,
    SIMHASH_RUNGS,
    banding_rung,
)
from iris_project_database_refresh_spark.operators.multimodal import (  # noqa: E402
    PH_BITS,
    PH_RUNGS,
    PH_TAU,
)

_LADDERS = [
    (SIMHASH_RUNGS, SIMHASH_BITS, HAMMING_TAU),
    (PH_RUNGS, PH_BITS, PH_TAU),
]


@pytest.mark.parametrize("rungs,bits,tau", _LADDERS)
def test_rung_exactness_invariant(rungs, bits, tau):
    """tau flips touch <= tau bands; a combo key survives iff some
    c-subset is untouched, which B - c >= tau guarantees for EVERY
    possible set of touched bands (not just on average)."""
    from itertools import combinations

    for B, c in rungs:
        assert bits % B == 0
        assert B - c >= tau
        # exhaustive pigeonhole: every tau-subset of touched bands
        # leaves at least one c-combo fully intact
        for touched in combinations(range(B), min(tau, B)):
            assert any(
                not set(s) & set(touched) for s in combinations(range(B), c)
            )


@pytest.mark.parametrize("rungs,bits,tau", _LADDERS)
def test_rung_selection_boundaries(rungs, bits, tau):
    for n in (None, 0, 1, 2, 32768):
        assert banding_rung(n, rungs, bits, tau) == rungs[0]
    # each rung holds exactly while its key domain covers the corpus
    for B, c in rungs:
        w = (bits // B) * c
        assert banding_rung(1 << w, rungs, bits, tau) == (B, c)
    assert banding_rung(1 << 62, rungs, bits, tau) == rungs[-1]


@pytest.mark.parametrize("rungs,bits,tau", _LADDERS)
def test_rung_key_width_bounds_candidates(rungs, bits, tau):
    """Once selected, a rung's key domain is at least the corpus size,
    so expected random same-key pairs stay O(C(B,c) * N)."""
    for n in (10**5, 10**7, 10**9):
        B, c = banding_rung(n, rungs, bits, tau)
        if (B, c) != rungs[-1]:
            assert (1 << ((bits // B) * c)) >= n


# --- exact→ANN backend dispatch (round-9 scale mechanization) ----------------
#
# similarity_pairs / knn_graph (and knn_mutual_graph through it)
# dispatch their candidate-generation backend on the corpus row count:
# exact blocked GEMM <= SIM_EXACT_MAX, SIM_BANDS band-salted LSH
# bucketings above. The threshold and band count live in BOTH engines;
# these pins extract them from the PRODUCTION oracle SQL strings (the
# r7 ADVICE rule: a re-inlined copy can drift silently).

from iris_project_database_refresh_spark.operators.embeddings import (  # noqa: E402
    ORACLES,
    SIM_BANDS,
    SIM_EXACT_MAX,
)


@pytest.mark.parametrize(
    "key", ["similarity_pairs", "knn_graph", "knn_mutual_graph", "hnsw_build_links"]
)
def test_dispatch_constants_pinned_in_oracle_sql(key):
    if key == "hnsw_build_links":
        from iris_project_database_refresh_spark.operators.pq import (
            ORACLES as PQ_ORACLES,
        )

        sql = PQ_ORACLES[key]
    else:
        sql = ORACLES[key]
    le = re.findall(r"WHERE \(SELECT n FROM cnt\) <= (\d+)", sql)
    gt = re.findall(r"WHERE \(SELECT n FROM cnt\) > (\d+)", sql)
    assert le and gt, f"{key}: count-gated dispatch branches missing from oracle SQL"
    assert {int(x) for x in le + gt} == {SIM_EXACT_MAX}
    bands = re.findall(r"unnest\(range\((\d+)\)\) AS band", sql)
    assert bands, f"{key}: banded bucketing missing from oracle SQL"
    assert {int(b) for b in bands} == {SIM_BANDS}


def test_dispatch_exact_at_test_sfs():
    """Every committed test corpus (and the sf0.1 bench corpus) sits on
    the exact side of the dispatch, so driver hashes and standing
    values are bit-unchanged; the 16x probe corpus (32000) swaps."""
    for n in (500, 2000):
        assert n <= SIM_EXACT_MAX
    assert 16 * 2000 > SIM_EXACT_MAX


def test_banded_bucket_sql_indexes_shared_plane_stream():
    """Band b must draw planes [b*np, (b+1)*np) of the SAME md5 stream
    as the single-band bucket: evaluating the band expression at
    band=0 over a fixed vector must equal the single-band SQL."""
    from iris_project_database_refresh_spark.operators.embeddings import (
        _bucket_sql_band,
        _bucket_sql_dyn,
    )

    probe = "WITH npl AS (SELECT 5 AS np) SELECT {expr} FROM (SELECT [0.3, -1.2, 0.7, 2.5]::DOUBLE[] AS v), npl"
    b0 = duckdb.sql(probe.format(expr=_bucket_sql_band("v", "0"))).fetchone()[0]
    single = duckdb.sql(probe.format(expr=_bucket_sql_dyn("v"))).fetchone()[0]
    assert b0 == single
    # bands 1..3 use DISJOINT plane windows -> generically different ids
    others = [
        duckdb.sql(probe.format(expr=_bucket_sql_band("v", str(b)))).fetchone()[0]
        for b in range(1, 4)
    ]
    assert len(set([b0] + others)) > 1
