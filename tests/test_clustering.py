from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iris_project_database_refresh_spark.operators import clustering

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(clustering.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        clustering.QUERIES[name](spark, SF_CORRECT), oracle, clustering.ORACLES[name]
    )


def test_kmeans_partitions_all_vectors(spark):
    rows = clustering.kmeans_embeddings(spark, SF_CORRECT).collect()
    assert 1 <= len(rows) <= clustering.KMEANS_K
    n_vecs = (
        clustering._qvecs(spark, SF_CORRECT).count()
    )
    assert sum(r.cluster_size for r in rows) == n_vecs
    assert all(r.inertia >= 0 for r in rows)


def test_kmeans_training_reduces_inertia(spark):
    """Lloyd's guarantee: total inertia under the trained centroids is
    no worse than under the initial codebook."""
    vecs = clustering._qvecs(spark, SF_CORRECT).localCheckpoint(eager=False)
    cents0 = vecs.where(
        (F.col("vec_id") >= 100) & (F.col("vec_id") < 100 + clustering.KMEANS_K)
    ).select((F.col("vec_id") - 100).alias("cid"), F.col("q").alias("c"))
    inertia0 = (
        clustering._assign(vecs, cents0).agg(F.sum("dist").alias("i")).collect()[0].i
    )
    trained = sum(
        r.inertia for r in clustering.kmeans_embeddings(spark, SF_CORRECT).collect()
    )
    assert trained <= inertia0


def test_semantic_dedup_pairs_are_exact_pairs(spark):
    """Cluster restriction may only REMOVE pairs: every semantic_dedup
    pair must appear in the exact all-pairs result at the same tau,
    with the same cosine."""
    from iris_project_database_refresh_spark.operators.embeddings import similarity_pairs

    sem = {
        (r.id_keep, r.id_drop, r.cosine)
        for r in clustering.semantic_dedup(spark, SF_CORRECT).collect()
    }
    exact = {
        (r.id_a, r.id_b, r.cosine) for r in similarity_pairs(spark, SF_CORRECT).collect()
    }
    assert sem, "no within-cluster near-dup pairs found"
    assert sem <= exact


def test_pca_rayleigh_dominates_average_eigenvalue(spark):
    """The power-method direction must score at least the average
    eigenvalue: x'Gx/x'x >= trace(G)/64 (exact-integer comparison)."""
    rows = clustering.embed_pca_power(spark, SF_CORRECT).collect()
    assert len(rows) == clustering.DIM
    lam_num, lam_den = rows[0].lam_num, rows[0].lam_den
    gram = {
        (r.i, r.j): r.g for r in clustering._gram(spark, SF_CORRECT).collect()
    }
    trace = sum(gram[(d, d)] for d in range(clustering.DIM))
    assert lam_num * clustering.DIM >= trace * lam_den


def test_pca_deflation_orthogonality(spark):
    """PC2 must be meaningfully non-parallel to PC1: |cos(x1, x2)|
    bounded away from 1, and lambda2 <= lambda1 (both Rayleigh
    quotients on their Grams)."""
    from .conftest import SF_CORRECT

    r2 = clustering.embed_pca_deflate(spark, SF_CORRECT).collect()
    r1 = clustering.embed_pca_power(spark, SF_CORRECT).collect()
    n1 = sum(r.w * r.w for r in r1)
    n2 = sum(r.w * r.w for r in r2)
    dot = r2[0].dot_12
    cos2 = (dot * dot) / (n1 * n2)
    assert cos2 < 0.25  # |cos| < 0.5 after 3 power rounds
    lam1 = r1[0].lam_num / r1[0].lam_den
    lam2 = r2[0].lam2_num / r2[0].lam2_den
    assert lam2 <= lam1 + 1e-9


def test_dbscan_invariants(spark):
    """Exact-DBSCAN structure: roles partition the corpus; every core
    meets the MINPTS bar; borders touch a core; noise touches none;
    every cluster id is the min vec_id of its own members."""
    rows = clustering.embed_dbscan(spark, SF_CORRECT).collect()
    from iris_project_database_refresh_spark.operators.embeddings import (
        similarity_pairs,
    )

    pairs = similarity_pairs(spark, SF_CORRECT).select("id_a", "id_b").collect()
    nbrs: dict[int, set] = {}
    for r in pairs:
        nbrs.setdefault(r.id_a, set()).add(r.id_b)
        nbrs.setdefault(r.id_b, set()).add(r.id_a)
    by_id = {r.vec_id: r for r in rows}
    core = {r.vec_id for r in rows if r.role == "core"}
    assert core, "no core points at the test tau/minpts"
    clusters: dict[int, list] = {}
    for r in rows:
        assert r.degree == len(nbrs.get(r.vec_id, ()))
        if r.role == "core":
            assert r.degree >= clustering.DBSCAN_MINPTS
            clusters.setdefault(r.cluster_id, []).append(r.vec_id)
        elif r.role == "border":
            assert nbrs.get(r.vec_id, set()) & core, r.vec_id
            assert r.cluster_id != -1
        else:
            assert not (nbrs.get(r.vec_id, set()) & core)
            assert r.cluster_id == -1
    for cid, members in clusters.items():
        assert cid == min(members), (cid, min(members))


def test_dbscan_long_chain_converges(spark, tmp_path):
    """r8 ADVICE: epsilon-graphs grow long transitive chains, and
    min-label alone only covers DBSCAN_CC_ROUNDS hops. Plant a chain of
    diameter ~22 (>> 8): v_i = (e_i + e_{i+1})/sqrt(2) gives adjacent
    cosine 0.5 >= tau and skip cosine 0 < tau; tripling each node makes
    everyone core under MINPTS=3. The pointer-jump rounds must collapse
    the WHOLE chain to one cluster — checked against the exact
    recursive-CTE fixpoint oracle, which would hash-mismatch on any
    silent fragmentation."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    dim, n_nodes, copies = 24, 23, 3
    rows = []
    vid = 0
    for i in range(n_nodes):
        v = np.zeros(dim, dtype=np.float32)
        v[i] = v[i + 1] = 1.0 / np.sqrt(2.0)
        for _ in range(copies):
            rows.append((vid, v))
            vid += 1
    tbl = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array([r[1] for r in rows], pa.list_(pa.float32())),
            "label": pa.array([0] * len(rows), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    out = clustering.embed_dbscan(spark, str(tmp_path))
    got = out.collect()
    assert all(r.role == "core" for r in got)
    assert {r.cluster_id for r in got} == {0}, "chain fragmented"

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{tmp_path}/embeddings.parquet')"
    )
    try:
        assert_matches_oracle(out, con, clustering.ORACLES["embed_dbscan"])
    finally:
        con.close()
