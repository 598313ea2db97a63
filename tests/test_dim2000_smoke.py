"""DIM=2000 scale smoke — the reference schema stores `vector(2000)`
(database-schema.sql) while the synthetic corpus uses a 64-dim
stand-in.  These tests instantiate the two dimension-sensitive paths at
the real width on a small corpus:

* blocked-GEMM all-pairs (`similarity_pairs`): per-task memory is
  2·n/SIM_BLOCKS vectors × d doubles, independent of corpus size — the
  replication factor (exactly SIM_BLOCKS per vector) and the block-pair
  group bound are asserted directly, and the scored output must match a
  numpy ground truth at d=2000;
* PQ encode/ADC (`knn_pq`): subspace count scales linearly with dim
  (M = 2000/SUBD = 250 at the reference width) — the full
  encode→ADC→top-K pipeline must reproduce a numpy replay exactly.

Values are dyadic rationals (k/256), so every fold is exact in IEEE
double regardless of summation order — the same determinism device the
operators use corpus-side.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pytest

from iris_project_database_refresh_spark.operators import embeddings as emb_ops
from iris_project_database_refresh_spark.operators import pq as pq_ops

DIM = 2000
N = 120


@pytest.fixture(scope="module")
def dim2000_dir(spark, tmp_path_factory):
    rng = np.random.default_rng(20260815)
    vecs = rng.integers(-128, 128, size=(N, DIM)).astype(np.float64) / 256.0
    vecs[1] = vecs[0]          # exact duplicate pair (cosine 1.0)
    vecs[2] = vecs[0] * 0.5    # same direction (cosine 1.0)
    d = str(tmp_path_factory.mktemp("dim2000"))
    rows = [(i, int(i % 4), [float(x) for x in vecs[i]]) for i in range(N)]
    spark.createDataFrame(
        rows, "vec_id bigint, label bigint, embedding array<double>"
    ).repartition(8).write.parquet(os.path.join(d, "embeddings.parquet"))
    return d, vecs


def test_blocked_gemm_similarity_pairs_at_dim2000(spark, dim2000_dir):
    d, vecs = dim2000_dir
    got = {
        (r.id_a, r.id_b): r.cosine
        for r in emb_ops.similarity_pairs(spark, d).collect()
    }
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    sims = np.round(norm @ norm.T, 6)
    want = {
        (a, b): sims[a, b]
        for a in range(N)
        for b in range(a + 1, N)
        if sims[a, b] >= emb_ops.PAIR_TAU
    }
    assert got == want
    assert (0, 1) in got and got[(0, 1)] == 1.0  # the planted duplicates
    assert (0, 2) in got and got[(0, 2)] == 1.0


def test_blocked_gemm_task_memory_model_at_dim2000(spark, dim2000_dir):
    """The memory contract that makes the GEMM 100 TB-safe: every vector
    is replicated exactly SIM_BLOCKS times by the operator's OWN block
    expansion, and no block-pair task ever holds more than 2·ceil(n/B)
    vectors (× d × 8 B = task RAM)."""
    d, _vecs = dim2000_dir
    B = emb_ops.SIM_BLOCKS
    from iris_project_database_refresh_spark.sources.tables import load_table

    emb = load_table(spark, d, "embeddings").select("vec_id", "embedding")
    # the pre-score DataFrame similarity_pairs actually groups on
    rep = emb_ops._replicate_blocks(emb)
    per_vec = rep.groupBy("vec_id").count().collect()
    assert len(per_vec) == N
    assert {r["count"] for r in per_vec} == {B}  # exactly SIM_BLOCKS copies
    # group sizes of the physical (pa, pb) tasks: a diagonal block holds
    # one role (<= ceil(n/B) vectors), an off-diagonal block two
    per_block = math.ceil(N / B)
    groups = rep.groupBy("pa", "pb").count().collect()
    assert len(groups) == B * (B + 1) // 2  # every unordered block pair
    for g in groups:
        cap = per_block if g["pa"] == g["pb"] else 2 * per_block
        assert g["count"] <= cap
    # task memory at the reference width: 2 * per_block vectors of d doubles
    task_bytes = 2 * per_block * DIM * 8
    assert task_bytes < 64 * 2**20  # << executor budget even at d=2000


def test_pq_encode_adc_at_dim2000(spark, dim2000_dir, monkeypatch):
    """knn_pq at M=250 subspaces (2000/SUBD): Spark's encode→ADC→top-K
    must equal a numpy replay with the operator's own floor-scaling."""
    d, vecs = dim2000_dir
    monkeypatch.setattr(pq_ops, "M", DIM // pq_ops.SUBD)
    M, SUBD = pq_ops.M, pq_ops.SUBD
    KC, NQ, K = pq_ops.KCENT, pq_ops.PQ_QUERIES, pq_ops.PQ_K
    from iris_project_database_refresh_spark.operators.advanced import CENTROID_BASE

    got = [
        (r.query_id, r.neighbor_id, r.rank, r.adc_dot, round(r.cosine, 6))
        for r in pq_ops.knn_pq(spark, d).collect()
    ]

    sub = vecs.reshape(N, M, SUBD)
    cb = sub[CENTROID_BASE : CENTROID_BASE + KC]  # (KC, M, SUBD)
    # encode: nearest centroid per (vector, subspace) on floor-scaled L2
    d2 = ((sub[:, None, :, :] - cb[None, :, :, :]) ** 2).sum(axis=3)  # (N, KC, M)
    di = np.floor(d2 * 1e6 + 0.5).astype(np.int64)
    codes = di.argmin(axis=1)  # ties -> lowest k, same as min(struct(di,k))
    # ADC tables for the queries
    sdot = np.floor((sub[:NQ, None, :, :] * cb[None, :, :, :]).sum(axis=3) * 1e6 + 0.5).astype(np.int64)  # (NQ, KC, M)
    want = []
    norm = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
    for q in range(NQ):
        sadc = {
            v: int(sdot[q, codes[v], np.arange(M)].sum())
            for v in range(N)
            if v != q
        }
        ranked = sorted(sadc.items(), key=lambda kv: (-kv[1], kv[0]))[:K]
        for rank, (v, s) in enumerate(ranked, start=1):
            want.append((q, v, rank, s / 1e6, round(float(norm[q] @ norm[v]), 6)))
    assert sorted(got) == sorted(want)
    assert len(got) == NQ * K
