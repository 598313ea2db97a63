from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import embeddings

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(embeddings.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        embeddings.QUERIES[name](spark, SF_CORRECT), oracle, embeddings.ORACLES[name]
    )


def test_knn_broadcasts_queries(spark):
    plan = (
        embeddings.knn_brute_force(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_similarity_pairs_no_driver_materialization(spark, monkeypatch):
    """Building the similarity_pairs plan must not run a job or pull
    data to the driver — the round-1 version collect()ed the whole
    embeddings table before the job even started."""
    from pyspark.sql import DataFrame

    def boom(self, *a, **k):
        raise AssertionError("driver-side materialization during plan construction")

    for meth in ("collect", "toPandas", "toLocalIterator"):
        monkeypatch.setattr(DataFrame, meth, boom)
    df = embeddings.similarity_pairs(spark, SF_CORRECT)
    assert df.columns == ["id_a", "id_b", "cosine"]


def test_lsh_results_are_subset_quality(spark):
    """LSH neighbors must come from the exact candidate universe and the
    rank-1 hit should usually agree with exact when the bucket holds it."""
    exact = {
        (r.query_id, r.neighbor_id): r.rank
        for r in embeddings.knn_brute_force(spark, SF_CORRECT).collect()
    }
    lsh = embeddings.knn_lsh(spark, SF_CORRECT).collect()
    assert lsh, "LSH returned nothing — buckets degenerate"
    hits = sum(1 for r in lsh if (r.query_id, r.neighbor_id) in exact)
    # recall is a trade-off, but on 16 buckets over 500 vectors some of
    # the exact top-10 must surface
    assert hits > 0


def test_similarity_pairs_invariant_to_block_count(spark, monkeypatch):
    """The blocked GEMM must return the same pairs for any SIM_BLOCKS —
    the grid factor only changes per-task memory, never the result."""
    base = sorted(map(tuple, embeddings.similarity_pairs(spark, SF_CORRECT).collect()))
    monkeypatch.setattr(embeddings, "SIM_BLOCKS", 1)
    single = sorted(map(tuple, embeddings.similarity_pairs(spark, SF_CORRECT).collect()))
    monkeypatch.setattr(embeddings, "SIM_BLOCKS", 3)
    three = sorted(map(tuple, embeddings.similarity_pairs(spark, SF_CORRECT).collect()))
    assert base == single == three
    assert len(base) > 0


def test_embedding_lsh_recall_vs_exact(spark):
    """Bucketed near-dup pairs must be a subset of the exact pairs with
    nontrivial recall (same-bucket candidates only)."""
    exact = set(
        (r.id_a, r.id_b) for r in embeddings.similarity_pairs(spark, SF_CORRECT).collect()
    )
    lsh = [
        (r.id_a, r.id_b)
        for r in embeddings.dedup_embedding_lsh(spark, SF_CORRECT).collect()
    ]
    assert lsh, "no bucketed pairs at all"
    assert set(lsh) <= exact  # cosine threshold identical -> subset
    assert len(lsh) / len(exact) > 0.1  # 16 buckets, tau=0.4: some recall


def test_knn_graph_agrees_with_brute_force_probes(spark):
    """The full graph restricted to the probe set must equal the
    probe-set brute force exactly — two independent implementations of
    the same ranking."""
    graph = {
        (r.vec_id, r.rank): (r.neighbor_id, r.cosine)
        for r in embeddings.knn_graph(spark, SF_CORRECT).collect()
        if r.vec_id < embeddings.N_QUERIES
    }
    probe = {
        (r.query_id, r.rank): (r.neighbor_id, r.cosine)
        for r in embeddings.knn_brute_force(spark, SF_CORRECT).collect()
    }
    assert graph == probe


def test_mmr_greedy_invariants(spark):
    """Step 1 must be the pure-relevance argmax; picks are distinct per
    query; every later pick's mmr_deci is consistent with the 7/3 split
    over the candidate set (recomputed in Python for one query)."""
    from .conftest import SF_CORRECT

    rows = embeddings.search_mmr_diversify(spark, SF_CORRECT).collect()
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == embeddings.N_QUERIES
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.step)
        assert [r.step for r in rs] == list(range(1, embeddings.MMR_K + 1))
        ids = [r.doc_id for r in rs]
        assert len(set(ids)) == len(ids)
        # step 1 = pure relevance: its mmr is 7 * rel_u and rel is the max
        assert rs[0].mmr_deci == embeddings.MMR_LAMBDA_DECI * rs[0].rel_u
        assert rs[0].rel_u == max(r.rel_u for r in rs)


def test_sign_binarize_recall_reasonable(spark):
    """One bit per dim keeps a meaningful share of the exact top-10 on
    the feature-hash embeddings; recall is a valid [0, 1] ratio."""
    from .conftest import SF_CORRECT

    rows = embeddings.embed_sign_binarize_recall(spark, SF_CORRECT).collect()
    assert len(rows) == embeddings.N_QUERIES
    for r in rows:
        assert 0 <= r.recall_bp <= 10000
        assert r.overlap_at_k * 10000 // embeddings.KNN_K == r.recall_bp
    assert sum(r.overlap_at_k for r in rows) > 0


def test_triplet_semihard_rule(spark):
    from iris_project_database_refresh_spark.operators.embeddings import (
        embed_triplet_semihard,
    )

    rows = embed_triplet_semihard(spark, SF_CORRECT).collect()
    assert len(rows) == 5  # one triplet per anchor
    for r in rows:
        assert r["pos_id"] != r["neg_id"]
        if r["violation"] == 0:
            # semi-hard: negative strictly below the positive
            assert r["neg_cosine"] < r["pos_cosine"]
            assert r["margin_micro"] >= 0
        else:
            # fallback: the hardest impostor outranks the positive
            assert r["neg_cosine"] >= r["pos_cosine"]


def test_knn_shapley_python_replay(spark):
    """Replay the closed-form recursion in plain python for one anchor
    and match the operator's values exactly (truncation dust included)."""
    import math

    from iris_project_database_refresh_spark.operators.embeddings import (
        KNN_SHAP_K,
        SHAP_SCALE,
        N_QUERIES,
        knn_shapley_values,
    )

    emb = {
        r["vec_id"]: (r["label"], list(r["embedding"]))
        for r in spark.read.parquet(SF_CORRECT + "/embeddings.parquet").collect()
    }
    a_label, a_vec = emb[0]
    qn = math.sqrt(sum(x * x for x in a_vec))
    scored = []
    for vid, (lbl, v) in emb.items():
        if vid == 0:
            continue
        dot = sum(float(x) * float(y) for x, y in zip(a_vec, v))
        cos = round(dot / (qn * math.sqrt(sum(float(x) ** 2 for x in v))), 6)
        scored.append((-cos, vid, 1 if lbl == a_label else 0))
    scored.sort()
    inds = [ind for _, _, ind in scored]
    n = len(inds)

    def tdiv(a, b):  # truncate toward zero, the cross-engine div
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    s = [0] * n
    s[n - 1] = tdiv(inds[n - 1] * SHAP_SCALE, n)
    for i in range(n - 2, -1, -1):  # ranks are 1-based: position i is rank i+1
        rank = i + 1
        term = tdiv(
            (inds[i] - inds[i + 1]) * min(KNN_SHAP_K, rank) * SHAP_SCALE,
            KNN_SHAP_K * rank,
        )
        s[i] = s[i + 1] + term
    by_vid = {vid: s[i] for i, (_, vid, _) in enumerate(scored)}
    got = {
        r["vec_id"]: r["shapley_e9"]
        for r in knn_shapley_values(spark, SF_CORRECT).collect()
        if r["anchor_id"] == 0
    }
    assert len(got) == 10
    for vid, val in got.items():
        assert by_vid[vid] == val, (vid, by_vid[vid], val)
    # the operator's top-10 really are the 10 largest replayed values
    top = sorted(by_vid.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert {vid for vid, _ in top} == set(got)


def test_multiprobe_recall_dominates_single(spark):
    from iris_project_database_refresh_spark.operators.embeddings import (
        knn_lsh_multiprobe,
    )

    rows = knn_lsh_multiprobe(spark, SF_CORRECT).collect()
    assert len(rows) == 5
    for r in rows:
        # superset of candidates can never lose exact-top-K members
        assert r["n_cand_multi"] >= r["n_cand_single"]
        assert r["recall_multi_bp"] >= r["recall_single_bp"]
        assert 0 <= r["recall_multi_bp"] <= 10000
    # the probes must actually help somewhere, else the op is vacuous
    assert any(r["recall_multi_bp"] > r["recall_single_bp"] for r in rows)


def test_planes_memo_invalidates_on_corpus_change(spark, tmp_path):
    """r7 ADVICE: the np memo must not survive an in-place corpus
    refresh — key is (dir, file signature), so rewriting
    embeddings.parquet under the SAME dir forces a recount and the
    plane count tracks the live corpus exactly like the DuckDB oracle's
    count(*)."""
    d = str(tmp_path)
    p = f"{d}/embeddings.parquet"
    spark.range(500).write.mode("overwrite").parquet(p)
    assert embeddings._planes_for(spark, d) == embeddings.LSH_PLANES  # floor
    # the refresh lands more vectors in place: m = ceil(8000/250) = 32
    # buckets -> np = 5, one past the floor
    spark.range(8000).write.mode("overwrite").parquet(p)
    assert embeddings._planes_for(spark, d) == embeddings._lsh_planes(8000) == 5


def test_mutual_graph_is_symmetric_subset(spark):
    """Every mutual edge appears in BOTH directions of knn_graph with
    the reported ranks; no one-directional edge survives."""
    g = {
        (r.vec_id, r.neighbor_id): r.rank
        for r in embeddings.knn_graph(spark, SF_CORRECT).collect()
    }
    mutual = embeddings.knn_mutual_graph(spark, SF_CORRECT).collect()
    assert mutual
    seen = set()
    for r in mutual:
        assert r.id_a < r.id_b
        assert g[(r.id_a, r.id_b)] == r.rank_ab
        assert g[(r.id_b, r.id_a)] == r.rank_ba
        seen.add((r.id_a, r.id_b))
    both_dirs = {
        (a, b) for (a, b) in g if a < b and (b, a) in g
    }
    assert seen == both_dirs


# --- exact→ANN backend dispatch (round-9 scale mechanization) ----------------

def _write_big_corpus(tmp_path, n=6000, dim=16):
    """Deterministic synthetic corpus ABOVE SIM_EXACT_MAX: clustered
    gaussians (so PAIR_TAU pairs and meaningful neighbors exist), no
    zero vectors, written in the production embeddings schema."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    centers = rng.normal(size=(20, dim))
    labels = rng.integers(0, 20, size=n)
    vecs = centers[labels] + 0.35 * rng.normal(size=(n, dim))
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [row.astype("float32") for row in vecs], pa.list_(pa.float32())
            ),
            "label": pa.array(labels.astype("int32"), pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    return vecs


@pytest.fixture(scope="module")
def big_corpus(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("bigemb")
    vecs = _write_big_corpus(tmp)
    return str(tmp), vecs


def _oracle_on(dirname):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{dirname}/embeddings.parquet')"
    )
    return con


def test_swapped_similarity_pairs_matches_oracle(spark, big_corpus):
    """Above SIM_EXACT_MAX the PRODUCTION paths of both engines must
    take the banded branch and agree exactly — the count-gated dispatch
    is in the committed SQL string, not a test-only variant."""
    d, _ = big_corpus
    assert embeddings._corpus_rows(spark, d) > embeddings.SIM_EXACT_MAX
    con = _oracle_on(d)
    try:
        assert_matches_oracle(
            embeddings.similarity_pairs(spark, d),
            con,
            embeddings.ORACLES["similarity_pairs"],
        )
    finally:
        con.close()


def test_swapped_knn_graph_matches_oracle_and_recall(spark, big_corpus):
    """Swapped knn_graph: cross-engine parity of the banded branch AND
    the recall-vs-exact delta the verdict asked to measure — the exact
    grain is recomputed in numpy (the same 6dp/id-tie ranking)."""
    import numpy as np

    d, vecs = big_corpus
    con = _oracle_on(d)
    try:
        spark_df = embeddings.knn_graph(spark, d)
        assert_matches_oracle(spark_df, con, embeddings.ORACLES["knn_graph"])
    finally:
        con.close()

    got = {}
    for r in spark_df.collect():
        got.setdefault(r.vec_id, set()).add(r.neighbor_id)
    # numpy exact grain (float32 storage → float64 math, like both engines)
    m = vecs.astype("float32").astype("float64")
    m /= np.linalg.norm(m, axis=1, keepdims=True)
    sims = np.round(m @ m.T, 6)
    np.fill_diagonal(sims, -2.0)
    n = len(m)
    k = embeddings.KNN_K
    hits = tot = 0
    for qi in range(0, n, 7):  # deterministic 1/7 sample keeps the test fast
        order = np.lexsort((np.arange(n), -sims[qi]))[:k]
        exact = set(order.tolist())
        tot += k
        hits += len(exact & got.get(qi, set()))
    recall = hits / tot
    # clustered corpus, 4 OR-amplified bands: high-recall regime; the
    # floor guards against a degenerate banding, the print records the
    # measured delta for BASELINE.md
    print(f"swapped knn_graph recall@{k} vs exact: {recall:.4f}")
    assert recall > 0.5


def test_dispatch_threshold_boundary(spark, tmp_path):
    """At exactly SIM_EXACT_MAX rows the exact backend runs (<=), one
    past it the banded backend runs — probed via the plan on BOTH
    sides of the boundary: the exact plan carries the block-pair
    columns (pa/pb with expr ids — bare "pa" would match "parquet"),
    the banded plan groups by (band, bucket)."""
    n = embeddings.SIM_EXACT_MAX
    d_at = tmp_path / "at"
    d_over = tmp_path / "over"
    d_at.mkdir()
    d_over.mkdir()
    _write_big_corpus(d_at, n=n)
    _write_big_corpus(d_over, n=n + 1)

    at = embeddings.knn_graph(spark, str(d_at))
    plan_at = at._jdf.queryExecution().analyzed().toString()
    assert "band" not in plan_at and "pa#" in plan_at and "pb#" in plan_at

    over = embeddings.knn_graph(spark, str(d_over))
    plan_over = over._jdf.queryExecution().analyzed().toString()
    assert "band" in plan_over and "pb#" not in plan_over


def test_lit_weights_match_md5_stream(spark):
    """`_plane_weights_py` (hashlib) must equal the per-row md5 bucket
    expression both engines evaluate — probed by bucketing a fixed
    vector with BOTH Spark forms and the DuckDB band SQL."""
    import duckdb

    from iris_project_database_refresh_spark.operators.embeddings import (
        _bucket_expr,
        _bucket_expr_lit,
        _bucket_sql_band,
        _plane_weights_py,
    )

    vec = [0.3, -1.2, 0.7, 2.5, -0.1, 1.9]
    np_, band = 5, 2
    df = spark.createDataFrame([(vec,)], "v array<double>").select(
        _bucket_expr(F_col := __import__("pyspark.sql.functions", fromlist=["col"]).col("v"), np_, offset=band * np_).alias("md5_form"),
        _bucket_expr_lit(F_col, _plane_weights_py(band * np_, np_, len(vec))).alias("lit_form"),
    )
    row = df.first()
    assert row.md5_form == row.lit_form
    sql = (
        f"WITH npl AS (SELECT {np_} AS np) "
        f"SELECT {_bucket_sql_band('v', str(band))} FROM "
        f"(SELECT {vec}::DOUBLE[] AS v), npl"
    )
    assert duckdb.sql(sql).fetchone()[0] == row.md5_form


def test_knn_graph_incremental_semantics(spark):
    """Python replay of the displacement rule on the sf0.01 corpus:
    every 'enter' row's (cosine, id) must beat the master's current
    K-th entry; every batch vector emits exactly K 'batch' rows ranked
    against master only; no batch id appears as a master vec_id."""
    from pyspark.sql import functions as F

    rows = embeddings.knn_graph_incremental(spark, SF_CORRECT).collect()
    batch_rows = [r for r in rows if r.kind == "batch"]
    enter_rows = [r for r in rows if r.kind == "enter"]
    assert batch_rows and enter_rows
    by_b = {}
    for r in batch_rows:
        assert r.vec_id % embeddings.KNN_BATCH_MOD == 3
        assert r.neighbor_id % embeddings.KNN_BATCH_MOD != 3
        by_b.setdefault(r.vec_id, []).append(r.rank)
    assert all(sorted(v) == list(range(1, embeddings.KNN_K + 1)) for v in by_b.values())
    g = {
        (r.vec_id, r.rank): (r.neighbor_id, r.cosine)
        for r in embeddings._knn_graph_exact_on(
            __import__(
                "iris_project_database_refresh_spark.sources.tables",
                fromlist=["load_table"],
            ).load_table(spark, SF_CORRECT, "embeddings")
            .where(F.pmod(F.col("vec_id"), embeddings.KNN_BATCH_MOD) != 3)
            .select("vec_id", "embedding")
        ).collect()
    }
    for r in enter_rows:
        assert r.vec_id % embeddings.KNN_BATCH_MOD != 3
        assert r.neighbor_id % embeddings.KNN_BATCH_MOD == 3
        kn, kc = g[(r.vec_id, embeddings.KNN_K)]
        # ahead of the K-th entry under (cosine desc, id asc)
        assert (-round(r.cosine * 1e6), r.neighbor_id) < (-round(kc * 1e6), kn)
        assert 1 <= r.rank <= embeddings.KNN_K


def test_swapped_knn_graph_incremental_matches_oracle(spark, big_corpus):
    """Above SIM_EXACT_MAX BOTH arms of the incremental refresh swap —
    the master-index stand-in AND the batch probe (a constant batch
    fraction makes the exact batch x master scan quadratic in the
    corpus; the 16x probe caught the first cut) — and the production
    count-gated oracle must match them exactly."""
    d, _ = big_corpus
    con = _oracle_on(d)
    try:
        assert_matches_oracle(
            embeddings.knn_graph_incremental(spark, d),
            con,
            embeddings.ORACLES["knn_graph_incremental"],
        )
    finally:
        con.close()


def test_sq8_recall_bounds(spark):
    """SQ8 keeps one byte per dimension, so its quantized-dot ranking
    must recover a solid share of the exact cosine top-K — far above
    the ~0.02 random floor — with every query covered and the bp
    arithmetic consistent."""
    rows = embeddings.embed_sq8_recall(spark, SF_CORRECT).collect()
    assert {r.query_id for r in rows} == set(range(embeddings.N_QUERIES))
    for r in rows:
        assert 0 <= r.overlap_at_k <= embeddings.KNN_K
        assert r.recall_bp == r.overlap_at_k * 10000 // embeddings.KNN_K
        assert r.recall_bp >= 3000
    assert sum(r.overlap_at_k for r in rows) >= embeddings.N_QUERIES * 5
