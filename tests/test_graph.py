from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import graph

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(graph.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        graph.QUERIES[name](spark, SF_CORRECT), oracle, graph.ORACLES[name]
    )


def test_pagerank_shape_and_authority(spark):
    rows = graph.pagerank_docs(spark, SF_CORRECT).collect()
    assert len(rows) == graph.TOP_K
    # sorted by rank desc with doc_id tie-break
    ranks = [r.rank_scaled for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # the planted graph concentrates mass: every top-20 node beats the
    # uniform prior SCALE/N (N=500 at sf0.01)
    assert all(r.rank_scaled > graph.SCALE // 500 for r in rows)
    # presentation rank is the scaled rank, floor-rounded to 6dp
    for r in rows:
        assert abs(r.rank - r.rank_scaled / graph.SCALE) < 1e-6


def test_triangle_count_ring_floor(spark):
    rows = graph.triangle_count(spark, SF_CORRECT).collect()
    assert len(rows) == graph.TRI_TOP
    total = rows[0].n_triangles_total
    assert all(r.n_triangles_total == total for r in rows)
    # the ring wedges (u, u+1, u+2) alone close N triangles
    assert total >= 500
    # participation is sorted desc with id tie-break
    counts = [r.n_triangles for r in rows]
    assert counts == sorted(counts, reverse=True)


def test_katz_centrality_python_replay(spark):
    """Katz is exactly reproducible from the planted edge formulas with
    plain-integer arithmetic — replay the attenuated path-count rounds
    in Python and compare the full top-K frame."""
    from iris_project_database_refresh_spark.sources.tables import load_table

    from .conftest import SF_CORRECT

    n = load_table(spark, SF_CORRECT, "documents").count()
    edges = []
    for u in range(n):
        for v in {(u * 31 + 7) % n, (u * 17 + 3) % n, (u * 13 + 11) % n, (u * 7 + 1) % min(n, 50)}:
            edges.append((u, v))
    t = [graph.SCALE] * n
    katz = [0] * n
    for _ in range(graph.KATZ_ITERS):
        m = [0] * n
        for u, v in edges:
            m[v] += t[u] // graph.KATZ_BETA_DEN
        t = m
        katz = [katz[i] + m[i] for i in range(n)]
    expect = sorted(range(n), key=lambda i: (-katz[i], i))[: graph.TOP_K]
    got = graph.graph_katz_centrality(spark, SF_CORRECT).collect()
    assert [r.doc_id for r in got] == expect
    assert [r.katz_scaled for r in got] == [katz[i] for i in expect]


def test_hits_duals_discriminate(spark):
    """Authorities concentrate on the planted hub targets (doc_id < 50)
    and scores are max-normalized (top authority == HITS_SCALE)."""
    from .conftest import SF_CORRECT

    rows = graph.graph_hits(spark, SF_CORRECT).collect()
    assert len(rows) == graph.TOP_K
    assert rows[0].authority_scaled == graph.HITS_SCALE
    assert all(r.doc_id < 50 for r in rows[:10])
    assert len({r.authority_scaled for r in rows}) > 10


def test_modularity_is_positive_for_lpa_partition(spark):
    from .conftest import SF_CORRECT as sf

    rows = graph.graph_modularity(spark, sf).collect()
    assert len(rows) == graph.LPA_TOP
    # communities LPA actually found should beat the configuration model
    assert sum(r["q_contrib_micro"] for r in rows) > 0
    for r in rows:
        # doubled-adjacency bookkeeping: internal edges can't exceed the
        # community's total degree mass
        assert 0 <= r["internal_edges"] * 2 <= r["degree_sum"]


def test_betweenness_python_replay(spark):
    """Replay bounded Brandes in plain python on the same planted graph."""
    from .conftest import SF_CORRECT as sf

    n = spark.read.parquet(sf + "/documents.parquet").count()
    adj = {}
    for u in range(n):
        for v in {(u * 31 + 7) % n, (u * 17 + 3) % n, (u * 13 + 11) % n}:
            if u != v:
                adj.setdefault(u, set()).add(v)
                adj.setdefault(v, set()).add(u)

    def tdiv(a, b):
        q = abs(a) // abs(b)
        return q if (a >= 0) == (b > 0) else -q

    bc = {}
    for seed in graph.BC_SEEDS:
        levels = [{seed: 1}]
        seen = {seed}
        for _ in range(graph.BC_ROUNDS):
            nxt = {}
            for u, sig in levels[-1].items():
                for v in adj.get(u, ()):
                    if v not in seen:
                        nxt[v] = nxt.get(v, 0) + sig
            seen |= set(nxt)
            levels.append(nxt)
        delta = {}
        for r in range(graph.BC_ROUNDS - 1, -1, -1):
            cur = {}
            for v, sig in levels[r].items():
                tot = 0
                hit = False
                for w in adj.get(v, ()):
                    if w in levels[r + 1]:
                        hit = True
                        tot += tdiv(
                            sig * (graph.BC_SCALE + delta.get(w, 0)),
                            levels[r + 1][w],
                        )
                if hit:
                    cur[v] = tot
            delta = cur
            if r > 0:
                for v, d in cur.items():
                    bc[v] = bc.get(v, 0) + d
    want = sorted(bc.items(), key=lambda kv: (-kv[1], kv[0]))[: graph.TOP_K]
    got = [
        (r["node"], r["bc_micro"])
        for r in graph.graph_betweenness(spark, sf).collect()
    ]
    assert got == want
