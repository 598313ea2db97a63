

def test_chain_ladder_invariants(spark):
    """Factors develop censored cohorts only: fully-observed cohorts
    (obs_dev = CL_MAX_DEV) carry zero reserve, every ultimate is >= the
    latest diagonal (factors >= 1 on cumulative counts), and censored
    cohorts exist in the data."""
    from iris_project_database_refresh_spark.operators import warehouse as wh
    from .conftest import SF_CORRECT

    rows = wh.orders_chain_ladder(spark, SF_CORRECT).collect()
    assert rows
    full = [r for r in rows if r.obs_dev == wh.CL_MAX_DEV]
    censored = [r for r in rows if r.obs_dev < wh.CL_MAX_DEV]
    assert full and censored
    assert all(r.reserve_milli == 0 for r in full)
    assert all(r.ultimate_milli >= r.latest_cum * 1000 for r in rows)


def test_lineitem_orderkey_referential_integrity(spark):
    """orders_chain_ladder's censoring cutoff is computed from lineitem
    ALONE (r10 optimization: one fewer pass over the fact join); that
    equals the oracle's max over the orders inner join only under
    referential integrity — every l_orderkey present in orders. Machine-
    check the invariant the optimization narrates (r10 ADVICE item)."""
    from iris_project_database_refresh_spark.sources.tables import load_table

    from .conftest import SF_CORRECT

    li = load_table(spark, SF_CORRECT, "lineitem").select("l_orderkey")
    o = load_table(spark, SF_CORRECT, "orders").select("o_orderkey")
    orphans = li.join(
        o, li.l_orderkey == o.o_orderkey, "left_anti"
    ).count()
    assert orphans == 0
