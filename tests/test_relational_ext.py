from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import relational_ext

from .conftest import SF_CORRECT, assert_matches_oracle


@pytest.mark.parametrize("name", sorted(relational_ext.QUERIES))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(
        relational_ext.QUERIES[name](spark, SF_CORRECT), oracle, relational_ext.ORACLES[name]
    )


def test_q4_uses_semi_join(spark):
    plan = (
        relational_ext.q4_order_priority(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "LeftSemi" in plan


def test_q6_filters_pushed(spark):
    plan = (
        relational_ext.q6_revenue_change(spark, SF_CORRECT)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PushedFilters: [" in plan and "l_shipdate" in plan and "l_quantity" in plan


def test_backlog_conserves_orders(spark):
    """Sweep-line invariant: total opened == total closed == orders with
    lines, and the backlog returns to zero at the end of the horizon."""
    from iris_project_database_refresh_spark.operators.relational_ext import (
        orders_open_backlog,
    )

    rows = sorted(orders_open_backlog(spark, SF_CORRECT).collect(), key=lambda r: r.day)
    assert sum(r.n_opened for r in rows) == sum(r.n_closed for r in rows)
    assert rows[-1].open_backlog == 0
    assert all(r.open_backlog >= 0 for r in rows)


def test_copurchase_lift_sane(spark):
    from iris_project_database_refresh_spark.operators.relational_ext import (
        BASKET_MIN_PAIR,
        BASKET_TOP,
        part_copurchase_lift,
    )

    rows = part_copurchase_lift(spark, SF_CORRECT).collect()
    assert len(rows) == BASKET_TOP
    for r in rows:
        assert r.part_a < r.part_b
        assert r.n_ab >= BASKET_MIN_PAIR
        assert r.n_ab <= min(r.n_a, r.n_b)
        assert r.lift > 0
    supports = [r.n_ab for r in rows]
    assert supports == sorted(supports, reverse=True)


def test_copurchase_mega_basket_capped(spark, tmp_path):
    """The mega-basket cap bounds pair fan-out: a planted order with 200
    distinct parts (which alone would emit 19,900 pairs into one join
    key) is dropped entirely — its exclusive parts never reach the
    output, the surviving per-basket fan-out is bounded by BASKET_CAP,
    and the capped Spark plan still matches the capped oracle on the
    planted corpus."""
    import duckdb

    from iris_project_database_refresh_spark.operators.relational_ext import (
        BASKET_CAP,
        COPURCHASE_SQL,
        part_copurchase_lift,
    )
    from iris_project_database_refresh_spark.sources.tables import load_table

    from .conftest import assert_matches_oracle

    base = load_table(spark, "/root/testdata/sf0.001", "lineitem")
    mega = spark.createDataFrame(
        [(77_000_001, 10_000_000 + i) for i in range(200)]
        # plus 40 normal planted baskets sharing one pair — support 40
        # dominates the sf0.001 corpus, so the pair must reach the top-20
        + [(77_000_002 + j, 10_000_300 + k) for j in range(40) for k in range(2)],
        "l_orderkey bigint, l_partkey bigint",
    )
    planted = base.select("l_orderkey", "l_partkey").unionByName(mega)
    out = str(tmp_path / "sf_planted")
    planted.coalesce(1).write.mode("overwrite").parquet(out + "/lineitem.parquet")

    df = part_copurchase_lift(spark, out)
    rows = df.collect()
    mega_parts = {10_000_000 + i for i in range(200)}
    assert all(
        r.part_a not in mega_parts and r.part_b not in mega_parts for r in rows
    ), "mega-basket parts leaked through the cap"
    # the planted normal pair (within cap) survives
    assert any(r.part_a == 10_000_300 and r.part_b == 10_000_301 for r in rows)

    # fan-out bound: no surviving basket exceeds BASKET_CAP parts
    capped = (
        load_table(spark, out, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .groupBy("l_orderkey")
        .count()
    )
    assert capped.filter(f"count > {BASKET_CAP}").count() == 1  # only the mega order

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{out}/lineitem.parquet/*.parquet')"
    )
    assert_matches_oracle(df, con, COPURCHASE_SQL)
    con.close()


def test_trade_matrix_complete_and_stochastic(spark):
    from iris_project_database_refresh_spark.operators.relational_ext import (
        nation_trade_matrix,
    )

    rows = nation_trade_matrix(spark, SF_CORRECT).collect()
    # full 25x25 bilateral matrix at this SF
    assert len(rows) == 625
    shares = {}
    for r in rows:
        shares.setdefault(r.supp_nation, 0.0)
        shares[r.supp_nation] += r.export_share
    assert all(abs(s - 1.0) < 1e-3 for s in shares.values())


def test_wilson_bound_below_rate(spark):
    from iris_project_database_refresh_spark.operators.relational_ext import (
        brand_return_rates,
    )

    rows = brand_return_rates(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert 0 <= r.wilson_lower <= r.return_rate <= 1
        assert r.n_returned <= r.n_lines


def test_refresh_streams_keep_referential_integrity(spark):
    rows = relational_ext.orders_refresh_streams(spark, SF_CORRECT).collect()
    assert rows
    assert all(r.n_orphan_lineitems == 0 for r in rows)
    # the streams really changed the table
    assert sum(r.orders_before for r in rows) != sum(r.orders_after for r in rows)


def test_price_index_brackets_fisher(spark):
    """Fisher must lie between Laspeyres and Paasche (geometric mean),
    and every index is positive."""
    from iris_project_database_refresh_spark.operators.relational_ext import (
        price_index_monthly,
    )

    from .conftest import SF_CORRECT

    rows = price_index_monthly(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        lo, hi = sorted((r.laspeyres_bp, r.paasche_bp))
        assert lo - 1 <= r.fisher_bp <= hi + 1
        assert r.laspeyres_bp > 0 and r.paasche_bp > 0


def test_duplicate_payment_gates(spark):
    """Every emitted pair satisfies both gates and is ordered k1 < k2."""
    from iris_project_database_refresh_spark.operators import relational_ext as rx

    from .conftest import SF_CORRECT

    rows = rx.orders_duplicate_payment_screen(spark, SF_CORRECT).collect()
    assert rows
    for r in rows:
        assert r.k1 < r.k2
        assert r.cents_diff * 10000 <= r.cents_1 * rx.DUP_TOL_BP
        assert r.day_gap <= rx.DUP_WINDOW_DAYS


def test_knapsack_prefix_and_bound(spark):
    from iris_project_database_refresh_spark.operators.relational_ext import (
        part_knapsack_greedy,
    )
    from .conftest import SF_CORRECT as sf

    rows = part_knapsack_greedy(spark, sf).collect()
    assert rows
    r0 = rows[0]
    assert r0["weight_taken"] <= r0["budget"]
    assert r0["lp_bound_cents"] >= r0["value_taken"]
    assert 0 <= r0["gap_bound_bp"] <= 10000
    # brand rollup reassembles the taken set exactly
    assert sum(r["brand_weight"] for r in rows) == r0["weight_taken"]
    assert sum(r["brand_cents"] for r in rows) == r0["value_taken"]


def test_eoq_newsvendor_properties(spark):
    from iris_project_database_refresh_spark.operators.relational_ext import (
        part_eoq_newsvendor,
    )
    from .conftest import SF_CORRECT as sf

    rows = part_eoq_newsvendor(spark, sf).collect()
    assert len(rows) == 25
    for r in rows:
        # EOQ grows with demand: check the closed form directly
        import math

        want = math.floor(
            math.sqrt(2 * r["annual_demand"] * 50000 / 700)
        )
        assert r["eoq_units"] == want
        # 3/4 fractile sits in the quantity domain, above the median-ish
        assert 1 <= r["newsvendor_q"] <= 50
        assert r["newsvendor_q"] >= 25  # uniform-ish demand -> upper half


def test_frequent_triples_apriori_consistency(spark):
    """Every reported triple's support must be <= each sub-pair's
    support (apriori monotonicity) and >= the minsup gate."""
    from iris_project_database_refresh_spark.operators import relational_ext as rx
    from .conftest import SF_CORRECT

    rows = rx.brand_frequent_triples(spark, SF_CORRECT).collect()
    assert 0 < len(rows) <= rx.TRIPLE_TOPN
    assert all(r.support >= rx.TRIPLE_S3 for r in rows)
    assert all(r.brand_a < r.brand_b < r.brand_c for r in rows)
    assert all(r.lift_micro > 0 for r in rows)
