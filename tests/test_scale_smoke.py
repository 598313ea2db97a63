"""10x scale-up smoke: replicate sf0.1 in-plan and check the aggregate
plans still behave (results scale exactly; runtime stays bounded)."""
from __future__ import annotations

from functools import reduce

import pyspark.sql.functions as F

from iris_project_database_refresh_spark.sources.tables import load_table

SF_BENCH = "/root/testdata/sf0.1"
REPL = 10


def test_q1_scales_linearly(spark):
    li = load_table(spark, SF_BENCH, "lineitem")
    big = reduce(lambda a, b: a.unionAll(b), [li] * REPL)

    def q1(df):
        return (
            df.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(
                F.sum("l_quantity").alias("sum_qty"),
                F.count(F.lit(1)).alias("n"),
                F.avg("l_discount").alias("avg_disc"),
            )
        )

    base = {(r.l_returnflag, r.l_linestatus): r for r in q1(li).collect()}
    scaled = {(r.l_returnflag, r.l_linestatus): r for r in q1(big).collect()}
    assert set(base) == set(scaled)
    for k, b in base.items():
        s = scaled[k]
        assert s.n == b.n * REPL
        assert abs(s.sum_qty - b.sum_qty * REPL) < 1e-4
        assert abs(s.avg_disc - b.avg_disc) < 1e-9


def test_join_agg_scales(spark):
    orders = load_table(spark, SF_BENCH, "orders")
    li = load_table(spark, SF_BENCH, "lineitem")
    big_li = reduce(lambda a, b: a.unionAll(b), [li] * REPL)
    joined = (
        big_li.join(orders, big_li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    base = {
        r.o_orderstatus: r.n
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    got = {r.o_orderstatus: r.n for r in joined.collect()}
    assert got == {k: v * REPL for k, v in base.items()}
