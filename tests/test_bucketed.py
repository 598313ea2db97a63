from __future__ import annotations

from pyspark.sql import functions as F

from iris_project_database_refresh_spark.sources import bucketed
from iris_project_database_refresh_spark.sources.tables import load_table

from .conftest import SF_SMOKE


def test_bucketed_join_has_no_exchange(spark):
    li_t, ord_t = bucketed.bucketize_order_tables(spark, SF_SMOKE, prefix="tb1")
    # at smoke scale the planner would broadcast the small side (which
    # disables bucketing); disable broadcast to get the plan the join
    # has at 100 TB, where both facts are large
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = bucketed.bucketed_order_join(spark, li_t, ord_t)
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # the whole point: co-located join, the shuffle was paid at write time
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan
    assert "Bucketed: true" in plan

    # and an aggregation on the bucket key also skips the exchange
    agg = (
        spark.table(li_t)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    agg_plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in agg_plan


def test_bucketed_join_matches_unbucketed(spark):
    li_t, ord_t = bucketed.bucketize_order_tables(spark, SF_SMOKE, prefix="tb2")
    got = (
        bucketed.bucketed_order_join(spark, li_t, ord_t)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    li = load_table(spark, SF_SMOKE, "lineitem")
    orders = load_table(spark, SF_SMOKE, "orders")
    want = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("l_extendedprice"), 2).alias("s"))
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))
