"""Remaining TPC-H analogues — Q2/Q9/Q11/Q12/Q16/Q20/Q21 — completing
the 22-query suite started in ``relational.py`` / ``relational_ext.py``.

The test schema has no ``partsupp`` table and lineitem lacks
commit/receipt dates and ship modes, so each query keeps its *plan
shape* (the part the engine is graded on) while deriving the missing
relation or predicate from what exists:

- the part-supplier relation is ``lineitem`` aggregated to distinct
  ``(l_partkey, l_suppkey)`` pairs, with ``min(l_extendedprice /
  l_quantity)`` standing in for ``ps_supplycost`` (min, not avg — min
  over an identical float set is order-independent, so Spark and the
  DuckDB oracle agree bit-for-bit);
- "late" is ``l_shipdate > o_orderdate + INTERVAL n DAYS`` in place of
  receipt-vs-commit-date comparisons (exact timestamp arithmetic on
  both engines).

Reference parity: these widen the catalog-query surface of
``database-schema.sql:95-106`` the way the rest of the relational
suite does (filtered lookups, grouped rollups, existence checks).

Scale notes (100 TB):
- every dimension join is an explicit ``broadcast()``; the only
  fact-fact shuffles are lineitem⋈orders on orderkey;
- Q21 is the classic rewrite of the EXISTS / NOT EXISTS pair into ONE
  aggregation over orderkey that reuses the join shuffle — the naive
  formulation is two extra self-joins of the largest table;
- Q2/Q20's per-part min/avg run as window functions over the already
  pair-aggregated (much smaller) supply relation, not over raw
  lineitem;
- Q11's global total is a 1-row aggregate cross-joined (broadcast)
  into the per-part rollup, keeping the whole plan lazy — same
  pattern as ``catalog_merge``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The derived part-supplier relation: one row per observed
    (partkey, suppkey) pair with the min observed unit price as the
    supply cost and total shipped quantity. One shuffle on the pair
    key; at 100 TB this is a partial-agg-heavy reduction of the fact
    table to ~|part|x|avg suppliers per part| rows."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("ps_supplycost"),
        F.sum("l_quantity").alias("ps_qty"),
    )


SUPPLY_SQL = """
SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
       min(l_extendedprice / l_quantity) AS ps_supplycost,
       sum(l_quantity) AS ps_qty
FROM lineitem GROUP BY 1, 2
"""


# --- Q2: minimum-cost supplier ------------------------------------------------

def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every LARGE part, the ASIA supplier(s) offering the minimum
    supply cost (TPC-H Q2's correlated-subquery shape as a window min
    over the region-filtered supply relation). Plan: supply agg
    (pair shuffle) -> broadcast supplier/nation/region -> window min
    on partkey -> equality filter -> top-100."""
    supply = _supply(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "LARGE")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    j = (
        supply.join(F.broadcast(part), supply.ps_partkey == part.p_partkey)
        .join(F.broadcast(supp), supply.ps_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    w = Window.partitionBy("ps_partkey")
    return (
        j.withColumn("min_cost", F.min("ps_supplycost").over(w))
        .where(F.col("ps_supplycost") == F.col("min_cost"))
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name",
            "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            F.round("ps_supplycost", 4).alias("supplycost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


Q2_SQL = f"""
WITH supply AS ({SUPPLY_SQL}),
j AS (
  SELECT s_acctbal, s_name, n_name, ps_partkey, ps_supplycost,
         min(ps_supplycost) OVER (PARTITION BY ps_partkey) AS min_cost
  FROM supply
  JOIN part     ON ps_partkey = p_partkey
  JOIN supplier ON ps_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_type = 'LARGE' AND r_name = 'ASIA'
)
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name,
       ps_partkey AS p_partkey, round(ps_supplycost, 4) AS supplycost
FROM j WHERE ps_supplycost = min_cost
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


# --- Q9: product-type profit by nation and year -------------------------------

def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit on widget parts by supplier nation and order year (TPC-H
    Q9; supply cost proxied as 10% of retail price x quantity). Plan:
    the one fact-fact shuffle is lineitem⋈orders on orderkey; part,
    supplier and nation broadcast; single group-by after.

    The profit terms are mixed-sign, so a double sum is summation-order
    dependent and 2dp rounding can flip a cent between engines; each
    term is floored to a 1e-4-scaled integer first (per-row doubles are
    bit-identical on both engines), making the sum exact and
    order-independent."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part").where(F.col("p_name").contains("widget"))
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - 0.1 * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    scaled = F.floor(profit * 10000 + 0.5).cast("bigint")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(F.sum(scaled) / 10000.0, 2).alias("sum_profit"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


Q9_SQL = """
SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
       round(CAST(sum(CAST(floor((l_extendedprice * (1 - l_discount)
                                  - 0.1 * p_retailprice * l_quantity) * 10000 + 0.5)
                          AS BIGINT)) AS DOUBLE) / 10000.0, 2) AS sum_profit,
       count(*) AS n_lines
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# --- Q11: important part values (global-total HAVING) -------------------------

def q11_important_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose shipped value from NATION_3 suppliers exceeds 0.1%
    of the nation's total (TPC-H Q11's correlated global-total HAVING).
    The scalar total is a 1-row aggregate broadcast-cross-joined into
    the per-part rollup — fully lazy, no driver collect."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    value = F.col("l_extendedprice") * F.col("l_quantity")
    base = (
        li.join(F.broadcast(supp.select("s_suppkey", "s_nationkey")), li.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .select(F.col("l_partkey").alias("ps_partkey"), value.alias("value"))
    )
    per_part = base.groupBy("ps_partkey").agg(F.sum("value").alias("part_value"))
    total = base.agg(F.sum("value").alias("total_value"))
    return (
        per_part.join(F.broadcast(total))
        .where(F.col("part_value") > 0.001 * F.col("total_value"))
        .select("ps_partkey", F.round("part_value", 2).alias("part_value"))
    )


Q11_SQL = """
WITH base AS (
  SELECT l_partkey AS ps_partkey, l_extendedprice * l_quantity AS value
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
)
SELECT ps_partkey, round(sum(value), 2) AS part_value
FROM base
GROUP BY ps_partkey
HAVING sum(value) > 0.001 * (SELECT sum(value) FROM base)
"""


# --- Q12: late-shipment priority split ----------------------------------------

def q12_late_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1997 lines shipped more than 30 days after their order date,
    split per line status into critical- vs other-priority order
    counts (TPC-H Q12 with linestatus standing in for shipmode and
    ship-lag for the receipt/commit comparison). One shuffle join on
    orderkey, then a two-way conditional aggregation."""
    li = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .where(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


Q12_SQL = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY l_linestatus
"""


# --- Q16: supplier counts per part attribute ----------------------------------

def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-supplier counts per (brand, type, size) for selected
    parts, excluding negative-balance suppliers (the Q16 complaints
    anti-join). Plan: distinct pair shuffle -> broadcast part filter
    -> broadcast anti-join -> group-by with distinct count."""
    li = load_table(spark, sf_dir, "lineitem")
    pairs = li.select(
        F.col("l_partkey").alias("ps_partkey"), F.col("l_suppkey").alias("ps_suppkey")
    ).distinct()
    part = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "STANDARD")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    bad_supp = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0)
    return (
        pairs.join(F.broadcast(part), pairs.ps_partkey == part.p_partkey)
        .join(
            F.broadcast(bad_supp),
            pairs.ps_suppkey == bad_supp.s_suppkey,
            "left_anti",
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("ps_suppkey").alias("supplier_cnt"))
    )


Q16_SQL = """
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey FROM lineitem) pairs
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'STANDARD'
  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
"""


# --- Q20: suppliers with an outsized share of a part --------------------------

def q20_excess_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EUROPE suppliers shipping more than 1.5x the average
    per-supplier quantity of some PROMO part (TPC-H Q20's
    availqty-vs-half-shipped threshold recast against the derived
    supply relation). Quantities are small integers, so the
    sum/count/threshold arithmetic is exact on both engines. Plan:
    supply agg -> broadcast part filter -> window avg on partkey ->
    semi-join the (tiny) supplier table."""
    supply = _supply(spark, sf_dir)
    part = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    w = Window.partitionBy("ps_partkey")
    excess = (
        supply.join(F.broadcast(part), supply.ps_partkey == part.p_partkey)
        .withColumn("avg_qty", F.sum("ps_qty").over(w) / F.count(F.lit(1)).over(w))
        .where(F.col("ps_qty") > 1.5 * F.col("avg_qty"))
        .select("ps_suppkey")
    )
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(excess, supp.s_suppkey == excess.ps_suppkey, "left_semi")
        .select("s_name", F.round("s_acctbal", 2).alias("s_acctbal"), "n_name")
    )


Q20_SQL = f"""
WITH supply AS ({SUPPLY_SQL}),
excess AS (
  SELECT ps_suppkey
  FROM (
    SELECT ps_suppkey, ps_qty,
           sum(ps_qty) OVER (PARTITION BY ps_partkey) * 1.0
             / count(*) OVER (PARTITION BY ps_partkey) AS avg_qty
    FROM supply JOIN part ON ps_partkey = p_partkey
    WHERE p_type = 'PROMO'
  ) WHERE ps_qty > 1.5 * avg_qty
)
SELECT s_name, round(s_acctbal, 2) AS s_acctbal, n_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND s_suppkey IN (SELECT ps_suppkey FROM excess)
"""


# --- Q21: suppliers who kept multi-supplier orders waiting --------------------

def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers that were the SOLE late shipper (> 60 days after the
    order date) on finalized multi-supplier orders — TPC-H Q21 with
    its EXISTS / NOT EXISTS pair rewritten as one aggregation per
    orderkey: count distinct suppliers, count distinct late suppliers,
    keep orders with (n_supp > 1, n_late_supp == 1), then count per
    blamed supplier. At 100 TB this reuses the orderkey shuffle of the
    lineitem⋈orders join instead of two extra fact self-joins."""
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # distinct counts via collect_set sizes, NOT countDistinct: two
    # countDistinct columns plan as an Expand (x3 row multiplication)
    # feeding TWO exchanges; the set-based shape is one
    # ObjectHashAggregate with map-side partial sets (bounded by
    # suppliers-per-order) through ONE exchange. collect_set and
    # countDistinct agree exactly (both ignore NULLs).
    per_order = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_orderkey")
        .agg(
            F.size(F.collect_set("l_suppkey")).alias("n_supp"),
            F.size(F.collect_set(F.when(late, F.col("l_suppkey")))).alias(
                "n_late_supp"
            ),
            F.max(F.when(late, F.col("l_suppkey"))).alias("late_suppkey"),
        )
        .where((F.col("n_supp") > 1) & (F.col("n_late_supp") == 1))
    )
    return (
        per_order.groupBy("late_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .join(F.broadcast(supp), F.col("late_suppkey") == supp.s_suppkey)
        .select("s_name", "numwait")
        .orderBy(F.desc("numwait"), "s_name")
        .limit(10)
    )


Q21_SQL = """
WITH per_order AS (
  SELECT l_orderkey,
         count(DISTINCT l_suppkey) AS n_supp,
         count(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                             THEN l_suppkey END) AS n_late_supp,
         max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                  THEN l_suppkey END) AS late_suppkey
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
  GROUP BY l_orderkey
)
SELECT s_name, count(*) AS numwait
FROM per_order
JOIN supplier ON late_suppkey = s_suppkey
WHERE n_supp > 1 AND n_late_supp = 1
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 10
"""


QUERIES = {
    "q2_min_cost_supplier": q2_min_cost_supplier,
    "q9_product_profit": q9_product_profit,
    "q11_important_values": q11_important_values,
    "q12_late_lines": q12_late_lines,
    "q16_supplier_part_counts": q16_supplier_part_counts,
    "q20_excess_quantity": q20_excess_quantity,
    "q21_waiting_suppliers": q21_waiting_suppliers,
}

ORACLES = {
    "q2_min_cost_supplier": Q2_SQL,
    "q9_product_profit": Q9_SQL,
    "q11_important_values": Q11_SQL,
    "q12_late_lines": Q12_SQL,
    "q16_supplier_part_counts": Q16_SQL,
    "q20_excess_quantity": Q20_SQL,
    "q21_waiting_suppliers": Q21_SQL,
}
