"""Relational query surface.

The reference's query semantics (filter/ILIKE catalog lookup —
`database-schema.sql:95-98`; ordered content retrieval; process-monitor
rollups — `database-schema.sql:101-106`) are scan→filter→join→agg→window
plans. We exercise them TPC-H-style on the test corpus so correctness is
oracle-checkable and the physical plans are representative of 100 TB
fact/dim workloads.

Scale notes
-----------
* Dim tables (region/nation/customer at TPC-H ratios) are broadcast —
  explicit ``F.broadcast`` so the plan never degenerates to a
  sort-merge join on a small side even if stats are stale.
* Fact-fact joins (orders⋈lineitem) shuffle on the join key; AQE
  coalesces/splits partitions at runtime.
* Every predicate is a simple column comparison so it pushes into the
  parquet scan (verified in tests via PushedFilters).
* All double aggregates are explicitly rounded — both for deterministic
  cross-engine comparison and because downstream consumers of the
  reference's CSVs expect fixed-precision money columns
  (`catalog search/stage5_output_final_csv.py:316` prepare_final_csv).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


# --- TPC-H Q1 style: scan-filter-aggregate ---------------------------------

def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                        AS sum_qty,
       round(sum(l_extendedprice), 2)                                   AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
       round(avg(l_quantity), 6)                                        AS avg_qty,
       round(avg(l_extendedprice), 6)                                   AS avg_price,
       round(avg(l_discount), 6)                                        AS avg_disc,
       count(*)                                                         AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


# --- TPC-H Q3 style: join + agg + top-N ------------------------------------

def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").where(F.col("o_orderdate") < F.lit("1998-03-15").cast("timestamp"))
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_shipdate") > F.lit("1998-03-15").cast("timestamp"))
    # customer side is a filtered dim → broadcast; orders⋈lineitem is the
    # fact-fact shuffle join on l_orderkey.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", F.col("o_orderdate").cast("timestamp").alias("o_orderdate"), "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


Q3_SQL = """
SELECT l_orderkey, o_orderdate, o_orderpriority,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, o_orderdate, l_orderkey
LIMIT 10
"""


# --- TPC-H Q5 style: 6-way join --------------------------------------------

def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    # region→nation→(customer, supplier) are all broadcastable dims; the
    # only large shuffles are orders⋈lineitem on orderkey.
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .where(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


Q5_SQL = """
SELECT n_name,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


# --- window ranking (content-retrieval ORDER BY semantics) ------------------

def top_customers_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation.

    Mirrors the reference's ordered retrieval (ORDER BY chapter_number,
    section_number, chunk_number — database-schema.sql:98) as a window
    ranking. Deterministic tiebreak on custkey.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("c_nationkey").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.withColumn("rank_in_nation", F.row_number().over(w))
        .where(F.col("rank_in_nation") <= 3)
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            "n_name",
            "c_custkey",
            "c_name",
            F.round("c_acctbal", 2).alias("acctbal"),
            F.col("rank_in_nation").cast("bigint").alias("rank_in_nation"),
        )
    )


TOP_CUSTOMERS_SQL = """
SELECT n_name, c_custkey, c_name, round(c_acctbal, 2) AS acctbal, CAST(rank_in_nation AS BIGINT) AS rank_in_nation
FROM (
  SELECT c_custkey, c_name, c_nationkey, c_acctbal,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey ASC) AS rank_in_nation
  FROM customer
) r
JOIN nation ON c_nationkey = n_nationkey
WHERE rank_in_nation <= 3
"""


# --- process-monitor rollup over events -------------------------------------

def monitor_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-stage/time-bucket rollup.

    process_monitor_logs semantics (`database-schema.sql:258-280`:
    duration/total_tokens/total_cost per stage): events.event_type plays
    stage_name, value plays cost. Hourly tumbling buckets via
    date_trunc — a pure map-side expression, so the only shuffle is the
    final aggregation on (bucket, type).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("bucket"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.round(F.avg("value"), 6).alias("avg_value"),
            F.round(F.min("value"), 6).alias("min_value"),
            F.round(F.max("value"), 6).alias("max_value"),
        )
    )


MONITOR_ROLLUP_SQL = """
SELECT date_trunc('hour', ts)    AS bucket,
       event_type,
       count(*)                  AS n_events,
       count(DISTINCT user_id)   AS n_users,
       round(sum(value), 2)      AS sum_value,
       round(avg(value), 6)      AS avg_value,
       round(min(value), 6)      AS min_value,
       round(max(value), 6)      AS max_value
FROM events
GROUP BY 1, 2
"""


# --- gap sessionization ------------------------------------------------------

SESSION_GAP_MIN = 30


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions per user (30-min inactivity closes a session).

    Two windows over the same (user_id, ts) partitioning — Spark executes
    both in a single shuffle+sort, which is the plan you want at scale:
    one pass, no self-join.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("long") - F.lag(F.col("ts").cast("long")).over(w)
    new_session = F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60), 1).otherwise(0)
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        ev.withColumn("session_id", F.sum(new_session).over(wcum))
        .groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


SESSIONIZE_SQL = f"""
WITH events_us AS (
  -- align to Spark's microsecond timestamps (source parquet is nanos)
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
), flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN ts - lag(ts) OVER w <= INTERVAL {SESSION_GAP_MIN} MINUTE THEN 0 ELSE 1 END AS new_session
  FROM events_us
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), numbered AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       min(ts)              AS session_start,
       max(ts)              AS session_end,
       count(*)             AS n_events,
       round(sum(value), 2) AS sum_value
FROM numbered
GROUP BY user_id, session_id
"""


# --- as-of join --------------------------------------------------------------

def as_of_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each purchase, the most recent prior view by the same user.

    Scalable as-of pattern: instead of a range self-join (quadratic per
    user), carry the view timestamp forward with
    ``last(..., ignorenulls)`` over one sorted window — a single
    shuffle on user_id regardless of data size.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type").isin("view", "purchase"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    return (
        ev.withColumn("last_view_ts", F.last(view_ts, ignorenulls=True).over(w))
        .where(F.col("event_type") == "purchase")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.round("value", 6).alias("value"),
            "last_view_ts",
            (F.col("ts").cast("long") - F.col("last_view_ts").cast("long")).alias("secs_since_view"),
        )
    )


AS_OF_SQL = """
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
), ev AS (
  SELECT * FROM events_us WHERE event_type IN ('view', 'purchase')
), carried AS (
  SELECT event_id, user_id, ts, value, event_type,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
  FROM ev
)
SELECT event_id, user_id, ts, round(value, 6) AS value, last_view_ts,
       CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(last_view_ts)) AS BIGINT) AS secs_since_view
FROM carried
WHERE event_type = 'purchase'
"""


# --- JSON props parsing ------------------------------------------------------

def parse_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON props column + aggregation.

    Mirrors the reference's JSONB ``llm_calls`` rollup
    (`database-schema.sql:267-269`: total_tokens/total_cost are sums over
    a JSON array). ``get_json_object`` is a JVM expression — no Python.
    """
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("bigint")
    return (
        ev.withColumn("k", k)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


PARSE_PROPS_SQL = """
SELECT event_type,
       count(*)                                              AS n_events,
       CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT)      AS sum_k,
       round(avg(CAST(props->>'k' AS BIGINT)), 6)            AS avg_k,
       min(CAST(props->>'k' AS BIGINT))                      AS min_k,
       max(CAST(props->>'k' AS BIGINT))                      AS max_k
FROM events
GROUP BY event_type
"""


QUERIES = {
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "top_customers_window": top_customers_window,
    "monitor_rollup": monitor_rollup,
    "sessionize": sessionize,
    "as_of_join": as_of_join,
    "parse_props": parse_props,
}

ORACLES = {
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "top_customers_window": TOP_CUSTOMERS_SQL,
    "monitor_rollup": MONITOR_ROLLUP_SQL,
    "sessionize": SESSIONIZE_SQL,
    "as_of_join": AS_OF_SQL,
    "parse_props": PARSE_PROPS_SQL,
}


# --- as-of join with direction + tolerance -----------------------------------

ASOF_TOLERANCE_S = 1800  # 30 min


def as_of_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """merge_asof-complete variant of `as_of_join`: BOTH directions
    (most recent prior view AND next following view per purchase) with
    a 30-minute tolerance — matches outside it are nulled, pandas
    merge_asof semantics.

    Same scalable carried-window shape as `as_of_join` (one user_id
    shuffle, no range self-join): the backward match rides
    last(ignorenulls) over preceding rows, the forward match rides
    first(ignorenulls) over following rows — both directions share the
    one sort.
    """
    ev = load_table(spark, sf_dir, "events").where(F.col("event_type").isin("view", "purchase"))
    wb = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    )
    wf = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.currentRow + 1, Window.unboundedFollowing)
    )
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    raw = (
        ev.withColumn("back_raw", F.last(view_ts, ignorenulls=True).over(wb))
        .withColumn("fwd_raw", F.first(view_ts, ignorenulls=True).over(wf))
        .where(F.col("event_type") == "purchase")
    )
    back_secs = F.col("ts").cast("long") - F.col("back_raw").cast("long")
    fwd_secs = F.col("fwd_raw").cast("long") - F.col("ts").cast("long")
    back_ok = back_secs <= ASOF_TOLERANCE_S
    fwd_ok = fwd_secs <= ASOF_TOLERANCE_S
    return raw.select(
        "event_id",
        "user_id",
        "ts",
        F.when(back_ok, F.col("back_raw")).alias("back_view_ts"),
        F.when(back_ok, back_secs).alias("back_secs"),
        F.when(fwd_ok, F.col("fwd_raw")).alias("fwd_view_ts"),
        F.when(fwd_ok, fwd_secs).alias("fwd_secs"),
        (back_ok.cast("int") + F.lit(0)).alias("back_matched"),
        (fwd_ok.cast("int") + F.lit(0)).alias("fwd_matched"),
    ).fillna({"back_matched": 0, "fwd_matched": 0})


AS_OF_TOLERANCE_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
), ev AS (
  SELECT * FROM events_us WHERE event_type IN ('view', 'purchase')
), carried AS (
  SELECT event_id, user_id, ts, event_type,
         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS back_raw,
         first_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS fwd_raw
  FROM ev
), scored AS (
  SELECT event_id, user_id, ts,
         back_raw,
         CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(back_raw)) AS BIGINT) AS back_secs,
         fwd_raw,
         CAST(floor(epoch(fwd_raw)) AS BIGINT) - CAST(floor(epoch(ts)) AS BIGINT) AS fwd_secs
  FROM carried WHERE event_type = 'purchase'
)
SELECT event_id, user_id, ts,
       CASE WHEN back_secs <= {ASOF_TOLERANCE_S} THEN back_raw END AS back_view_ts,
       CASE WHEN back_secs <= {ASOF_TOLERANCE_S} THEN back_secs END AS back_secs,
       CASE WHEN fwd_secs <= {ASOF_TOLERANCE_S} THEN fwd_raw END AS fwd_view_ts,
       CASE WHEN fwd_secs <= {ASOF_TOLERANCE_S} THEN fwd_secs END AS fwd_secs,
       coalesce(CAST(back_secs <= {ASOF_TOLERANCE_S} AS INT), 0) AS back_matched,
       coalesce(CAST(fwd_secs <= {ASOF_TOLERANCE_S} AS INT), 0) AS fwd_matched
FROM scored
"""

QUERIES["as_of_join_tolerance"] = as_of_join_tolerance
ORACLES["as_of_join_tolerance"] = AS_OF_TOLERANCE_SQL


# --- sessionization gap sweep -------------------------------------------------
#
# The tuning table for `sessionize`'s 30-minute constant (the
# band-sweep pattern applied to sessionization): session counts and
# density at inactivity thresholds 15 min / 30 min / 60 min, computed
# from ONE lag pass — n_sessions(T) = n_users + #gaps > T, so the
# whole sweep is three conditional sums over the same gap stream, no
# re-sessionization per config.  The table an analytics owner reads
# before pinning the gap (too small fragments journeys, too large
# merges visits).
#
# Plan: one (user_id) shuffle+sort for the lag, one 1-row aggregate,
# then a 3-row explode — corpus touched once.

GAP_SWEEP_S = (900, 1800, 3600)


def sessionize_gap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id"
    )
    w = _W.partitionBy("user_id").orderBy("t", "event_id")
    gaps = ev.select(
        "user_id",
        F.expr(
            "cast((t - lag(t) over (partition by user_id order by t, event_id))"
            " div 1000000 as bigint)"
        ).alias("gap_s"),
    )
    agg = gaps.agg(
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
        *[
            F.sum((F.col("gap_s") > T).cast("bigint")).alias(f"b{T}")
            for T in GAP_SWEEP_S
        ],
    )
    arms = F.array(
        *[
            F.struct(F.lit(T).cast("bigint").alias("threshold_s"), F.col(f"b{T}").alias("brk"))
            for T in GAP_SWEEP_S
        ]
    )
    return (
        agg.select("n_users", "n_events", F.explode(arms).alias("a"))
        .select(
            F.col("a.threshold_s").alias("threshold_s"),
            F.col("n_users").cast("bigint").alias("n_users"),
            F.col("n_events").cast("bigint").alias("n_events"),
            (F.col("n_users") + F.col("a.brk")).cast("bigint").alias("n_sessions"),
            F.expr("cast(n_events * 1000 div (n_users + a.brk) as bigint)").alias(
                "events_per_session_milli"
            ),
        )
    )


GAP_SWEEP_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
gaps AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
           // 1000000 AS gap_s
  FROM events_us
),
agg AS (
  SELECT count(DISTINCT user_id)::BIGINT AS n_users, count(*)::BIGINT AS n_events,
         {", ".join(f"CAST(sum(CASE WHEN gap_s > {T} THEN 1 ELSE 0 END) AS BIGINT) AS b{T}" for T in GAP_SWEEP_S)}
  FROM gaps
)
{" UNION ALL ".join(f'''
SELECT CAST({T} AS BIGINT) AS threshold_s, n_users, n_events,
       CAST(n_users + b{T} AS BIGINT) AS n_sessions,
       CAST(n_events * 1000 // (n_users + b{T}) AS BIGINT) AS events_per_session_milli
FROM agg''' for T in GAP_SWEEP_S)}
"""

QUERIES["sessionize_gap_sweep"] = sessionize_gap_sweep
ORACLES["sessionize_gap_sweep"] = GAP_SWEEP_SQL
