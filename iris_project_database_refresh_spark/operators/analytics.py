"""Analytics operators: grouped model fit, rolling windows, rollups.

* `per_source_linefit` — per-group least-squares fit (n_tokens ~
  n_chars) via the built-in ``regr_slope``/``regr_intercept`` SQL
  aggregates (Spark ≥3.4): one JVM hash aggregation with map-side
  partials, no Python workers, no group-fits-in-memory constraint.
  (The grouped-map Arrow pattern this replaced lives on as the
  template in ``streaming/sessions.py`` for genuinely non-closed-form
  per-group logic.) Oracle: DuckDB's identical closed form, 6dp.
* `events_rolling_1h` — per-user 1-hour rolling sum/count via a RANGE
  window frame (event-time range, not row count). One shuffle on
  user_id; the frame is evaluated in a single sorted pass.
* `monitor_rollup_cube` — ROLLUP over (event_type, day): the OLAP
  grouping-sets surface for the monitor table
  (`database-schema.sql:101-106` per-stage/per-day cost summaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


# --- grouped least-squares via applyInPandas ---------------------------------

def per_source_linefit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "source",
        F.length("text").cast("double").alias("x"),
        F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).cast("double").alias("y"),
    )

    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.regr_slope("y", "x"), 6).alias("slope"),
        F.round(F.regr_intercept("y", "x"), 6).alias("intercept"),
    )


LINEFIT_SQL = """
SELECT source,
       count(*) AS n_docs,
       round(regr_slope(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))::DOUBLE,
                        length(text)::DOUBLE), 6) AS slope,
       round(regr_intercept(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))::DOUBLE,
                            length(text)::DOUBLE), 6) AS intercept
FROM documents
GROUP BY source
"""


# --- event-time RANGE window --------------------------------------------------

def events_rolling_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("long"))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        "ts",
        F.count(F.lit(1)).over(w).alias("n_events_1h"),
        F.round(F.sum("value").over(w), 2).alias("sum_value_1h"),
    )


ROLLING_SQL = """
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
)
SELECT event_id, user_id, ts,
       count(*) OVER w AS n_events_1h,
       round(sum(value) OVER w, 2) AS sum_value_1h
FROM events_us
WINDOW w AS (PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
             RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
"""


# --- ROLLUP grouping sets -------------------------------------------------------

def monitor_rollup_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    # duckdb's date_trunc('day') yields DATE; match it
    day = F.date_trunc("day", F.col("ts")).cast("date").alias("day")
    return (
        ev.rollup("event_type", day)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.grouping_id().alias("grouping_level"),
        )
    )


ROLLUP_SQL = """
SELECT event_type,
       date_trunc('day', ts) AS day,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       CAST(grouping(event_type, date_trunc('day', ts)) AS BIGINT) AS grouping_level
FROM events
GROUP BY ROLLUP (event_type, date_trunc('day', ts))
"""



# --- binned range join --------------------------------------------------------
#
# Spark has no native range-join optimization: `a JOIN b ON ts BETWEEN
# start AND end` plans as BroadcastNestedLoopJoin (or worse, a
# cartesian) — O(|a|x|b|) comparisons. The scale-safe pattern is to BIN
# time: explode each interval into the day buckets it covers (bounded
# fan-out: interval length / bin width + 1), equi-join events on
# (user, bin) — an ordinary shuffled hash join — and apply the exact
# BETWEEN as a residual filter. The oracle runs the naive BETWEEN join;
# results agree exactly because binning only prunes candidates.
#
# Maintenance windows are planted in-query (the house pattern): per
# user, WINDOWS_PER_USER 36-hour windows on a weekly cadence offset by
# user id. Integer-second arithmetic throughout: Spark unix_timestamp
# truncates to seconds while DuckDB epoch() keeps microseconds, but
# floor(x) >= s  <=>  x >= s and floor(x) < e <=> x < e for integer
# bounds, so the two residual filters admit identical event sets.

BIN_S = 86400  # 1-day bins
WINDOW_LEN_S = 36 * 3600
WINDOWS_PER_USER = 4
EPOCH_2024 = 1704067200  # 2024-01-01 00:00:00 UTC


def range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_timestamp("ts").alias("es"), "value"
    )
    users = ev.select("user_id").distinct()
    iv = (
        users.select(
            "user_id", F.explode(F.sequence(F.lit(0), F.lit(WINDOWS_PER_USER - 1))).alias("k")
        )
        .select(
            "user_id",
            (F.col("user_id") * 10 + F.col("k")).alias("interval_id"),
            (
                F.lit(EPOCH_2024)
                + (F.col("user_id") % 5 + F.col("k") * 7) * BIN_S
            ).alias("start_s"),
        )
        .withColumn("end_s", F.col("start_s") + WINDOW_LEN_S)
    )
    binned_iv = iv.select(
        "user_id",
        "interval_id",
        "start_s",
        "end_s",
        F.explode(
            F.sequence(
                F.floor(F.col("start_s") / BIN_S),
                F.floor((F.col("end_s") - 1) / BIN_S),
            )
        ).alias("bin"),
    )
    binned_ev = ev.withColumn("bin", F.floor(F.col("es") / BIN_S))
    return (
        binned_ev.join(binned_iv, ["user_id", "bin"])
        .where((F.col("es") >= F.col("start_s")) & (F.col("es") < F.col("end_s")))
        .groupBy("interval_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


RANGE_JOIN_SQL = f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
iv AS (
  SELECT user_id, user_id * 10 + k AS interval_id,
         {EPOCH_2024} + (user_id % 5 + k * 7) * {BIN_S} AS start_s
  FROM users, (SELECT unnest(generate_series(0, {WINDOWS_PER_USER - 1})) AS k)
)
SELECT interval_id, count(*) AS n_events, round(sum(value), 2) AS sum_value
FROM iv JOIN events ON events.user_id = iv.user_id
  AND epoch(ts) >= start_s AND epoch(ts) < start_s + {WINDOW_LEN_S}
GROUP BY interval_id
"""


# --- interval OVERLAP join (bin-bucketed) ------------------------------------
#
# The overlap complement to range_join_binned's containment semantics:
# two per-user interval families (think sessions vs promotion windows),
# pairs where a.start < b.end AND b.start < a.end. Spark has no native
# interval-join optimization — the naive plan is a nested loop over the
# two inequalities — so both sides explode their covered day bins and
# meet in an ordinary (user_id, bin) equi-join; a multi-bin overlap is
# found once per shared bin, so candidates dedup before the residual
# check. Bin width trades fan-out (intervals span len/BIN_S bins)
# against bucket size — the standard interval-bucketing join.

OVL_A_LEN_S = 36 * 3600
OVL_B_LEN_S = 24 * 3600
OVL_PER_USER = 2
OVL_SPAN_DAYS = 28


def interval_overlap_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = load_table(spark, sf_dir, "events").select("user_id").distinct()
    ks = F.explode(F.sequence(F.lit(0), F.lit(OVL_PER_USER - 1))).alias("k")

    def fam(mult: int, off: int, length: int, tag: str):
        start = (
            F.lit(EPOCH_2024)
            + ((F.col("user_id") * mult + F.col("k") * off) % OVL_SPAN_DAYS) * BIN_S
        )
        return users.select("user_id", ks).select(
            "user_id",
            (F.col("user_id") * 10 + F.col("k")).alias(f"{tag}_id"),
            start.alias(f"{tag}_start"),
            (start + length).alias(f"{tag}_end"),
        )

    a, b = fam(3, 11, OVL_A_LEN_S, "a"), fam(5, 7, OVL_B_LEN_S, "b")

    def binned(df, tag):
        return df.withColumn(
            "bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{tag}_start") / BIN_S),
                    F.floor((F.col(f"{tag}_end") - 1) / BIN_S),
                )
            ),
        )

    cand = (
        binned(a, "a")
        .join(binned(b, "b"), ["user_id", "bin"])
        .dropDuplicates(["a_id", "b_id"])
        .where((F.col("a_start") < F.col("b_end")) & (F.col("b_start") < F.col("a_end")))
    )
    return cand.select(
        "user_id",
        "a_id",
        "b_id",
        (
            F.least(F.col("a_end"), F.col("b_end"))
            - F.greatest(F.col("a_start"), F.col("b_start"))
        ).alias("overlap_s"),
    )


INTERVAL_OVERLAP_SQL = f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
ks AS (SELECT unnest(generate_series(0, {OVL_PER_USER - 1})) AS k),
a AS (
  SELECT user_id, user_id * 10 + k AS a_id,
         {EPOCH_2024} + ((user_id * 3 + k * 11) % {OVL_SPAN_DAYS}) * {BIN_S} AS a_start,
         {EPOCH_2024} + ((user_id * 3 + k * 11) % {OVL_SPAN_DAYS}) * {BIN_S} + {OVL_A_LEN_S} AS a_end
  FROM users, ks
),
b AS (
  SELECT user_id, user_id * 10 + k AS b_id,
         {EPOCH_2024} + ((user_id * 5 + k * 7) % {OVL_SPAN_DAYS}) * {BIN_S} AS b_start,
         {EPOCH_2024} + ((user_id * 5 + k * 7) % {OVL_SPAN_DAYS}) * {BIN_S} + {OVL_B_LEN_S} AS b_end
  FROM users, ks
)
SELECT a.user_id AS user_id, a_id, b_id,
       least(a_end, b_end) - greatest(a_start, b_start) AS overlap_s
FROM a JOIN b ON a.user_id = b.user_id
 AND a_start < b_end AND b_start < a_end
"""


# --- two-phase salted aggregation (skewed-key rollup) ------------------------

def events_salted_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The monitor rollup routed through ``functions.distributed.
    salted_agg``: partial aggregate on (event_type, salt) — spreading
    any hot key across 32 reducers — then merge the partials on
    event_type. Result is identical to the direct groupBy (the oracle
    IS the direct groupBy); what changes is the physical plan, which
    the tests pin: two aggregation exchanges, the first carrying the
    salt. At 100 TB this is the groupBy-with-mega-key defense (one
    event type being 90% of the stream), the aggregation analogue of
    AQE's skew-join splitting — AQE does not salt aggregations.

    sum(value) is re-aggregated from per-salt partials, so the float
    addition tree differs from a direct sum; the 2dp rounding absorbs
    that (same contract monitor_rollup already relies on).
    """
    from ..functions.distributed import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {"n_events": "count(*)", "sum_value": "sum(value)", "max_value": "max(value)"},
    )
    return out.select(
        "event_type",
        "n_events",
        F.round(F.col("sum_value"), 2).alias("sum_value"),
        F.round(F.col("max_value"), 2).alias("max_value"),
    )


SALTED_ROLLUP_SQL = """
SELECT event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       round(max(value), 2) AS max_value
FROM events
GROUP BY event_type
"""


QUERIES = {
    "range_join_binned": range_join_binned,
    "per_source_linefit": per_source_linefit,
    "events_rolling_1h": events_rolling_1h,
    "monitor_rollup_cube": monitor_rollup_cube,
    "events_salted_rollup": events_salted_rollup,
    "interval_overlap_join": interval_overlap_join,
}

ORACLES = {
    "range_join_binned": RANGE_JOIN_SQL,
    "per_source_linefit": LINEFIT_SQL,
    "events_rolling_1h": ROLLING_SQL,
    "monitor_rollup_cube": ROLLUP_SQL,
    "events_salted_rollup": SALTED_ROLLUP_SQL,
    "interval_overlap_join": INTERVAL_OVERLAP_SQL,
}


# --- explicit GROUPING SETS --------------------------------------------------
#
# The third member of the OLAP grouping family (ROLLUP lives at
# monitor_rollup_cube, pivot at events_pivot): arbitrary GROUPING SETS
# — per-type totals, per-day totals, and the grand total in ONE pass,
# WITHOUT the intermediate (type, day) cells a ROLLUP/CUBE would also
# compute. One scan, one Expand (3 replicas instead of a cube's 4),
# map-side partial aggregation; grouping_id distinguishes the sets.

def monitor_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the day column first: groupingSets identifies grouping
    # columns by expression identity, so a repeated date_trunc alias
    # would register as separate columns and skew grouping_id
    ev = load_table(spark, sf_dir, "events").withColumn(
        "day", F.date_trunc("day", F.col("ts")).cast("date")
    )
    return ev.groupingSets(
        [[F.col("event_type")], [F.col("day")], []], F.col("event_type"), F.col("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        F.grouping_id().alias("grouping_level"),
    )


GROUPING_SETS_SQL = """
SELECT event_type,
       date_trunc('day', ts) AS day,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value,
       CAST(grouping(event_type, date_trunc('day', ts)) AS BIGINT) AS grouping_level
FROM events
GROUP BY GROUPING SETS ((event_type), (date_trunc('day', ts)), ())
"""

QUERIES["monitor_grouping_sets"] = monitor_grouping_sets
ORACLES["monitor_grouping_sets"] = GROUPING_SETS_SQL


# --- supplier busy-interval union (sweep-line coverage) -------------------------
#
# The interval-UNION primitive that interval_overlap_join (stabbing
# pairs) and events_gapfill (dense scaffolds) both lack: merge each
# supplier's overlapping busy windows into disjoint spells and measure
# true covered time — utilization, distinct engagements, longest
# uninterrupted stretch.  This is the classic sweep-line turned into
# pure window algebra: an interval starts a NEW spell iff its start
# clears the running max of all earlier ends (half-open; touching
# intervals merge), the spell id is the running sum of those flags,
# and spells reduce to [min(start), max(end)).
#
# Plant: each lineitem occupies its supplier for (quantity % 7 + 1)
# days from ship date — deterministic integer widths both engines
# derive identically.
#
# Plan / scale: ONE shuffle (partition by suppkey), two sorted window
# passes over each key's intervals, one grouped reduction — no
# self-join, no pair blowup, no gap scaffold.  Per-key interval counts
# are the fact cardinality; the windows stream in sort order, so skew
# is bounded by the largest single supplier (AQE-covered), and the
# output is one row per supplier.

BUSY_MOD_DAYS = 7


def supplier_busy_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem")
    iv = l.select(
        "l_suppkey",
        F.to_date("l_shipdate").alias("s"),
        F.date_add(
            F.to_date("l_shipdate"),
            (F.col("l_quantity").cast("int") % BUSY_MOD_DAYS + 1),
        ).alias("e"),
        "l_orderkey",
        "l_linenumber",
    )
    w = Window.partitionBy("l_suppkey").orderBy("s", "e", "l_orderkey", "l_linenumber")
    prev_max = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.select(
        "l_suppkey",
        "s",
        "e",
        "l_orderkey",
        "l_linenumber",
        F.when(prev_max.isNull() | (F.col("s") > prev_max), 1)
        .otherwise(0)
        .alias("is_new"),
    ).withColumn(
        # the same TOTAL order as the flag window (orderkey+linenumber
        # make it unique) — a looser tie order here could put a
        # flagged row after an unflagged twin and split the spell
        "spell",
        F.sum("is_new").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    spells = flagged.groupBy("l_suppkey", "spell").agg(
        F.min("s").alias("sp_start"), F.max("e").alias("sp_end")
    )
    return spells.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spells"),
        F.sum(F.datediff("sp_end", "sp_start")).cast("bigint").alias("covered_days"),
        F.max(F.datediff("sp_end", "sp_start")).cast("bigint").alias("longest_spell_days"),
        F.min("sp_start").alias("first_busy"),
        F.max("sp_end").alias("last_busy"),
    )


BUSY_COVERAGE_SQL = f"""
WITH iv AS (
  SELECT l_suppkey,
         CAST(l_shipdate AS DATE) AS s,
         CAST(l_shipdate AS DATE) + CAST(CAST(l_quantity AS INTEGER) % {BUSY_MOD_DAYS} + 1 AS INTEGER) AS e,
         l_orderkey, l_linenumber
  FROM lineitem
),
flagged AS (
  SELECT l_suppkey, s, e, l_orderkey, l_linenumber,
         CASE WHEN max(e) OVER (PARTITION BY l_suppkey ORDER BY s, e, l_orderkey, l_linenumber
                                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
                   OR s > max(e) OVER (PARTITION BY l_suppkey ORDER BY s, e, l_orderkey, l_linenumber
                                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 1 ELSE 0 END AS is_new
  FROM iv
),
spelled AS (
  SELECT l_suppkey, s, e,
         CAST(sum(is_new) OVER (PARTITION BY l_suppkey ORDER BY s, e, l_orderkey, l_linenumber
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS spell
  FROM flagged
),
spells AS (
  SELECT l_suppkey, spell, min(s) AS sp_start, max(e) AS sp_end
  FROM spelled GROUP BY l_suppkey, spell
)
SELECT l_suppkey,
       count(*)::BIGINT AS n_spells,
       CAST(sum(sp_end - sp_start) AS BIGINT) AS covered_days,
       CAST(max(sp_end - sp_start) AS BIGINT) AS longest_spell_days,
       min(sp_start) AS first_busy,
       max(sp_end) AS last_busy
FROM spells
GROUP BY l_suppkey
"""

QUERIES["supplier_busy_coverage"] = supplier_busy_coverage
ORACLES["supplier_busy_coverage"] = BUSY_COVERAGE_SQL
