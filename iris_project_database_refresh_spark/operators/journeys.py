"""User-journey analytics over the event stream: conversion funnels
and cohort retention.

Extends the monitor/event analytics family (reference:
``database-schema.sql`` process_monitor_logs usage reporting) with the
two behavioral shapes every event warehouse is asked for:

* `events_funnel` — ordered-step conversion (view -> click ->
  purchase) with a per-step conversion window. Each user's relevant
  events collapse into ONE sorted array (a single shuffle on user_id),
  and the sequential "first step-k event after step-(k-1)" scan is pure
  Catalyst array algebra (``filter``/``transform``/``array_min`` over
  the per-user list) — no self-joins of the fact table per step, which
  is the naive formulation's cost (3 shuffled scans). Per-user state is
  bounded by that user's event count in the funnel types; at 100 TB
  you'd additionally bound the collection window (e.g. 30 days), which
  composes as one more filter before the groupBy.
* `cohort_retention` — weekly cohort x week-offset retention counts by
  customer segment. The raw stream collapses to distinct (user, week)
  activity first (shuffle #1); cohort assignment is a per-user min over
  that bounded activity table (shuffle #2 on user_id); the segment
  dimension joins as a broadcast. All downstream work runs on
  |users| x |weeks| rows, never raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.distributed import bounded_sorted_events
from ..sources.tables import load_table

FUNNEL_STEPS = ["view", "click", "purchase"]
STEP_WINDOW_US = 24 * 3600 * 1_000_000  # each step must convert within 24h


def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin(*FUNNEL_STEPS))
        .select("user_id", F.unix_micros("ts").alias("t"), F.col("event_type").alias("typ"))
    )
    # bounded_sorted_events = the skew guard: the per-user array is
    # capped (earliest EVENTS_PER_KEY_CAP events + truncation flag), so
    # a power user cannot concentrate an unbounded history in one task.
    # The cap is far above the corpus max (99 events/user at sf0.1), so
    # the oracle semantics are unchanged here.
    per_user = bounded_sorted_events(ev, "user_id", F.struct("t", "typ"))

    def first_after(step: str, prev):
        # min ts of a `step` event strictly after `prev`, within the window
        cond = (
            (lambda e: e["typ"] == step)
            if prev is None
            else (lambda e: (e["typ"] == step) & (e["t"] > prev) & (e["t"] <= prev + STEP_WINDOW_US))
        )
        return F.array_min(F.transform(F.filter("evs", cond), lambda e: e["t"]))

    staged = per_user.withColumn("t1", first_after("view", None))
    staged = staged.withColumn("t2", first_after("click", F.col("t1")))
    staged = staged.withColumn("t3", first_after("purchase", F.col("t2")))
    return staged.agg(
        F.count("t1").alias("step1_users"),
        F.count("t2").alias("step2_users"),
        F.count("t3").alias("step3_users"),
        F.round(F.count("t2") / F.count("t1"), 4).alias("rate_12"),
        F.round(F.count("t3") / F.count("t2"), 4).alias("rate_23"),
    )


FUNNEL_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
per_user AS (
  SELECT user_id,
         list_sort(list(struct_pack(t := epoch_us(ts), typ := event_type))) AS evs
  FROM events_us
  WHERE event_type IN ('view', 'click', 'purchase')
  GROUP BY user_id
),
s1 AS (
  SELECT user_id, evs,
         list_min(list_transform(list_filter(evs, e -> e.typ = 'view'), e -> e.t)) AS t1
  FROM per_user
),
s2 AS (
  SELECT user_id, evs, t1,
         list_min(list_transform(list_filter(evs,
           e -> e.typ = 'click' AND e.t > t1 AND e.t <= t1 + {STEP_WINDOW_US}), e -> e.t)) AS t2
  FROM s1
),
s3 AS (
  SELECT t1, t2,
         list_min(list_transform(list_filter(evs,
           e -> e.typ = 'purchase' AND e.t > t2 AND e.t <= t2 + {STEP_WINDOW_US}), e -> e.t)) AS t3
  FROM s2
)
SELECT count(t1) AS step1_users,
       count(t2) AS step2_users,
       count(t3) AS step3_users,
       round(count(t2) / count(t1), 4) AS rate_12,
       round(count(t3) / count(t2), 4) AS rate_23
FROM s3
"""


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    seg = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return (
        activity.join(cohorts, "user_id")
        .join(F.broadcast(seg), "user_id")
        .groupBy(
            "segment",
            "cohort_week",
            F.floor(F.datediff("week", "cohort_week") / 7).cast("long").alias("offset_weeks"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


COHORT_SQL = """
WITH activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events
),
cohorts AS (SELECT user_id, min(week) AS cohort_week FROM activity GROUP BY 1)
SELECT c.c_mktsegment AS segment,
       cohort_week,
       CAST(date_diff('week', cohort_week, week) AS BIGINT) AS offset_weeks,
       count(*) AS n_users
FROM activity
JOIN cohorts USING (user_id)
JOIN customer c ON c.c_custkey = activity.user_id
GROUP BY 1, 2, 3
"""


# --- first-order transition matrix -------------------------------------------

def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over user journeys: for
    every (current, next) event-type pair, the transition count and
    P(next | current) — the journey summary behind "what do users do
    after X". One window pass (lead over user_id ordered by ts,
    event_id — same partitioning the sessionizer uses) produces the
    transition stream; counts reduce map-side; row totals come back as
    a broadcast join. Probabilities are count ratios — exact rationals
    in binary64, same division in both engines."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), F.col("next_type").alias("nxt"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = trans.groupBy("cur").agg(F.sum("n").alias("row_total"))
    return trans.join(F.broadcast(totals), "cur").select(
        "cur",
        "nxt",
        "n",
        F.round(F.col("n") / F.col("row_total"), 6).alias("p_next"),
    )


MARKOV_SQL = """
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
trans AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events_us
),
counts AS (
  SELECT cur, nxt, count(*) AS n FROM trans WHERE nxt IS NOT NULL GROUP BY cur, nxt
),
totals AS (SELECT cur, sum(n) AS row_total FROM counts GROUP BY cur)
SELECT cur, nxt, n, round(n / CAST(row_total AS DOUBLE), 6) AS p_next
FROM counts JOIN totals USING (cur)
"""


QUERIES = {
    "events_funnel": events_funnel,
    "cohort_retention": cohort_retention,
    "events_markov_transitions": events_markov_transitions,
}

ORACLES = {
    "events_funnel": FUNNEL_SQL,
    "cohort_retention": COHORT_SQL,
    "events_markov_transitions": MARKOV_SQL,
}


# --- behavioral entropy ------------------------------------------------------

def user_behavior_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user Shannon entropy over the event-type distribution —
    the diversity score that separates single-purpose accounts
    (entropy ~ 0) from broad ones (~ log2(5)). Two bounded
    aggregations: (user, type) counts, then one entropy sum per user
    over <= |event types| rows; -p*log2(p) terms round at 6dp like the
    other log-based scores."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("user_id").agg(
        F.sum("n").alias("total"), F.count(F.lit(1)).alias("n_types")
    )
    p = F.col("n") / F.col("total")
    return (
        counts.join(totals, "user_id")
        .groupBy("user_id")
        .agg(
            F.max("total").cast("bigint").alias("n_events"),
            F.max("n_types").cast("bigint").alias("n_types"),
            F.round(-F.sum(p * F.log2(p)), 6).alias("entropy_bits"),
        )
    )


ENTROPY_SQL = """
WITH counts AS (
  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2
),
totals AS (
  SELECT user_id, sum(n) AS total, count(*) AS n_types FROM counts GROUP BY user_id
)
SELECT user_id,
       max(total)::BIGINT AS n_events,
       max(n_types)::BIGINT AS n_types,
       round(-sum((n / CAST(total AS DOUBLE)) * log2(n / CAST(total AS DOUBLE))), 6) AS entropy_bits
FROM counts JOIN totals USING (user_id)
GROUP BY user_id
"""

QUERIES["user_behavior_entropy"] = user_behavior_entropy
ORACLES["user_behavior_entropy"] = ENTROPY_SQL


# --- engagement metrics (DAU / WAU / stickiness) -----------------------------

WAU_DAYS = 7


def events_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users, trailing-7-day active users, and stickiness
    (DAU/WAU) per day. WAU is NOT decomposable from daily counts
    (distinct users over a sliding window), so each (user, day)
    activity row is exploded onto the WAU_DAYS windows it contributes
    to — a bounded 7x fan-out of the distinct-activity table, never of
    the raw stream — and the window's distinct count collapses back.
    Days with no 7-day history (the first WAU_DAYS-1 days) still report
    (their partial window), matching the oracle."""
    ev = load_table(spark, sf_dir, "events")
    activity = ev.select(
        "user_id", F.date_trunc("day", "ts").cast("date").alias("day")
    ).distinct().localCheckpoint(eager=False)  # DAU + WAU fan-out both consume it

    dau = activity.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))
    fanned = activity.select(
        "user_id",
        F.explode(
            F.expr(f"sequence(day, date_add(day, {WAU_DAYS - 1}), interval 1 day)")
        ).alias("wday"),
    )
    # only report days that actually exist in the stream
    wau = (
        fanned.groupBy(F.col("wday").alias("day"))
        .agg(F.countDistinct("user_id").alias("wau"))
        .join(dau.select("day"), "day", "leftsemi")
    )
    return (
        dau.join(wau, "day")
        .select(
            "day",
            "dau",
            "wau",
            F.round(F.col("dau") / F.col("wau"), 6).alias("stickiness"),
        )
    )


ENGAGEMENT_SQL = f"""
WITH activity AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
),
dau AS (SELECT day, count(*) AS dau FROM activity GROUP BY day),
fanned AS (
  SELECT user_id, unnest(generate_series(day, day + {WAU_DAYS - 1}, INTERVAL 1 DAY))::DATE AS day
  FROM activity
),
wau AS (
  SELECT day, count(DISTINCT user_id) AS wau
  FROM fanned WHERE day IN (SELECT day FROM dau)
  GROUP BY day
)
SELECT day, dau, wau, round(dau / CAST(wau AS DOUBLE), 6) AS stickiness
FROM dau JOIN wau USING (day)
"""

QUERIES["events_engagement"] = events_engagement
ORACLES["events_engagement"] = ENGAGEMENT_SQL


# --- hour-of-day x day-of-week seasonality -----------------------------------

def events_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The load-profile heatmap behind every monitor dashboard:
    (day-of-week, hour-of-day) event counts with each cell's share of
    the total — one bounded 7x24 aggregation over the stream, total
    rejoined as a lazy 1-row broadcast. dayofweek follows ISO here
    (1 = Monday) to match DuckDB's isodow."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        F.expr("((dayofweek(ts) + 5) % 7) + 1").alias("iso_dow"),
        F.hour("ts").alias("hour"),
    ).agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    total = cells.agg(F.sum("n").alias("total"))
    return cells.crossJoin(F.broadcast(total)).select(
        "iso_dow",
        "hour",
        "n",
        "sum_value",
        F.round(F.col("n") / F.col("total"), 6).alias("share"),
    )


SEASONALITY_SQL = """
WITH cells AS (
  SELECT isodow(ts)::BIGINT AS iso_dow, hour(ts)::INT AS hour,
         count(*) AS n, round(sum(value), 2) AS sum_value
  FROM events GROUP BY 1, 2
),
total AS (SELECT sum(n) AS total FROM cells)
SELECT iso_dow, hour, n, sum_value,
       round(n / CAST(total AS DOUBLE), 6) AS share
FROM cells, total
"""

QUERIES["events_seasonality"] = events_seasonality
ORACLES["events_seasonality"] = SEASONALITY_SQL


# --- U-shaped multi-touch attribution ----------------------------------------
#
# Position-based credit for each purchase over the touches (view/click)
# that preceded it within 24 h: 40% to the first touch, 40% to the
# last, the remaining 20% split over the middles (1.0 / 0.5+0.5 for
# one- and two-touch paths). Credit is integer micro-units — first/
# last get 400_000, each middle gets 200_000 div (n-2) — so the final
# sums are exact integers in both engines (double credit summed across
# a shuffle would be order-sensitive). The conversion⋈touch join is
# user-partitioned with a bounded time window, so per-key fan-out is
# the user's 24 h touch count, not their full history.

ATTR_WINDOW_US = 24 * 3600 * 1_000_000
_CR_FULL = 1_000_000
_CR_HALF = 500_000
_CR_EDGE = 400_000
_CR_MID_POOL = 200_000


def attribution_u_shaped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.unix_micros("ts").alias("t_touch"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
    )
    convs = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("t_conv"),
        F.col("event_id").alias("conv_id"),
    )
    j = convs.join(
        touches,
        (convs.user_id == touches.user_id)
        & (touches.t_touch < convs.t_conv)
        & (touches.t_touch >= convs.t_conv - ATTR_WINDOW_US),
    ).select("conv_id", "touch_id", "touch_type", "t_touch")
    w = Window.partitionBy("conv_id")
    wo = w.orderBy("t_touch", "touch_id")
    ranked = j.select(
        "conv_id",
        "touch_id",
        "touch_type",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    credit = (
        F.when(F.col("n") == 1, _CR_FULL)
        .when(F.col("n") == 2, _CR_HALF)
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), _CR_EDGE)
        .otherwise(F.expr(f"{_CR_MID_POOL} div (n - 2)"))
    )
    return (
        ranked.withColumn("credit_micro", credit.cast("bigint"))
        .groupBy("touch_type")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("conv_id").alias("n_conversions"),
            F.sum("credit_micro").alias("credit_micro_total"),
            F.round(F.sum("credit_micro") / 1e6, 6).alias("total_credit"),
        )
    )


ATTRIBUTION_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
touches AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t_touch,
         event_id AS touch_id, event_type AS touch_type
  FROM events_us WHERE event_type IN ('view', 'click')
),
convs AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS t_conv, event_id AS conv_id
  FROM events_us WHERE event_type = 'purchase'
),
j AS (
  SELECT c.conv_id, t.touch_id, t.touch_type, t.t_touch
  FROM convs c JOIN touches t
    ON c.user_id = t.user_id
   AND t.t_touch < c.t_conv
   AND t.t_touch >= c.t_conv - {ATTR_WINDOW_US}
),
ranked AS (
  SELECT conv_id, touch_id, touch_type,
         row_number() OVER (PARTITION BY conv_id ORDER BY t_touch, touch_id) AS rn,
         count(*) OVER (PARTITION BY conv_id) AS n
  FROM j
),
credited AS (
  SELECT touch_type, conv_id,
         CASE WHEN n = 1 THEN {_CR_FULL}
              WHEN n = 2 THEN {_CR_HALF}
              WHEN rn = 1 OR rn = n THEN {_CR_EDGE}
              ELSE {_CR_MID_POOL} // (n - 2) END AS credit_micro
  FROM ranked
)
SELECT touch_type,
       count(*) AS n_touches,
       count(DISTINCT conv_id) AS n_conversions,
       CAST(sum(credit_micro) AS BIGINT) AS credit_micro_total,
       round(sum(credit_micro) / 1000000.0, 6) AS total_credit
FROM credited
GROUP BY touch_type
"""

QUERIES["attribution_u_shaped"] = attribution_u_shaped
ORACLES["attribution_u_shaped"] = ATTRIBUTION_SQL


# --- events_top_paths --------------------------------------------------------
#
# The most-travelled session journeys: sessionize (same 30-minute gap
# rule as `sessionize`), render each session as its ordered
# event-type path, count paths, keep the top 10. The product question
# behind the Markov matrix — full paths instead of one-step
# transitions.
#
# Scale: two windows on the user partitioning (lag + running sum — the
# sessionize shape), one bounded per-session collect capped at
# PATH_CAP steps (the per-key skew guard; mirrored in the oracle so
# semantics stay engine-equal), then a path-count aggregation and a
# TakeOrdered top-10. No corpus-sized window.

PATH_CAP = 20


def events_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .relational import SESSION_GAP_MIN

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "ts", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
    new_session = F.when(gap.isNull() | (gap > SESSION_GAP_MIN * 60 * 1000000), 1).otherwise(0)
    sessions = ev.withColumn(
        "session_idx", F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    paths = (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.array_join(
                F.transform(
                    F.slice(
                        F.array_sort(
                            F.collect_list(
                                F.struct(F.unix_micros("ts").alias("t"), "event_id", "event_type")
                            )
                        ),
                        1,
                        PATH_CAP,
                    ),
                    lambda e: e["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.desc("n_sessions"), F.asc("path"))
        .limit(10)
    )


TOP_PATHS_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts, event_type FROM events
),
flagged AS (
  SELECT user_id, event_id, ts, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(lag(ts) OVER w) <= {30 * 60 * 1000000}
              THEN 0 ELSE 1 END AS new_session
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
numbered AS (
  SELECT user_id, event_id, ts, event_type,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM flagged
),
paths AS (
  SELECT user_id, session_idx,
         array_to_string(
           list_transform(
             list_slice(list(struct_pack(t := epoch_us(ts), event_id := event_id,
                                         event_type := event_type)
                             ORDER BY epoch_us(ts), event_id), 1, {PATH_CAP}),
             e -> e.event_type),
           '>') AS path
  FROM numbered
  GROUP BY user_id, session_idx
)
SELECT path, count(*) AS n_sessions
FROM paths
GROUP BY path
ORDER BY n_sessions DESC, path ASC
LIMIT 10
"""

QUERIES["events_top_paths"] = events_top_paths
ORACLES["events_top_paths"] = TOP_PATHS_SQL


# --- time-to-convert distribution --------------------------------------------
#
# The latency companion of `events_funnel`: not just WHO converts
# (view -> purchase) but HOW FAST — the distribution product teams
# monitor (p50/p90 time-to-convert) per refresh. Same one-shuffle
# shape as the funnel: per-user histories collapse once through the
# skew-capped sorted-array device, the first-view/first-purchase walk
# is a JVM array expression, and the final distribution is a 1-row
# aggregate over per-user latencies. Exact `percentile` keeps oracle
# bit-parity (Spark percentile ≡ DuckDB quantile_cont linear
# interpolation — the monitor_quantiles device); percentile_approx is
# the documented 100 TB swap.

CONVERT_WINDOW_US = 7 * 24 * 3600 * 1_000_000  # purchase within 7 days of first view


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("view", "purchase"))
        .select("user_id", F.unix_micros("ts").alias("t"), F.col("event_type").alias("typ"))
    )
    per_user = bounded_sorted_events(ev, "user_id", F.struct("t", "typ"))
    staged = per_user.withColumn(
        "t_view",
        F.array_min(F.transform(F.filter("evs", lambda e: e["typ"] == "view"), lambda e: e["t"])),
    ).withColumn(
        "t_purch",
        F.array_min(
            F.transform(
                F.filter(
                    "evs",
                    lambda e: (e["typ"] == "purchase")
                    & (e["t"] > F.col("t_view"))
                    & (e["t"] <= F.col("t_view") + CONVERT_WINDOW_US),
                ),
                lambda e: e["t"],
            )
        ),
    )
    lat = staged.select(
        "t_view",
        F.expr("cast((t_purch - t_view) div 1000000 as bigint)").alias("latency_s"),
    )
    return lat.agg(
        F.count("t_view").alias("n_viewers"),
        F.count("latency_s").alias("n_converted"),
        F.expr("cast(count(latency_s) * 10000 div count(t_view) as bigint)").alias(
            "conversion_bp"
        ),
        F.min("latency_s").alias("min_s"),
        F.round(F.expr("percentile(latency_s, 0.5)"), 6).alias("p50_s"),
        F.round(F.expr("percentile(latency_s, 0.9)"), 6).alias("p90_s"),
        F.max("latency_s").alias("max_s"),
        F.expr("cast(sum(latency_s) div count(latency_s) as bigint)").alias("mean_s_floor"),
    )


TIME_TO_CONVERT_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
per_user AS (
  SELECT user_id,
         list_sort(list(struct_pack(t := epoch_us(ts), typ := event_type))) AS evs
  FROM events_us
  WHERE event_type IN ('view', 'purchase')
  GROUP BY user_id
),
staged AS (
  SELECT user_id, evs,
         list_min(list_transform(list_filter(evs, e -> e.typ = 'view'), e -> e.t)) AS t_view
  FROM per_user
),
lat AS (
  SELECT t_view,
         (list_min(list_transform(list_filter(evs,
            e -> e.typ = 'purchase' AND e.t > t_view
                 AND e.t <= t_view + {CONVERT_WINDOW_US}), e -> e.t)) - t_view)
           // 1000000 AS latency_s
  FROM staged
)
SELECT count(t_view) AS n_viewers,
       count(latency_s) AS n_converted,
       CAST(count(latency_s) * 10000 // count(t_view) AS BIGINT) AS conversion_bp,
       CAST(min(latency_s) AS BIGINT) AS min_s,
       round(quantile_cont(latency_s, 0.5), 6) AS p50_s,
       round(quantile_cont(latency_s, 0.9), 6) AS p90_s,
       CAST(max(latency_s) AS BIGINT) AS max_s,
       CAST(sum(latency_s) // count(latency_s) AS BIGINT) AS mean_s_floor
FROM lat
"""

QUERIES["funnel_time_to_convert"] = funnel_time_to_convert
ORACLES["funnel_time_to_convert"] = TIME_TO_CONVERT_SQL


# --- A/B test lift readout ----------------------------------------------------
#
# Experimentation analytics over the event stream: users split into
# control/treatment by parity (the planted-assignment device — a real
# pipeline joins an assignment table), outcome = did the user
# purchase MORE than the median user does (a self-calibrating outcome:
# the planted stream is purchase-dense and per-user volumes shift with
# scale factor, so a fixed bar degenerates to all-or-nothing — the
# median bar stays informative at any SF; median via exact percentile,
# the quantile_cont parity device, on a 1-row broadcast); the readout
# is conversion per arm, absolute lift in basis
# points, and the two-proportion z-score (pooled), with the z
# expression written identically in both engines (round 6; IEEE sqrt
# of identical doubles). Per-user outcomes collapse first, so every
# statistic runs on one bounded (arm) rollup.

def events_ab_test_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    counts = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("cnt")
    )
    med = counts.agg(F.expr("percentile(cnt, 0.5)").alias("med"))
    per_user = counts.crossJoin(F.broadcast(med)).select(
        "user_id", (F.col("cnt") > F.col("med")).cast("int").alias("converted")
    )
    arms = per_user.select(
        F.when(F.col("user_id") % 2 == 0, "control").otherwise("treatment").alias("arm"),
        "converted",
    ).groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("converted").cast("bigint").alias("n_converted"),
    )
    wide = (
        arms.groupBy()
        .pivot("arm", ["control", "treatment"])
        .sum("n_users", "n_converted")
        .select(
            F.col("control_sum(n_users)").alias("n_c"),
            F.col("control_sum(n_converted)").alias("x_c"),
            F.col("treatment_sum(n_users)").alias("n_t"),
            F.col("treatment_sum(n_converted)").alias("x_t"),
        )
    )
    return wide.select(
        F.col("n_c").cast("bigint").alias("control_users"),
        F.col("x_c").cast("bigint").alias("control_converted"),
        F.col("n_t").cast("bigint").alias("treatment_users"),
        F.col("x_t").cast("bigint").alias("treatment_converted"),
        F.expr("cast(x_c * 10000 div n_c as bigint)").alias("control_rate_bp"),
        F.expr("cast(x_t * 10000 div n_t as bigint)").alias("treatment_rate_bp"),
        F.expr("cast(x_t * 10000 div n_t - x_c * 10000 div n_c as bigint)").alias("lift_bp"),
        F.round(
            F.expr(
                "(cast(x_t as double) / n_t - cast(x_c as double) / n_c) / "
                "sqrt((cast(x_c + x_t as double) / (n_c + n_t)) * (1 - cast(x_c + x_t as double) / (n_c + n_t)) * (1.0 / n_c + 1.0 / n_t))"
            ),
            6,
        ).alias("z_score"),
    )


AB_TEST_SQL = """
WITH counts AS (
  SELECT user_id, sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cnt
  FROM events GROUP BY user_id
), med AS (SELECT quantile_cont(cnt, 0.5) AS med FROM counts),
per_user AS (
  SELECT user_id, CAST(cnt > med AS INT) AS converted FROM counts, med
), arms AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
         count(*) AS n, CAST(sum(converted) AS BIGINT) AS x
  FROM per_user GROUP BY 1
), wide AS (
  SELECT max(CASE WHEN arm = 'control' THEN n END) AS n_c,
         max(CASE WHEN arm = 'control' THEN x END) AS x_c,
         max(CASE WHEN arm = 'treatment' THEN n END) AS n_t,
         max(CASE WHEN arm = 'treatment' THEN x END) AS x_t
  FROM arms
)
SELECT CAST(n_c AS BIGINT) AS control_users, x_c AS control_converted,
       CAST(n_t AS BIGINT) AS treatment_users, x_t AS treatment_converted,
       CAST(x_c * 10000 // n_c AS BIGINT) AS control_rate_bp,
       CAST(x_t * 10000 // n_t AS BIGINT) AS treatment_rate_bp,
       CAST(x_t * 10000 // n_t - x_c * 10000 // n_c AS BIGINT) AS lift_bp,
       round((CAST(x_t AS DOUBLE) / n_t - CAST(x_c AS DOUBLE) / n_c) /
             sqrt((CAST(x_c + x_t AS DOUBLE) / (n_c + n_t)) * (1 - CAST(x_c + x_t AS DOUBLE) / (n_c + n_t)) * (1.0 / n_c + 1.0 / n_t)), 6)
         AS z_score
FROM wide
"""

QUERIES["events_ab_test_lift"] = events_ab_test_lift
ORACLES["events_ab_test_lift"] = AB_TEST_SQL


# --- majority-class next-event baseline ---------------------------------------
#
# The evaluation floor for any sequence model on this stream: predict
# each user's next event as the most frequent successor of the
# current type (argmax row of the Markov matrix) and measure
# accuracy. The transition pass reuses events_markov_transitions'
# lead-window shape; the argmax table is bounded (types × types) and
# rides a broadcast back onto the transition stream. Accuracy in
# basis points, per current-type and overall, exact integers.

def events_next_event_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = _W.partitionBy("user_id").orderBy("ts", "event_id")
    trans = ev.select(
        F.col("event_type").alias("cur"),
        F.lead("event_type").over(w).alias("nxt"),
    ).where(F.col("nxt").isNotNull())
    counts = trans.groupBy("cur", "nxt").agg(F.count(F.lit(1)).alias("n"))
    w2 = _W.partitionBy("cur").orderBy(F.desc("n"), F.asc("nxt"))
    pred = (
        counts.withColumn("r", F.row_number().over(w2))
        .where(F.col("r") == 1)
        .select("cur", F.col("nxt").alias("predicted"))
    )
    scored = trans.join(F.broadcast(pred), "cur")
    return scored.groupBy("cur", "predicted").agg(
        F.count(F.lit(1)).alias("n_transitions"),
        F.sum((F.col("nxt") == F.col("predicted")).cast("bigint")).alias("n_correct"),
        F.expr(
            "cast(sum(cast(nxt = predicted as bigint)) * 10000 div count(1) as bigint)"
        ).alias("accuracy_bp"),
    )


NEXT_EVENT_BASELINE_SQL = """
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
), trans AS (
  SELECT event_type AS cur,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events_us
), t2 AS (SELECT * FROM trans WHERE nxt IS NOT NULL),
counts AS (
  SELECT cur, nxt, count(*) AS n FROM t2 GROUP BY cur, nxt
), pred AS (
  SELECT cur, nxt AS predicted FROM (
    SELECT *, row_number() OVER (PARTITION BY cur ORDER BY n DESC, nxt ASC) AS r FROM counts
  ) WHERE r = 1
)
SELECT t2.cur, predicted, count(*) AS n_transitions,
       CAST(sum(CASE WHEN nxt = predicted THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       CAST(CAST(sum(CASE WHEN nxt = predicted THEN 1 ELSE 0 END) AS BIGINT) * 10000 // count(*) AS BIGINT) AS accuracy_bp
FROM t2 JOIN pred ON t2.cur = pred.cur
GROUP BY t2.cur, predicted
"""

QUERIES["events_next_event_baseline"] = events_next_event_baseline
ORACLES["events_next_event_baseline"] = NEXT_EVENT_BASELINE_SQL


# --- attribution model comparison --------------------------------------------
#
# The model-choice table next to `attribution_u_shaped`: first-touch,
# last-touch and linear credit for the SAME conversion⋈touch windows,
# side by side per channel — how much each model shifts budget is
# exactly what a marketing-mix review reads. Same join shape and
# exact-integer credit discipline (micro-credits; linear pool divided
# by floor with the remainder assigned to the first touch so every
# conversion's credit sums to exactly 1,000,000 in both engines).

def attribution_model_compare(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    touches = ev.where(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.unix_micros("ts").alias("t_touch"),
        F.col("event_id").alias("touch_id"),
        F.col("event_type").alias("touch_type"),
    )
    convs = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("t_conv"),
        F.col("event_id").alias("conv_id"),
    )
    j = convs.join(
        touches,
        (convs.user_id == touches.user_id)
        & (touches.t_touch < convs.t_conv)
        & (touches.t_touch >= convs.t_conv - ATTR_WINDOW_US),
    ).select("conv_id", "touch_id", "touch_type", "t_touch")
    w = Window.partitionBy("conv_id")
    wo = w.orderBy("t_touch", "touch_id")
    ranked = j.select(
        "conv_id",
        "touch_type",
        F.row_number().over(wo).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    first_credit = F.when(F.col("rn") == 1, _CR_FULL).otherwise(0)
    last_credit = F.when(F.col("rn") == F.col("n"), _CR_FULL).otherwise(0)
    linear_credit = F.expr(f"{_CR_FULL} div n") + F.when(
        F.col("rn") == 1, F.expr(f"{_CR_FULL} % n")
    ).otherwise(0)
    return (
        ranked.select(
            "touch_type",
            first_credit.cast("bigint").alias("first_micro"),
            last_credit.cast("bigint").alias("last_micro"),
            linear_credit.cast("bigint").alias("linear_micro"),
        )
        .groupBy("touch_type")
        .agg(
            F.sum("first_micro").alias("first_touch_micro"),
            F.sum("last_micro").alias("last_touch_micro"),
            F.sum("linear_micro").alias("linear_micro"),
        )
    )


ATTR_COMPARE_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
), touches AS (
  SELECT user_id, epoch_us(ts) AS t_touch, event_id AS touch_id, event_type AS touch_type
  FROM events_us WHERE event_type IN ('view', 'click')
), convs AS (
  SELECT user_id, epoch_us(ts) AS t_conv, event_id AS conv_id
  FROM events_us WHERE event_type = 'purchase'
), j AS (
  SELECT conv_id, touch_id, touch_type, t_touch
  FROM convs c JOIN touches t
    ON c.user_id = t.user_id AND t.t_touch < c.t_conv
   AND t.t_touch >= c.t_conv - {ATTR_WINDOW_US}
), ranked AS (
  SELECT conv_id, touch_type,
         row_number() OVER (PARTITION BY conv_id ORDER BY t_touch, touch_id) AS rn,
         count(*) OVER (PARTITION BY conv_id) AS n
  FROM j
)
SELECT touch_type,
       CAST(sum(CASE WHEN rn = 1 THEN {_CR_FULL} ELSE 0 END) AS BIGINT) AS first_touch_micro,
       CAST(sum(CASE WHEN rn = n THEN {_CR_FULL} ELSE 0 END) AS BIGINT) AS last_touch_micro,
       CAST(sum({_CR_FULL} // n + CASE WHEN rn = 1 THEN {_CR_FULL} % n ELSE 0 END) AS BIGINT) AS linear_micro
FROM ranked GROUP BY touch_type
"""

QUERIES["attribution_model_compare"] = attribution_model_compare
ORACLES["attribution_model_compare"] = ATTR_COMPARE_SQL


# --- dormancy and reactivation -----------------------------------------------
#
# Lifecycle analytics beyond retention curves: a dormancy episode is a
# gap of DORMANT_DAYS+ between consecutive events of a user; the
# report counts users who went dormant, how many reactivated (had an
# event after the gap — true by construction of a gap; dormancy
# without return shows up as churn via the final-event cutoff), and
# the reactivation-gap distribution. Same user-partitioned lag shape
# as burstiness; churn = last event older than DORMANT_DAYS before
# the corpus max timestamp (1-row broadcast).

DORMANT_DAYS = 7


def events_dormancy_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id"
    )
    w = _W.partitionBy("user_id").orderBy("t", "event_id")
    gaps = ev.select(
        "user_id",
        F.expr(
            "cast((t - lag(t) over (partition by user_id order by t, event_id)) div 86400000000 as bigint)"
        ).alias("gap_days"),
    )
    per_user = gaps.groupBy("user_id").agg(
        F.max("gap_days").alias("max_gap_days"),
        F.sum((F.col("gap_days") >= DORMANT_DAYS).cast("bigint")).alias("n_dormancies"),
    )
    last_seen = ev.groupBy("user_id").agg(F.max("t").alias("t_last"))
    horizon = ev.agg(F.max("t").alias("t_max"))
    churned = last_seen.crossJoin(F.broadcast(horizon)).select(
        "user_id",
        ((F.col("t_max") - F.col("t_last")) >= DORMANT_DAYS * 86400000000).cast("bigint").alias(
            "churned"
        ),
    )
    joined = per_user.join(churned, "user_id")
    return joined.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum((F.col("n_dormancies") > 0).cast("bigint")).alias("users_with_dormancy"),
        F.sum("n_dormancies").alias("total_dormancy_episodes"),
        F.max("max_gap_days").alias("longest_gap_days"),
        F.sum("churned").alias("churned_users"),
        F.expr("cast(sum(churned) * 10000 div count(1) as bigint)").alias("churn_bp"),
    )


DORMANCY_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
), gaps AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
           // 86400000000 AS gap_days
  FROM events_us
), per_user AS (
  SELECT user_id, max(gap_days) AS max_gap_days,
         CAST(sum(CASE WHEN gap_days >= {DORMANT_DAYS} THEN 1 ELSE 0 END) AS BIGINT) AS n_dormancies
  FROM gaps GROUP BY user_id
), last_seen AS (
  SELECT user_id, max(epoch_us(ts)) AS t_last FROM events_us GROUP BY user_id
), horizon AS (SELECT max(epoch_us(ts)) AS t_max FROM events_us),
churned AS (
  SELECT user_id, CAST((t_max - t_last) >= {DORMANT_DAYS} * 86400000000 AS BIGINT) AS churned
  FROM last_seen, horizon
)
SELECT count(*) AS n_users,
       CAST(sum(CASE WHEN n_dormancies > 0 THEN 1 ELSE 0 END) AS BIGINT) AS users_with_dormancy,
       CAST(sum(n_dormancies) AS BIGINT) AS total_dormancy_episodes,
       CAST(max(max_gap_days) AS BIGINT) AS longest_gap_days,
       CAST(sum(churned) AS BIGINT) AS churned_users,
       CAST(CAST(sum(churned) AS BIGINT) * 10000 // count(*) AS BIGINT) AS churn_bp
FROM per_user JOIN churned USING (user_id)
"""

QUERIES["events_dormancy_stats"] = events_dormancy_stats
ORACLES["events_dormancy_stats"] = DORMANCY_SQL


# --- day-over-day retention ---------------------------------------------------
#
# The DAU retention companion of the weekly cohort matrix: for each
# day, what share of the previous day's active users is active again?
# The activity stream collapses to distinct (user, day) once; the
# next-day overlap is one self-join shifted by a day; shares in basis
# points on the bounded day table.

def events_dod_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day")
    ).distinct()
    # retention attributes to the PRIOR day: for each active (user, D),
    # did the user appear again on D+1? — one self-join shifted by a day
    prev = ev.select("user_id", F.col("day").alias("prev_day"))
    ret = prev.join(
        ev.select("user_id", F.date_sub("day", 1).alias("prev_day"), F.lit(1).alias("returned")),
        ["user_id", "prev_day"],
        "left",
    )
    return ret.groupBy(F.col("prev_day").alias("day")).agg(
        F.count(F.lit(1)).alias("active_users"),
        F.count("returned").alias("retained_next_day"),
        F.expr("cast(count(returned) * 10000 div count(1) as bigint)").alias("retention_bp"),
    )


DOD_RETENTION_SQL = """
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
), activity AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events_us
)
SELECT a.day, count(*) AS active_users,
       CAST(count(b.user_id) AS BIGINT) AS retained_next_day,
       CAST(count(b.user_id) * 10000 // count(*) AS BIGINT) AS retention_bp
FROM activity a
LEFT JOIN activity b ON b.user_id = a.user_id AND b.day = a.day + INTERVAL 1 DAY
GROUP BY a.day
"""

QUERIES["events_dod_retention"] = events_dod_retention
ORACLES["events_dod_retention"] = DOD_RETENTION_SQL


# --- A/B sample-ratio-mismatch gate --------------------------------------------
#
# The sanity check that must pass BEFORE reading `events_ab_test_lift`:
# with deterministic 50/50 assignment (user_id parity), does the
# realized arm split actually look 50/50? One-df chi-square against
# equal allocation, kept in exact milli-units —
# chi2_milli = (n_c − n_t)²·1000 // (n_c + n_t) — alarmed at the
# χ²(1, 0.05) = 3.841 critical value. One user-grain aggregation, then
# arithmetic on a 1-row frame.

SRM_CHI2_MILLI_BAR = 3841


def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id")
    users = ev.distinct().select(
        F.when(F.col("user_id") % 2 == 0, "control").otherwise("treatment").alias("arm")
    )
    arms = users.groupBy("arm").agg(F.count(F.lit(1)).alias("n"))
    wide = (
        arms.groupBy()
        .pivot("arm", ["control", "treatment"])
        .sum("n")
        .select(F.col("control").alias("n_c"), F.col("treatment").alias("n_t"))
    )
    return wide.select(
        "n_c",
        "n_t",
        (F.col("n_c") + F.col("n_t")).alias("n_total"),
        (F.col("n_c") - F.col("n_t")).alias("delta"),
        F.expr("(n_c - n_t) * (n_c - n_t) * 1000 div (n_c + n_t)").alias("chi2_milli"),
        (F.expr("(n_c - n_t) * (n_c - n_t) * 1000 div (n_c + n_t)") > SRM_CHI2_MILLI_BAR)
        .cast("int")
        .alias("srm_alarm"),
    )


SRM_SQL = f"""
WITH users AS (
  SELECT DISTINCT user_id FROM events
), arms AS (
  SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(sum(CASE WHEN user_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_t
  FROM users
)
SELECT n_c, n_t, n_c + n_t AS n_total, n_c - n_t AS delta,
       (n_c - n_t) * (n_c - n_t) * 1000 // (n_c + n_t) AS chi2_milli,
       CAST((n_c - n_t) * (n_c - n_t) * 1000 // (n_c + n_t) > {SRM_CHI2_MILLI_BAR} AS INT) AS srm_alarm
FROM arms
"""

QUERIES["events_ab_srm_check"] = events_ab_srm_check
ORACLES["events_ab_srm_check"] = SRM_SQL


# --- rule-stack bot detection -------------------------------------------------
#
# The per-user automation classifier assembled from the signals the
# stream already carries (public bot-detection practice: regularity +
# coverage + rate rules, stacked): gap regularity (CV of inter-event
# seconds in bp — the events_burstiness statistic, re-used per user),
# around-the-clock coverage (distinct activity hours of day), and
# sustained rate (events per active hour, milli).  Each rule
# contributes integer points; the banded verdict (human / suspect /
# bot) is what a traffic-quality gate consumes.
#
# Plan: ONE user-keyed window pass for gaps, one per-user aggregate
# for all three features, bounded arithmetic after — no second corpus
# pass, no joins.

BOT_CV_REGULAR_BP = 8000      # CV below this = machine-regular cadence
BOT_ALLHOURS_MIN = 24         # active in every hour of the day = no sleep
BOT_RATE_MILLI_MIN = 1080     # sustained-rate upper tail of the planted stream


def events_bot_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("t"),
        "event_id",
        F.hour("ts").alias("hod"),
        F.date_trunc("hour", "ts").alias("ahour"),
    )
    w = _W.partitionBy("user_id").orderBy("t", "event_id")
    gapped = ev.select(
        "user_id",
        "hod",
        "ahour",
        F.expr(
            "cast((t - lag(t) over (partition by user_id order by t, event_id))"
            " div 1000000 as bigint)"
        ).alias("gap_s"),
    )
    per_user = gapped.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("gap_s").alias("sx"),
        F.sum(F.expr("gap_s * gap_s")).alias("sxx"),
        F.sum(F.col("gap_s").isNotNull().cast("bigint")).alias("n_gaps"),
        F.countDistinct("hod").alias("n_hours_of_day"),
        F.countDistinct("ahour").alias("n_active_hours"),
    ).where(F.col("n_gaps") >= 2)
    cv_bp = F.expr(
        "cast(floor(10000.0 * sqrt(cast(n_gaps as double) * sxx - cast(sx as double) * sx)"
        " / cast(sx as double) + 0.5) as bigint)"
    )
    feat = per_user.select(
        "user_id",
        F.col("n_events").cast("bigint").alias("n_events"),
        cv_bp.alias("cv_bp"),
        F.col("n_hours_of_day").cast("bigint").alias("n_hours_of_day"),
        F.expr("cast(n_events * 1000 div n_active_hours as bigint)").alias(
            "rate_milli"
        ),
    )
    score = (
        (F.col("cv_bp") < BOT_CV_REGULAR_BP).cast("int")
        + (F.col("n_hours_of_day") >= BOT_ALLHOURS_MIN).cast("int")
        + (F.col("rate_milli") >= BOT_RATE_MILLI_MIN).cast("int")
    )
    verdict = (
        F.when(score >= 2, "bot")
        .when(score == 1, "suspect")
        .otherwise("human")
    )
    return feat.select(
        "*", score.cast("bigint").alias("bot_points"), verdict.alias("verdict")
    )


BOT_DETECT_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
gapped AS (
  SELECT user_id,
         CAST(extract(hour FROM ts) AS BIGINT) AS hod,
         date_trunc('hour', ts) AS ahour,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
           // 1000000 AS gap_s
  FROM events_us
),
per_user AS (
  SELECT user_id, count(*)::BIGINT AS n_events,
         CAST(sum(gap_s) AS BIGINT) AS sx,
         CAST(sum(gap_s * gap_s) AS BIGINT) AS sxx,
         CAST(sum(CASE WHEN gap_s IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps,
         count(DISTINCT hod)::BIGINT AS n_hours_of_day,
         count(DISTINCT ahour)::BIGINT AS n_active_hours
  FROM gapped GROUP BY user_id HAVING sum(CASE WHEN gap_s IS NOT NULL THEN 1 ELSE 0 END) >= 2
),
feat AS (
  SELECT user_id, n_events,
         CAST(floor(10000.0 * sqrt(CAST(n_gaps AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              / CAST(sx AS DOUBLE) + 0.5) AS BIGINT) AS cv_bp,
         n_hours_of_day,
         CAST(n_events * 1000 // n_active_hours AS BIGINT) AS rate_milli
  FROM per_user
)
SELECT user_id, n_events, cv_bp, n_hours_of_day, rate_milli,
       CAST(CAST(cv_bp < {BOT_CV_REGULAR_BP} AS INT)
            + CAST(n_hours_of_day >= {BOT_ALLHOURS_MIN} AS INT)
            + CAST(rate_milli >= {BOT_RATE_MILLI_MIN} AS INT) AS BIGINT) AS bot_points,
       CASE WHEN CAST(cv_bp < {BOT_CV_REGULAR_BP} AS INT)
                 + CAST(n_hours_of_day >= {BOT_ALLHOURS_MIN} AS INT)
                 + CAST(rate_milli >= {BOT_RATE_MILLI_MIN} AS INT) >= 2 THEN 'bot'
            WHEN CAST(cv_bp < {BOT_CV_REGULAR_BP} AS INT)
                 + CAST(n_hours_of_day >= {BOT_ALLHOURS_MIN} AS INT)
                 + CAST(rate_milli >= {BOT_RATE_MILLI_MIN} AS INT) = 1 THEN 'suspect'
            ELSE 'human' END AS verdict
FROM feat
"""

QUERIES["events_bot_detect"] = events_bot_detect
ORACLES["events_bot_detect"] = BOT_DETECT_SQL


# --- day-over-day active-user overlap -----------------------------------------
#
# Audience continuity as a set statistic: Jaccard overlap of the
# active-user sets of consecutive days (the cohort-free continuity
# read next to events_dod_retention's rate — Jaccard also punishes
# NEW influx, so a traffic-buy shows up here while pure retention
# looks flat).  Exact integer bp from distinct (day, user) rows.
#
# Plan: one (day, user) distinct, day-grain set sizes, one
# self-join on day+1 for intersection counts — all keyed small
# aggregations after the single distinct pass.

def events_dau_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("day", "ts").cast("date").alias("day"), "user_id"
    ).distinct().localCheckpoint(eager=False)
    sizes = ev.groupBy("day").agg(F.count(F.lit(1)).alias("n_users"))
    nxt = ev.select(F.date_sub("day", 1).alias("day"), "user_id")
    inter = ev.join(nxt, ["day", "user_id"]).groupBy("day").agg(
        F.count(F.lit(1)).alias("n_common")
    )
    s2 = sizes.select(F.date_sub("day", 1).alias("day"), F.col("n_users").alias("n_next"))
    return (
        sizes.join(s2, "day")
        .join(inter, "day", "left")
        .select(
            "day",
            F.col("n_users").cast("bigint").alias("n_users"),
            F.col("n_next").cast("bigint").alias("n_users_next"),
            F.coalesce(F.col("n_common"), F.lit(0)).cast("bigint").alias("n_common"),
            F.expr(
                "cast(coalesce(n_common, 0) * 10000 div (n_users + n_next - coalesce(n_common, 0)) as bigint)"
            ).alias("jaccard_bp"),
        )
    )


DAU_OVERLAP_SQL = """
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
au AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day, user_id FROM events_us
),
sizes AS (SELECT day, count(*)::BIGINT AS n_users FROM au GROUP BY day),
inter AS (
  SELECT a.day, count(*)::BIGINT AS n_common
  FROM au a JOIN au b ON b.day = a.day + INTERVAL 1 DAY AND a.user_id = b.user_id
  GROUP BY a.day
)
SELECT s.day, s.n_users,
       n2.n_users AS n_users_next,
       CAST(coalesce(i.n_common, 0) AS BIGINT) AS n_common,
       CAST(coalesce(i.n_common, 0) * 10000
            // (s.n_users + n2.n_users - coalesce(i.n_common, 0)) AS BIGINT) AS jaccard_bp
FROM sizes s
JOIN sizes n2 ON n2.day = s.day + INTERVAL 1 DAY
LEFT JOIN inter i ON i.day = s.day
"""

QUERIES["events_dau_overlap"] = events_dau_overlap
ORACLES["events_dau_overlap"] = DAU_OVERLAP_SQL


# --- CUPED-adjusted A/B lift --------------------------------------------------
#
# The variance-reduction step every mature experimentation platform
# runs (CUPED, Deng et al. 2013, public): pre-period spend is a
# covariate for post-period spend, theta = Cov(X,Y)/Var(X) over all
# users, and the adjusted metric y - theta*(x - xbar) shrinks metric
# variance by ~rho^2 — the same experiment reads significant days
# earlier.  Time range splits at its midpoint into pre/post (the PSI
# device); arms follow events_ab_test_lift's user_id % 2 convention.
# All integer: spend in exact cents, theta in milli from one guarded
# division of the n-scaled SS/cross-product sums, per-user adjusted
# spend truncated to cents (bit-equal both engines), variance
# reduction via the n*SS integer device in bp.
#
# Plan: one (user, period) conditional aggregation, two 1-row
# broadcasts (midpoint, theta/means), one bounded arm rollup.

def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v_c"),
    )
    rng = ev.agg(F.expr("(min(ts_us) + max(ts_us)) div 2").alias("mid"))
    per_user = (
        ev.crossJoin(F.broadcast(rng))
        .groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts_us") <= F.col("mid"), F.col("v_c")).otherwise(0)).alias("x"),
            F.sum(F.when(F.col("ts_us") > F.col("mid"), F.col("v_c")).otherwise(0)).alias("y"),
        )
        .localCheckpoint(eager=False)
    )
    stats = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("x * y")).alias("sxy"),
    ).select(
        "n",
        "sx",
        "sy",
        F.expr(
            "CASE WHEN n * sxx - sx * sx > 0"
            " THEN ((n * sxy - sx * sy) * 1000) div (n * sxx - sx * sx)"
            " ELSE cast(0 as bigint) END"
        ).alias("theta_milli"),
        F.expr("sx div n").alias("xbar"),
    )
    adj = per_user.crossJoin(F.broadcast(stats)).select(
        "user_id",
        "y",
        F.expr("y - (theta_milli * (x - xbar)) div 1000").alias("a"),
        F.expr("cast(user_id % 2 as int)").alias("arm_t"),
        "n",
        "theta_milli",
    )
    rolled = adj.groupBy("n", "theta_milli").agg(
        F.sum(F.when(F.col("arm_t") == 0, 1).otherwise(0)).alias("n_c"),
        F.sum(F.when(F.col("arm_t") == 1, 1).otherwise(0)).alias("n_t"),
        F.sum(F.when(F.col("arm_t") == 0, F.col("y")).otherwise(0)).alias("y_c"),
        F.sum(F.when(F.col("arm_t") == 1, F.col("y")).otherwise(0)).alias("y_t"),
        F.sum(F.when(F.col("arm_t") == 0, F.col("a")).otherwise(0)).alias("a_c"),
        F.sum(F.when(F.col("arm_t") == 1, F.col("a")).otherwise(0)).alias("a_t"),
        F.sum("y").alias("syy_s"),
        F.sum(F.expr("y * y")).alias("syy2"),
        F.sum("a").alias("saa_s"),
        F.sum(F.expr("a * a")).alias("saa2"),
    )
    return rolled.select(
        F.col("n").cast("bigint").alias("n_users"),
        F.col("theta_milli").cast("bigint").alias("theta_milli"),
        F.expr("cast((y_t * 1000) div n_t - (y_c * 1000) div n_c as bigint)").alias(
            "raw_lift_milli_c"
        ),
        F.expr("cast((a_t * 1000) div n_t - (a_c * 1000) div n_c as bigint)").alias(
            "cuped_lift_milli_c"
        ),
        F.expr(
            "CASE WHEN n * syy2 - syy_s * syy_s > 0 THEN"
            " cast(((n * syy2 - syy_s * syy_s) - (n * saa2 - saa_s * saa_s)) * 10000"
            " div (n * syy2 - syy_s * syy_s) as bigint)"
            " ELSE cast(0 as bigint) END"
        ).alias("var_reduction_bp"),
    )


AB_CUPED_SQL = """
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
ev AS (
  SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us,
         floor(value * 100 + (0.5)::DOUBLE)::BIGINT AS v_c
  FROM events_us
),
rng AS (SELECT (min(ts_us) + max(ts_us)) // 2 AS mid FROM ev),
per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN ts_us <= mid THEN v_c ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN ts_us > mid THEN v_c ELSE 0 END) AS BIGINT) AS y
  FROM ev, rng GROUP BY user_id
),
stats AS (
  SELECT count(*)::BIGINT AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx, CAST(sum(x * y) AS BIGINT) AS sxy
  FROM per_user
),
theta AS (
  SELECT n, sx, sy,
         CASE WHEN n * sxx - sx * sx > 0
              THEN ((n * sxy - sx * sy) * 1000) // (n * sxx - sx * sx)
              ELSE 0 END AS theta_milli,
         sx // n AS xbar
  FROM stats
),
adj AS (
  SELECT user_id, y,
         y - (theta_milli * (x - xbar)) // 1000 AS a,
         CAST(user_id % 2 AS INT) AS arm_t, n, theta_milli
  FROM per_user, theta
),
rolled AS (
  SELECT n, theta_milli,
         CAST(sum(CASE WHEN arm_t = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
         CAST(sum(CASE WHEN arm_t = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
         CAST(sum(CASE WHEN arm_t = 0 THEN y ELSE 0 END) AS BIGINT) AS y_c,
         CAST(sum(CASE WHEN arm_t = 1 THEN y ELSE 0 END) AS BIGINT) AS y_t,
         CAST(sum(CASE WHEN arm_t = 0 THEN a ELSE 0 END) AS BIGINT) AS a_c,
         CAST(sum(CASE WHEN arm_t = 1 THEN a ELSE 0 END) AS BIGINT) AS a_t,
         CAST(sum(y) AS BIGINT) AS syy_s, CAST(sum(y * y) AS BIGINT) AS syy2,
         CAST(sum(a) AS BIGINT) AS saa_s, CAST(sum(a * a) AS BIGINT) AS saa2
  FROM adj GROUP BY n, theta_milli
)
SELECT CAST(n AS BIGINT) AS n_users,
       CAST(theta_milli AS BIGINT) AS theta_milli,
       CAST((y_t * 1000) // n_t - (y_c * 1000) // n_c AS BIGINT) AS raw_lift_milli_c,
       CAST((a_t * 1000) // n_t - (a_c * 1000) // n_c AS BIGINT) AS cuped_lift_milli_c,
       CAST(CASE WHEN n * syy2 - syy_s * syy_s > 0 THEN
            ((n * syy2 - syy_s * syy_s) - (n * saa2 - saa_s * saa_s)) * 10000
            // (n * syy2 - syy_s * syy_s)
            ELSE 0 END AS BIGINT) AS var_reduction_bp
FROM rolled
"""

QUERIES["events_ab_cuped"] = events_ab_cuped
ORACLES["events_ab_cuped"] = AB_CUPED_SQL


# --- Discrete-time churn hazard table -----------------------------------------
#
# The survival-analysis readout under cohort_retention and
# events_dormancy_stats: per tenure-month, how many customers are
# still at risk, how many churn (last order falls in that month), how
# many are right-censored (last order within 90 days of corpus end —
# they may still return), and the discrete hazard events/at_risk in
# basis points.  Kaplan-Meier's life-table denominators come from a
# reverse cumulative sum over the BOUNDED tenure-month table; the
# per-customer reduction is one groupBy on custkey.
#
# Scale: one corpus shuffle (custkey agg), then all windows run on the
# tenure grid (months, not customers).  Censoring keyed off
# max(o_orderdate) via a 1-row broadcast — no driver round trip.

CHURN_CENSOR_DAYS = 90


def customer_churn_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    per_cust = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt"), F.max("o_orderdate").alias("last_dt")
    )
    end = orders.agg(F.max("o_orderdate").alias("end_dt"))
    marked = per_cust.crossJoin(F.broadcast(end)).select(
        F.expr("cast(datediff(last_dt, first_dt) div 30 as bigint)").alias("tenure_m"),
        F.expr(
            f"cast(datediff(end_dt, last_dt) < {CHURN_CENSOR_DAYS} as bigint)"
        ).alias("censored"),
    )
    grid = marked.groupBy("tenure_m").agg(
        F.count("*").cast("bigint").alias("n_ending"),
        F.sum("censored").cast("bigint").alias("n_censored"),
    )
    w = Window.orderBy(F.col("tenure_m").asc()).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    return grid.select(
        "tenure_m",
        F.sum("n_ending").over(w).cast("bigint").alias("n_at_risk"),
        (F.col("n_ending") - F.col("n_censored")).cast("bigint").alias("n_churned"),
        "n_censored",
    ).select(
        "tenure_m", "n_at_risk", "n_churned", "n_censored",
        F.expr("cast(n_churned * 10000 div n_at_risk as bigint)").alias("hazard_bp"),
    )


CHURN_HAZARD_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, min(o_orderdate) AS first_dt, max(o_orderdate) AS last_dt
  FROM orders GROUP BY o_custkey
),
endd AS (SELECT max(o_orderdate) AS end_dt FROM orders),
marked AS (
  SELECT CAST(datediff('day', first_dt, last_dt) // 30 AS BIGINT) AS tenure_m,
         CAST(datediff('day', last_dt, end_dt) < {CHURN_CENSOR_DAYS} AS BIGINT) AS censored
  FROM per_cust, endd
),
grid AS (
  SELECT tenure_m, count(*)::BIGINT AS n_ending, CAST(sum(censored) AS BIGINT) AS n_censored
  FROM marked GROUP BY tenure_m
),
tab AS (
  SELECT tenure_m,
         CAST(sum(n_ending) OVER (ORDER BY tenure_m
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_at_risk,
         CAST(n_ending - n_censored AS BIGINT) AS n_churned,
         n_censored
  FROM grid
)
SELECT tenure_m, n_at_risk, n_churned, n_censored,
       CAST(n_churned * 10000 // n_at_risk AS BIGINT) AS hazard_bp
FROM tab
"""

QUERIES["customer_churn_hazard"] = customer_churn_hazard
ORACLES["customer_churn_hazard"] = CHURN_HAZARD_SQL


# --- A/B sample-size / power plan ----------------------------------------------
#
# The planning step the experimentation family (events_ab_test_lift /
# events_ab_srm_check / events_ab_cuped) runs BEFORE any experiment:
# for each event type as a conversion goal, the per-arm sample size a
# two-proportion z-test needs to detect a 10% relative lift at
# alpha=0.05 / power=0.8.  The z constants enter as ONE hard-coded
# integer — (z_{a/2}+z_beta)^2 = (1.959964+0.841621)^2 in milli
# (Z2_MILLI = 7849, the Benford device) — and rates stay in truncated
# bp, so n = z^2 * (p1(1-p1)+p2(1-p2)) / delta^2 is exact integer
# arithmetic with magnitudes bounded by the bp grid at any corpus
# size.  Goals whose truncated MDE is 0 bp are emitted with n = -1
# (unmeasurable at this baseline).
#
# Scale: two distinct-user aggregations (corpus shuffles) + a
# bounded per-type rollup; the totals ride 1-row broadcasts.

Z2_MILLI = 7849  # (1.959964 + 0.841621)^2, alpha=.05 two-sided, power=.8


def events_ab_power_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    total = ev.agg(F.countDistinct("user_id").cast("bigint").alias("n_users"))
    per_type = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").cast("bigint").alias("n_converted")
    )
    base = per_type.crossJoin(F.broadcast(total)).select(
        "event_type", "n_users", "n_converted",
        F.expr("cast(n_converted * 10000 div n_users as bigint)").alias("p_bp"),
    )
    scored = base.select(
        "event_type", "n_users", "n_converted", "p_bp",
        F.expr("cast(p_bp div 10 as bigint)").alias("delta_bp"),
    ).select(
        "event_type", "n_users", "n_converted", "p_bp", "delta_bp",
        F.expr(
            "case when delta_bp = 0 or p_bp + delta_bp > 10000 then -1 else"
            f" cast({Z2_MILLI} * (p_bp * (10000 - p_bp)"
            " + (p_bp + delta_bp) * (10000 - p_bp - delta_bp))"
            " div (1000 * delta_bp * delta_bp) + 1 as bigint) end"
        ).alias("n_per_arm"),
    )
    return scored.select(
        "event_type", "n_users", "n_converted", "p_bp", "delta_bp", "n_per_arm",
        F.expr(
            "cast(n_per_arm >= 0 and 2 * n_per_arm <= n_users as int)"
        ).alias("feasible_now"),
    )


AB_POWER_SQL = f"""
WITH events_us AS (SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events),
total AS (SELECT count(DISTINCT user_id)::BIGINT AS n_users FROM events_us),
per_type AS (
  SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_converted
  FROM events_us GROUP BY event_type
),
base AS (
  SELECT event_type, n_users, n_converted,
         CAST(n_converted * 10000 // n_users AS BIGINT) AS p_bp
  FROM per_type, total
),
scored AS (
  SELECT event_type, n_users, n_converted, p_bp,
         CAST(p_bp // 10 AS BIGINT) AS delta_bp
  FROM base
),
planned AS (
  SELECT event_type, n_users, n_converted, p_bp, delta_bp,
         CASE WHEN delta_bp = 0 OR p_bp + delta_bp > 10000 THEN -1 ELSE
           CAST({Z2_MILLI} * (p_bp * (10000 - p_bp)
                + (p_bp + delta_bp) * (10000 - p_bp - delta_bp))
                // (1000 * delta_bp * delta_bp) + 1 AS BIGINT) END AS n_per_arm
  FROM scored
)
SELECT event_type, n_users, n_converted, p_bp, delta_bp, n_per_arm,
       CAST(n_per_arm >= 0 AND 2 * n_per_arm <= n_users AS INT) AS feasible_now
FROM planned
"""

QUERIES["events_ab_power_plan"] = events_ab_power_plan
ORACLES["events_ab_power_plan"] = AB_POWER_SQL


# --- Daypart activity archetypes ----------------------------------------------
#
# The lightweight behavioral segmentation under user_behavior_entropy:
# each user's events split into four dayparts (hour div 6 — night /
# morning / afternoon / evening), the user labeled with the argmax
# daypart (ties resolved toward the earlier daypart by the ordered
# CASE cascade — deterministic, no floats), and the corpus rolled up
# per archetype with share and mean-activity stats.  The segmentation
# a notification scheduler or capacity planner actually ships.
#
# Scale: ONE corpus aggregation to user grain (conditional sums — no
# explode, no per-daypart rescans), then a bounded 4-row archetype
# rollup; shares in truncated bp.

def user_daypart_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr("cast(hour(ts) div 6 as int)").alias("dp")
    )
    per_user = ev.groupBy("user_id").agg(
        *[
            F.sum((F.col("dp") == i).cast("bigint")).cast("bigint").alias(f"n{i}")
            for i in range(4)
        ]
    )
    labeled = per_user.select(
        "user_id",
        (F.col("n0") + F.col("n1") + F.col("n2") + F.col("n3")).alias("n_events"),
        F.when(
            (F.col("n0") >= F.col("n1")) & (F.col("n0") >= F.col("n2")) & (F.col("n0") >= F.col("n3")),
            "night",
        )
        .when((F.col("n1") >= F.col("n2")) & (F.col("n1") >= F.col("n3")), "morning")
        .when(F.col("n2") >= F.col("n3"), "afternoon")
        .otherwise("evening")
        .alias("archetype"),
    )
    tot = labeled.agg(F.count("*").cast("bigint").alias("n_users"))
    return (
        labeled.groupBy("archetype")
        .agg(
            F.count("*").cast("bigint").alias("n_archetype_users"),
            F.sum("n_events").cast("bigint").alias("n_events"),
            F.expr("cast(sum(n_events) div count(*) as bigint)").alias(
                "mean_events_per_user"
            ),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "archetype", "n_archetype_users", "n_events", "mean_events_per_user",
            F.expr("cast(n_archetype_users * 10000 div n_users as bigint)").alias(
                "users_share_bp"
            ),
        )
    )


DAYPART_SQL = """
WITH events_us AS (SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events),
per_user AS (
  SELECT user_id,
         CAST(sum(CASE WHEN hour(ts) // 6 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN hour(ts) // 6 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN hour(ts) // 6 = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         CAST(sum(CASE WHEN hour(ts) // 6 = 3 THEN 1 ELSE 0 END) AS BIGINT) AS n3
  FROM events_us GROUP BY user_id
),
labeled AS (
  SELECT user_id, n0 + n1 + n2 + n3 AS n_events,
         CASE WHEN n0 >= n1 AND n0 >= n2 AND n0 >= n3 THEN 'night'
              WHEN n1 >= n2 AND n1 >= n3 THEN 'morning'
              WHEN n2 >= n3 THEN 'afternoon'
              ELSE 'evening' END AS archetype
  FROM per_user
),
tot AS (SELECT count(*)::BIGINT AS n_users FROM labeled)
SELECT archetype, count(*)::BIGINT AS n_archetype_users,
       CAST(sum(n_events) AS BIGINT) AS n_events,
       CAST(sum(n_events) // count(*) AS BIGINT) AS mean_events_per_user,
       CAST(count(*) * 10000 // n_users AS BIGINT) AS users_share_bp
FROM labeled, tot GROUP BY archetype, n_users
"""

QUERIES["user_daypart_profile"] = user_daypart_profile
ORACLES["user_daypart_profile"] = DAYPART_SQL


# --- Markov-chain entropy rate ------------------------------------------------
#
# How predictable is the NEXT action given the current one?  The
# entropy rate H(Y|X) = -sum p(x,y)·ln p(y|x) of the user-journey
# Markov chain, next to the unconditional H(Y) (user_behavior_entropy
# family) — their gap is the predictability the transition structure
# buys.  The ln-quantize device (zipf_fit): ln of each transition
# probability is floored at 1e4 grain, entropy sums stay exact
# integers weighted by counts, results in nat-milli via one division.
#
# Scale: the production transition pipeline (one lead window keyed by
# user), then everything on the BOUNDED types² grid; totals ride
# broadcasts.  H(Y|X) <= H(Y) (conditioning reduces entropy) lands as
# a flag, exact on the quantized grid.

def events_markov_entropy_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .where(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), F.col("next_type").alias("nxt"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)  # pin: feeds row totals, grand total, both sums
    )
    row_tot = trans.groupBy("cur").agg(F.sum("n").cast("bigint").alias("n_cur"))
    grand = trans.agg(F.sum("n").cast("bigint").alias("n_all"))
    # -ln p(y|x) quantized: floor(ln(n_cur / n) * 1e4) = exact on the grid
    cond = (
        trans.join(F.broadcast(row_tot), "cur")
        .select(
            "n",
            F.expr(
                "cast(floor(ln(cast(n_cur as double) / cast(n as double)) * 10000)"
                " as bigint)"
            ).alias("nl_q"),
        )
        .agg(
            F.expr("cast(sum(n * nl_q) as bigint)").alias("num"),
            F.expr("cast(sum(n) as bigint)").alias("den"),
        )
    )
    nxt_tot = trans.groupBy("nxt").agg(F.sum("n").cast("bigint").alias("n_nxt"))
    uncond = (
        nxt_tot.crossJoin(F.broadcast(grand))
        .select(
            "n_nxt",
            F.expr(
                "cast(floor(ln(cast(n_all as double) / cast(n_nxt as double)) * 10000)"
                " as bigint)"
            ).alias("nl_q"),
        )
        .agg(
            F.expr("cast(sum(n_nxt * nl_q) as bigint)").alias("unum"),
            F.expr("cast(sum(n_nxt) as bigint)").alias("uden"),
        )
    )
    return cond.crossJoin(F.broadcast(uncond)).select(
        F.col("den").alias("n_transitions"),
        F.expr("cast(num div den as bigint)").alias("h_rate_nat_e4"),
        F.expr("cast(unum div uden as bigint)").alias("h_marginal_nat_e4"),
        F.expr("cast((unum div uden) - (num div den) as bigint)").alias(
            "predictability_gain_e4"
        ),
        F.expr("cast(num div den <= unum div uden as int)").alias("conditioning_helps"),
    )


MARKOV_ENTROPY_SQL = """
WITH events_us AS (SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events),
trans AS (
  SELECT event_type AS cur, next_type AS nxt, count(*)::BIGINT AS n
  FROM (
    SELECT event_type,
           lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events_us
  ) WHERE next_type IS NOT NULL
  GROUP BY cur, nxt
),
row_tot AS (SELECT cur, CAST(sum(n) AS BIGINT) AS n_cur FROM trans GROUP BY cur),
grand AS (SELECT CAST(sum(n) AS BIGINT) AS n_all FROM trans),
cond AS (
  SELECT CAST(sum(t.n * CAST(floor(ln(CAST(r.n_cur AS DOUBLE) / CAST(t.n AS DOUBLE))
                 * 10000) AS BIGINT)) AS BIGINT) AS num,
         CAST(sum(t.n) AS BIGINT) AS den
  FROM trans t JOIN row_tot r USING (cur)
),
nxt_tot AS (SELECT nxt, CAST(sum(n) AS BIGINT) AS n_nxt FROM trans GROUP BY nxt),
uncond AS (
  SELECT CAST(sum(n_nxt * CAST(floor(ln(CAST(n_all AS DOUBLE) / CAST(n_nxt AS DOUBLE))
                 * 10000) AS BIGINT)) AS BIGINT) AS unum,
         CAST(sum(n_nxt) AS BIGINT) AS uden
  FROM nxt_tot, grand
)
SELECT den AS n_transitions,
       CAST(num // den AS BIGINT) AS h_rate_nat_e4,
       CAST(unum // uden AS BIGINT) AS h_marginal_nat_e4,
       CAST((unum // uden) - (num // den) AS BIGINT) AS predictability_gain_e4,
       CAST(num // den <= unum // uden AS INT) AS conditioning_helps
FROM cond, uncond
"""

QUERIES["events_markov_entropy_rate"] = events_markov_entropy_rate
ORACLES["events_markov_entropy_rate"] = MARKOV_ENTROPY_SQL


# --- sequence pattern matching over user journeys --------------------------------
#
# The sequenceMatch analytic (ClickHouse's public sequence-analytics
# surface): does a user's ordered event stream contain a pattern —
# view then purchase, view then purchase with NO error between,
# signup leading through view to purchase?  Each user's journey
# collapses to one compact letter string (first char of each type —
# distinct across the five types: c/e/p/s/v) in (ts, event_id) order,
# and each pattern is one regex over that string; both engines' regex
# dialects agree on the `.`/`[^x]`/`*` subset used.  Output: per
# pattern, matching users and the share in bp.
#
# Scale: ONE shuffle (user_id) -> per-user sorted fold to a string
# bounded by the user's history (the sessionizer bound); pattern
# checks are per-row regexes; the rollup is a 3-row aggregate.

SEQ_PATTERNS = [
    ("view_then_purchase", "v.*p"),
    ("view_purchase_clean", "v[^e]*p"),
    ("signup_view_purchase", "s.*v.*p"),
]


def events_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list("
                "struct(ts, event_id, substring(event_type, 1, 1) as c))), x -> x.c), '')"
            ).alias("seq")
        )
    )
    flags = per_user.select(
        *[
            F.col("seq").rlike(rx).cast("bigint").alias(name)
            for name, rx in SEQ_PATTERNS
        ]
    ).agg(
        F.count(F.lit(1)).alias("n_users"),
        *[F.sum(name).alias(f"m_{name}") for name, _ in SEQ_PATTERNS],
    )
    pat_rows = F.array(
        *[
            F.struct(
                F.lit(name).alias("pattern"),
                F.col(f"m_{name}").alias("n_match"),
            )
            for name, _ in SEQ_PATTERNS
        ]
    )
    return flags.select("n_users", F.explode(pat_rows).alias("p")).select(
        F.col("p.pattern").alias("pattern"),
        F.col("p.n_match").cast("bigint").alias("n_match"),
        F.col("n_users").cast("bigint").alias("n_users"),
        F.expr("p.n_match * 10000 div n_users").cast("bigint").alias("share_bp"),
    )


_SEQ_FLAGS = ", ".join(
    f"CAST(sum(CASE WHEN regexp_matches(seq, '{rx}') THEN 1 ELSE 0 END) AS BIGINT) AS m_{name}"
    for name, rx in SEQ_PATTERNS
)
_SEQ_ROWS = ", ".join(
    f"struct_pack(pattern := '{name}', n_match := m_{name})" for name, _ in SEQ_PATTERNS
)

SEQUENCE_MATCH_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
per_user AS (
  SELECT user_id,
         array_to_string(list_transform(list_sort(list(
             struct_pack(ts := ts, event_id := event_id,
                         c := substr(event_type, 1, 1)))), x -> x.c), '') AS seq
  FROM events_us GROUP BY user_id
),
flags AS (SELECT count(*)::BIGINT AS n_users, {_SEQ_FLAGS} FROM per_user)
SELECT p.pattern, p.n_match, n_users,
       CAST(p.n_match * 10000 // n_users AS BIGINT) AS share_bp
FROM flags, (SELECT unnest([{_SEQ_ROWS}]) AS p)
"""

QUERIES["events_sequence_match"] = events_sequence_match
ORACLES["events_sequence_match"] = SEQUENCE_MATCH_SQL


# --- LZ78 sequence complexity of user journeys ------------------------------------
#
# How algorithmically rich is a user's behavior stream?  LZ78 phrase
# complexity (Lempel & Ziv 1978) — the number of distinct phrases the
# incremental parse emits — is the classic compressibility measure for
# behavioral sequences (bot streams parse into few phrases, diverse
# human journeys into many).  The parse is genuinely sequential per
# user (dictionary state), so it runs as the house F.aggregate fold /
# recursive-CTE pair: state = (delimited phrase dictionary, current
# phrase, count), the dictionary membership test one delimited
# `instr`.  Corpus rollup: per event-type-sequence length band, users,
# mean phrase count (milli) and mean compression ratio c/L (bp) —
# exact integer sums.
#
# Scale: ONE user_id shuffle -> per-user letter string (the
# sessionizer bound) -> linear fold; dictionary state is bounded by
# the user's own sequence.  The rollup is a bounded band aggregate.

def events_lz_complexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    per_user = ev.groupBy("user_id").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list("
            "struct(ts, event_id, substring(event_type, 1, 1) as c))), x -> x.c), '')"
        ).alias("seq")
    )
    folded = per_user.select(
        "user_id",
        F.length("seq").cast("bigint").alias("len"),
        F.expr(
            """
            aggregate(
              transform(sequence(1, length(seq)), i -> substring(seq, i, 1)),
              named_struct('dict', '|', 'w', '', 'c', cast(0 as bigint)),
              (acc, ch) -> case
                when instr(acc.dict, '|' || acc.w || ch || '|') > 0
                  then named_struct('dict', acc.dict, 'w', acc.w || ch, 'c', acc.c)
                else named_struct(
                  'dict', acc.dict || acc.w || ch || '|', 'w', '', 'c', acc.c + 1)
                end,
              acc -> acc.c + (case when acc.w <> '' then 1 else 0 end))
            """
        ).alias("c"),
    )
    bands = folded.select(
        F.expr("length(cast(len as string))").cast("bigint").alias("len_band"),
        "len",
        "c",
    )
    return (
        bands.groupBy("len_band")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum("len").alias("total_events"),
            F.expr("sum(c) * 1000 div count(1)").alias("mean_phrases_milli"),
            F.max("c").alias("max_phrases"),
            F.expr("sum(c * 10000 div len) div count(1)").alias("mean_ratio_bp"),
        )
        .select(
            "len_band",
            F.col("n_users").cast("bigint").alias("n_users"),
            F.col("total_events").cast("bigint").alias("total_events"),
            F.col("mean_phrases_milli").cast("bigint").alias("mean_phrases_milli"),
            F.col("max_phrases").cast("bigint").alias("max_phrases"),
            F.col("mean_ratio_bp").cast("bigint").alias("mean_ratio_bp"),
        )
    )


LZ_COMPLEXITY_SQL = """
WITH RECURSIVE events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
per_user AS (
  SELECT user_id,
         array_to_string(list_transform(list_sort(list(
             struct_pack(ts := ts, event_id := event_id,
                         c := substr(event_type, 1, 1)))), x -> x.c), '') AS seq
  FROM events_us GROUP BY user_id
),
walk AS (
  SELECT user_id, seq, length(seq) AS len, 0::BIGINT AS i,
         '|' AS dict, '' AS w, 0::BIGINT AS c
  FROM per_user
  UNION ALL
  SELECT user_id, seq, len, i + 1,
         CASE WHEN instr(dict, '|' || w || substr(seq, (i + 1)::INT, 1) || '|') > 0
              THEN dict
              ELSE dict || w || substr(seq, (i + 1)::INT, 1) || '|' END,
         CASE WHEN instr(dict, '|' || w || substr(seq, (i + 1)::INT, 1) || '|') > 0
              THEN w || substr(seq, (i + 1)::INT, 1)
              ELSE '' END,
         CASE WHEN instr(dict, '|' || w || substr(seq, (i + 1)::INT, 1) || '|') > 0
              THEN c ELSE c + 1 END
  FROM walk WHERE i < len
),
final AS (
  SELECT user_id, len, c + (CASE WHEN w <> '' THEN 1 ELSE 0 END) AS c
  FROM walk WHERE i = len
),
bands AS (
  SELECT length(CAST(len AS VARCHAR)) AS len_band, len, c FROM final
)
SELECT CAST(len_band AS BIGINT) AS len_band, count(*)::BIGINT AS n_users,
       CAST(sum(len) AS BIGINT) AS total_events,
       CAST(sum(c) * 1000 // count(*) AS BIGINT) AS mean_phrases_milli,
       CAST(max(c) AS BIGINT) AS max_phrases,
       CAST(sum(c * 10000 // len) // count(*) AS BIGINT) AS mean_ratio_bp
FROM bands GROUP BY len_band
"""

QUERIES["events_lz_complexity"] = events_lz_complexity
ORACLES["events_lz_complexity"] = LZ_COMPLEXITY_SQL


# --- retention-curve power-law fit ----------------------------------------------
#
# events_dod_retention measures day+1 only; the planning question is
# the CURVE — retention at horizon k typically decays as a power law
# r(k) ~ c·k^(-s) (the classic mobile-analytics finding), and the
# fitted exponent is the number a growth model extrapolates with.
# Retention at k = P(user active on day D returns on D+k) for
# k = 1..RET_MAX_K, then the ln-quantize integer OLS (the zipf/heaps
# device) of ln(ret_bp) on ln(k) over the horizon grid.  Per-k rows
# ship alongside the fitted slope/intercept so the curve AND the fit
# are auditable.
#
# Plan: the distinct (user, day) activity set joins itself shifted by
# each k in one broadcast of the 10-row horizon table — rows ∝
# activity x K, aggregated immediately; the OLS runs on the bounded
# 10-row grid.

RET_MAX_K = 10
_RLQ = 10000  # ln quantization for the fit


def events_retention_curve_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    act = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.to_date("ts").alias("day"))
        .distinct()
    )
    ks = spark.range(1, RET_MAX_K + 1).select(F.col("id").cast("int").alias("k"))
    base = act.crossJoin(F.broadcast(ks))
    right = act.select(
        F.col("user_id").alias("r_uid"), F.col("day").alias("rday")
    ).withColumn("hit", F.lit(1))
    ret = base.join(
        right,
        (F.col("rday") == F.expr("date_add(day, k)")) & (F.col("user_id") == F.col("r_uid")),
        "left",
    )
    perk = ret.groupBy("k").agg(
        F.count(F.lit(1)).alias("active_pairs"),
        F.count("hit").alias("retained"),
    ).select(
        "k",
        "active_pairs",
        "retained",
        F.expr("retained * 10000 div active_pairs").cast("bigint").alias("ret_bp"),
    )
    pts = perk.select(
        "k",
        F.expr(f"cast(floor(ln(cast(k as double)) * {_RLQ}) as bigint)").alias("x"),
        F.expr(f"cast(floor(ln(cast(ret_bp as double)) * {_RLQ}) as bigint)").alias("y"),
    ).where(F.col("ret_bp") > 0)
    fit = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
    ).select(
        F.expr(
            f"cast((n * sxy - sx * sy) * 1000 div (n * sxx - sx * sx) as bigint)"
        ).alias("decay_slope_milli"),
        F.expr(
            f"cast((sy * sxx - sx * sxy) div (n * sxx - sx * sx) as bigint)"
        ).alias("intercept_lnq"),
    )
    return perk.crossJoin(F.broadcast(fit)).select(
        F.col("k").cast("bigint").alias("k"),
        F.col("active_pairs").cast("bigint").alias("active_pairs"),
        F.col("retained").cast("bigint").alias("retained"),
        "ret_bp",
        "decay_slope_milli",
        "intercept_lnq",
    )


RETENTION_FIT_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
act AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events_us),
ks AS (SELECT unnest(generate_series(1, {RET_MAX_K})) AS k),
perk AS (
  SELECT k, count(*)::BIGINT AS active_pairs,
         CAST(count(b.user_id) AS BIGINT) AS retained,
         CAST(count(b.user_id) * 10000 // count(*) AS BIGINT) AS ret_bp
  FROM act a CROSS JOIN ks
  LEFT JOIN act b ON b.user_id = a.user_id AND b.day = a.day + to_days(k::INT)
  GROUP BY k
),
pts AS (
  SELECT CAST(floor(ln(CAST(k AS DOUBLE)) * {_RLQ}) AS BIGINT) AS x,
         CAST(floor(ln(CAST(ret_bp AS DOUBLE)) * {_RLQ}) AS BIGINT) AS y
  FROM perk WHERE ret_bp > 0
),
fit AS (
  SELECT CAST((n * sxy - sx * sy) * 1000 // (n * sxx - sx * sx) AS BIGINT) AS decay_slope_milli,
         CAST((sy * sxx - sx * sxy) // (n * sxx - sx * sx) AS BIGINT) AS intercept_lnq
  FROM (
    SELECT count(*)::BIGINT AS n, CAST(sum(x) AS BIGINT) AS sx,
           CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
           CAST(sum(x * x) AS BIGINT) AS sxx
    FROM pts)
)
SELECT CAST(k AS BIGINT) AS k, active_pairs, retained, ret_bp,
       decay_slope_milli, intercept_lnq
FROM perk CROSS JOIN fit
"""

QUERIES["events_retention_curve_fit"] = events_retention_curve_fit
ORACLES["events_retention_curve_fit"] = RETENTION_FIT_SQL


# --- sequential probability ratio test (SPRT) -----------------------------------
#
# The experimentation family's SEQUENTIAL member beside the fixed-n
# tests (events_ab_test_lift / CUPED / SRM / power planner): Wald's
# SPRT (1945) accumulates the binomial log-likelihood ratio day by day
# and stops the moment it crosses ln((1-beta)/alpha) (ship) or
# ln(beta/(1-alpha)) (stop) — the legitimate way to peek at an A/B
# test daily.  Control's overall conversion freezes p0, the MDE sets
# p1 = p0 x 1.2; per-day increments quantize to e4 integers on
# identical doubles, so the fold state and the crossing day are exact.
#
# Plan: one (arm, day) aggregation of per-(user, day) activity, then a
# bounded fold over the treatment day series; crossing bounded by the
# calendar, not data volume.

SPRT_ALPHA_MILLI = 50  # alpha = 0.05
SPRT_BETA_MILLI = 100  # beta = 0.10
SPRT_MDE_PCT = 20  # p1 = p0 * 1.2


def events_ab_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.to_date("ts").alias("day")
    )
    act = ev.groupBy("user_id", "day").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv")
    )
    daily = act.select(
        F.when(F.col("user_id") % 2 == 0, "control").otherwise("treatment").alias("arm"),
        "day",
        "conv",
    ).groupBy("arm", "day").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("c")
    )
    p0 = daily.where(F.col("arm") == "control").agg(
        F.sum("c").alias("c0"), F.sum("n").alias("t0")
    )
    tdays = (
        daily.where(F.col("arm") == "treatment")
        .groupBy()
        .agg(F.sort_array(F.collect_list(F.struct("day", "n", "c"))).alias("ds"))
        .crossJoin(F.broadcast(p0))
    )
    # identical-double pieces: p0 = c0/t0, p1 = p0*1.2 (clamped), per-day
    # increment floor(.*1e4); boundaries as e4 ints from double lns
    P0 = "(c0 / cast(t0 as double))"
    P1 = f"(least({P0} * (100 + {SPRT_MDE_PCT}) / 100.0, 0.999))"
    INC = (
        f"cast(floor((d.c * ln({P1} / {P0})"
        f" + (d.n - d.c) * ln((1.0 - {P1}) / (1.0 - {P0}))) * 10000) as bigint)"
    )
    A = f"cast(floor(ln((1000.0 - {SPRT_BETA_MILLI}) / {SPRT_ALPHA_MILLI}) * 10000) as bigint)"
    B = f"cast(floor(ln(cast({SPRT_BETA_MILLI} as double) / (1000.0 - {SPRT_ALPHA_MILLI})) * 10000) as bigint)"
    folded = tdays.select(
        F.expr("size(ds)").cast("bigint").alias("n_days"),
        F.expr(f"{A}").alias("upper_e4"),
        F.expr(f"{B}").alias("lower_e4"),
        F.expr(f"cast(floor({P0} * 1000000) as bigint)").alias("p0_micro"),
        F.expr(f"cast(floor({P1} * 1000000) as bigint)").alias("p1_micro"),
        F.expr(
            f"""
            aggregate(ds,
              named_struct('llr', cast(0 as bigint), 'i', cast(0 as bigint),
                           'hit', cast(0 as bigint), 'hit_day', cast(null as date)),
              (acc, d) -> case when acc.hit <> 0 then acc else
                named_struct(
                  'llr', acc.llr + {INC},
                  'i', acc.i + 1,
                  'hit', case when acc.llr + {INC} >= {A} then 1
                              when acc.llr + {INC} <= {B} then -1 else 0 end,
                  'hit_day', case when acc.llr + {INC} >= {A}
                                    or acc.llr + {INC} <= {B} then d.day end)
              end)
            """
        ).alias("st"),
    )
    return folded.select(
        "n_days",
        F.col("st.i").alias("days_observed"),
        F.col("st.llr").alias("llr_e4"),
        "upper_e4",
        "lower_e4",
        "p0_micro",
        "p1_micro",
        F.expr(
            "case st.hit when 1 then 'accept_h1' when -1 then 'accept_h0'"
            " else 'continue' end"
        ).alias("decision"),
        F.col("st.hit_day").alias("decision_day"),
    )


_SP_P0 = "(c0 / CAST(t0 AS DOUBLE))"
_SP_P1 = f"(least({_SP_P0} * (100 + {SPRT_MDE_PCT}) / 100.0, 0.999))"
_SP_INC = (
    f"CAST(floor((dw[(i + 1)::INT].c * ln({_SP_P1} / {_SP_P0})"
    f" + (dw[(i + 1)::INT].n - dw[(i + 1)::INT].c)"
    f" * ln((1.0 - {_SP_P1}) / (1.0 - {_SP_P0}))) * 10000) AS BIGINT)"
)
_SP_A = f"CAST(floor(ln((1000.0 - {SPRT_BETA_MILLI}) / {SPRT_ALPHA_MILLI}) * 10000) AS BIGINT)"
_SP_B = f"CAST(floor(ln(CAST({SPRT_BETA_MILLI} AS DOUBLE) / (1000.0 - {SPRT_ALPHA_MILLI})) * 10000) AS BIGINT)"

SPRT_SQL = f"""
WITH RECURSIVE events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
act AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events_us GROUP BY 1, 2
),
daily AS (
  SELECT CASE WHEN user_id % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm,
         day, count(*)::BIGINT AS n, CAST(sum(conv) AS BIGINT) AS c
  FROM act GROUP BY 1, 2
),
p0 AS (
  SELECT CAST(sum(c) AS BIGINT) AS c0, CAST(sum(n) AS BIGINT) AS t0
  FROM daily WHERE arm = 'control'
),
td AS (
  SELECT list_sort(list(struct_pack(day := day, n := n, c := c))) AS dw,
         count(*)::BIGINT AS nd
  FROM daily WHERE arm = 'treatment'
),
walk AS (
  SELECT dw, nd, c0, t0, 0::BIGINT AS i, 0::BIGINT AS llr,
         0::BIGINT AS hit, CAST(NULL AS DATE) AS hit_day
  FROM td, p0
  UNION ALL
  SELECT dw, nd, c0, t0, i + 1,
         llr + {_SP_INC},
         CASE WHEN llr + {_SP_INC} >= {_SP_A} THEN 1
              WHEN llr + {_SP_INC} <= {_SP_B} THEN -1 ELSE 0 END,
         CASE WHEN llr + {_SP_INC} >= {_SP_A} OR llr + {_SP_INC} <= {_SP_B}
              THEN dw[(i + 1)::INT].day END
  FROM walk WHERE i < nd AND hit = 0
),
last AS (
  SELECT * FROM walk WHERE hit <> 0 OR i = nd ORDER BY i LIMIT 1
)
SELECT nd AS n_days, i AS days_observed, llr AS llr_e4,
       {_SP_A} AS upper_e4, {_SP_B} AS lower_e4,
       CAST(floor({_SP_P0} * 1000000) AS BIGINT) AS p0_micro,
       CAST(floor({_SP_P1} * 1000000) AS BIGINT) AS p1_micro,
       CASE hit WHEN 1 THEN 'accept_h1' WHEN -1 THEN 'accept_h0'
            ELSE 'continue' END AS decision,
       hit_day AS decision_day
FROM last
"""

QUERIES["events_ab_sprt"] = events_ab_sprt
ORACLES["events_ab_sprt"] = SPRT_SQL


# --- Kaplan-Meier product-limit survival ----------------------------------------
#
# The named estimator customer_churn_hazard's risk grid exists to feed
# (Kaplan & Meier 1958): S(t) = prod_{i<=t} (1 - d_i/n_i) with
# right-censored customers (still active at the observation end)
# leaving the risk set without counting as churn events. The product
# of per-bucket ratios is made engine-reproducible by the house
# ln-quantize fold: each survival factor (n_i-d_i)/n_i is a double
# derived from identical BIGINTs, its ln floor-quantizes to exact
# integer micros, the cumulative sum over the ordered tenure grid is
# pure integer arithmetic, and the final exp runs on an identical
# integer-derived double in both engines before bp floor-quantization.
# A bucket where everyone at risk churns (factor 0) zeroes the curve
# from there on — tracked with a prefix max flag so ln never sees 0.
#
# Scale: rides the hazard grid (one per-customer agg + a bounded
# tenure-grid window); the curve table is at most max-tenure rows.

def customer_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    per_cust = orders.groupBy("o_custkey").agg(
        F.min("o_orderdate").alias("first_dt"), F.max("o_orderdate").alias("last_dt")
    )
    end = orders.agg(F.max("o_orderdate").alias("end_dt"))
    marked = per_cust.crossJoin(F.broadcast(end)).select(
        F.expr("cast(datediff(last_dt, first_dt) div 30 as bigint)").alias("tenure_m"),
        F.expr(
            f"cast(datediff(end_dt, last_dt) < {CHURN_CENSOR_DAYS} as bigint)"
        ).alias("censored"),
    )
    grid = marked.groupBy("tenure_m").agg(
        F.count("*").cast("bigint").alias("n_ending"),
        F.sum("censored").cast("bigint").alias("n_censored"),
    )
    w_risk = Window.orderBy(F.col("tenure_m").asc()).rowsBetween(
        Window.currentRow, Window.unboundedFollowing
    )
    tab = grid.select(
        "tenure_m",
        F.sum("n_ending").over(w_risk).cast("bigint").alias("n_at_risk"),
        (F.col("n_ending") - F.col("n_censored")).cast("bigint").alias("n_churned"),
        "n_censored",
    )
    w_pre = Window.orderBy(F.col("tenure_m").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    stepped = tab.select(
        "tenure_m",
        "n_at_risk",
        "n_churned",
        "n_censored",
        # ln of the survival factor in exact integer micros; 0-factor
        # buckets contribute a sentinel handled by the zeroed flag
        F.expr(
            "case when n_at_risk > n_churned then"
            " cast(floor(ln((n_at_risk - n_churned) / cast(n_at_risk as double)) * 1000000) as bigint)"
            " else 0 end"
        ).alias("lnf_micro"),
        F.expr("case when n_at_risk = n_churned then 1 else 0 end").alias("zf"),
    )
    return stepped.select(
        "tenure_m",
        "n_at_risk",
        "n_churned",
        "n_censored",
        F.sum("lnf_micro").over(w_pre).cast("bigint").alias("ln_surv_micro"),
        F.max("zf").over(w_pre).alias("zeroed"),
    ).select(
        "tenure_m",
        "n_at_risk",
        "n_churned",
        "n_censored",
        F.expr("case when zeroed = 1 then null else ln_surv_micro end").alias(
            "ln_surv_micro"
        ),
        F.expr(
            "case when zeroed = 1 then 0 else"
            " cast(floor(exp(ln_surv_micro / 1000000.0) * 10000 + 0.5) as bigint) end"
        ).alias("surv_bp"),
    )


KM_SURVIVAL_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, min(o_orderdate) AS first_dt, max(o_orderdate) AS last_dt
  FROM orders GROUP BY o_custkey
),
endd AS (SELECT max(o_orderdate) AS end_dt FROM orders),
marked AS (
  SELECT CAST(datediff('day', first_dt, last_dt) // 30 AS BIGINT) AS tenure_m,
         CAST(datediff('day', last_dt, end_dt) < {CHURN_CENSOR_DAYS} AS BIGINT) AS censored
  FROM per_cust, endd
),
grid AS (
  SELECT tenure_m, count(*)::BIGINT AS n_ending, CAST(sum(censored) AS BIGINT) AS n_censored
  FROM marked GROUP BY tenure_m
),
tab AS (
  SELECT tenure_m,
         CAST(sum(n_ending) OVER (ORDER BY tenure_m
              ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_at_risk,
         CAST(n_ending - n_censored AS BIGINT) AS n_churned,
         n_censored
  FROM grid
),
stepped AS (
  SELECT tenure_m, n_at_risk, n_churned, n_censored,
         CASE WHEN n_at_risk > n_churned THEN
           CAST(floor(ln((n_at_risk - n_churned) / CAST(n_at_risk AS DOUBLE)) * 1000000) AS BIGINT)
         ELSE 0 END AS lnf_micro,
         CASE WHEN n_at_risk = n_churned THEN 1 ELSE 0 END AS zf
  FROM tab
),
acc AS (
  SELECT tenure_m, n_at_risk, n_churned, n_censored,
         CAST(sum(lnf_micro) OVER (ORDER BY tenure_m
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ln_surv_micro,
         max(zf) OVER (ORDER BY tenure_m
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS zeroed
  FROM stepped
)
SELECT tenure_m, n_at_risk, n_churned, n_censored,
       CASE WHEN zeroed = 1 THEN NULL ELSE ln_surv_micro END AS ln_surv_micro,
       CASE WHEN zeroed = 1 THEN 0 ELSE
         CAST(floor(exp(ln_surv_micro / 1000000.0) * 10000 + 0.5) AS BIGINT) END AS surv_bp
FROM acc
"""

QUERIES["customer_survival_km"] = customer_survival_km
ORACLES["customer_survival_km"] = KM_SURVIVAL_SQL


# --- uplift-model evaluation: the Qini curve ------------------------------------
#
# The eval the experimentation ring was missing: given a (planted)
# uplift-model score per user, rank users by score, cut into deciles,
# and report the cumulative treatment-vs-control conversion gap per
# targeting depth — the Qini curve (Radcliffe 2007), THE standard
# offline metric for "whom should we treat first".  Arms and the
# conversion label reuse events_ab_test_lift's conventions (arm =
# user_id parity, converted = purchase count above the corpus median);
# the score is a deterministic md5 stand-in (the METRIC is under test,
# not the model).  All outputs are exact integers: qini_scaled(d) =
# x_t_cum * n_c_cum - x_c_cum * n_t_cum (the Qini numerator scaled by
# the control mass) and uplift_bp uses truncating per-arm division,
# guarded with greatest(n, 1) so an all-treated (or all-control) first
# decile yields 0-from-empty-arm in BOTH engines instead of NULL in
# Spark vs a division error in DuckDB.
#
# Scale: one user-grain agg + a 1-row broadcast median computed from
# the bounded count-table device (distinct purchase-count support +
# two middle order statistics, 2*cnt > lo+hi == cnt > median exactly)
# — NOT percentile() over the entity-grain table, which would
# materialize every per-user value in one aggregation buffer; the global
# ranking runs as functions.distributed.sequential_ids (range
# repartition + per-partition numbering + broadcast offsets — NOT a
# single-task global window) over the (score desc, user asc) composite
# encoded as one ascending bigint; all cumulative work then happens on
# the 10-row decile table.


def events_uplift_qini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import md5_int32

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    counts = ev.groupBy("user_id").agg(
        F.sum((F.col("event_type") == "purchase").cast("int")).alias("cnt")
    )
    # Exact median WITHOUT percentile()-over-entity-grain (which
    # materializes every per-user value in one agg buffer): the
    # bounded count-table device — cumulate the distinct-value support
    # (bounded by the purchase-count domain, the house "value support"
    # exception), read the two middle order statistics, and compare
    # 2*cnt > lo+hi, which is exactly cnt > (lo+hi)/2 = median in
    # integers. Same label as percentile(cnt, 0.5) in both engines.
    vc = counts.groupBy("cnt").agg(F.count(F.lit(1)).alias("c"))
    w_sup = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, 0)
    cum = vc.select("cnt", F.sum("c").over(w_sup).alias("cum"))
    n_all = counts.agg(F.count(F.lit(1)).alias("n_users_all"))
    med2 = (
        cum.crossJoin(F.broadcast(n_all))
        .agg(
            F.min(
                F.when(F.col("cum") >= F.expr("(n_users_all + 1) div 2"), F.col("cnt"))
            ).alias("lo"),
            F.min(
                F.when(F.col("cum") >= F.expr("n_users_all div 2 + 1"), F.col("cnt"))
            ).alias("hi"),
        )
        .select((F.col("lo") + F.col("hi")).alias("med2"))
    )
    per_user = counts.crossJoin(F.broadcast(med2)).select(
        "user_id",
        (F.col("cnt") * 2 > F.col("med2")).cast("int").alias("converted"),
        (F.pmod(F.col("user_id"), 2) == 1).cast("int").alias("treated"),
        F.pmod(md5_int32(F.col("user_id").cast("string")), 1000).alias("score"),
    )
    n_df = per_user.agg(F.count(F.lit(1)).alias("n"))
    # distributed global rank (no single-task window): encode the
    # (score desc, user_id asc) composite as one ascending bigint and
    # number via the range-repartition + broadcast-offsets two-pass
    from ..functions.distributed import sequential_ids

    keyed = per_user.withColumn(
        "ord", (F.lit(999) - F.col("score")) * F.lit(1 << 40) + F.col("user_id")
    )
    ranked = (
        sequential_ids(keyed, "ord", id_col="rn")
        .crossJoin(F.broadcast(n_df))
        .select(
            "*", F.expr("(rn - 1) * 10 div n + 1").cast("int").alias("decile")
        )
    )
    per_dec = ranked.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("treated").alias("n_t"),
        F.sum(F.col("treated") * F.col("converted")).alias("x_t"),
        F.sum(1 - F.col("treated")).alias("n_c"),
        F.sum((1 - F.col("treated")) * F.col("converted")).alias("x_c"),
    )
    wc = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_dec.select(
        "decile",
        F.sum("n_users").over(wc).cast("bigint").alias("n_users_cum"),
        F.sum("n_t").over(wc).cast("bigint").alias("n_t_cum"),
        F.sum("x_t").over(wc).cast("bigint").alias("x_t_cum"),
        F.sum("n_c").over(wc).cast("bigint").alias("n_c_cum"),
        F.sum("x_c").over(wc).cast("bigint").alias("x_c_cum"),
    )
    return cum.select(
        F.col("decile").cast("bigint").alias("decile"),
        "n_users_cum", "n_t_cum", "x_t_cum", "n_c_cum", "x_c_cum",
        F.expr(
            "10000 * x_t_cum div greatest(n_t_cum, 1)"
            " - 10000 * x_c_cum div greatest(n_c_cum, 1)"
        ).alias("uplift_bp"),
        (F.col("x_t_cum") * F.col("n_c_cum") - F.col("x_c_cum") * F.col("n_t_cum"))
        .cast("bigint")
        .alias("qini_scaled"),
    )


UPLIFT_QINI_SQL = """
WITH counts AS (
  SELECT user_id, sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS cnt
  FROM events GROUP BY user_id
),
med AS (SELECT median(cnt) AS med FROM counts),
per_user AS (
  SELECT user_id,
         CASE WHEN cnt > med THEN 1 ELSE 0 END AS converted,
         CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treated,
         CAST('0x' || substr(md5(user_id::VARCHAR), 1, 8) AS BIGINT) % 1000 AS score
  FROM counts, med
),
n_t AS (SELECT count(*)::BIGINT AS n FROM per_user),
ranked AS (
  SELECT *, CAST((row_number() OVER (ORDER BY score DESC, user_id) - 1) * 10 // n + 1 AS INT) AS decile
  FROM per_user, n_t
),
per_dec AS (
  SELECT decile, count(*) AS n_users, sum(treated) AS n_t,
         sum(treated * converted) AS x_t,
         sum(1 - treated) AS n_c, sum((1 - treated) * converted) AS x_c
  FROM ranked GROUP BY decile
),
cum AS (
  SELECT decile,
         sum(n_users) OVER w AS n_users_cum,
         sum(n_t) OVER w AS n_t_cum,
         sum(x_t) OVER w AS x_t_cum,
         sum(n_c) OVER w AS n_c_cum,
         sum(x_c) OVER w AS x_c_cum
  FROM per_dec
  WINDOW w AS (ORDER BY decile ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT CAST(decile AS BIGINT) AS decile,
       CAST(n_users_cum AS BIGINT) AS n_users_cum,
       CAST(n_t_cum AS BIGINT) AS n_t_cum,
       CAST(x_t_cum AS BIGINT) AS x_t_cum,
       CAST(n_c_cum AS BIGINT) AS n_c_cum,
       CAST(x_c_cum AS BIGINT) AS x_c_cum,
       CAST(10000 * x_t_cum // greatest(n_t_cum, 1) - 10000 * x_c_cum // greatest(n_c_cum, 1) AS BIGINT) AS uplift_bp,
       CAST(x_t_cum * n_c_cum - x_c_cum * n_t_cum AS BIGINT) AS qini_scaled
FROM cum
"""

QUERIES["events_uplift_qini"] = events_uplift_qini
ORACLES["events_uplift_qini"] = UPLIFT_QINI_SQL
