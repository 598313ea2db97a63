"""Recursive time-series operators: per-user EWMA + CUSUM drift alarms.

Reference parity: the process monitor's per-stage timing stream
(`database-schema.sql:258` process_monitor_logs) is the kind of series
the reference eyeballs for drift; an exponentially-weighted moving
average is the standard smoother for it. SQL window frames cannot
express EWMA (each output depends on the *previous output*, not a
frame of inputs), so this is a genuinely recursive per-key fold:

    e_1 = v_1;  e_i = (1 - ALPHA) * e_{i-1} + ALPHA * v_i

Spark-first shape: one shuffle groups each user's events, a sorted
struct array fixes the order (ts, event_id — deterministic under ts
ties), and ``F.aggregate`` runs the fold as a JVM array expression —
no Python, no iterative driver loop, state bounded by one user's
events. The DuckDB oracle runs the *same* fold via a recursive CTE
with the identical IEEE operation order (not ``list_reduce``, which
was found nondeterministic — see the inline comment below), so the
doubles agree bit-for-bit before the 6dp presentation rounding.

Scale: cost is one shuffle on user_id plus linear per-row work; a
single user's history must fit in one task (the same bound the
sessionizer and funnel already carry). For unbounded histories the
streaming analogue is ``applyInPandasWithState`` carrying e_{i-1} as
state (see streaming/sessions.py for the template).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.distributed import bounded_sorted_events
from ..sources.tables import load_table

ALPHA = 0.25

QUERIES = {}
ORACLES = {}


def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id", "value"
    )
    # Skew guard (see functions/distributed.bounded_sorted_events): the
    # per-user fold array is capped with a truncation flag; the cap is
    # far above the corpus max so the oracle fold is unchanged.
    per_user = bounded_sorted_events(ev, "user_id", F.struct("t", "event_id", "value"))
    folded = per_user.select(
        "user_id",
        "evs",
        F.expr(
            f"""
            aggregate(
              slice(transform(evs, e -> e.value), 2, greatest(size(evs) - 1, 0)),
              array(evs[0].value),
              (acc, x) -> acc || array(element_at(acc, -1) * {1 - ALPHA} + {ALPHA} * x)
            )
            """
        ).alias("ew"),
    )
    return folded.select(
        "user_id",
        F.posexplode(F.arrays_zip("evs", "ew")).alias("pos", "z"),
    ).select(
        "user_id",
        F.col("z.evs.event_id").alias("event_id"),
        F.timestamp_micros(F.col("z.evs.t")).alias("ts"),
        F.col("z.evs.value").alias("value"),
        # floor-based 6dp rounding: both engines compute the identical
        # floor(x*1e6 + 0.5)/1e6 on the identical fold result, so there is
        # no round-half boundary to disagree on (DuckDB's round() on
        # DOUBLE resolves .5-ulp neighbors differently from Spark's).
        (F.floor(F.col("z.ew") * 1e6 + F.lit(0.5)) / 1e6).alias("ewma"),
    )


# The recursion runs as a recursive CTE rather than list_reduce:
# DuckDB 1.0's list_reduce produced nondeterministic folds on larger
# vectorized inputs (observed on tokenizer_segment), so no oracle in
# this repo folds with lambdas. The step expression keeps the exact
# IEEE op order of the Spark fold: e*(1-a) + a*v.
EWMA_SQL = f"""
WITH RECURSIVE events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
per_user AS (
  SELECT user_id,
         list_sort(list(struct_pack(t := epoch_us(ts), event_id := event_id,
                                    value := value))) AS evs
  FROM events_us
  GROUP BY user_id
),
walk AS (
  SELECT user_id, evs, len(evs)::BIGINT AS n, 1::BIGINT AS i,
         evs[1].value::DOUBLE AS e
  FROM per_user
  UNION ALL
  SELECT user_id, evs, n, i + 1,
         e * ({1 - ALPHA})::DOUBLE + ({ALPHA})::DOUBLE * evs[(i + 1)::INT].value
  FROM walk WHERE i < n
)
SELECT user_id,
       evs[i::INT].event_id AS event_id,
       make_timestamp(evs[i::INT].t) AS ts,
       evs[i::INT].value AS value,
       floor(e * (1000000)::DOUBLE + (0.5)::DOUBLE) / (1000000)::DOUBLE AS ewma
FROM walk
"""

QUERIES["events_ewma"] = events_ewma
ORACLES["events_ewma"] = EWMA_SQL


# --- CUSUM changepoint detection ---------------------------------------------
#
# Drift detection over the monitor stream (the check the reference's
# process-monitor dashboards eyeball): one-sided CUSUM over each event
# type's daily volume, s_t = max(0, s_{t-1} + (x_t - target)), alarm
# when s_t exceeds H. Another output-depends-on-previous-output
# recursion — F.aggregate on Spark, recursive CTE on DuckDB — and it
# is exactly engine-equal because everything is integers: daily sums
# scale to cents, the target is an integer floor of the global daily
# mean, and H is an integer division of it. The corpus-sized work is
# one (type, day) aggregation; the fold runs over the bounded day
# series per type.

CUSUM_H_DIV = 2  # alarm threshold H = target/2 (sized to the synthetic stream's drift)


def events_cusum_alarm(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("x"))
    )
    per_type = daily.groupBy("event_type").agg(
        F.sort_array(F.collect_list(F.struct("day", "x"))).alias("days"),
        F.expr("sum(x) div count(*)").alias("target"),
    )
    folded = per_type.select(
        "event_type",
        "days",
        "target",
        F.expr(
            """
            aggregate(slice(days, 2, greatest(size(days) - 1, 0)),
              array(greatest(cast(0 as bigint), days[0].x - target)),
              (acc, d) -> acc || array(greatest(cast(0 as bigint),
                  element_at(acc, -1) + (d.x - target))))
            """
        ).alias("s"),
    )
    out = folded.select(
        "event_type",
        "target",
        F.posexplode(F.arrays_zip("days", "s")).alias("pos", "z"),
    ).select(
        "event_type",
        F.col("z.days.day").alias("day"),
        F.col("z.days.x").alias("x"),
        F.col("z.s").alias("cusum"),
        (F.col("z.s") > F.expr(f"target div {CUSUM_H_DIV}")).alias("alarm"),
    )
    return out.where(F.col("alarm"))


CUSUM_SQL = f"""
WITH RECURSIVE events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         sum(floor(value * 100 + (0.5)::DOUBLE)::BIGINT)::BIGINT AS x
  FROM events_us GROUP BY 1, 2
),
per_type AS (
  SELECT event_type,
         list_sort(list(struct_pack(day := day, x := x))) AS days,
         (sum(x) // count(*))::BIGINT AS target
  FROM daily GROUP BY event_type
),
walk AS (
  SELECT event_type, days, target, len(days)::BIGINT AS n, 1::BIGINT AS i,
         greatest(0::BIGINT, days[1].x - target) AS s
  FROM per_type
  UNION ALL
  SELECT event_type, days, target, n, i + 1,
         greatest(0::BIGINT, s + (days[(i + 1)::INT].x - target))
  FROM walk WHERE i < n
)
SELECT event_type, days[i::INT].day AS day, days[i::INT].x AS x,
       s AS cusum, s > target // {CUSUM_H_DIV} AS alarm
FROM walk
WHERE s > target // {CUSUM_H_DIV}
"""

QUERIES["events_cusum_alarm"] = events_cusum_alarm
ORACLES["events_cusum_alarm"] = CUSUM_SQL


# --- inter-arrival burstiness -------------------------------------------------
#
# Burstiness index per user: coefficient of variation of inter-event
# gaps (CV = 1 for a Poisson process; > 1 = bursty sessions, < 1 =
# regular automation — the bot-vs-human signal). Gaps in exact
# integer seconds from a user-partitioned lag; mean/variance from the
# order-independent integer-sum device; per-user CVs roll into
# burstiness bands. One user shuffle; band rollup bounded.

def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id"
    )
    w = _W.partitionBy("user_id").orderBy("t", "event_id")
    gaps = ev.select(
        "user_id",
        F.expr("cast((t - lag(t) over (partition by user_id order by t, event_id)) div 1000000 as bigint)").alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    sums = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("gap_s").alias("sx"),
        F.sum(F.expr("gap_s * gap_s")).alias("sxx"),
    ).where(F.col("n") >= 2)
    cv_bp = F.expr(
        "cast(floor(10000.0 * sqrt(cast(n as double) * sxx - cast(sx as double) * sx) "
        "/ cast(sx as double) + 0.5) as bigint)"
    )
    banded = sums.select(
        cv_bp.alias("cv_bp"),
    ).select(
        F.when(F.col("cv_bp") < 8000, "regular (<0.8)")
        .when(F.col("cv_bp") <= 12000, "poisson-like (0.8-1.2)")
        .otherwise("bursty (>1.2)")
        .alias("band"),
    )
    return banded.groupBy("band").agg(F.count(F.lit(1)).alias("n_users"))


EVENTS_BURSTINESS_SQL = """
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
), gaps AS (
  SELECT user_id,
         (epoch_us(ts) - lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
           // 1000000 AS gap_s
  FROM events_us
), sums AS (
  SELECT user_id, count(*) AS n, CAST(sum(gap_s) AS BIGINT) AS sx,
         CAST(sum(gap_s * gap_s) AS BIGINT) AS sxx
  FROM gaps WHERE gap_s IS NOT NULL GROUP BY user_id HAVING count(*) >= 2
), cvs AS (
  SELECT CAST(floor(10000.0 * sqrt(CAST(n AS DOUBLE) * sxx - CAST(sx AS DOUBLE) * sx)
              / CAST(sx AS DOUBLE) + 0.5) AS BIGINT) AS cv_bp
  FROM sums
)
SELECT CASE WHEN cv_bp < 8000 THEN 'regular (<0.8)'
            WHEN cv_bp <= 12000 THEN 'poisson-like (0.8-1.2)'
            ELSE 'bursty (>1.2)' END AS band,
       count(*) AS n_users
FROM cvs GROUP BY 1
"""

QUERIES["events_burstiness"] = events_burstiness
ORACLES["events_burstiness"] = EVENTS_BURSTINESS_SQL


# --- daily co-movement matrix -------------------------------------------------
#
# Which monitor streams move together day over day? (error volume
# tracking click volume is load-shaped; error volume alone spiking is
# an incident.) Pearson r for every pair of event types over their
# daily counts, from the exact-integer-sum device — the corpus-sized
# work is ONE (day, type) count; the pair matrix runs over a ~30-row
# pivoted day table crossed within itself (types² pairs, bounded).

def events_type_comovement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day"), "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    a = daily.select("day", F.col("event_type").alias("type_a"), F.col("n").alias("x"))
    b = daily.select("day", F.col("event_type").alias("type_b"), F.col("n").alias("y"))
    pairs = a.join(b, "day").where(F.col("type_a") < F.col("type_b"))
    sums = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    r = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.sqrt((F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        * F.sqrt((F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double"))
    )
    return sums.select(
        "type_a", "type_b", F.col("n").cast("bigint").alias("n_days"), F.round(r, 6).alias("pearson_r")
    )


TYPE_COMOVEMENT_SQL = """
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
), daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type, count(*) AS n
  FROM events_us GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b, a.n AS x, b.n AS y
  FROM daily a JOIN daily b ON a.day = b.day AND a.event_type < b.event_type
), sums AS (
  SELECT type_a, type_b, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM pairs GROUP BY type_a, type_b
)
SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
       round((n * sxy - sx * sy) /
             (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) * sqrt(CAST(n * syy - sy * sy AS DOUBLE))), 6)
         AS pearson_r
FROM sums
"""

QUERIES["events_type_comovement"] = events_type_comovement
ORACLES["events_type_comovement"] = TYPE_COMOVEMENT_SQL


# --- naive seasonal forecast evaluation --------------------------------------
#
# The forecasting floor (the co-movement and next-event baselines'
# time-series sibling): predict each (type, hour) volume as the SAME
# HOUR ONE WEEK EARLIER and score MAPE — any real forecaster must
# beat this number. One (type, hour) count; the forecast join is a
# 168-hour self-shift on the bounded hour table; absolute errors and
# MAPE in exact integer basis points.

def events_seasonal_naive_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).alias("n"))
    forecast = hourly.select(
        "event_type",
        (F.col("hour") + F.expr("INTERVAL 168 HOURS")).alias("hour"),
        F.col("n").alias("n_forecast"),
    )
    scored = hourly.join(forecast, ["event_type", "hour"])
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours_scored"),
        F.sum("n").alias("actual_total"),
        F.sum(F.expr("abs(n - n_forecast)")).cast("bigint").alias("abs_err_total"),
        F.expr("cast(sum(abs(n - n_forecast)) * 10000 div sum(n) as bigint)").alias("mape_bp"),
    )


SEASONAL_NAIVE_SQL = """
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
), hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*) AS n
  FROM events_us GROUP BY 1, 2
), scored AS (
  SELECT a.event_type, a.n, f.n AS n_forecast
  FROM hourly a JOIN hourly f
    ON a.event_type = f.event_type AND f.hour + INTERVAL 168 HOURS = a.hour
)
SELECT event_type, count(*) AS n_hours_scored,
       CAST(sum(n) AS BIGINT) AS actual_total,
       CAST(sum(abs(n - n_forecast)) AS BIGINT) AS abs_err_total,
       CAST(CAST(sum(abs(n - n_forecast)) AS BIGINT) * 10000 // sum(n) AS BIGINT) AS mape_bp
FROM scored GROUP BY event_type
"""

QUERIES["events_seasonal_naive_eval"] = events_seasonal_naive_eval
ORACLES["events_seasonal_naive_eval"] = SEASONAL_NAIVE_SQL


# --- token-bucket rate-limit simulation ---------------------------------------
#
# Admission-control replay over the event stream: a per-user token
# bucket (capacity TB_CAP, one token per TB_REFILL_US microseconds,
# integer floor refill) decides allow/reject per event — the *planning*
# query an ingestion gateway runs against history before setting
# limits. Output-depends-on-previous-output recursion again (the EWMA
# family device): one shuffle groups each user's events,
# bounded_sorted_events pins a capped deterministic order, and
# F.aggregate folds a (prev_t, tokens, allowed) struct — all-integer
# arithmetic, so the oracle's recursive CTE is exactly engine-equal.

TB_CAP = 5
TB_REFILL_US = 60_000_000  # one token per minute


def events_rate_limit_sim(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("t"), "event_id"
    )
    per_user = bounded_sorted_events(ev, "user_id", F.struct("t", "event_id"))
    folded = per_user.select(
        "user_id",
        F.size("evs").cast("bigint").alias("n_events"),
        F.expr(
            f"""
            aggregate(
              slice(evs, 2, greatest(size(evs) - 1, 0)),
              struct(evs[0].t AS prev_t,
                     cast({TB_CAP - 1} AS bigint) AS tok,
                     cast(1 AS bigint) AS allowed),
              (acc, e) -> struct(
                e.t AS prev_t,
                least(cast({TB_CAP} AS bigint),
                      acc.tok + (e.t - acc.prev_t) div {TB_REFILL_US})
                  - if(least(cast({TB_CAP} AS bigint),
                             acc.tok + (e.t - acc.prev_t) div {TB_REFILL_US}) >= 1,
                       cast(1 AS bigint), cast(0 AS bigint)) AS tok,
                acc.allowed + if(least(cast({TB_CAP} AS bigint),
                             acc.tok + (e.t - acc.prev_t) div {TB_REFILL_US}) >= 1,
                       cast(1 AS bigint), cast(0 AS bigint)) AS allowed)
            )
            """
        ).alias("st"),
    )
    return folded.select(
        "user_id",
        "n_events",
        F.col("st.allowed").alias("n_allowed"),
        (F.col("n_events") - F.col("st.allowed")).alias("n_rejected"),
        F.col("st.tok").alias("final_tokens"),
    )


RATE_LIMIT_SQL = f"""
WITH RECURSIVE events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
per_user AS (
  SELECT user_id,
         list_sort(list(struct_pack(t := epoch_us(ts), event_id := event_id))) AS evs
  FROM events_us GROUP BY user_id
),
walk AS (
  SELECT user_id, evs, len(evs)::BIGINT AS n, 1::BIGINT AS i,
         evs[1].t AS prev_t, ({TB_CAP} - 1)::BIGINT AS tok, 1::BIGINT AS allowed
  FROM per_user
  UNION ALL
  SELECT user_id, evs, n, i + 1,
         evs[(i + 1)::INT].t,
         least({TB_CAP}::BIGINT, tok + (evs[(i + 1)::INT].t - prev_t) // {TB_REFILL_US})
           - CASE WHEN least({TB_CAP}::BIGINT,
                             tok + (evs[(i + 1)::INT].t - prev_t) // {TB_REFILL_US}) >= 1
                  THEN 1 ELSE 0 END,
         allowed + CASE WHEN least({TB_CAP}::BIGINT,
                             tok + (evs[(i + 1)::INT].t - prev_t) // {TB_REFILL_US}) >= 1
                  THEN 1 ELSE 0 END
  FROM walk WHERE i < n
)
SELECT user_id, n AS n_events, allowed AS n_allowed,
       n - allowed AS n_rejected, tok AS final_tokens
FROM walk WHERE i = n
"""

QUERIES["events_rate_limit_sim"] = events_rate_limit_sim
ORACLES["events_rate_limit_sim"] = RATE_LIMIT_SQL


# --- single change-point detection --------------------------------------------
#
# Where did each event type's hourly volume shift? For every candidate
# split k of the ordered hourly-count series, score the mean difference
# with the exact-integer statistic
#     score_k = (S_k·(n−k) − (S_n−S_k)·k)²
# (the two-sample mean gap cross-multiplied to clear divisions; a
# production petabyte run would track the normalized double instead —
# the argmax is what matters) and pick the argmax via the house
# conditional max(struct) device — lexicographic, so score ties break
# to the latest split hour, identically in both engines. Work:
# one (type, hour) aggregation over the corpus, then windows over the
# bounded per-type hour series — no per-row recursion at all.

def events_change_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    w = W.partitionBy("event_type").orderBy("hour")
    wall = W.partitionBy("event_type")
    scored = (
        hourly.select(
            "event_type",
            "hour",
            F.sum("x").over(w.rowsBetween(W.unboundedPreceding, 0)).alias("s_k"),
            F.row_number().over(w).cast("bigint").alias("k"),
            F.sum("x").over(wall).alias("s_n"),
            F.count(F.lit(1)).over(wall).cast("bigint").alias("n"),
        )
        .where(F.col("k") < F.col("n"))  # a split needs both sides non-empty
        .select(
            "event_type", "hour", "k", "n", "s_k", "s_n",
            F.pow(
                (F.col("s_k") * (F.col("n") - F.col("k")) - (F.col("s_n") - F.col("s_k")) * F.col("k")).cast("double"),
                2,
            ).cast("bigint").alias("score"),
        )
    )
    best = scored.groupBy("event_type").agg(
        F.max(F.struct(F.col("score"), F.col("k").alias("neg"), F.col("hour"), F.col("s_k"), F.col("s_n"), F.col("n"))).alias("b")
    )
    return best.select(
        "event_type",
        F.col("b.n").alias("n_hours"),
        F.col("b.hour").alias("split_hour"),
        F.col("b.score").alias("score"),
        F.expr("b.s_k * 1000 div b.neg").alias("mean_before_k"),
        F.expr("(b.s_n - b.s_k) * 1000 div (b.n - b.neg)").alias("mean_after_k"),
    )


CHANGE_POINT_SQL = """
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS x
  FROM events_us GROUP BY 1, 2
),
scored AS (
  SELECT event_type, hour,
         CAST(sum(x) OVER (PARTITION BY event_type ORDER BY hour
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s_k,
         CAST(row_number() OVER (PARTITION BY event_type ORDER BY hour) AS BIGINT) AS k,
         CAST(sum(x) OVER (PARTITION BY event_type) AS BIGINT) AS s_n,
         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
  FROM hourly
),
candid AS (
  SELECT event_type, hour, k, n, s_k, s_n,
         CAST(pow((s_k * (n - k) - (s_n - s_k) * k)::DOUBLE, 2) AS BIGINT) AS score
  FROM scored WHERE k < n
),
best AS (
  SELECT event_type,
         max(struct_pack(score := score, neg := k, hour := hour,
                         s_k := s_k, s_n := s_n, n := n)) AS b
  FROM candid GROUP BY event_type
)
SELECT event_type,
       b.n AS n_hours,
       b.hour AS split_hour,
       b.score AS score,
       b.s_k * 1000 // b.neg AS mean_before_k,
       (b.s_n - b.s_k) * 1000 // (b.n - b.neg) AS mean_after_k
FROM best
"""

QUERIES["events_change_point"] = events_change_point
ORACLES["events_change_point"] = CHANGE_POINT_SQL


# --- arrival overdispersion test -----------------------------------------------
#
# Is each event type's hourly arrival process Poisson-like, or bursty?
# Dispersion index D = sample-variance / mean of the hourly counts,
# kept exact: D_milli = (n·Σx² − (Σx)²)·1000 // ((n−1)·Σx) — the
# variance-to-mean algebra cross-multiplied into one integer division
# (positive operands, so Spark `div` and DuckDB `//` agree).
# Overdispersed (bursty) at D > 1.5. One (type, hour) aggregation,
# then a 5-row rollup; complements events_burstiness' inter-arrival
# view with the count-process view.

DISPERSION_BAR_MILLI = 1500


def events_overdispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("x"))
    agg = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    return agg.select(
        "event_type",
        "n_hours",
        F.col("s").alias("total_events"),
        F.expr("s * 1000 div n_hours").alias("mean_milli"),
        F.expr("(n_hours * q - s * s) * 1000 div ((n_hours - 1) * s)").alias(
            "dispersion_milli"
        ),
        (
            F.expr("(n_hours * q - s * s) * 1000 div ((n_hours - 1) * s)")
            > DISPERSION_BAR_MILLI
        ).cast("int").alias("overdispersed"),
    )


OVERDISPERSION_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour, count(*)::BIGINT AS x
  FROM events_us GROUP BY 1, 2
),
agg AS (
  SELECT event_type, count(*)::BIGINT AS n_hours,
         CAST(sum(x) AS BIGINT) AS s, CAST(sum(x * x) AS BIGINT) AS q
  FROM hourly GROUP BY event_type
)
SELECT event_type, n_hours, s AS total_events,
       s * 1000 // n_hours AS mean_milli,
       (n_hours * q - s * s) * 1000 // ((n_hours - 1) * s) AS dispersion_milli,
       CAST((n_hours * q - s * s) * 1000 // ((n_hours - 1) * s) > {DISPERSION_BAR_MILLI} AS INT) AS overdispersed
FROM agg
"""

QUERIES["events_overdispersion"] = events_overdispersion
ORACLES["events_overdispersion"] = OVERDISPERSION_SQL


# --- Holt linear-trend smoothing ----------------------------------------------
#
# The forecasting step up from events_ewma (level only) and
# events_seasonal_naive_eval (the floor): Holt's double exponential
# smoothing per event type over the daily volume series — level +
# trend state, one-step-ahead forecasts scored against the naive
# last-value forecast (public Holt 1957 / Hyndman fpp practice).
# Alpha = 0.2, beta = 0.1 as exact integer fractions over milli-cent
# state.  The trend can go NEGATIVE — verified safe because BOTH
# engines truncate integer division toward zero (Spark `div` and
# DuckDB `//`: -7//2 = -3 in each), so the smoothing divisions are
# bit-equal with no rewrite.
#
# Plan: one (type, day) aggregation (map-side partials) then a bounded
# per-type fold over the day series — F.aggregate on Spark, recursive
# CTE on DuckDB, the cusum pattern.

_HOLT_LNEW = "((200 * d.x * 1000 + 800 * (acc.l + acc.b)) div 1000)"
_HOLT_BNEW = f"((100 * ({_HOLT_LNEW} - acc.l) + 900 * acc.b) div 1000)"


def events_holt_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("x"))
    per_type = (
        daily.groupBy("event_type")
        .agg(F.sort_array(F.collect_list(F.struct("day", "x"))).alias("days"))
        .where(F.size("days") >= 3)
    )
    folded = per_type.select(
        "event_type",
        F.size("days").cast("bigint").alias("n_days"),
        F.expr(
            f"""
            aggregate(
              slice(days, 3, greatest(size(days) - 2, 0)),
              named_struct(
                'l', days[0].x * cast(1000 as bigint),
                'b', (days[1].x - days[0].x) * cast(1000 as bigint),
                'sae', cast(0 as bigint),
                'nsae', cast(0 as bigint),
                'px', days[1].x),
              (acc, d) -> named_struct(
                'l', {_HOLT_LNEW},
                'b', {_HOLT_BNEW},
                'sae', acc.sae + abs(d.x * 1000 - (acc.l + acc.b)),
                'nsae', acc.nsae + abs(d.x - acc.px) * 1000,
                'px', d.x))
            """
        ).alias("st"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.col("st.l").alias("level_milli"),
        F.col("st.b").alias("trend_milli"),
        (F.col("st.l") + F.col("st.b")).alias("forecast_next_milli"),
        F.col("st.sae").alias("holt_sae_milli"),
        F.col("st.nsae").alias("naive_sae_milli"),
        (F.col("st.sae") < F.col("st.nsae")).cast("int").alias("holt_beats_naive"),
    )


HOLT_SQL = """
WITH RECURSIVE events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         sum(floor(value * 100 + (0.5)::DOUBLE)::BIGINT)::BIGINT AS x
  FROM events_us GROUP BY 1, 2
),
per_type AS (
  SELECT event_type, list_sort(list(struct_pack(day := day, x := x))) AS days,
         count(*)::BIGINT AS n
  FROM daily GROUP BY event_type HAVING count(*) >= 3
),
walk AS (
  SELECT event_type, days, n, 2::BIGINT AS i,
         days[1].x * 1000 AS l,
         (days[2].x - days[1].x) * 1000 AS b,
         0::BIGINT AS sae, 0::BIGINT AS nsae
  FROM per_type
  UNION ALL
  SELECT event_type, days, n, i + 1,
         (200 * days[(i + 1)::INT].x * 1000 + 800 * (l + b)) // 1000,
         (100 * (((200 * days[(i + 1)::INT].x * 1000 + 800 * (l + b)) // 1000) - l)
          + 900 * b) // 1000,
         sae + abs(days[(i + 1)::INT].x * 1000 - (l + b)),
         nsae + abs(days[(i + 1)::INT].x - days[i::INT].x) * 1000
  FROM walk WHERE i < n
)
SELECT event_type, n AS n_days,
       CAST(l AS BIGINT) AS level_milli,
       CAST(b AS BIGINT) AS trend_milli,
       CAST(l + b AS BIGINT) AS forecast_next_milli,
       CAST(sae AS BIGINT) AS holt_sae_milli,
       CAST(nsae AS BIGINT) AS naive_sae_milli,
       CAST(sae < nsae AS INT) AS holt_beats_naive
FROM walk WHERE i = n
"""

QUERIES["events_holt_linear"] = events_holt_linear
ORACLES["events_holt_linear"] = HOLT_SQL


# --- forecast backtest suite --------------------------------------------------
#
# The model-selection table over the forecasting family (the sweep
# pattern applied to forecasters): naive last-value, seasonal-naive
# (lag 7 days) and Holt linear trend backtested one-step-ahead on the
# SAME daily series and the SAME eval window (day EVAL_FROM onward, so
# every method has its lags/state warmed), SAE in exact milli units
# and a per-type rank — which forecaster earns the dashboard slot.
#
# Plan: one (type, day) aggregation; naive/snaive errors are indexed
# array transforms, Holt re-runs its integer fold carrying a step
# counter so only eval-window errors accumulate; a 3-row explode per
# type and an arithmetic rank (no window).

EVAL_FROM = 9  # first 1-based day position scored (lag-7 + warmup covered)


def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("x"))
    per_type = (
        daily.groupBy("event_type")
        .agg(F.sort_array(F.collect_list(F.struct("day", "x"))).alias("days"))
        .where(F.size("days") >= EVAL_FROM)
    )
    naive = F.expr(
        f"aggregate(sequence({EVAL_FROM}, size(days)), cast(0 as bigint),"
        " (acc, p) -> acc + abs(days[p-1].x - days[p-2].x) * 1000)"
    )
    snaive = F.expr(
        f"aggregate(sequence({EVAL_FROM}, size(days)), cast(0 as bigint),"
        " (acc, p) -> acc + abs(days[p-1].x - days[p-8].x) * 1000)"
    )
    holt = F.expr(
        f"""
        aggregate(
          slice(days, 3, greatest(size(days) - 2, 0)),
          named_struct(
            'l', days[0].x * cast(1000 as bigint),
            'b', (days[1].x - days[0].x) * cast(1000 as bigint),
            'sae', cast(0 as bigint),
            'p', cast(3 as bigint)),
          (acc, d) -> named_struct(
            'l', {_HOLT_LNEW},
            'b', {_HOLT_BNEW},
            'sae', acc.sae + IF(acc.p >= {EVAL_FROM},
                                abs(d.x * 1000 - (acc.l + acc.b)), cast(0 as bigint)),
            'p', acc.p + 1)).sae
        """
    )
    scored = per_type.select(
        "event_type",
        F.size("days").cast("bigint").alias("n_days"),
        naive.alias("sae_naive"),
        snaive.alias("sae_snaive"),
        holt.alias("sae_holt"),
    )
    arms = F.array(
        F.struct(F.lit("naive").alias("method"), F.col("sae_naive").alias("sae")),
        F.struct(F.lit("snaive").alias("method"), F.col("sae_snaive").alias("sae")),
        F.struct(F.lit("holt").alias("method"), F.col("sae_holt").alias("sae")),
    )
    exploded = scored.select(
        "event_type", "n_days", "sae_naive", "sae_snaive", "sae_holt",
        F.explode(arms).alias("a"),
    )
    rank = F.expr(
        "cast(1 + size(filter(array("
        "struct('naive' as method, sae_naive as sae),"
        "struct('snaive' as method, sae_snaive as sae),"
        "struct('holt' as method, sae_holt as sae)),"
        " m -> m.sae < a.sae or (m.sae = a.sae and m.method < a.method))) as bigint)"
    )
    return exploded.select(
        "event_type",
        "n_days",
        F.col("a.method").alias("method"),
        F.col("a.sae").alias("sae_milli"),
        rank.alias("rank"),
    )


BACKTEST_SQL = f"""
WITH RECURSIVE events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         sum(floor(value * 100 + (0.5)::DOUBLE)::BIGINT)::BIGINT AS x
  FROM events_us GROUP BY 1, 2
),
per_type AS (
  SELECT event_type, list_sort(list(struct_pack(day := day, x := x))) AS days,
         count(*)::BIGINT AS n
  FROM daily GROUP BY event_type HAVING count(*) >= {EVAL_FROM}
),
walk AS (
  SELECT event_type, days, n, 2::BIGINT AS i,
         days[1].x * 1000 AS l,
         (days[2].x - days[1].x) * 1000 AS b,
         0::BIGINT AS sae
  FROM per_type
  UNION ALL
  SELECT event_type, days, n, i + 1,
         (200 * days[(i + 1)::INT].x * 1000 + 800 * (l + b)) // 1000,
         (100 * (((200 * days[(i + 1)::INT].x * 1000 + 800 * (l + b)) // 1000) - l)
          + 900 * b) // 1000,
         sae + CASE WHEN i + 1 >= {EVAL_FROM}
                    THEN abs(days[(i + 1)::INT].x * 1000 - (l + b)) ELSE 0 END
  FROM walk WHERE i < n
),
holted AS (SELECT event_type, n, sae AS sae_holt FROM walk WHERE i = n),
scored AS (
  SELECT p.event_type, p.n AS n_days,
         CAST(coalesce(list_sum(list_transform(range({EVAL_FROM}, p.n + 1),
              q -> abs(days[q::INT].x - days[(q - 1)::INT].x) * 1000)), 0) AS BIGINT) AS sae_naive,
         CAST(coalesce(list_sum(list_transform(range({EVAL_FROM}, p.n + 1),
              q -> abs(days[q::INT].x - days[(q - 7)::INT].x) * 1000)), 0) AS BIGINT) AS sae_snaive,
         CAST(h.sae_holt AS BIGINT) AS sae_holt
  FROM per_type p JOIN holted h ON p.event_type = h.event_type
),
arms AS (
  SELECT event_type, n_days, sae_naive, sae_snaive, sae_holt, 'naive' AS method, sae_naive AS sae FROM scored
  UNION ALL
  SELECT event_type, n_days, sae_naive, sae_snaive, sae_holt, 'snaive', sae_snaive FROM scored
  UNION ALL
  SELECT event_type, n_days, sae_naive, sae_snaive, sae_holt, 'holt', sae_holt FROM scored
)
SELECT event_type, n_days, method, CAST(sae AS BIGINT) AS sae_milli,
       CAST(1 + len(list_filter(
           [struct_pack(m := 'naive', s := sae_naive),
            struct_pack(m := 'snaive', s := sae_snaive),
            struct_pack(m := 'holt', s := sae_holt)],
           e -> e.s < sae OR (e.s = sae AND e.m < method))) AS BIGINT) AS rank
FROM arms
"""

QUERIES["events_forecast_backtest"] = events_forecast_backtest
ORACLES["events_forecast_backtest"] = BACKTEST_SQL


# --- Autocorrelation function over hourly load --------------------------------
#
# The periodicity detector that motivates events_seasonality and
# events_hopping_agg: the ACF of the (gap-filled) hourly event-count
# series at lags 1..6.  Exact integer autocovariance via the
# multiply-through-by-n device — centered value y_i = n*x_i - S needs
# no mean division, numerator_k = sum(y_i * y_{i+k}), denominator =
# sum(y_i^2), acf in signed milli (Spark div and DuckDB // both
# truncate toward zero).  The +-2/sqrt(n) white-noise band gives the
# significance flag (sqrt + one correctly-rounded double division,
# then floor — identical in both engines).
#
# Scale: one shuffle to the hourly grain; everything after runs on the
# BOUNDED hour table (corpus span, not corpus rows) — the
# single-partition window over it is a deliberate bounded-table
# device, same as events_gapfill.  At 100 TB the hourly rollup is the
# only corpus-sized stage; counts rescale to thousands if n*x
# approaches the BIGINT edge.

ACF_MAX_LAG = 6


def events_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h")
    )
    counts = ev.groupBy("h").agg(F.count("*").cast("bigint").alias("c"))
    bounds = counts.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    hours = bounds.select(
        F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("h")
    )
    dense = hours.join(counts, "h", "left").select(
        "h", F.coalesce("c", F.lit(0)).cast("bigint").alias("x")
    )
    tot = dense.agg(
        F.count("*").cast("bigint").alias("n"), F.sum("x").cast("bigint").alias("s")
    )
    cent = dense.crossJoin(F.broadcast(tot)).select(
        "h", "n", F.expr("cast(n * x - s as bigint)").alias("y")
    )
    w = Window.orderBy("h")
    leads = cent.select(
        "n",
        "y",
        *[F.lead("y", k).over(w).alias(f"y{k}") for k in range(1, ACF_MAX_LAG + 1)],
    )
    stacked = leads.select(
        "n",
        "y",
        F.expr(
            "stack({}, {})".format(
                ACF_MAX_LAG,
                ", ".join(f"{k}, y{k}" for k in range(1, ACF_MAX_LAG + 1)),
            )
        ).alias("lag", "ylag"),
    )
    den = cent.agg(F.expr("cast(sum(y * y) as bigint)").alias("den"))
    per_lag = (
        stacked.where(F.col("ylag").isNotNull())
        .groupBy("lag", "n")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.expr("cast(sum(y * ylag) as bigint)").alias("num"),
        )
    )
    return per_lag.crossJoin(F.broadcast(den)).select(
        F.col("lag").cast("int").alias("lag"),
        F.col("n").alias("n_hours"),
        "n_pairs",
        F.expr("cast(num * 1000 div den as bigint)").alias("acf_milli"),
        F.expr(
            "cast(abs(num * 1000 div den) >"
            " floor(2000 / sqrt(cast(n as double)) + 0.5) as int)"
        ).alias("significant"),
    )


AUTOCORR_SQL = """
WITH events_us AS (SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events),
hrs AS (
  SELECT date_trunc('hour', ts) AS h, count(*)::BIGINT AS c FROM events_us GROUP BY 1
),
bounds AS (SELECT min(h) AS mn, max(h) AS mx FROM hrs),
dense AS (
  SELECT gs.h, coalesce(c, 0)::BIGINT AS x
  FROM (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bounds) gs
  LEFT JOIN hrs USING (h)
),
tot AS (SELECT count(*)::BIGINT AS n, CAST(sum(x) AS BIGINT) AS s FROM dense),
cent AS (
  SELECT h, n, CAST(n * x - s AS BIGINT) AS y,
         row_number() OVER (ORDER BY h) AS rn
  FROM dense, tot
),
den AS (SELECT CAST(sum(y * y) AS BIGINT) AS den FROM cent),
lags AS (SELECT unnest(range(1, {K} + 1)) AS lag),
pairs AS (
  SELECT l.lag, a.n, a.y AS y, b.y AS ylag
  FROM cent a JOIN lags l ON true JOIN cent b ON b.rn = a.rn + l.lag
),
per_lag AS (
  SELECT lag, n, count(*)::BIGINT AS n_pairs, CAST(sum(y * ylag) AS BIGINT) AS num
  FROM pairs GROUP BY lag, n
)
SELECT CAST(lag AS INT) AS lag, n AS n_hours, n_pairs,
       CAST(num * 1000 // den AS BIGINT) AS acf_milli,
       CAST(abs(num * 1000 // den) >
            floor(2000 / sqrt(CAST(n AS DOUBLE)) + 0.5) AS INT) AS significant
FROM per_lag, den
""".format(K=ACF_MAX_LAG)

QUERIES["events_autocorr"] = events_autocorr
ORACLES["events_autocorr"] = AUTOCORR_SQL


# --- Haar wavelet energy decomposition ----------------------------------------
#
# Where does the load variance live — hour-to-hour jitter or slow
# multi-hour swings?  Three unrolled levels of the UNNORMALIZED Haar
# transform over the gap-filled hourly count series (integer pairwise
# sums/differences — exact), energies per detail level plus the final
# approximation, each normalized by its 2^level scale so Parseval
# holds EXACTLY in integers over the series truncated to a multiple
# of 8: sum(x^2) = e1/2 + e2/4 + e3/8 + ea/8.  Shares in bp against
# the truncated total say which timescale dominates.
#
# Scale: one corpus shuffle to the hourly grain (the autocorr
# device); the three pairwise levels are groupBys on the BOUNDED hour
# table keyed rn div 2 (conditional-sum differences — no intra-group
# ordering needed).

def events_haar_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h")
    )
    counts = ev.groupBy("h").agg(F.count("*").cast("bigint").alias("x"))
    bounds = counts.agg(F.min("h").alias("mn"), F.max("h").alias("mx"))
    dense = (
        bounds.select(F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("h"))
        .join(counts, "h", "left")
        .select("h", F.coalesce("x", F.lit(0)).cast("bigint").alias("x"))
    )
    idx = dense.select(
        "x", (F.row_number().over(Window.orderBy("h")) - 1).cast("bigint").alias("rn")
    )
    n8 = idx.agg(F.expr("cast(count(*) div 8 * 8 as bigint)").alias("n8"))
    kept = idx.crossJoin(F.broadcast(n8)).where(F.col("rn") < F.col("n8"))
    l1 = kept.groupBy(F.expr("rn div 2").alias("p")).agg(
        F.expr("cast(sum(x) as bigint)").alias("a"),
        F.expr("cast(sum(x * (1 - 2 * (rn % 2))) as bigint)").alias("d"),
    )
    l2 = l1.groupBy(F.expr("p div 2").alias("q")).agg(
        F.expr("cast(sum(a) as bigint)").alias("a"),
        F.expr("cast(sum(a * (1 - 2 * (p % 2))) as bigint)").alias("d"),
    )
    l3 = l2.groupBy(F.expr("q div 2").alias("r")).agg(
        F.expr("cast(sum(a) as bigint)").alias("a"),
        F.expr("cast(sum(a * (1 - 2 * (q % 2))) as bigint)").alias("d"),
    )
    tot = kept.agg(F.expr("cast(sum(x * x) as bigint)").alias("total_energy"))
    rows = None
    for level, df_l, col, scale in (
        (1, l1, "d", 2), (2, l2, "d", 4), (3, l3, "d", 8), (4, l3, "a", 8),
    ):
        r = df_l.agg(
            F.lit(level).cast("bigint").alias("level"),
            F.lit("detail" if col == "d" else "approx").alias("band"),
            F.count("*").cast("bigint").alias("n_coeffs"),
            F.expr(f"cast(sum({col} * {col}) as bigint)").alias("energy_raw"),
            F.expr(f"cast(sum({col} * {col}) div {scale} as bigint)").alias(
                "energy_norm"
            ),
        )
        rows = r if rows is None else rows.unionByName(r)
    return rows.crossJoin(F.broadcast(tot)).select(
        "level", "band", "n_coeffs", "energy_raw", "energy_norm",
        F.expr(
            "cast(energy_norm * 10000 div greatest(total_energy, 1) as bigint)"
        ).alias("share_bp"),
    )


HAAR_SQL = """
WITH events_us AS (SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events),
hrs AS (
  SELECT date_trunc('hour', ts) AS h, count(*)::BIGINT AS x FROM events_us GROUP BY 1
),
bounds AS (SELECT min(h) AS mn, max(h) AS mx FROM hrs),
dense AS (
  SELECT gs.h, coalesce(x, 0)::BIGINT AS x
  FROM (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS h FROM bounds) gs
  LEFT JOIN hrs USING (h)
),
idx AS (SELECT x, row_number() OVER (ORDER BY h) - 1 AS rn FROM dense),
n8 AS (SELECT count(*) // 8 * 8 AS n8 FROM idx),
kept AS (SELECT x, rn FROM idx, n8 WHERE rn < n8),
l1 AS (
  SELECT rn // 2 AS p, CAST(sum(x) AS BIGINT) AS a,
         CAST(sum(x * (1 - 2 * (rn % 2))) AS BIGINT) AS d
  FROM kept GROUP BY rn // 2
),
l2 AS (
  SELECT p // 2 AS q, CAST(sum(a) AS BIGINT) AS a,
         CAST(sum(a * (1 - 2 * (p % 2))) AS BIGINT) AS d
  FROM l1 GROUP BY p // 2
),
l3 AS (
  SELECT q // 2 AS r, CAST(sum(a) AS BIGINT) AS a,
         CAST(sum(a * (1 - 2 * (q % 2))) AS BIGINT) AS d
  FROM l2 GROUP BY q // 2
),
tot AS (SELECT CAST(sum(x * x) AS BIGINT) AS total_energy FROM kept),
levels AS (
  SELECT 1::BIGINT AS level, 'detail' AS band, count(*)::BIGINT AS n_coeffs,
         CAST(sum(d * d) AS BIGINT) AS energy_raw,
         CAST(sum(d * d) // 2 AS BIGINT) AS energy_norm FROM l1
  UNION ALL
  SELECT 2, 'detail', count(*), CAST(sum(d * d) AS BIGINT),
         CAST(sum(d * d) // 4 AS BIGINT) FROM l2
  UNION ALL
  SELECT 3, 'detail', count(*), CAST(sum(d * d) AS BIGINT),
         CAST(sum(d * d) // 8 AS BIGINT) FROM l3
  UNION ALL
  SELECT 4, 'approx', count(*), CAST(sum(a * a) AS BIGINT),
         CAST(sum(a * a) // 8 AS BIGINT) FROM l3
)
SELECT level, band, n_coeffs, energy_raw, energy_norm,
       CAST(energy_norm * 10000 // greatest(total_energy, 1) AS BIGINT) AS share_bp
FROM levels, tot
"""

QUERIES["events_haar_energy"] = events_haar_energy
ORACLES["events_haar_energy"] = HAAR_SQL


# --- Page-Hinkley sequential drift test ------------------------------------------
#
# The sequential change detector beside CUSUM (events_cusum_alarm) and
# the binary change-point scan (events_change_point): Page-Hinkley
# (Page 1954, the Hinkley form) accumulates m_t = sum(x_i - mean_i),
# where mean_i is the RUNNING mean, and alarms when m_t - min(m) beats
# a threshold — the standard streaming-ML drift gate (e.g. river/MOA).
# Genuinely recursive (each step needs the previous running sums), so
# it is the F.aggregate-fold / recursive-CTE pair of the Holt/EWMA
# family.  All state integer: the running mean quantizes by truncating
# div (identical in both engines), the threshold is data-scaled
# (2x the grand hourly mean) so the test is dimensionless.
#
# Scale: one (type, hour) aggregation; the fold runs per type over the
# bounded hourly grid; streaming analogue carries (t, s, m, mmin) in
# applyInPandasWithState.

PH_DELTA = 0


def events_page_hinkley(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count(F.lit(1)).alias("x"))
    per_type = (
        hourly.groupBy("event_type")
        .agg(F.sort_array(F.collect_list(F.struct("h", "x"))).alias("hs"))
        .where(F.size("hs") >= 2)
    )
    folded = per_type.select(
        "event_type",
        F.size("hs").cast("bigint").alias("n_hours"),
        F.expr("aggregate(hs, cast(0 as bigint), (a, d) -> a + d.x)").alias("tot"),
        F.expr(
            f"""
            aggregate(
              slice(hs, 2, greatest(size(hs) - 1, 0)),
              named_struct(
                't', cast(1 as bigint), 's', hs[0].x,
                'm', cast(0 as bigint), 'mmin', cast(0 as bigint),
                'alarm', cast(0 as bigint),
                'lam', 2 * aggregate(hs, cast(0 as bigint), (a, d) -> a + d.x) div size(hs)),
              (acc, d) -> named_struct(
                't', acc.t + 1,
                's', acc.s + d.x,
                'm', acc.m + d.x - (acc.s + d.x) div (acc.t + 1) - {PH_DELTA},
                'mmin', least(acc.mmin, acc.m + d.x - (acc.s + d.x) div (acc.t + 1) - {PH_DELTA}),
                'alarm', case when acc.alarm = 0 and
                    (acc.m + d.x - (acc.s + d.x) div (acc.t + 1) - {PH_DELTA})
                    - least(acc.mmin, acc.m + d.x - (acc.s + d.x) div (acc.t + 1) - {PH_DELTA})
                    > acc.lam then acc.t + 1 else acc.alarm end,
                'lam', acc.lam))
            """
        ).alias("st"),
    )
    return folded.select(
        "event_type",
        "n_hours",
        F.col("st.m").alias("ph_m"),
        F.col("st.mmin").alias("ph_min"),
        (F.col("st.m") - F.col("st.mmin")).alias("ph_gap"),
        F.col("st.lam").alias("lambda_thresh"),
        F.col("st.alarm").alias("alarm_at"),
        (F.col("st.alarm") > 0).cast("int").alias("alarmed"),
    )


PAGE_HINKLEY_SQL = f"""
WITH RECURSIVE events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS h, count(*)::BIGINT AS x
  FROM events_us GROUP BY 1, 2
),
per_type AS (
  SELECT event_type, list_sort(list(struct_pack(h := h, x := x))) AS hs,
         count(*)::BIGINT AS n, CAST(sum(x) AS BIGINT) AS tot
  FROM hourly GROUP BY event_type HAVING count(*) >= 2
),
walk AS (
  SELECT event_type, hs, n, tot, 1::BIGINT AS t, hs[1].x AS s,
         0::BIGINT AS m, 0::BIGINT AS mmin, 0::BIGINT AS alarm,
         2 * tot // n AS lam
  FROM per_type
  UNION ALL
  SELECT event_type, hs, n, tot, t + 1, s + hs[(t + 1)::INT].x,
         m + hs[(t + 1)::INT].x - (s + hs[(t + 1)::INT].x) // (t + 1) - {PH_DELTA},
         least(mmin, m + hs[(t + 1)::INT].x - (s + hs[(t + 1)::INT].x) // (t + 1) - {PH_DELTA}),
         CASE WHEN alarm = 0 AND
             (m + hs[(t + 1)::INT].x - (s + hs[(t + 1)::INT].x) // (t + 1) - {PH_DELTA})
             - least(mmin, m + hs[(t + 1)::INT].x - (s + hs[(t + 1)::INT].x) // (t + 1) - {PH_DELTA})
             > lam THEN t + 1 ELSE alarm END,
         lam
  FROM walk WHERE t < n
)
SELECT event_type, n AS n_hours, CAST(m AS BIGINT) AS ph_m,
       CAST(mmin AS BIGINT) AS ph_min, CAST(m - mmin AS BIGINT) AS ph_gap,
       CAST(lam AS BIGINT) AS lambda_thresh, CAST(alarm AS BIGINT) AS alarm_at,
       CAST(alarm > 0 AS INT) AS alarmed
FROM walk WHERE t = n
"""

QUERIES["events_page_hinkley"] = events_page_hinkley
ORACLES["events_page_hinkley"] = PAGE_HINKLEY_SQL


# --- split-conformal forecast intervals ------------------------------------------
#
# The distribution-free interval the forecasting family lacks: split
# conformal prediction (Vovk et al.; Lei et al. 2018) around the naive
# one-step forecast.  Per event type, the daily absolute one-step
# residuals split chronologically into calibration (first 2/3) and
# test; the 90% conformal radius is the ceil(0.9*(nc+1))-th smallest
# calibration residual — EXACT integer order statistics, no
# interpolation — and the audit reports empirical test coverage
# against the 9000 bp target.  Everything integer: residuals in
# cents, the quantile an indexed element of a sorted array, coverage
# in bp.
#
# Scale: one (type, day) aggregation; per-type array work over the
# bounded daily grid (sort + slice + indexed selection, all JVM-side).

CONF_TARGET_BP = 9000


def events_conformal_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("x"))
    per_type = (
        daily.groupBy("event_type")
        .agg(F.sort_array(F.collect_list(F.struct("day", "x"))).alias("days"))
        .where(F.size("days") >= 6)
    )
    resid = per_type.select(
        "event_type",
        F.size("days").cast("bigint").alias("n_days"),
        F.expr(
            "transform(sequence(2, size(days)), i -> abs(days[i-1].x - days[i-2].x))"
        ).alias("r"),
    ).select(
        "event_type",
        "n_days",
        "r",
        F.expr("(2 * size(r)) div 3").cast("bigint").alias("n_cal"),
    )
    scored = resid.select(
        "event_type",
        "n_days",
        "n_cal",
        (F.size("r") - F.col("n_cal")).cast("bigint").alias("n_test"),
        F.expr(
            "element_at(array_sort(slice(r, 1, cast(n_cal as int))),"
            " cast(least((9 * (n_cal + 1) + 9) div 10, n_cal) as int))"
        ).alias("q_cents"),
    )
    cover = resid.join(
        scored.select("event_type", "q_cents", "n_test"), "event_type"
    ).select(
        "event_type",
        F.expr(
            "size(filter(slice(r, cast(n_cal as int) + 1, cast(size(r) - n_cal as int)),"
            " x -> x <= q_cents))"
        ).cast("bigint").alias("n_covered"),
    )
    return scored.join(cover, "event_type").select(
        "event_type",
        "n_days",
        "n_cal",
        "n_test",
        F.col("q_cents").cast("bigint").alias("q_cents"),
        "n_covered",
        F.expr("n_covered * 10000 div n_test").cast("bigint").alias("coverage_bp"),
        F.lit(CONF_TARGET_BP).cast("bigint").alias("target_bp"),
    )


CONFORMAL_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         sum(floor(value * 100 + (0.5)::DOUBLE)::BIGINT)::BIGINT AS x
  FROM events_us GROUP BY 1, 2
),
per_type AS (
  SELECT event_type, list_sort(list(struct_pack(day := day, x := x))) AS days,
         count(*)::BIGINT AS n_days
  FROM daily GROUP BY event_type HAVING count(*) >= 6
),
resid AS (
  SELECT event_type, n_days,
         list_transform(generate_series(2, n_days::INT), i -> abs(days[i].x - days[i-1].x)) AS r,
         (2 * (n_days - 1)) // 3 AS n_cal
  FROM per_type
),
scored AS (
  SELECT event_type, n_days, n_cal, len(r) - n_cal AS n_test,
         list_sort(r[1:n_cal::INT])[least((9 * (n_cal + 1) + 9) // 10, n_cal)::INT] AS q_cents,
         r
  FROM resid
)
SELECT event_type, n_days, CAST(n_cal AS BIGINT) AS n_cal,
       CAST(n_test AS BIGINT) AS n_test, CAST(q_cents AS BIGINT) AS q_cents,
       CAST(len(list_filter(r[(n_cal + 1)::INT:], x -> x <= q_cents)) AS BIGINT) AS n_covered,
       CAST(len(list_filter(r[(n_cal + 1)::INT:], x -> x <= q_cents)) * 10000 // n_test AS BIGINT) AS coverage_bp,
       CAST({CONF_TARGET_BP} AS BIGINT) AS target_bp
FROM scored
"""

QUERIES["events_conformal_interval"] = events_conformal_interval
ORACLES["events_conformal_interval"] = CONFORMAL_SQL


# --- Croston intermittent-demand smoothing --------------------------------------
#
# The forecasting family member Holt cannot cover: slow-moving parts
# whose weekly demand is mostly zeros (Croston 1972; the standard
# spare-parts method, plus the Syntetos-Boylan approximation's 1-α/2
# bias correction).  Croston smooths TWO series updated only at demand
# points — demand size z and inter-demand interval p — and forecasts
# the demand rate z/p per week; feeding naive EWMA into intermittent
# series (what events_ewma would do here) systematically over-forecasts
# right after each demand spike.  Pairs with part_ss_inventory_sim:
# this operator estimates the demand rate that policy replay consumes.
#
# Integer devices as in events_holt_linear: alpha = 0.2 as the exact
# 200/800 milli fraction, truncating div (both engines truncate toward
# zero), init from the first demand size and first inter-demand gap,
# fold from the third demand week on.
#
# Plan: one (part, week) aggregation over the fact scan (map-side
# partials), then a bounded per-part fold — demand weeks per part are
# bounded by the calendar, not data volume; F.aggregate on Spark, a
# recursive CTE on DuckDB.

CROSTON_EPOCH = "1992-01-01"


def part_croston_demand(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    weekly = li.groupBy(
        "l_partkey",
        F.expr(
            f"datediff(cast(date_trunc('day', l_shipdate) as date),"
            f" cast('{CROSTON_EPOCH}' as date)) div 7"
        )
        .cast("bigint")
        .alias("w"),
    ).agg(F.sum(F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("bigint")).alias("c"))
    per_part = (
        weekly.groupBy("l_partkey")
        .agg(F.sort_array(F.collect_list(F.struct("w", "c"))).alias("dw"))
        .where(F.size("dw") >= 3)
    )
    folded = per_part.select(
        "l_partkey",
        F.size("dw").cast("bigint").alias("n_demand_weeks"),
        F.expr("dw[size(dw) - 1].w - dw[0].w + 1").cast("bigint").alias("span_weeks"),
        F.expr(
            """
            aggregate(
              slice(dw, 3, greatest(size(dw) - 2, 0)),
              named_struct(
                'z', dw[0].c * cast(1000 as bigint),
                'p', (dw[1].w - dw[0].w) * cast(1000 as bigint),
                'pw', dw[1].w),
              (acc, d) -> named_struct(
                'z', (200 * d.c * 1000 + 800 * acc.z) div 1000,
                'p', (200 * (d.w - acc.pw) * 1000 + 800 * acc.p) div 1000,
                'pw', d.w))
            """
        ).alias("st"),
    )
    return folded.select(
        "l_partkey",
        "n_demand_weeks",
        "span_weeks",
        F.col("st.z").alias("size_milli"),
        F.col("st.p").alias("interval_milli"),
        F.expr("st.z * 1000 div st.p").cast("bigint").alias("croston_rate_milli"),
        F.expr("(st.z * 1000 div st.p) * 900 div 1000").cast("bigint").alias("sba_rate_milli"),
    )


CROSTON_SQL = f"""
WITH RECURSIVE weekly AS (
  SELECT l_partkey,
         CAST(CAST(date_diff('day', DATE '{CROSTON_EPOCH}',
                   CAST(date_trunc('day', l_shipdate) AS DATE)) AS BIGINT) // 7 AS BIGINT) AS w,
         CAST(sum(CAST(floor(l_quantity * 100 + (0.5)::DOUBLE) AS BIGINT)) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
per_part AS (
  SELECT l_partkey, list_sort(list(struct_pack(w := w, c := c))) AS dw,
         count(*)::BIGINT AS n
  FROM weekly GROUP BY l_partkey HAVING count(*) >= 3
),
walk AS (
  SELECT l_partkey, dw, n, 2::BIGINT AS i,
         dw[1].c * 1000 AS z,
         (dw[2].w - dw[1].w) * 1000 AS p,
         dw[2].w AS pw
  FROM per_part
  UNION ALL
  SELECT l_partkey, dw, n, i + 1,
         (200 * dw[(i + 1)::INT].c * 1000 + 800 * z) // 1000,
         (200 * (dw[(i + 1)::INT].w - pw) * 1000 + 800 * p) // 1000,
         dw[(i + 1)::INT].w
  FROM walk WHERE i < n
)
SELECT l_partkey, n AS n_demand_weeks,
       CAST(dw[n::INT].w - dw[1].w + 1 AS BIGINT) AS span_weeks,
       CAST(z AS BIGINT) AS size_milli,
       CAST(p AS BIGINT) AS interval_milli,
       CAST(z * 1000 // p AS BIGINT) AS croston_rate_milli,
       CAST((z * 1000 // p) * 900 // 1000 AS BIGINT) AS sba_rate_milli
FROM walk WHERE i = n
"""

QUERIES["part_croston_demand"] = part_croston_demand
ORACLES["part_croston_demand"] = CROSTON_SQL


# --- Syntetos-Boylan demand-pattern classification ------------------------------
#
# The router in front of the forecasting family (Syntetos, Boylan &
# Croston 2005): per part, mean inter-demand interval ADI = span/n and
# the squared coefficient of variation CV² of demand sizes place the
# part in one of four quadrants — smooth (EWMA/Holt territory),
# intermittent (Croston), erratic, lumpy (SBA) — against the published
# cutoffs ADI 1.32 and CV² 0.49.  This is the operator that decides
# WHICH of events_ewma / events_holt_linear / part_croston_demand a
# replenishment pipeline should trust per key.
#
# All exact integers: ADI in milli via truncating div, CV² in basis
# points from the n·S2 − S1² identity over cent-quantized sizes (no
# float mean/variance anywhere), so class labels are bit-deterministic.
#
# Plan: the same one (part, week) aggregation croston rides, then a
# per-part two-sum aggregate — no folds, no windows, no pair joins.

SBC_ADI_MILLI = 1320  # ADI cutoff 1.32
SBC_CV2_BP = 4900  # CV² cutoff 0.49


def part_demand_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    weekly = li.groupBy(
        "l_partkey",
        F.expr(
            f"datediff(cast(date_trunc('day', l_shipdate) as date),"
            f" cast('{CROSTON_EPOCH}' as date)) div 7"
        )
        .cast("bigint")
        .alias("w"),
    ).agg(F.sum(F.floor(F.col("l_quantity") * 100 + F.lit(0.5)).cast("bigint")).alias("c"))
    agg = weekly.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n"),
        (F.max("w") - F.min("w") + 1).alias("span"),
        F.sum("c").alias("s1"),
        F.sum(F.expr("c * c")).alias("s2"),
    )
    adi = "span * 1000 div n"
    cv2 = "(n * s2 - s1 * s1) * 10000 div (s1 * s1)"
    return agg.where(F.col("n") >= 2).select(
        "l_partkey",
        F.col("n").cast("bigint").alias("n_demand_weeks"),
        F.col("span").cast("bigint").alias("span_weeks"),
        F.expr(adi).cast("bigint").alias("adi_milli"),
        F.expr(cv2).cast("bigint").alias("cv2_bp"),
        F.expr(
            f"case when {adi} < {SBC_ADI_MILLI} and {cv2} < {SBC_CV2_BP} then 'smooth'"
            f" when {adi} >= {SBC_ADI_MILLI} and {cv2} < {SBC_CV2_BP} then 'intermittent'"
            f" when {adi} < {SBC_ADI_MILLI} then 'erratic'"
            " else 'lumpy' end"
        ).alias("demand_class"),
    )


SBC_SQL = f"""
WITH weekly AS (
  SELECT l_partkey,
         CAST(CAST(date_diff('day', DATE '{CROSTON_EPOCH}',
                   CAST(date_trunc('day', l_shipdate) AS DATE)) AS BIGINT) // 7 AS BIGINT) AS w,
         CAST(sum(CAST(floor(l_quantity * 100 + (0.5)::DOUBLE) AS BIGINT)) AS BIGINT) AS c
  FROM lineitem GROUP BY 1, 2
),
agg AS (
  SELECT l_partkey, count(*)::BIGINT AS n,
         CAST(max(w) - min(w) + 1 AS BIGINT) AS span,
         CAST(sum(c) AS BIGINT) AS s1,
         CAST(sum(c * c) AS BIGINT) AS s2
  FROM weekly GROUP BY l_partkey
)
SELECT l_partkey, n AS n_demand_weeks, span AS span_weeks,
       CAST(span * 1000 // n AS BIGINT) AS adi_milli,
       CAST((n * s2 - s1 * s1) * 10000 // (s1 * s1) AS BIGINT) AS cv2_bp,
       CASE WHEN span * 1000 // n < {SBC_ADI_MILLI}
                 AND (n * s2 - s1 * s1) * 10000 // (s1 * s1) < {SBC_CV2_BP} THEN 'smooth'
            WHEN span * 1000 // n >= {SBC_ADI_MILLI}
                 AND (n * s2 - s1 * s1) * 10000 // (s1 * s1) < {SBC_CV2_BP} THEN 'intermittent'
            WHEN span * 1000 // n < {SBC_ADI_MILLI} THEN 'erratic'
            ELSE 'lumpy' END AS demand_class
FROM agg WHERE n >= 2
"""

QUERIES["part_demand_classify"] = part_demand_classify
ORACLES["part_demand_classify"] = SBC_SQL


# --- Holt-Winters additive seasonal smoothing -----------------------------------
#
# The seasonal completion of the forecasting family (Winters 1960):
# events_ewma carries level, events_holt_linear level+trend — weekly
# service traffic needs level+trend+7-day season.  Additive HW with
# alpha=0.2, beta=0.1, gamma=0.3 as exact integer milli fractions; the
# fold state carries the 7-slot seasonal ring AND a 7-slot raw ring
# (so the seasonal-naive rival is scored inside the same fold), both
# as arrays in the aggregate struct — the house fold device extended
# to vector state (F.aggregate indexed-transform / recursive-CTE
# list_transform).  Init: level = first-week mean, trend = 0,
# s_i = x_i - level (standard fpp init); fold from day 8.
#
# Plan: one (type, day) aggregation then a bounded per-type fold;
# seasonal state is O(period), rounds bounded by the calendar.

HW_PERIOD = 7

_HW_SLOT = "cast(acc.i % 7 as int)"
_HW_SSLOT = f"acc.s[{_HW_SLOT}]"
_HW_RSLOT = f"acc.r[{_HW_SLOT}]"
_HW_LNEW = f"((200 * (d.x * 1000 - {_HW_SSLOT}) + 800 * (acc.l + acc.b)) div 1000)"
_HW_BNEW = f"((100 * ({_HW_LNEW} - acc.l) + 900 * acc.b) div 1000)"
_HW_SNEW = f"((300 * (d.x * 1000 - {_HW_LNEW}) + 700 * {_HW_SSLOT}) div 1000)"
_HW_L0 = (
    "((days[0].x + days[1].x + days[2].x + days[3].x + days[4].x + days[5].x"
    " + days[6].x) * cast(1000 as bigint) div 7)"
)


def events_holt_winters(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("x"))
    per_type = (
        daily.groupBy("event_type")
        .agg(F.sort_array(F.collect_list(F.struct("day", "x"))).alias("days"))
        .where(F.size("days") >= 2 * HW_PERIOD)
    )
    folded = per_type.select(
        "event_type",
        F.size("days").cast("bigint").alias("n_days"),
        F.expr(
            f"""
            aggregate(
              slice(days, 8, greatest(size(days) - 7, 0)),
              named_struct(
                'l', {_HW_L0},
                'b', cast(0 as bigint),
                's', transform(sequence(0, 6), j -> days[j].x * cast(1000 as bigint) - {_HW_L0}),
                'r', transform(sequence(0, 6), j -> days[j].x),
                'i', cast(7 as bigint),
                'sae', cast(0 as bigint),
                'nsae', cast(0 as bigint)),
              (acc, d) -> named_struct(
                'l', {_HW_LNEW},
                'b', {_HW_BNEW},
                's', transform(acc.s, (v, j) -> case when j = {_HW_SLOT} then {_HW_SNEW} else v end),
                'r', transform(acc.r, (v, j) -> case when j = {_HW_SLOT} then d.x else v end),
                'i', acc.i + 1,
                'sae', acc.sae + abs(d.x * 1000 - (acc.l + acc.b + {_HW_SSLOT})),
                'nsae', acc.nsae + abs(d.x - {_HW_RSLOT}) * 1000))
            """
        ).alias("st"),
    )
    sel = [
        "event_type",
        "n_days",
        F.col("st.l").alias("level_milli"),
        F.col("st.b").alias("trend_milli"),
    ]
    sel += [F.expr(f"st.s[{j}]").alias(f"season{j}_milli") for j in range(HW_PERIOD)]
    sel += [
        F.col("st.sae").alias("hw_sae_milli"),
        F.col("st.nsae").alias("snaive_sae_milli"),
        (F.col("st.sae") < F.col("st.nsae")).cast("int").alias("hw_beats_snaive"),
    ]
    return folded.select(*sel)


_HWQ_SLOT = "(i % 7)"
_HWQ_SSLOT = f"s[{_HWQ_SLOT} + 1]"
_HWQ_RSLOT = f"r[{_HWQ_SLOT} + 1]"
_HWQ_X = "dw[(i + 1)::INT].x"
_HWQ_LNEW = f"((200 * ({_HWQ_X} * 1000 - {_HWQ_SSLOT}) + 800 * (l + b)) // 1000)"
_HWQ_BNEW = f"((100 * ({_HWQ_LNEW} - l) + 900 * b) // 1000)"
_HWQ_SNEW = f"((300 * ({_HWQ_X} * 1000 - {_HWQ_LNEW}) + 700 * {_HWQ_SSLOT}) // 1000)"
_HWQ_L0 = (
    "((dw[1].x + dw[2].x + dw[3].x + dw[4].x + dw[5].x + dw[6].x + dw[7].x)"
    " * 1000 // 7)"
)

HOLT_WINTERS_SQL = f"""
WITH RECURSIVE events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*)::BIGINT AS x
  FROM events_us GROUP BY 1, 2
),
per_type AS (
  SELECT event_type, list_sort(list(struct_pack(day := day, x := x))) AS dw,
         count(*)::BIGINT AS n
  FROM daily GROUP BY event_type HAVING count(*) >= {2 * HW_PERIOD}
),
walk AS (
  SELECT event_type, dw, n, 7::BIGINT AS i,
         {_HWQ_L0} AS l, 0::BIGINT AS b,
         list_transform(range(7), j -> dw[(j + 1)::INT].x * 1000 - {_HWQ_L0}) AS s,
         list_transform(range(7), j -> dw[(j + 1)::INT].x) AS r,
         0::BIGINT AS sae, 0::BIGINT AS nsae
  FROM per_type
  UNION ALL
  SELECT event_type, dw, n, i + 1,
         {_HWQ_LNEW}, {_HWQ_BNEW},
         list_transform(range(7), j -> CASE WHEN j = {_HWQ_SLOT} THEN {_HWQ_SNEW} ELSE s[(j + 1)::INT] END),
         list_transform(range(7), j -> CASE WHEN j = {_HWQ_SLOT} THEN {_HWQ_X} ELSE r[(j + 1)::INT] END),
         sae + abs({_HWQ_X} * 1000 - (l + b + {_HWQ_SSLOT})),
         nsae + abs({_HWQ_X} - {_HWQ_RSLOT}) * 1000
  FROM walk WHERE i < n
)
SELECT event_type, n AS n_days,
       CAST(l AS BIGINT) AS level_milli, CAST(b AS BIGINT) AS trend_milli,
       {", ".join(f"CAST(s[{j + 1}] AS BIGINT) AS season{j}_milli" for j in range(HW_PERIOD))},
       CAST(sae AS BIGINT) AS hw_sae_milli,
       CAST(nsae AS BIGINT) AS snaive_sae_milli,
       CAST(sae < nsae AS INT) AS hw_beats_snaive
FROM walk WHERE i = n
"""

QUERIES["events_holt_winters"] = events_holt_winters
ORACLES["events_holt_winters"] = HOLT_WINTERS_SQL


# --- two-state burst detection (Kleinberg-style Viterbi) ------------------------
#
# The state-labeling complement of events_cusum_alarm's one-sided
# alarm: model daily volume as a 2-state process (base rate lambda0 =
# the series mean, burst rate lambda1 = 2*lambda0), Poisson
# negative-log-likelihood emissions, an entry cost gamma for switching
# into burst (Kleinberg 2003's automaton, 2 states) — and recover the
# OPTIMAL state sequence by Viterbi, not a greedy threshold.
#
# The showpiece device: Viterbi needs a forward DP and a traceback —
# both run as bounded per-type FOLDS.  Emission costs quantize to
# milli integers (floor((lambda - x*ln(lambda))*1000) on identical
# doubles — the one ln per state), so the whole DP is exact integer
# arithmetic; the forward fold carries (cost0, cost1, parents[]), the
# traceback folds the REVERSED parent array carrying the running
# state.  DuckDB mirrors with two recursive CTEs.
#
# Plan: one (type, day) aggregation, then two bounded folds per type;
# rounds bounded by the calendar, state O(days) per type.

BURST_GAMMA_MILLI = 2000  # burst entry cost
# lambda1 = lambda0 + 2*floor(sqrt(lambda0)): the +2-sigma Poisson rate,
# ADAPTIVE in the base rate so burst days exist at every SF (a fixed
# multiplier drowns as relative fluctuations shrink with volume)

_BE0 = "(cast(lam0 as double) - d.x * ln(cast(lam0 as double)))"
_BE1 = "(cast(lam1 as double) - d.x * ln(cast(lam1 as double)))"
_BE0_INIT = _BE0.replace("d.x", "days[0].x")
_BE1_INIT = _BE1.replace("d.x", "days[0].x")


def events_burst_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
    )
    daily = ev.groupBy("event_type", "day").agg(F.count(F.lit(1)).alias("x"))
    per_type = (
        daily.groupBy("event_type")
        .agg(
            F.sort_array(F.collect_list(F.struct("day", "x"))).alias("days"),
            F.expr("sum(x) div count(*)").alias("lam0"),
        )
        .where(F.size("days") >= 2)
        .select(
            "event_type",
            "days",
            "lam0",
            F.expr(
                "lam0 + 2 * cast(floor(sqrt(cast(lam0 as double))) as bigint)"
            ).alias("lam1"),
        )
    )
    fwd = per_type.select(
        "event_type",
        "days",
        F.expr(
            f"""
            aggregate(
              slice(days, 2, greatest(size(days) - 1, 0)),
              named_struct(
                'c0', cast(floor({_BE0_INIT} * 1000) as bigint),
                'c1', cast(floor({_BE1_INIT} * 1000) as bigint) + {BURST_GAMMA_MILLI},
                'par', cast(array() as array<struct<p0: int, p1: int>>)),
              (acc, d) -> named_struct(
                'c0', least(acc.c0, acc.c1) + cast(floor({_BE0} * 1000) as bigint),
                'c1', least(acc.c0 + {BURST_GAMMA_MILLI}, acc.c1)
                      + cast(floor({_BE1} * 1000) as bigint),
                'par', acc.par || array(named_struct(
                    'p0', case when acc.c0 <= acc.c1 then 0 else 1 end,
                    'p1', case when acc.c0 + {BURST_GAMMA_MILLI} <= acc.c1 then 0 else 1 end))))
            """
        ).alias("st"),
    )
    traced = fwd.select(
        "event_type",
        "days",
        F.expr(
            """
            reverse(aggregate(
              reverse(st.par),
              named_struct(
                'cur', case when st.c0 <= st.c1 then 0 else 1 end,
                'labels', array(case when st.c0 <= st.c1 then 0 else 1 end)),
              (acc, p) -> named_struct(
                'cur', case when acc.cur = 0 then p.p0 else p.p1 end,
                'labels', acc.labels || array(case when acc.cur = 0 then p.p0 else p.p1 end))
            ).labels)
            """
        ).alias("labels"),
    )
    out = traced.select(
        "event_type",
        F.posexplode(F.arrays_zip("days", "labels")).alias("pos", "z"),
    ).select(
        "event_type",
        F.col("z.days.day").alias("day"),
        F.col("z.days.x").cast("bigint").alias("x"),
        F.col("z.labels").cast("bigint").alias("burst_state"),
    )
    return out.where(F.col("burst_state") == 1)


_BQ_E0 = "(CAST(lam0 AS DOUBLE) - dw[(i + 1)::INT].x * ln(CAST(lam0 AS DOUBLE)))"
_BQ_E1 = "(CAST(lam1 AS DOUBLE) - dw[(i + 1)::INT].x * ln(CAST(lam1 AS DOUBLE)))"
_BQ_E0_INIT = _BQ_E0.replace("dw[(i + 1)::INT]", "dw[1]")
_BQ_E1_INIT = _BQ_E1.replace("dw[(i + 1)::INT]", "dw[1]")

BURST_VITERBI_SQL = f"""
WITH RECURSIVE events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*)::BIGINT AS x
  FROM events_us GROUP BY 1, 2
),
per_type AS (
  SELECT event_type, list_sort(list(struct_pack(day := day, x := x))) AS dw,
         count(*)::BIGINT AS n,
         CAST(sum(x) // count(*) AS BIGINT) AS lam0,
         CAST(sum(x) // count(*) AS BIGINT)
         + 2 * CAST(floor(sqrt(CAST(CAST(sum(x) // count(*) AS BIGINT) AS DOUBLE))) AS BIGINT) AS lam1
  FROM daily GROUP BY event_type HAVING count(*) >= 2
),
fwd AS (
  SELECT event_type, dw, n, lam0, lam1, 1::BIGINT AS i,
         CAST(floor({_BQ_E0_INIT} * 1000) AS BIGINT) AS c0,
         CAST(floor({_BQ_E1_INIT} * 1000) AS BIGINT) + {BURST_GAMMA_MILLI} AS c1,
         CAST([] AS INT[]) AS p0s, CAST([] AS INT[]) AS p1s
  FROM per_type
  UNION ALL
  SELECT event_type, dw, n, lam0, lam1, i + 1,
         least(c0, c1) + CAST(floor({_BQ_E0} * 1000) AS BIGINT),
         least(c0 + {BURST_GAMMA_MILLI}, c1) + CAST(floor({_BQ_E1} * 1000) AS BIGINT),
         list_append(p0s, CASE WHEN c0 <= c1 THEN 0 ELSE 1 END),
         list_append(p1s, CASE WHEN c0 + {BURST_GAMMA_MILLI} <= c1 THEN 0 ELSE 1 END)
  FROM fwd WHERE i < n
),
final AS (SELECT * FROM fwd WHERE i = n),
back AS (
  SELECT event_type, dw, n, p0s, p1s, n AS t,
         CASE WHEN c0 <= c1 THEN 0 ELSE 1 END AS cur,
         [CASE WHEN c0 <= c1 THEN 0 ELSE 1 END] AS labels
  FROM final
  UNION ALL
  SELECT event_type, dw, n, p0s, p1s, t - 1,
         CASE WHEN cur = 0 THEN p0s[(t - 1)::INT] ELSE p1s[(t - 1)::INT] END,
         list_prepend(CASE WHEN cur = 0 THEN p0s[(t - 1)::INT]
                           ELSE p1s[(t - 1)::INT] END, labels)
  FROM back WHERE t > 1
),
labeled AS (SELECT event_type, dw, labels FROM back WHERE t = 1)
SELECT event_type, dw[i::INT].day AS day,
       CAST(dw[i::INT].x AS BIGINT) AS x,
       CAST(labels[i::INT] AS BIGINT) AS burst_state
FROM labeled, unnest(range(1, len(dw) + 1)) AS u(i)
WHERE labels[i::INT] = 1
"""

QUERIES["events_burst_viterbi"] = events_burst_viterbi
ORACLES["events_burst_viterbi"] = BURST_VITERBI_SQL


# --- SAX symbolization + motif counting -------------------------------------------
#
# The time-series mining primitive the numeric family lacks (Lin,
# Keogh et al. 2003 "Symbolic Aggregate approXimation"): each
# (event_type, day) compresses to a 24-symbol word — hourly mean cents
# binned against GLOBAL quartile breakpoints into a 4-letter alphabet
# — and recurring words are the corpus's daily-shape MOTIFS (the thing
# an on-call recognizes as "a normal Tuesday"). The alphabet
# breakpoints are exact integer order statistics selected by
# row_number over the bounded hourly grid (the user_spend_quartiles
# device, never the fact rows); hourly means are truncating-div
# integers; the word is an ORDER-DETERMINISTIC string fold
# (array_sort struct collect / string_agg ORDER BY hour).
#
# Scale: one fact aggregation to the (type, day, hour) grid; the
# quartile selection, symbolization and motif count all run on that
# bounded grid. Missing hours symbolize as '_' so partial days form
# distinct (and visibly gappy) words.

SAX_TOP = 20


def events_sax_motifs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    grid = ev.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        F.hour("ts").alias("hr"),
    ).agg(
        F.expr(
            "cast(sum(cast(floor(value * 100 + 0.5) as bigint)) div count(*) as bigint)"
        ).alias("mean_cents")
    ).localCheckpoint(eager=False)
    ordered = grid.select(
        "mean_cents",
        F.row_number().over(Window.orderBy(F.asc("mean_cents"), F.asc("event_type"), F.asc("day"), F.asc("hr"))).alias("r"),
    )
    n_df = ordered.agg(F.max("r").alias("n"))
    brk = (
        ordered.crossJoin(F.broadcast(n_df))
        .where(
            (F.col("r") == F.expr("n div 4"))
            | (F.col("r") == F.expr("n div 2"))
            | (F.col("r") == F.expr("3 * n div 4"))
        )
        .groupBy()
        .agg(
            F.min("mean_cents").alias("q1"),
            F.expr("max(case when r = n div 2 then mean_cents end)").alias("q2"),
            F.max("mean_cents").alias("q3"),
        )
    )
    sym = grid.crossJoin(F.broadcast(brk)).select(
        "event_type",
        "day",
        "hr",
        F.expr(
            "case when mean_cents <= q1 then 'a' when mean_cents <= q2 then 'b'"
            " when mean_cents <= q3 then 'c' else 'd' end"
        ).alias("s"),
    )
    words = sym.groupBy("event_type", "day").agg(
        F.expr(
            "concat_ws('', transform(array_sort(collect_list(struct(hr, s))), x -> x.s))"
        ).alias("sax"),
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
    )
    return (
        words.groupBy("event_type", "sax", "n_hours")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_days"),
            F.min("day").alias("first_day"),
        )
        .orderBy(F.desc("n_days"), F.asc("event_type"), F.asc("sax"))
        .limit(SAX_TOP)
    )


SAX_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
), grid AS (
  SELECT event_type, CAST(ts AS DATE) AS day, hour(ts) AS hr,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) // count(*) AS BIGINT) AS mean_cents
  FROM events_us GROUP BY 1, 2, 3
), ordered AS (
  SELECT mean_cents,
         row_number() OVER (ORDER BY mean_cents, event_type, day, hr) AS r
  FROM grid
), nn AS (SELECT max(r) AS n FROM ordered),
brk AS (
  SELECT min(mean_cents) AS q1,
         max(CASE WHEN r = n // 2 THEN mean_cents END) AS q2,
         max(mean_cents) AS q3
  FROM ordered, nn
  WHERE r = n // 4 OR r = n // 2 OR r = 3 * n // 4
), sym AS (
  SELECT event_type, day, hr,
         CASE WHEN mean_cents <= q1 THEN 'a' WHEN mean_cents <= q2 THEN 'b'
              WHEN mean_cents <= q3 THEN 'c' ELSE 'd' END AS s
  FROM grid, brk
), words AS (
  SELECT event_type, day, string_agg(s, '' ORDER BY hr) AS sax,
         count(*)::BIGINT AS n_hours
  FROM sym GROUP BY event_type, day
)
SELECT event_type, sax, n_hours, count(*)::BIGINT AS n_days, min(day) AS first_day
FROM words
GROUP BY event_type, sax, n_hours
ORDER BY n_days DESC, event_type ASC, sax ASC
LIMIT {SAX_TOP}
"""

QUERIES["events_sax_motifs"] = events_sax_motifs
ORACLES["events_sax_motifs"] = SAX_SQL


# --- dynamic time warping between event-type daily series ---------------------
#
# DTW (Sakoe & Chiba 1978) between every pair of per-type daily-total
# series — the alignment-tolerant distance `events_type_comovement`'s
# lag-free correlation can't see (two types tracing the same shape a
# few days apart score ~0 correlation but a small DTW cost). All
# integer: cent-scaled daily totals, |a-b| cell costs, bigint DP.
#
# The DP's intra-row recursion D(i,j) = c(i,j) + min(D(i-1,j),
# D(i-1,j-1), D(i,j-1)) looks inherently sequential, but unrolls
# exactly: with C(j) = Σ_{l<=j} c(i,l) and m(k) = min(D(i-1,k),
# D(i-1,k-1)),  D(i,j) = C(j) + min_{k<=j} (m(k) - C(k-1))  — prefix
# sums + a prefix min, so every ROW is pure (slice, transform, min)
# list ops with NO sequential chain inside it. Spark runs the row
# recursion as ONE bounded aggregate() fold (state = previous DP row,
# ~31 entries — the shelf-fold class); the DuckDB twin is a recursive
# CTE advancing one row per iteration with identical list surgery.
# Grid is calendar-bounded (≤ ~31 days per side) and the pair count
# is the type-pair grid — never the event grain.

DTW_INF = 1 << 50


def events_dtw_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)")).alias("v"))
    )
    series = daily.groupBy("event_type").agg(
        F.expr("transform(array_sort(collect_list(struct(day, v))), s -> s.v)").alias(
            "vs"
        )
    )
    a = series.select(
        F.col("event_type").alias("type_a"), F.col("vs").alias("va")
    )
    b = series.select(
        F.col("event_type").alias("type_b"), F.col("vs").alias("vb")
    )
    pairs = a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
    inf = f"cast({DTW_INF} as bigint)"
    cost_prefix = (
        "aggregate(transform(sequence(1, {hi}), l ->"
        " abs(element_at(va, i) - element_at(vb, l))),"
        " cast(0 as bigint), (a, x) -> a + x)"
    )
    dtw = F.expr(
        f"""
        aggregate(
          sequence(1, size(va)),
          concat(array(cast(0 as bigint)),
                 transform(sequence(1, size(vb)), j -> {inf})),
          (prev, i) -> concat(array({inf}),
            transform(sequence(1, size(vb)), j ->
              {cost_prefix.format(hi="j")}
              + array_min(transform(sequence(1, j), k ->
                  least(element_at(prev, k + 1), element_at(prev, k))
                  - (case when k = 1 then cast(0 as bigint)
                          else {cost_prefix.format(hi="k - 1")} end))))),
          fin -> element_at(fin, size(vb) + 1))
        """
    )
    return pairs.select(
        "type_a",
        "type_b",
        F.size("va").cast("bigint").alias("n_a"),
        F.size("vb").cast("bigint").alias("n_b"),
        dtw.alias("dtw_cost"),
    ).withColumn(
        "dtw_per_step",
        F.expr("dtw_cost div greatest(n_a, n_b)").cast("bigint"),
    )


DTW_PAIRS_SQL = f"""
WITH RECURSIVE ev AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(sum(CAST(floor(value * 100 + (0.5)::DOUBLE) AS BIGINT)) AS BIGINT) AS v
  FROM ev GROUP BY 1, 2
),
series AS (
  SELECT event_type, list(v ORDER BY day) AS vs FROM daily GROUP BY 1
),
pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         a.vs AS va, b.vs AS vb
  FROM series a JOIN series b ON a.event_type < b.event_type
),
dp AS (
  SELECT type_a, type_b, va, vb, 0 AS i,
         list_prepend(0::BIGINT,
           list_transform(range(1, len(vb) + 1), j -> {DTW_INF}::BIGINT)) AS row
  FROM pairs
  UNION ALL
  SELECT type_a, type_b, va, vb, i + 1,
         list_prepend({DTW_INF}::BIGINT,
           list_transform(range(1, len(vb) + 1), j ->
             CAST(coalesce(list_sum(list_transform(range(1, j + 1), l ->
                    abs(va[i + 1] - vb[l]))), 0) AS BIGINT)
             + CAST(list_min(list_transform(range(1, j + 1), k ->
                 least(row[k + 1], row[k])
                 - CAST(coalesce(list_sum(list_transform(range(1, k), l ->
                        abs(va[i + 1] - vb[l]))), 0) AS BIGINT))) AS BIGINT)))
  FROM dp WHERE i < len(va)
)
SELECT type_a, type_b,
       CAST(len(va) AS BIGINT) AS n_a, CAST(len(vb) AS BIGINT) AS n_b,
       CAST(row[len(vb) + 1] AS BIGINT) AS dtw_cost,
       CAST(row[len(vb) + 1] // greatest(len(va), len(vb)) AS BIGINT) AS dtw_per_step
FROM dp WHERE i = len(va)
"""

QUERIES["events_dtw_pairs"] = events_dtw_pairs
ORACLES["events_dtw_pairs"] = DTW_PAIRS_SQL


# --- quantile-forecast pinball loss (the production quantile metric) ----------
#
# Quantile forecasts are graded with pinball loss L_q(y,f) =
# max(q(y−f), (q−1)(y−f)) (Koenker & Bassett 1978; the M5-Uncertainty
# metric) — the number next to events_forecast_backtest's point-MAE
# when the deployment ships P10/P50/P90 bands. Split: first
# PINBALL_TRAIN_DAYS daily totals per type train a CONSTANT quantile
# forecast (the q-th ORDER STATISTIC of the train window — exact
# integer k-th smallest, ties to earlier day, no interpolation), the
# remaining days evaluate. Everything integer: cent-scaled totals,
# q in tenths so 10·L is exact (max(q10·d, (q10−10)·d)).
# Scale: calendar-bounded per-type windows (the bounded-grid class),
# one broadcast forecast join, one agg.

PINBALL_TRAIN_DAYS = 21
PINBALL_Q10S = (1, 5, 9)  # P10 / P50 / P90


def events_pinball_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)")).alias("v"))
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    idxd = daily.withColumn("idx", F.row_number().over(wd)).localCheckpoint(
        eager=False
    )  # split consumed by both arms
    train = idxd.where(F.col("idx") <= PINBALL_TRAIN_DAYS)
    test = idxd.where(F.col("idx") > PINBALL_TRAIN_DAYS)

    wv = Window.partitionBy("event_type").orderBy("v", "day")
    ranked = train.withColumn("rn", F.row_number().over(wv))
    qs = F.array(*[F.lit(q) for q in PINBALL_Q10S])
    forecasts = (
        ranked.select("event_type", "rn", "v", F.explode(qs).alias("q10"))
        .where(
            F.col("rn")
            == F.expr(f"(q10 * {PINBALL_TRAIN_DAYS} + 9) div 10")
        )
        .select("event_type", "q10", F.col("v").alias("f"))
    )
    losses = test.join(F.broadcast(forecasts), "event_type").select(
        "event_type",
        "q10",
        "f",
        F.expr("greatest(q10 * (v - f), (q10 - 10) * (v - f))").alias("l10"),
    )
    return losses.groupBy("event_type", "q10", "f").agg(
        F.count(F.lit(1)).alias("n_test"),
        F.sum("l10").alias("total_pinball_x10"),
    ).select(
        "event_type",
        F.col("q10").cast("bigint").alias("q10"),
        F.lit(PINBALL_TRAIN_DAYS).cast("bigint").alias("n_train"),
        F.col("n_test").cast("bigint").alias("n_test"),
        F.col("f").cast("bigint").alias("forecast"),
        F.col("total_pinball_x10").cast("bigint").alias("total_pinball_x10"),
        F.expr("total_pinball_x10 div n_test").cast("bigint").alias(
            "mean_pinball_x10"
        ),
    )


PINBALL_SQL = f"""
WITH ev AS (SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events),
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(sum(CAST(floor(value * 100 + (0.5)::DOUBLE) AS BIGINT)) AS BIGINT) AS v
  FROM ev GROUP BY 1, 2
),
idxd AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY day) AS idx
  FROM daily
),
train AS (SELECT * FROM idxd WHERE idx <= {PINBALL_TRAIN_DAYS}),
test AS (SELECT * FROM idxd WHERE idx > {PINBALL_TRAIN_DAYS}),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY v, day) AS rn
  FROM train
),
forecasts AS (
  SELECT event_type, q.q10, v AS f
  FROM ranked, (SELECT unnest([{", ".join(str(q) for q in PINBALL_Q10S)}]) AS q10) q
  WHERE rn = (q.q10 * {PINBALL_TRAIN_DAYS} + 9) // 10
)
SELECT t.event_type, CAST(f.q10 AS BIGINT) AS q10,
       CAST({PINBALL_TRAIN_DAYS} AS BIGINT) AS n_train,
       count(*)::BIGINT AS n_test,
       CAST(f.f AS BIGINT) AS forecast,
       CAST(sum(greatest(f.q10 * (t.v - f.f), (f.q10 - 10) * (t.v - f.f))) AS BIGINT) AS total_pinball_x10,
       CAST(CAST(sum(greatest(f.q10 * (t.v - f.f), (f.q10 - 10) * (t.v - f.f))) AS BIGINT)
            // count(*) AS BIGINT) AS mean_pinball_x10
FROM test t JOIN forecasts f ON f.event_type = t.event_type
GROUP BY t.event_type, f.q10, f.f
"""

QUERIES["events_pinball_eval"] = events_pinball_eval
ORACLES["events_pinball_eval"] = PINBALL_SQL


# --- classical seasonal decomposition (trend / seasonal / residual) -----------
#
# The moving-average decomposition (the "classical decomposition" of
# every forecasting text; STL's ancestor) as a graded ARTIFACT — the
# per-day trend/seasonal/residual table the anomaly and forecasting
# operators consume, complementing events_holt_winters (which FITS a
# model) with the model-free view. trend = centered 7-day MA (exact:
# window sum div 7, only emitted where the full window exists),
# detrended = v − trend, seasonal = per-(type, day-of-week) mean of
# the detrended values, residual = detrended − seasonal.
#
# Two cross-engine devices: day-of-week as (epoch days) % 7 — engine-
# independent, unlike the engines' dayofweek() conventions — and the
# OFFSET division trick for means of possibly-NEGATIVE detrended
# values: BOTH engines' integer division truncates toward zero
# (DuckDB's // included: -11 // 12 = 0, not -1), so neither computes
# floor for negative numerators; (x + OFF·n) div n − OFF keeps the
# numerator positive, where truncation and floor coincide, giving
# deterministic floor semantics in both engines.

DECOMP_OFF = 1 << 35


def events_classical_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)")).alias("v"))
    )
    w7 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
    trended = (
        daily.withColumn("s7", F.sum("v").over(w7))
        .withColumn("c7", F.count(F.lit(1)).over(w7))
        .where(F.col("c7") == 7)
        .select(
            "event_type",
            "day",
            "v",
            F.expr("s7 div 7").cast("bigint").alias("trend"),
            F.expr("datediff(day, date'1970-01-01') % 7").alias("dow"),
        )
        .withColumn("detrended", (F.col("v") - F.col("trend")).cast("bigint"))
        .localCheckpoint(eager=False)  # feeds the seasonal agg AND the output join
    )
    seasonal = trended.groupBy("event_type", "dow").agg(
        F.expr(
            f"cast((sum(detrended) + {DECOMP_OFF}L * count(*)) div count(*)"
            f" - {DECOMP_OFF}L as bigint)"
        ).alias("seasonal")
    )
    return (
        trended.join(seasonal, ["event_type", "dow"])
        .select(
            "event_type",
            "day",
            "v",
            "trend",
            F.col("dow").cast("bigint").alias("dow"),
            "seasonal",
            (F.col("detrended") - F.col("seasonal")).cast("bigint").alias("residual"),
        )
    )


CLASSICAL_DECOMP_SQL = f"""
WITH ev AS (SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events),
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(sum(CAST(floor(value * 100 + (0.5)::DOUBLE) AS BIGINT)) AS BIGINT) AS v
  FROM ev GROUP BY 1, 2
),
trended AS (
  SELECT event_type, day, v,
         CAST(s7 // 7 AS BIGINT) AS trend,
         CAST((day - DATE '1970-01-01') % 7 AS BIGINT) AS dow,
         CAST(v - s7 // 7 AS BIGINT) AS detrended
  FROM (
    SELECT *, sum(v) OVER w AS s7, count(*) OVER w AS c7
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
  ) WHERE c7 = 7
),
seasonal AS (
  SELECT event_type, dow,
         CAST((sum(detrended) + {DECOMP_OFF} * count(*)) // count(*)
              - {DECOMP_OFF} AS BIGINT) AS seasonal
  FROM trended GROUP BY 1, 2
)
SELECT t.event_type, t.day, t.v, t.trend, t.dow, s.seasonal,
       CAST(t.detrended - s.seasonal AS BIGINT) AS residual
FROM trended t JOIN seasonal s ON s.event_type = t.event_type AND s.dow = t.dow
"""

QUERIES["events_classical_decompose"] = events_classical_decompose
ORACLES["events_classical_decompose"] = CLASSICAL_DECOMP_SQL
