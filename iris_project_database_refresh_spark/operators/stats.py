"""Nonparametric / classical statistical tests over the fact tables.

Reference parity: the reference validates refreshed extracts with
eyeball-level distribution checks (`catalog search/stage5_output_final_csv.py`
validate_csv_data; `process_monitor_logs` in database-schema.sql) — these
operators are the principled versions of those checks: is a relationship
real (Spearman, chi-squared), is a sequence random (runs test), what is
the robust trend (Theil–Sen)?  All are public-art textbook statistics
(Spearman 1904; Pearson 1900; Wald & Wolfowitz 1940; Theil 1950 / Sen
1968).

House determinism devices (see PLANS.md / the module docstrings they
were introduced in):

* every test reduces the fact scan to a BOUNDED grid first (value
  contingency, hourly buckets, monthly sums) — the statistics are then
  exact integer arithmetic on that grid;
* wide integer products run in Spark ``decimal(38,0)`` / DuckDB
  ``HUGEINT`` (exact, intermediates only — outputs are always BIGINT),
  with truncating ``div`` only where the true quotient fits int64;
* the one irreducible irrational step (a sqrt ratio) runs as the SAME
  IEEE-double expression in both engines — each *, /, sqrt a single
  correctly-rounded op in identical order — then floors into milli/bp
  integers.

Scale: each operator is one narrow columnar scan + one small-key
aggregation; everything after operates on O(10²) rows (broadcast
joins, no fact-fact shuffles, no windows over fact rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES = {}
ORACLES = {}


# --- Spearman rank correlation: discount vs quantity ---------------------------
#
# Are deeper discounts moving bigger quantities?  Pearson on the raw
# values is dominated by the quantity spread; Spearman on midranks is
# the scale-free answer.  Both variables are LOW-CARDINALITY (11
# discount cents values x 50 quantities), so the exact tie-aware
# midranks come from the value contingency, not from ranking fact rows:
# doubled midrank rx2(v) = 2*(count below v) + count(v) + 1 is an exact
# integer, and Pearson-on-ranks needs only Sum cnt*rx2c*ry2c over the
# <= 550 cells (the x2 scaling cancels in the ratio).

def lineitem_spearman_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("cast(floor(l_discount * 100 + 0.5) as bigint)").alias("dc"),
        F.col("l_quantity").cast("bigint").alias("q"),
    )
    cells = li.groupBy("dc", "q").agg(F.count(F.lit(1)).alias("cnt"))

    def midranks(col: str):
        marg = cells.groupBy(col).agg(F.sum("cnt").alias("c"))
        w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
        return marg.select(
            col,
            (2 * F.coalesce(F.sum("c").over(w), F.lit(0)) + F.col("c") + 1).alias(
                f"r2_{col}"
            ),
        )

    n1 = cells.agg(
        F.sum("cnt").alias("n"),
        F.count_distinct("dc").alias("n_disc"),
        F.count_distinct("q").alias("n_qty"),
    )
    scored = (
        cells.join(F.broadcast(midranks("dc")), "dc")
        .join(F.broadcast(midranks("q")), "q")
        .crossJoin(F.broadcast(n1))
        .select(
            "n",
            "n_disc",
            "n_qty",
            F.expr("cast(cnt as decimal(38,0)) * (r2_dc - (n + 1)) * (r2_q - (n + 1))").alias("pxy"),
            F.expr("cast(cnt as decimal(38,0)) * (r2_dc - (n + 1)) * (r2_dc - (n + 1))").alias("pxx"),
            F.expr("cast(cnt as decimal(38,0)) * (r2_q - (n + 1)) * (r2_q - (n + 1))").alias("pyy"),
        )
    )
    sums = scored.groupBy("n", "n_disc", "n_qty").agg(
        F.sum("pxy").alias("sxy"), F.sum("pxx").alias("sxx"), F.sum("pyy").alias("syy")
    )
    # identical-IEEE-double device for the final ratio (intermediate
    # decimal sums are exact; the cast to double is one correct rounding)
    rho = "(cast(sxy as double) / sqrt(cast(sxx as double) * cast(syy as double)))"
    return sums.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("n_disc").cast("bigint").alias("n_disc"),
        F.col("n_qty").cast("bigint").alias("n_qty"),
        F.expr(f"cast(floor({rho} * 1000.0) as bigint)").alias("rho_milli"),
        F.expr(f"cast(floor({rho} * {rho} * 10000.0) as bigint)").alias("rho2_bp"),
    )


SPEARMAN_SQL = """
WITH li AS (
  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS dc,
         CAST(l_quantity AS BIGINT) AS q
  FROM lineitem
),
cells AS (SELECT dc, q, count(*)::BIGINT AS cnt FROM li GROUP BY dc, q),
dm AS (
  SELECT dc, 2 * coalesce(sum(c) OVER (ORDER BY dc
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r2_dc
  FROM (SELECT dc, CAST(sum(cnt) AS BIGINT) AS c FROM cells GROUP BY dc)
),
qm AS (
  SELECT q, 2 * coalesce(sum(c) OVER (ORDER BY q
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + c + 1 AS r2_q
  FROM (SELECT q, CAST(sum(cnt) AS BIGINT) AS c FROM cells GROUP BY q)
),
n1 AS (
  SELECT CAST(sum(cnt) AS BIGINT) AS n,
         count(DISTINCT dc)::BIGINT AS n_disc,
         count(DISTINCT q)::BIGINT AS n_qty
  FROM cells
),
sums AS (
  SELECT n, n_disc, n_qty,
         sum(CAST(cnt AS HUGEINT) * (r2_dc - (n + 1)) * (r2_q - (n + 1))) AS sxy,
         sum(CAST(cnt AS HUGEINT) * (r2_dc - (n + 1)) * (r2_dc - (n + 1))) AS sxx,
         sum(CAST(cnt AS HUGEINT) * (r2_q - (n + 1)) * (r2_q - (n + 1))) AS syy
  FROM cells JOIN dm USING (dc) JOIN qm USING (q) CROSS JOIN n1
  GROUP BY n, n_disc, n_qty
)
SELECT n AS n_rows, n_disc, n_qty,
       CAST(floor((CAST(sxy AS DOUBLE) / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))) * 1000.0) AS BIGINT) AS rho_milli,
       CAST(floor((CAST(sxy AS DOUBLE) / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE)))
            * (CAST(sxy AS DOUBLE) / sqrt(CAST(sxx AS DOUBLE) * CAST(syy AS DOUBLE))) * 10000.0) AS BIGINT) AS rho2_bp
FROM sums
"""

QUERIES["lineitem_spearman_corr"] = lineitem_spearman_corr
ORACLES["lineitem_spearman_corr"] = SPEARMAN_SQL


# --- chi-squared independence: return flag vs order-size band ------------------
#
# Does return behavior depend on order size?  Pearson chi-squared on
# the 3x3 contingency (returnflag x quantity tertile band), computed
# EXACTLY: per cell, (o*n - r*c)^2 * 1e6 div (r*c*n) is integral
# (wide products in decimal/HUGEINT; the quotient is bounded by
# 1e6 * n * min(r,c) so the BIGINT div result is exact), summed to
# chi2_micro.  Cramer's V is the effect size an analyst reads.

def lineitem_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("rf"),
        (1 + F.expr("(cast(l_quantity as bigint) - 1) div 17")).alias("band"),
    )
    cells = li.groupBy("rf", "band").agg(F.count(F.lit(1)).alias("o"))
    rm = cells.groupBy("rf").agg(F.sum("o").alias("r"))
    cm = cells.groupBy("band").agg(F.sum("o").alias("c"))
    tot = cells.agg(
        F.sum("o").alias("n"),
        F.count_distinct("rf").alias("nr"),
        F.count_distinct("band").alias("nc"),
    )
    scored = (
        cells.join(F.broadcast(rm), "rf")
        .join(F.broadcast(cm), "band")
        .crossJoin(F.broadcast(tot))
        .select(
            "n",
            "nr",
            "nc",
            F.expr(
                "cast((cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c)"
                " * (cast(o as decimal(38,0)) * n - cast(r as decimal(38,0)) * c)"
                " * 1000000 div (cast(r as decimal(38,0)) * c * n) as bigint)"
            ).alias("cell_micro"),
            F.expr("r * c * 1000 div n").alias("e_milli"),
        )
    )
    agg = scored.groupBy("n", "nr", "nc").agg(
        F.sum("cell_micro").alias("chi2_micro"), F.min("e_milli").alias("min_e_milli")
    )
    v = (
        "sqrt(cast(chi2_micro as double) / (1000000.0 * cast(n as double)"
        " * cast((least(nr, nc) - 1) as double)))"
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_rows"),
        F.col("nr").cast("bigint").alias("n_flags"),
        F.col("nc").cast("bigint").alias("n_bands"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
        F.col("chi2_micro").cast("bigint").alias("chi2_micro"),
        F.col("min_e_milli").cast("bigint").alias("min_expected_milli"),
        F.expr(f"cast(floor({v} * 1000.0) as bigint)").alias("cramers_v_milli"),
    )


CHI2_SQL = """
WITH li AS (
  SELECT l_returnflag AS rf, 1 + (CAST(l_quantity AS BIGINT) - 1) // 17 AS band
  FROM lineitem
),
cells AS (SELECT rf, band, count(*)::BIGINT AS o FROM li GROUP BY rf, band),
rm AS (SELECT rf, CAST(sum(o) AS BIGINT) AS r FROM cells GROUP BY rf),
cm AS (SELECT band, CAST(sum(o) AS BIGINT) AS c FROM cells GROUP BY band),
tot AS (
  SELECT CAST(sum(o) AS BIGINT) AS n, count(DISTINCT rf)::BIGINT AS nr,
         count(DISTINCT band)::BIGINT AS nc
  FROM cells
),
scored AS (
  SELECT n, nr, nc,
         CAST((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
              * (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
              * 1000000 // (CAST(r AS HUGEINT) * c * n) AS BIGINT) AS cell_micro,
         r * c * 1000 // n AS e_milli
  FROM cells JOIN rm USING (rf) JOIN cm USING (band) CROSS JOIN tot
),
agg AS (
  SELECT n, nr, nc, CAST(sum(cell_micro) AS BIGINT) AS chi2_micro,
         CAST(min(e_milli) AS BIGINT) AS min_e_milli
  FROM scored GROUP BY n, nr, nc
)
SELECT n AS n_rows, nr AS n_flags, nc AS n_bands,
       CAST((nr - 1) * (nc - 1) AS BIGINT) AS dof,
       chi2_micro, min_e_milli AS min_expected_milli,
       CAST(floor(sqrt(CAST(chi2_micro AS DOUBLE) / (1000000.0 * CAST(n AS DOUBLE)
            * CAST((least(nr, nc) - 1) AS DOUBLE))) * 1000.0) AS BIGINT) AS cramers_v_milli
FROM agg
"""

QUERIES["lineitem_chi2_independence"] = lineitem_chi2_independence
ORACLES["lineitem_chi2_independence"] = CHI2_SQL


# --- Wald-Wolfowitz runs test on hourly event load ------------------------------
#
# Is the hourly load sequence random around its median, or does it
# trend/cluster?  Classic runs test: hours above vs below the (lower)
# median, ties-at-median dropped per standard practice, runs counted
# with one lag over the BOUNDED hourly grid.  The z-score runs through
# the identical-double device.  Median selection is deterministic:
# the value at row (nh+1) div 2 ordered by (cnt, hour).

def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        F.date_trunc("hour", "ts").alias("h")
    )
    hourly = ev.groupBy("h").agg(F.count(F.lit(1)).alias("cnt"))
    ranked = hourly.withColumn(
        "rn", F.row_number().over(Window.orderBy("cnt", "h"))
    ).crossJoin(F.broadcast(hourly.agg(F.count(F.lit(1)).alias("nh"))))
    med = ranked.where(F.expr("rn = (nh + 1) div 2")).select(
        F.col("cnt").alias("med"), "nh"
    )
    signed = (
        hourly.crossJoin(F.broadcast(med))
        .where(F.col("cnt") != F.col("med"))
        .select("h", "nh", (F.col("cnt") > F.col("med")).cast("int").alias("s"))
    )
    lagged = signed.select(
        "nh",
        "s",
        F.lag("s").over(Window.orderBy("h")).alias("prev"),
    )
    agg = lagged.groupBy("nh").agg(
        F.count(F.lit(1)).alias("n_used"),
        F.sum("s").alias("n1"),
        F.sum(F.expr("case when prev is null or s <> prev then 1 else 0 end")).alias(
            "runs"
        ),
    )
    mu = "(1.0 + 2.0 * n_above * n_below / n_used)"
    var = (
        "(2.0 * n_above * n_below * (2.0 * n_above * n_below - n_used)"
        " / (cast(n_used as double) * n_used * (n_used - 1)))"
    )
    return agg.select(
        F.col("nh").cast("bigint").alias("n_hours"),
        F.col("n_used").cast("bigint").alias("n_used"),
        F.col("n1").cast("bigint").alias("n_above"),
        (F.col("n_used") - F.col("n1")).cast("bigint").alias("n_below"),
        F.col("runs").cast("bigint").alias("n_runs"),
    ).select(
        "n_hours",
        "n_used",
        "n_above",
        "n_below",
        "n_runs",
        F.expr(f"cast(floor({mu} * 1000.0) as bigint)").alias("mu_runs_milli"),
        F.expr(
            f"case when n_above > 0 and n_below > 0 and n_used > 1 and {var} > 0 then"
            f" cast(floor((n_runs - {mu}) / sqrt({var}) * 1000.0) as bigint)"
            " else cast(null as bigint) end"
        ).alias("z_milli"),
    )


RUNS_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, count(*)::BIGINT AS cnt
  FROM (SELECT date_trunc('microseconds', ts) AS ts FROM events)
  GROUP BY 1
),
nh1 AS (SELECT count(*)::BIGINT AS nh FROM hourly),
med AS (
  SELECT cnt AS med, nh
  FROM (SELECT cnt, row_number() OVER (ORDER BY cnt, h) AS rn FROM hourly)
  CROSS JOIN nh1 WHERE rn = (nh + 1) // 2
),
signed AS (
  SELECT h, nh, CAST(cnt > med AS INT) AS s
  FROM hourly CROSS JOIN med WHERE cnt <> med
),
lagged AS (SELECT nh, s, lag(s) OVER (ORDER BY h) AS prev FROM signed),
agg AS (
  SELECT nh, count(*)::BIGINT AS n_used, CAST(sum(s) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN prev IS NULL OR s <> prev THEN 1 ELSE 0 END) AS BIGINT) AS runs
  FROM lagged GROUP BY nh
),
named AS (
  SELECT nh AS n_hours, n_used, n1 AS n_above, n_used - n1 AS n_below, runs AS n_runs
  FROM agg
)
SELECT n_hours, n_used, n_above, n_below, n_runs,
       CAST(floor((1.0 + 2.0 * n_above * n_below / n_used) * 1000.0) AS BIGINT) AS mu_runs_milli,
       CASE WHEN n_above > 0 AND n_below > 0 AND n_used > 1
                 AND (2.0 * n_above * n_below * (2.0 * n_above * n_below - n_used)
                      / (CAST(n_used AS DOUBLE) * n_used * (n_used - 1))) > 0 THEN
         CAST(floor((n_runs - (1.0 + 2.0 * n_above * n_below / n_used))
              / sqrt(2.0 * n_above * n_below * (2.0 * n_above * n_below - n_used)
                     / (CAST(n_used AS DOUBLE) * n_used * (n_used - 1))) * 1000.0) AS BIGINT)
       ELSE CAST(NULL AS BIGINT) END AS z_milli
FROM named
"""

QUERIES["events_runs_test"] = events_runs_test
ORACLES["events_runs_test"] = RUNS_SQL


# --- Theil-Sen robust trend of monthly revenue ----------------------------------
#
# The robust complement to per_source_linefit's OLS: the median of all
# pairwise monthly-revenue slopes is immune to the outlier months OLS
# chases.  Months are BOUNDED (~80 across any SF), so the pairwise set
# (~3k rows) is a broadcast self-join of a tiny aggregate, never a
# fact-fact join.  Slopes in milli-cents/month via truncating div
# (both engines truncate toward zero — verified house device); medians
# are lower medians at deterministic row positions.

def lineitem_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        ((F.year("l_shipdate") - 1990) * 12 + F.month("l_shipdate")).alias("m"),
        F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").alias("cents"),
    )
    monthly = li.groupBy("m").agg(F.sum("cents").alias("rev"))
    a = monthly.select(F.col("m").alias("m1"), F.col("rev").alias("rev1"))
    b = monthly.select(F.col("m").alias("m2"), F.col("rev").alias("rev2"))
    pairs = a.join(F.broadcast(b), F.col("m1") < F.col("m2")).select(
        F.expr("(rev2 - rev1) * 1000 div (m2 - m1)").alias("slope"), "m1", "m2"
    )
    np_ = pairs.agg(F.count(F.lit(1)).alias("np"))
    slope_med = (
        pairs.withColumn(
            "rn", F.row_number().over(Window.orderBy("slope", "m1", "m2"))
        )
        .crossJoin(F.broadcast(np_))
        .where(F.expr("rn = (np + 1) div 2"))
        .select(F.col("slope").alias("slope_milli"), "np")
    )
    resid = monthly.crossJoin(F.broadcast(slope_med)).select(
        "np",
        "slope_milli",
        (F.col("rev") * 1000 - F.col("slope_milli") * F.col("m")).alias("res"),
        "m",
    )
    nm = monthly.agg(F.count(F.lit(1)).alias("nm"))
    out = (
        resid.withColumn("rn", F.row_number().over(Window.orderBy("res", "m")))
        .crossJoin(F.broadcast(nm))
        .where(F.expr("rn = (nm + 1) div 2"))
        .select(
            F.col("nm").cast("bigint").alias("n_months"),
            F.col("np").cast("bigint").alias("n_pairs"),
            F.col("slope_milli").cast("bigint").alias("slope_milli_c"),
            F.col("res").cast("bigint").alias("intercept_milli_c"),
        )
    )
    return out


THEIL_SEN_SQL = """
WITH li AS (
  SELECT (year(l_shipdate) - 1990) * 12 + month(l_shipdate) AS m,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS cents
  FROM lineitem
),
monthly AS (SELECT m, CAST(sum(cents) AS BIGINT) AS rev FROM li GROUP BY m),
pairs AS (
  SELECT (b.rev - a.rev) * 1000 // (b.m - a.m) AS slope, a.m AS m1, b.m AS m2
  FROM monthly a JOIN monthly b ON a.m < b.m
),
np1 AS (SELECT count(*)::BIGINT AS np FROM pairs),
slope_med AS (
  SELECT slope AS slope_milli, np
  FROM (SELECT slope, m1, m2, row_number() OVER (ORDER BY slope, m1, m2) AS rn FROM pairs)
  CROSS JOIN np1 WHERE rn = (np + 1) // 2
),
resid AS (
  SELECT np, slope_milli, rev * 1000 - slope_milli * m AS res, m
  FROM monthly CROSS JOIN slope_med
),
nm1 AS (SELECT count(*)::BIGINT AS nm FROM monthly)
SELECT nm AS n_months, np AS n_pairs,
       CAST(slope_milli AS BIGINT) AS slope_milli_c,
       CAST(res AS BIGINT) AS intercept_milli_c
FROM (SELECT np, slope_milli, res, row_number() OVER (ORDER BY res, m) AS rn FROM resid)
CROSS JOIN nm1 WHERE rn = (nm + 1) // 2
"""

QUERIES["lineitem_theil_sen_trend"] = lineitem_theil_sen_trend
ORACLES["lineitem_theil_sen_trend"] = THEIL_SEN_SQL


# --- two-sample Kolmogorov-Smirnov test -------------------------------------------
#
# Do purchase events draw their values from the same distribution as
# click events?  The classical two-sample KS test (Kolmogorov 1933 /
# Smirnov 1939), computed EXACTLY: over the merged cent-quantized
# support, D = max |F1 - F2| is the max over support points of
# |c1cum*n2 - c2cum*n1| / (n1*n2) — pure integers until the final bp
# div; the asymptotic z = D*sqrt(n1*n2/(n1+n2)) ships through the
# identical-double device.  No sorting of fact rows: the ECDFs
# cumulate over the bounded VALUE SUPPORT (cent grid), not the corpus.
#
# Scale: one scan -> per-(side, cent) counts; the cumulative window
# runs over the value support (bounded by the metric's domain); 1-row
# output.

KS_A, KS_B = "purchase", "click"


def events_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin(KS_A, KS_B)
    ).select(
        (F.col("event_type") == KS_A).cast("int").alias("side"),
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("v"),
    )
    counts = ev.groupBy("v").agg(
        F.sum(F.expr("case when side = 1 then 1 else 0 end")).alias("c1"),
        F.sum(F.expr("case when side = 0 then 1 else 0 end")).alias("c2"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = counts.select(
        "v",
        F.sum("c1").over(w).alias("f1"),
        F.sum("c2").over(w).alias("f2"),
    )
    tot = counts.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    gaps = cum.crossJoin(F.broadcast(tot)).select(
        "n1",
        "n2",
        F.expr("abs(f1 * n2 - f2 * n1)").alias("g"),
    )
    agg = gaps.groupBy("n1", "n2").agg(F.max("g").alias("gmax"))
    z = (
        "(cast(gmax as double) / (cast(n1 as double) * cast(n2 as double)))"
        " * sqrt(cast(n1 as double) * cast(n2 as double) / (cast(n1 as double) + cast(n2 as double)))"
    )
    return agg.select(
        F.col("n1").cast("bigint").alias("n_a"),
        F.col("n2").cast("bigint").alias("n_b"),
        F.expr("gmax * 10000 div (n1 * n2)").cast("bigint").alias("d_bp"),
        F.expr(f"cast(floor({z} * 1000.0) as bigint)").alias("ks_z_milli"),
    )


KS_SQL = f"""
WITH ev AS (
  SELECT CAST(event_type = '{KS_A}' AS INT) AS side,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
  FROM events WHERE event_type IN ('{KS_A}', '{KS_B}')
),
counts AS (
  SELECT v,
         CAST(sum(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c1,
         CAST(sum(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS c2
  FROM ev GROUP BY v
),
cum AS (
  SELECT v,
         CAST(sum(c1) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f1,
         CAST(sum(c2) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS f2
  FROM counts
),
tot AS (SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2 FROM counts),
agg AS (
  SELECT n1, n2, CAST(max(abs(f1 * n2 - f2 * n1)) AS BIGINT) AS gmax
  FROM cum CROSS JOIN tot GROUP BY n1, n2
)
SELECT n1 AS n_a, n2 AS n_b,
       CAST(gmax * 10000 // (n1 * n2) AS BIGINT) AS d_bp,
       CAST(floor((CAST(gmax AS DOUBLE) / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
            * sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))) * 1000.0) AS BIGINT) AS ks_z_milli
FROM agg
"""

QUERIES["events_ks_test"] = events_ks_test
ORACLES["events_ks_test"] = KS_SQL


# --- difference-in-differences revenue estimator ---------------------------------
#
# The causal-inference workhorse (Card & Krueger 1994 popularized it):
# a planted "policy" hits even-numbered nations from the corpus
# midpoint month onward; the DiD estimate is (treated_post -
# treated_pre) - (control_post - control_pre) on per-month-average
# revenue — all exact integer cents with month normalization by
# truncating div — plus a placebo estimate computed one year earlier
# (should be ~0; an honest parallel-trends probe).
#
# Scale: one fact scan with two dimension broadcasts -> a 2x2 (x2
# placebo) cell aggregate; all arithmetic on the bounded cell grid.

DID_POLICY_M = 40  # months since 1995-01 (corpus midpoint)


def nation_revenue_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate") - 1).alias("m"),
        F.expr("cast(floor(o_totalprice * 100 + 0.5) as bigint)").alias("cents"),
    )
    base = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    ).select(
        (F.col("c_nationkey") % 2 == 0).cast("int").alias("treated"),
        "m",
        "cents",
    )

    def did_at(policy_m: int, label: str):
        cells = (
            base.select(
                "treated",
                (F.col("m") >= policy_m).cast("int").alias("post"),
                "cents",
                "m",
            )
            .groupBy("treated", "post")
            .agg(
                F.sum("cents").alias("rev"),
                F.count_distinct("m").alias("nm"),
            )
            .select(
                "treated", "post", F.expr("rev div nm").alias("avg_m")
            )
        )
        # pivot the 2x2 to one row
        return cells.groupBy().agg(
            F.lit(label).alias("estimate"),
            F.sum(F.expr("case when treated = 1 and post = 1 then avg_m else 0 end")).alias("tp"),
            F.sum(F.expr("case when treated = 1 and post = 0 then avg_m else 0 end")).alias("tq"),
            F.sum(F.expr("case when treated = 0 and post = 1 then avg_m else 0 end")).alias("cp"),
            F.sum(F.expr("case when treated = 0 and post = 0 then avg_m else 0 end")).alias("cq"),
        )

    out = did_at(DID_POLICY_M, "policy").unionAll(
        did_at(DID_POLICY_M - 12, "placebo_minus_1y")
    )
    return out.select(
        "estimate",
        F.col("tp").cast("bigint").alias("treated_post_c"),
        F.col("tq").cast("bigint").alias("treated_pre_c"),
        F.col("cp").cast("bigint").alias("control_post_c"),
        F.col("cq").cast("bigint").alias("control_pre_c"),
        F.expr("(tp - tq) - (cp - cq)").cast("bigint").alias("did_c"),
        F.expr(
            "case when cq <> 0 then ((tp - tq) - (cp - cq)) * 10000 div cq"
            " else cast(null as bigint) end"
        ).alias("did_vs_control_pre_bp"),
    )


def _did_cells_sql(policy_m: int, label: str) -> str:
    return f"""
  SELECT '{label}' AS estimate,
         CAST(sum(CASE WHEN treated = 1 AND post = 1 THEN avg_m ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN treated = 1 AND post = 0 THEN avg_m ELSE 0 END) AS BIGINT) AS tq,
         CAST(sum(CASE WHEN treated = 0 AND post = 1 THEN avg_m ELSE 0 END) AS BIGINT) AS cp,
         CAST(sum(CASE WHEN treated = 0 AND post = 0 THEN avg_m ELSE 0 END) AS BIGINT) AS cq
  FROM (
    SELECT treated, post, CAST(sum(cents) AS BIGINT) // count(DISTINCT m) AS avg_m
    FROM (SELECT treated, CAST(m >= {policy_m} AS INT) AS post, cents, m FROM base)
    GROUP BY treated, post
  )"""


DID_SQL = f"""
WITH base AS (
  SELECT CAST(c_nationkey % 2 = 0 AS INT) AS treated,
         (year(o_orderdate) - 1995) * 12 + month(o_orderdate) - 1 AS m,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders JOIN customer ON o_custkey = c_custkey
),
twoest AS (
  {_did_cells_sql(DID_POLICY_M, "policy")}
  UNION ALL
  {_did_cells_sql(DID_POLICY_M - 12, "placebo_minus_1y")}
)
SELECT estimate, tp AS treated_post_c, tq AS treated_pre_c,
       cp AS control_post_c, cq AS control_pre_c,
       CAST((tp - tq) - (cp - cq) AS BIGINT) AS did_c,
       CASE WHEN cq <> 0 THEN CAST(((tp - tq) - (cp - cq)) * 10000 // cq AS BIGINT)
            ELSE CAST(NULL AS BIGINT) END AS did_vs_control_pre_bp
FROM twoest
"""

QUERIES["nation_revenue_did"] = nation_revenue_did
ORACLES["nation_revenue_did"] = DID_SQL


# --- Mann-Kendall trend test over daily event volume ----------------------------
#
# The hypothesis-test complement to lineitem_theil_sen_trend's slope
# estimate (Mann 1945; Kendall 1975): per event type, is daily volume
# monotonically trending?  S = Σ_{i<j} sign(x_j - x_i) over the BOUNDED
# daily grid, tie-corrected variance
# Var(S) = [n(n-1)(2n+5) - Σ_g t_g(t_g-1)(2t_g+5)] / 18, and the
# continuity-corrected z = (S ∓ 1)/sqrt(Var).  Everything up to the z
# is exact integer arithmetic; the one sqrt ratio runs through the
# house identical-IEEE-double device and floors into milli.
#
# Scale: the fact scan reduces to (event_type × day) counts first —
# the pairwise self-join is over that broadcast-sized aggregate (days
# grow with calendar time, not data volume), never over fact rows.

MK_Z_MILLI = 1960  # two-sided 5% critical value, floored milli


def events_mann_kendall(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("d")
    )
    daily = ev.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("cnt"))
    a = daily.select(
        F.col("event_type").alias("et"), F.col("d").alias("d1"), F.col("cnt").alias("c1")
    )
    b = daily.select(
        F.col("event_type").alias("et"), F.col("d").alias("d2"), F.col("cnt").alias("c2")
    )
    pairs = (
        a.join(F.broadcast(b), "et")
        .where(F.col("d1") < F.col("d2"))
        .groupBy("et")
        .agg(
            F.sum(F.expr("case when c2 > c1 then 1 when c2 < c1 then -1 else 0 end")).alias("s"),
            F.sum(F.expr("case when c2 > c1 then 1 else 0 end")).alias("n_pos"),
            F.sum(F.expr("case when c2 < c1 then 1 else 0 end")).alias("n_neg"),
        )
    )
    nd = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        daily.groupBy("event_type", "cnt")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(F.expr("t * (t - 1) * (2 * t + 5)")).alias("tie_term"),
            F.sum(F.expr("case when t > 1 then 1 else 0 end")).alias("n_tie_groups"),
        )
    )
    j = (
        nd.join(F.broadcast(ties), "event_type")
        .join(F.broadcast(pairs), nd.event_type == pairs.et)
        .drop("et")
    )
    var = "((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0)"
    z = (
        f"case when s > 0 then (s - 1) / sqrt({var})"
        f" when s < 0 then (s + 1) / sqrt({var})"
        " else 0.0 end"
    )
    return j.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("s").cast("bigint").alias("s_stat"),
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        F.col("n_tie_groups").cast("bigint").alias("n_tie_groups"),
        F.expr(f"cast(floor({var} * 1000.0) as bigint)").alias("var_milli"),
        F.expr(
            f"case when n > 1 and (n * (n - 1) * (2 * n + 5) - tie_term) > 0 then"
            f" cast(floor(({z}) * 1000.0) as bigint)"
            " else cast(null as bigint) end"
        ).alias("z_milli"),
        F.expr(
            f"case when n > 1 and (n * (n - 1) * (2 * n + 5) - tie_term) > 0 then"
            f" case when cast(floor(({z}) * 1000.0) as bigint) > {MK_Z_MILLI}"
            "   then 'increasing'"
            f"  when cast(floor(({z}) * 1000.0) as bigint) < -{MK_Z_MILLI}"
            "   then 'decreasing' else 'no_trend' end"
            " else 'undefined' end"
        ).alias("trend"),
    )


_MK_VAR = "((n * (n - 1) * (2 * n + 5) - tie_term) / 18.0)"
_MK_Z = (
    f"CASE WHEN s > 0 THEN (s - 1) / sqrt({_MK_VAR})"
    f" WHEN s < 0 THEN (s + 1) / sqrt({_MK_VAR})"
    " ELSE 0.0 END"
)

MANN_KENDALL_SQL = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
pairs AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1 WHEN b.cnt < a.cnt THEN -1 ELSE 0 END) AS BIGINT) AS s,
         CAST(sum(CASE WHEN b.cnt > a.cnt THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN b.cnt < a.cnt THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
  FROM daily a JOIN daily b ON a.event_type = b.event_type AND a.d < b.d
  GROUP BY 1
),
nd AS (SELECT event_type, count(*)::BIGINT AS n FROM daily GROUP BY 1),
ties AS (
  SELECT event_type,
         CAST(sum(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_term,
         CAST(sum(CASE WHEN t > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tie_groups
  FROM (SELECT event_type, cnt, count(*)::BIGINT AS t FROM daily GROUP BY 1, 2)
  GROUP BY 1
)
SELECT nd.event_type, n AS n_days, s AS s_stat, n_pos, n_neg, n_tie_groups,
       CAST(floor({_MK_VAR} * 1000.0) AS BIGINT) AS var_milli,
       CASE WHEN n > 1 AND (n * (n - 1) * (2 * n + 5) - tie_term) > 0 THEN
         CAST(floor(({_MK_Z}) * 1000.0) AS BIGINT)
       ELSE CAST(NULL AS BIGINT) END AS z_milli,
       CASE WHEN n > 1 AND (n * (n - 1) * (2 * n + 5) - tie_term) > 0 THEN
         CASE WHEN CAST(floor(({_MK_Z}) * 1000.0) AS BIGINT) > {MK_Z_MILLI}
                THEN 'increasing'
              WHEN CAST(floor(({_MK_Z}) * 1000.0) AS BIGINT) < -{MK_Z_MILLI}
                THEN 'decreasing' ELSE 'no_trend' END
       ELSE 'undefined' END AS trend
FROM nd JOIN ties USING (event_type) JOIN pairs ON pairs.event_type = nd.event_type
"""

QUERIES["events_mann_kendall"] = events_mann_kendall
ORACLES["events_mann_kendall"] = MANN_KENDALL_SQL


# --- lead-lag (Granger-style) predictive screen ---------------------------------
#
# events_type_comovement answers "do two series move together?"; this
# answers the DIRECTED question a monitoring pipeline actually asks —
# does yesterday's x help predict today's y BEYOND yesterday's y?
# (Granger 1969, the bivariate one-lag screen.)  For each ordered type
# pair, OLS of y_t on {y_{t-1}, x_{t-1}} vs the restricted {y_{t-1}}
# over the bounded daily grid, improvement = (SSE_r - SSE_f)/SSE_r.
#
# Devices: observations are mean-centered EXACTLY by n-scaling
# (d = n·v - S, all integers), every moment sum is an exact BIGINT, and
# the final normal-equation solve + SSE ratio runs in doubles derived
# from those identical integers with an identical op tree (the
# identical-double device) — then floors into bp.  2x2 Cramer solve,
# no matrix library.
#
# Plan: one (type, day) aggregation; the pair frame is a three-way
# self-join of that bounded grid (days x 20 pairs), then two bounded
# aggs (sums, then centered products).  Nothing fact-sized shuffles
# twice.

GRANGER_BAR_BP = 500  # improvement > 5% => x lead-predicts y


def events_leadlag_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.date_trunc("day", "ts").alias("d")
    )
    daily = ev.groupBy("event_type", "d").agg(F.count(F.lit(1)).alias("cnt"))
    y = daily.select(F.col("event_type").alias("yt"), F.col("d").alias("dy"), F.col("cnt").alias("cy"))
    yl = daily.select(F.col("event_type").alias("ylt"), F.col("d").alias("dyl"), F.col("cnt").alias("cyl"))
    xl = daily.select(F.col("event_type").alias("xt"), F.col("d").alias("dxl"), F.col("cnt").alias("cxl"))
    obs = (
        y.join(F.broadcast(yl), (F.col("yt") == F.col("ylt")) & (F.expr("dy = dyl + interval 1 day")))
        .join(
            F.broadcast(xl),
            (F.expr("dy = dxl + interval 1 day")) & (F.col("xt") != F.col("yt")),
        )
        .select("yt", "xt", "cy", "cyl", "cxl")
    )
    sums = obs.groupBy("yt", "xt").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cy").alias("sy"),
        F.sum("cyl").alias("syl"),
        F.sum("cxl").alias("sxl"),
    )
    centered = (
        obs.join(F.broadcast(sums), ["yt", "xt"])
        .select(
            "yt",
            "xt",
            "n",
            (F.col("n") * F.col("cy") - F.col("sy")).alias("a"),
            (F.col("n") * F.col("cyl") - F.col("syl")).alias("b"),
            (F.col("n") * F.col("cxl") - F.col("sxl")).alias("c"),
        )
        .groupBy("yt", "xt", "n")
        .agg(
            F.sum(F.expr("a * a")).alias("saa"),
            F.sum(F.expr("b * b")).alias("sbb"),
            F.sum(F.expr("c * c")).alias("scc"),
            F.sum(F.expr("a * b")).alias("sab"),
            F.sum(F.expr("a * c")).alias("sac"),
            F.sum(F.expr("b * c")).alias("sbc"),
        )
    )
    # identical-double assembly: det and every product as single double
    # ops over the exact integer sums
    det = "(cast(sbb as double) * cast(scc as double) - cast(sbc as double) * cast(sbc as double))"
    ssef = (
        f"(cast(saa as double) - "
        f"((cast(sab as double) * cast(scc as double) - cast(sac as double) * cast(sbc as double)) * cast(sab as double)"
        f" + (cast(sac as double) * cast(sbb as double) - cast(sab as double) * cast(sbc as double)) * cast(sac as double))"
        f" / {det})"
    )
    sser = "(cast(saa as double) - cast(sab as double) * cast(sab as double) / cast(sbb as double))"
    ok = f"n >= 3 and sbb > 0 and {det} > 0 and {sser} > 0"
    return centered.select(
        F.col("xt").alias("leader_type"),
        F.col("yt").alias("target_type"),
        F.col("n").cast("bigint").alias("n_obs"),
        F.expr(
            f"case when {ok} then cast(floor(({sser} - {ssef}) / {sser} * 10000) as bigint)"
            " else cast(null as bigint) end"
        ).alias("improvement_bp"),
        F.expr(
            f"case when {ok} then cast(floor(({sser} - {ssef}) / {sser} * 10000) as bigint)"
            f" > {GRANGER_BAR_BP} else null end"
        )
        .cast("int")
        .alias("leads"),
    )


_G_DET = "(CAST(sbb AS DOUBLE) * CAST(scc AS DOUBLE) - CAST(sbc AS DOUBLE) * CAST(sbc AS DOUBLE))"
_G_SSEF = (
    "(CAST(saa AS DOUBLE) - "
    "((CAST(sab AS DOUBLE) * CAST(scc AS DOUBLE) - CAST(sac AS DOUBLE) * CAST(sbc AS DOUBLE)) * CAST(sab AS DOUBLE)"
    " + (CAST(sac AS DOUBLE) * CAST(sbb AS DOUBLE) - CAST(sab AS DOUBLE) * CAST(sbc AS DOUBLE)) * CAST(sac AS DOUBLE))"
    f" / {_G_DET})"
)
_G_SSER = "(CAST(saa AS DOUBLE) - CAST(sab AS DOUBLE) * CAST(sab AS DOUBLE) / CAST(sbb AS DOUBLE))"
_G_OK = f"n >= 3 AND sbb > 0 AND {_G_DET} > 0 AND {_G_SSER} > 0"

GRANGER_SQL = f"""
WITH daily AS (
  SELECT event_type, date_trunc('day', ts) AS d, count(*)::BIGINT AS cnt
  FROM events GROUP BY 1, 2
),
obs AS (
  SELECT y.event_type AS yt, x.event_type AS xt,
         y.cnt AS cy, l.cnt AS cyl, x.cnt AS cxl
  FROM daily y
  JOIN daily l ON l.event_type = y.event_type AND y.d = l.d + INTERVAL 1 DAY
  JOIN daily x ON y.d = x.d + INTERVAL 1 DAY AND x.event_type <> y.event_type
),
sums AS (
  SELECT yt, xt, count(*)::BIGINT AS n,
         CAST(sum(cy) AS BIGINT) AS sy, CAST(sum(cyl) AS BIGINT) AS syl,
         CAST(sum(cxl) AS BIGINT) AS sxl
  FROM obs GROUP BY 1, 2
),
centered AS (
  SELECT o.yt, o.xt, s.n,
         CAST(sum((s.n * o.cy - s.sy) * (s.n * o.cy - s.sy)) AS BIGINT) AS saa,
         CAST(sum((s.n * o.cyl - s.syl) * (s.n * o.cyl - s.syl)) AS BIGINT) AS sbb,
         CAST(sum((s.n * o.cxl - s.sxl) * (s.n * o.cxl - s.sxl)) AS BIGINT) AS scc,
         CAST(sum((s.n * o.cy - s.sy) * (s.n * o.cyl - s.syl)) AS BIGINT) AS sab,
         CAST(sum((s.n * o.cy - s.sy) * (s.n * o.cxl - s.sxl)) AS BIGINT) AS sac,
         CAST(sum((s.n * o.cyl - s.syl) * (s.n * o.cxl - s.sxl)) AS BIGINT) AS sbc
  FROM obs o JOIN sums s ON o.yt = s.yt AND o.xt = s.xt
  GROUP BY o.yt, o.xt, s.n
)
SELECT xt AS leader_type, yt AS target_type, n AS n_obs,
       CASE WHEN {_G_OK} THEN
         CAST(floor(({_G_SSER} - {_G_SSEF}) / {_G_SSER} * 10000) AS BIGINT)
       ELSE CAST(NULL AS BIGINT) END AS improvement_bp,
       CAST(CASE WHEN {_G_OK} THEN
         CAST(floor(({_G_SSER} - {_G_SSEF}) / {_G_SSER} * 10000) AS BIGINT) > {GRANGER_BAR_BP}
       ELSE NULL END AS INT) AS leads
FROM centered
"""

QUERIES["events_leadlag_granger"] = events_leadlag_granger
ORACLES["events_leadlag_granger"] = GRANGER_SQL


# --- X-bar / R control chart ----------------------------------------------------
#
# The Shewhart SPC classic (public constants, ASTM/Montgomery tables)
# completing the drift family: CUSUM (events_cusum_alarm) catches slow
# drifts, Page-Hinkley (events_page_hinkley) catches mean shifts —
# the X-bar/R chart is what a process engineer actually pins on the
# wall: daily subgroups of hourly volumes (n=24), center lines from
# the grand mean and mean range, control limits X̄ ± A2·R̄ and
# [D3·R̄, D4·R̄].  For n=24: A2=0.157, D3=0.451, D4=1.548 (milli
# constants, public tables).  All sums exact integers; limits land in
# milli via integer multiplication and truncating div, so flag columns
# are bit-deterministic.
#
# Plan: one (type, day, hour) aggregation → per-(type, day) subgroup
# stats → one bounded per-type join of the grand lines back onto the
# subgroup table.  No windows over fact rows.

SPC_A2_MILLI = 157
SPC_D3_MILLI = 451
SPC_D4_MILLI = 1548


def events_spc_xbar(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        F.hour("ts").alias("hr"),
    )
    hourly = ev.groupBy("event_type", "day", "hr").agg(F.count(F.lit(1)).alias("x"))
    sub = hourly.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n_obs"),
        F.sum("x").alias("sx"),
        (F.max("x") - F.min("x")).alias("r"),
    ).select(
        "event_type",
        "day",
        "n_obs",
        F.expr("sx * 1000 div n_obs").alias("xbar_milli"),
        (F.col("r") * 1000).alias("r_milli"),
    )
    lines = sub.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_subgroups"),
        F.expr("sum(xbar_milli) div count(*)").alias("grand_milli"),
        F.expr("sum(r_milli) div count(*)").alias("rbar_milli"),
    )
    j = sub.join(F.broadcast(lines), "event_type")
    ucl = f"grand_milli + {SPC_A2_MILLI} * rbar_milli div 1000"
    lcl = f"grand_milli - {SPC_A2_MILLI} * rbar_milli div 1000"
    rucl = f"{SPC_D4_MILLI} * rbar_milli div 1000"
    rlcl = f"{SPC_D3_MILLI} * rbar_milli div 1000"
    out = j.select(
        "event_type",
        "day",
        F.col("n_obs").cast("bigint").alias("n_obs"),
        F.col("xbar_milli").cast("bigint").alias("xbar_milli"),
        F.col("r_milli").cast("bigint").alias("r_milli"),
        F.col("grand_milli").cast("bigint").alias("grand_milli"),
        F.col("rbar_milli").cast("bigint").alias("rbar_milli"),
        F.expr(
            f"cast(xbar_milli > {ucl} or xbar_milli < {lcl} as int)"
        ).alias("xbar_out"),
        F.expr(
            f"cast(r_milli > {rucl} or r_milli < {rlcl} as int)"
        ).alias("range_out"),
    )
    return out.where((F.col("xbar_out") == 1) | (F.col("range_out") == 1))


SPC_SQL = f"""
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
hourly AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         date_part('hour', ts) AS hr, count(*)::BIGINT AS x
  FROM events_us GROUP BY 1, 2, 3
),
sub AS (
  SELECT event_type, day, count(*)::BIGINT AS n_obs,
         CAST(CAST(sum(x) AS BIGINT) * 1000 // count(*) AS BIGINT) AS xbar_milli,
         CAST((max(x) - min(x)) * 1000 AS BIGINT) AS r_milli
  FROM hourly GROUP BY 1, 2
),
lines AS (
  SELECT event_type, count(*)::BIGINT AS n_subgroups,
         CAST(sum(xbar_milli) // count(*) AS BIGINT) AS grand_milli,
         CAST(sum(r_milli) // count(*) AS BIGINT) AS rbar_milli
  FROM sub GROUP BY event_type
)
SELECT event_type, day, n_obs, xbar_milli, r_milli, grand_milli, rbar_milli,
       CAST(xbar_milli > grand_milli + {SPC_A2_MILLI} * rbar_milli // 1000
            OR xbar_milli < grand_milli - {SPC_A2_MILLI} * rbar_milli // 1000 AS INT) AS xbar_out,
       CAST(r_milli > {SPC_D4_MILLI} * rbar_milli // 1000
            OR r_milli < {SPC_D3_MILLI} * rbar_milli // 1000 AS INT) AS range_out
FROM sub JOIN lines USING (event_type)
WHERE (xbar_milli > grand_milli + {SPC_A2_MILLI} * rbar_milli // 1000
       OR xbar_milli < grand_milli - {SPC_A2_MILLI} * rbar_milli // 1000)
   OR (r_milli > {SPC_D4_MILLI} * rbar_milli // 1000
       OR r_milli < {SPC_D3_MILLI} * rbar_milli // 1000)
"""

QUERIES["events_spc_xbar"] = events_spc_xbar
ORACLES["events_spc_xbar"] = SPC_SQL


# --- weight-of-evidence feature binning -----------------------------------------
#
# The credit-scoring / feature-engineering primitive (Siddiqi 2006
# "Credit Risk Scorecards"; standard in every scorecard pipeline):
# bin a candidate feature, then per bin report the Weight of Evidence
# WoE = ln(good_share / bad_share) and the Information Value
# contribution IV_i = (good_share - bad_share) * WoE_i — the number
# that decides whether the feature enters the model at all.  Feature:
# integer-cent l_extendedprice coded 0..1023 (1-row min/max broadcast,
# the zorder device) into 8 equi-width bins; label: l_returnflag='R'
# (the returned line is the "bad").  Laplace +1 smoothing keeps empty
# cells off ln's asymptote.  WoE's ln runs on an identical
# integer-derived double in both engines and floor-quantizes to 1e-4
# (zipf device); shares are exact integer micros; the IV term is the
# exact integer product share_diff_micro x woe_e4 (1e-10 units).
#
# Scale: ONE narrow fact aggregation to the 8-bin grid (map-side
# combine); everything after is 8-row arithmetic with the totals
# broadcast back as a 1-row cross join.

WOE_NCODE = 1024
WOE_BINW = 128
WOE_BINS = WOE_NCODE // WOE_BINW


def feature_binning_woe(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").alias("v"),
        (F.col("l_returnflag") == "R").cast("bigint").alias("bad"),
    )
    rng = li.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    grid = (
        li.crossJoin(F.broadcast(rng))
        .select(
            F.expr(f"(v - vmin) * {WOE_NCODE} div (vmax - vmin + 1) div {WOE_BINW}").alias(
                "bin"
            ),
            "bad",
        )
        .groupBy("bin")
        .agg(
            F.sum(F.lit(1) - F.col("bad")).cast("bigint").alias("n_good"),
            F.sum("bad").cast("bigint").alias("n_bad"),
        )
    )
    totals = grid.agg(
        F.sum("n_good").cast("bigint").alias("tg"), F.sum("n_bad").cast("bigint").alias("tb")
    )
    nb = WOE_BINS
    return (
        grid.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n_good",
            "n_bad",
            F.expr(f"(n_good + 1) * 1000000 div (tg + {nb})").alias("good_share_micro"),
            F.expr(f"(n_bad + 1) * 1000000 div (tb + {nb})").alias("bad_share_micro"),
            F.expr(
                f"cast(floor(ln(((n_good + 1) * (tb + {nb})) /"
                f" cast((n_bad + 1) * (tg + {nb}) as double)) * 10000) as bigint)"
            ).alias("woe_e4"),
        )
        .select(
            "*",
            (
                (F.col("good_share_micro") - F.col("bad_share_micro")) * F.col("woe_e4")
            ).cast("bigint").alias("iv_contrib_e10"),
        )
    )


WOE_SQL = f"""
WITH li AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
         CAST(l_returnflag = 'R' AS BIGINT) AS bad
  FROM lineitem
), rng AS (SELECT min(v) AS vmin, max(v) AS vmax FROM li),
grid AS (
  SELECT (v - vmin) * {WOE_NCODE} // (vmax - vmin + 1) // {WOE_BINW} AS bin,
         CAST(sum(1 - bad) AS BIGINT) AS n_good,
         CAST(sum(bad) AS BIGINT) AS n_bad
  FROM li, rng GROUP BY 1
),
totals AS (SELECT CAST(sum(n_good) AS BIGINT) AS tg, CAST(sum(n_bad) AS BIGINT) AS tb FROM grid)
SELECT bin, n_good, n_bad,
       (n_good + 1) * 1000000 // (tg + {WOE_BINS}) AS good_share_micro,
       (n_bad + 1) * 1000000 // (tb + {WOE_BINS}) AS bad_share_micro,
       CAST(floor(ln(((n_good + 1) * (tb + {WOE_BINS})) /
            CAST((n_bad + 1) * (tg + {WOE_BINS}) AS DOUBLE)) * 10000) AS BIGINT) AS woe_e4,
       CAST(((n_good + 1) * 1000000 // (tg + {WOE_BINS})
           - (n_bad + 1) * 1000000 // (tb + {WOE_BINS}))
           * CAST(floor(ln(((n_good + 1) * (tb + {WOE_BINS})) /
                  CAST((n_bad + 1) * (tg + {WOE_BINS}) AS DOUBLE)) * 10000) AS BIGINT)
         AS BIGINT) AS iv_contrib_e10
FROM grid, totals
"""

QUERIES["feature_binning_woe"] = feature_binning_woe
ORACLES["feature_binning_woe"] = WOE_SQL


# --- isotonic calibration (PAV via the minimax formula) ------------------------
#
# The monotone calibration curve (Barlow/Bartholomew/Bremner/Brunk
# 1972; Zadrozny & Elkan 2002 for classifier calibration): fit the
# best monotone non-decreasing approximation of P(convert | score) —
# the calibrator a ranking/reward pipeline trains on top of raw model
# scores, the constructive artifact next to the DIAGNOSTIC
# reward_margin_ece bins. Scores are the engine-deterministic md5
# device (the events_uplift_qini hash % ISO_LEVELS), labels are
# "user made >= 1 purchase".
#
# Exactness device: instead of the sequential pool-adjacent-violators
# stack (a data-dependent while-loop neither engine's expression layer
# has), the fit uses the closed-form MINIMAX characterization
# iso(i) = max_{j<=i} min_{k>=i} mean(y over levels j..k) — exactly
# the PAV solution. The score support is BOUNDED (ISO_LEVELS), so the
# whole computation is one triple range-join over <= L^3/6 rows of a
# 128-row broadcast table: means from integer prefix sums as ONE
# IEEE-double division each (identical in both engines), min/max over
# identical doubles (exact), floored into bp at the very end.
#
# Scale: the fact scan reduces to the L-row level grid first (one
# keyed agg over users); everything after runs on broadcast-sized
# relations — no fact-fact joins, no windows over fact rows. L fixes
# the post-agg cost regardless of corpus size.

ISO_LEVELS = 128


def events_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import md5_int32

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("y")
    )
    scored = users.select(
        F.pmod(md5_int32(F.col("user_id").cast("string")), ISO_LEVELS).alias("score"),
        "y",
    )
    levels = scored.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    )
    # bounded value-support window (<= ISO_LEVELS rows): prefix sums +
    # dense index — the house exception class, never entity-grain
    w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, 0)
    lv = levels.select(
        "score",
        "n",
        "sy",
        F.row_number().over(Window.orderBy("score")).alias("idx"),
        F.sum("n").over(w).alias("W"),
        F.sum("sy").over(w).alias("S"),
    ).localCheckpoint(eager=False)  # three self-join references below

    j = lv.select(
        F.col("idx").alias("j"),
        (F.col("W") - F.col("n")).alias("w_before"),
        (F.col("S") - F.col("sy")).alias("s_before"),
    )
    k = lv.select(F.col("idx").alias("k"), F.col("W").alias("w_k"), F.col("S").alias("s_k"))
    pairs = j.join(k, F.col("j") <= F.col("k")).select(
        "j",
        "k",
        (
            (F.col("s_k") - F.col("s_before")).cast("double")
            / (F.col("w_k") - F.col("w_before")).cast("double")
        ).alias("avg"),
    )
    i = lv.select(F.col("idx").alias("i"))
    inner = (
        i.join(pairs, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i")))
        .groupBy("i", "j")
        .agg(F.min("avg").alias("min_avg"))
        .groupBy("i")
        .agg(F.max("min_avg").alias("iso"))
    )
    return (
        lv.join(inner, lv.idx == inner.i)
        .select(
            "score",
            F.col("n").cast("bigint").alias("n_users"),
            F.expr("sy * 10000 div n").cast("bigint").alias("conv_bp"),
            F.expr("cast(floor(iso * 10000 + 0.5d) as bigint)").alias("iso_fit_bp"),
        )
    )


ISO_CALIBRATION_SQL = f"""
WITH users AS (
  SELECT user_id, max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
),
scored AS (
  SELECT CAST('0x' || substr(md5(user_id::VARCHAR), 1, 8) AS BIGINT) % {ISO_LEVELS} AS score, y
  FROM users
),
levels AS (SELECT score, count(*) AS n, sum(y) AS sy FROM scored GROUP BY score),
lv AS (
  SELECT score, n, sy,
         row_number() OVER (ORDER BY score) AS idx,
         sum(n) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS W,
         sum(sy) OVER (ORDER BY score ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS S
  FROM levels
),
pairs AS (
  SELECT j.idx AS j, k.idx AS k,
         CAST(k.S - (j.S - j.sy) AS DOUBLE) / CAST(k.W - (j.W - j.n) AS DOUBLE) AS avg
  FROM lv j JOIN lv k ON j.idx <= k.idx
),
inner_min AS (
  SELECT i.idx AS i, p.j, min(p.avg) AS min_avg
  FROM lv i JOIN pairs p ON p.j <= i.idx AND p.k >= i.idx
  GROUP BY i.idx, p.j
),
iso AS (SELECT i, max(min_avg) AS iso FROM inner_min GROUP BY i)
SELECT lv.score,
       CAST(lv.n AS BIGINT) AS n_users,
       CAST(lv.sy * 10000 // lv.n AS BIGINT) AS conv_bp,
       CAST(floor(iso.iso * 10000 + 0.5) AS BIGINT) AS iso_fit_bp
FROM lv JOIN iso ON iso.i = lv.idx
"""

QUERIES["events_isotonic_calibration"] = events_isotonic_calibration
ORACLES["events_isotonic_calibration"] = ISO_CALIBRATION_SQL


# --- bootstrap confidence interval (deterministic resampling) -----------------
#
# The nonparametric CI (Efron 1979) a metrics pipeline quotes when the
# daily-total distribution is nothing like normal: resample the days
# WITH replacement B times, recompute the mean each time, read the
# percentile band off the resample distribution. The house determinism
# device makes it oracle-reproducible: resample b's i-th draw is day
# index md5("{type}:{b}:{i}") % n — both engines derive the identical
# resample matrix, every statistic is integer (cent-scaled daily
# totals, div means, order-statistic band: lo/hi = the 5th/195th
# smallest of B=200 means, ties broken by resample id).
#
# Scale: the grid is (types × B × days) — resamples over the DAILY
# aggregate, never the event grain, so it is bounded by the calendar
# (~5 × 200 × 90 ≈ 90k rows at any corpus size); the per-type day
# window is the documented bounded-grid class.

BOOT_B = 200
BOOT_LO_RANK, BOOT_HI_RANK = 5, 195  # ceil(0.025 * B), ceil(0.975 * B)


def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "events")
        .groupBy(
            "event_type", F.date_trunc("day", "ts").cast("date").alias("day")
        )
        .agg(
            F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)")).alias("v")
        )
    )
    wd = Window.partitionBy("event_type").orderBy("day")
    idxd = daily.withColumn("i", F.row_number().over(wd) - 1).select(
        "event_type", F.col("i").alias("idx"), "v"
    ).localCheckpoint(eager=False)  # joined by every resample draw
    nper = idxd.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv")
    )
    draws = (
        nper.select("event_type", "n")
        .withColumn("b", F.explode(F.expr(f"sequence(0, {BOOT_B - 1})")))
        .withColumn("i", F.explode(F.expr("sequence(0, n - 1)")))
        .withColumn(
            "idx",
            F.expr(
                "cast(conv(substring(md5(concat(event_type, ':', cast(b as string),"
                " ':', cast(i as string))), 1, 8), 16, 10) as bigint) % n"
            ),
        )
    )
    means = (
        draws.join(idxd, ["event_type", "idx"])
        .groupBy("event_type", "b")
        .agg(F.expr("sum(v) div count(*)").alias("m"))
    )
    wb = Window.partitionBy("event_type").orderBy("m", "b")
    band = (
        means.withColumn("rn", F.row_number().over(wb))
        .groupBy("event_type")
        .agg(
            F.max(F.when(F.col("rn") == BOOT_LO_RANK, F.col("m"))).alias("boot_lo"),
            F.max(F.when(F.col("rn") == BOOT_HI_RANK, F.col("m"))).alias("boot_hi"),
        )
    )
    return (
        nper.join(band, "event_type")
        .select(
            "event_type",
            F.col("n").cast("bigint").alias("n_days"),
            F.expr("sv div n").cast("bigint").alias("observed_mean"),
            F.col("boot_lo").cast("bigint").alias("boot_lo"),
            F.col("boot_hi").cast("bigint").alias("boot_hi"),
            F.lit(BOOT_B).cast("bigint").alias("n_resamples"),
        )
    )


BOOTSTRAP_CI_SQL = f"""
WITH ev AS (SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events),
daily AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(sum(CAST(floor(value * 100 + (0.5)::DOUBLE) AS BIGINT)) AS BIGINT) AS v
  FROM ev GROUP BY 1, 2
),
idxd AS (
  SELECT event_type, row_number() OVER (PARTITION BY event_type ORDER BY day) - 1 AS idx, v
  FROM daily
),
nper AS (
  SELECT event_type, count(*)::BIGINT AS n, CAST(sum(v) AS BIGINT) AS sv
  FROM idxd GROUP BY 1
),
draws AS (
  SELECT np.event_type, np.n, bb.b, ii.i,
         CAST('0x' || substr(md5(np.event_type || ':' || bb.b || ':' || ii.i), 1, 8) AS BIGINT) % np.n AS idx
  FROM nper np,
       (SELECT unnest(range({BOOT_B})) AS b) bb,
       LATERAL (SELECT unnest(range(np.n)) AS i) ii
),
means AS (
  SELECT d.event_type, d.b, CAST(sum(x.v) // count(*) AS BIGINT) AS m
  FROM draws d JOIN idxd x ON x.event_type = d.event_type AND x.idx = d.idx
  GROUP BY 1, 2
),
band AS (
  SELECT event_type,
         max(CASE WHEN rn = {BOOT_LO_RANK} THEN m END) AS boot_lo,
         max(CASE WHEN rn = {BOOT_HI_RANK} THEN m END) AS boot_hi
  FROM (
    SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY m, b) AS rn
    FROM means
  ) GROUP BY 1
)
SELECT np.event_type, np.n AS n_days, CAST(np.sv // np.n AS BIGINT) AS observed_mean,
       CAST(b.boot_lo AS BIGINT) AS boot_lo, CAST(b.boot_hi AS BIGINT) AS boot_hi,
       CAST({BOOT_B} AS BIGINT) AS n_resamples
FROM nper np JOIN band b ON b.event_type = np.event_type
"""

QUERIES["events_bootstrap_ci"] = events_bootstrap_ci
ORACLES["events_bootstrap_ci"] = BOOTSTRAP_CI_SQL


# --- Brier-score decomposition (Murphy 1973) ----------------------------------
#
# The three-way calibration readout next to reward_margin_ece and
# events_isotonic_calibration (same user-grain label and md5 score
# plant as the isotonic operator, so the three calibration views grade
# the SAME model): with predictions binned at the score levels and the
# level midpoint (2s+1)/(2K) as the predicted probability,
#   brier = reliability − resolution + uncertainty,
# reliability = Σ n_l (p_l − o_l)² / N (calibration error),
# resolution  = Σ n_l (o_l − ō)² / N (how much the bins separate),
# uncertainty = ō(1 − ō).
# Determinism: every per-level term is a double computed from the same
# integers by the same expression tree in both engines, floor-scaled
# to 1e8 fixed point PER LEVEL, then integer-summed — so the K-bin sum
# order can't flip a bit; the decomposition identity is asserted on
# the scaled integers (the definition, exact up to the quantization).

def events_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import md5_int32

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    users = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("y")
    )
    scored = users.select(
        F.pmod(md5_int32(F.col("user_id").cast("string")), ISO_LEVELS).alias("score"),
        "y",
    )
    levels = scored.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sy")
    )
    tot = levels.agg(
        F.sum("n").alias("nn"), F.sum("sy").alias("ssy"),
        F.count(F.lit(1)).alias("n_bins"),
    )
    terms = levels.crossJoin(F.broadcast(tot)).select(
        "n_bins",
        "nn",
        "ssy",
        F.expr(
            f"cast(floor((n / cast(nn as double)) *"
            f" pow((2 * score + 1) / cast(2 * {ISO_LEVELS} as double) - sy / cast(n as double), 2)"
            " * 1e8 + 0.5) as bigint)"
        ).alias("rel_e8"),
        F.expr(
            "cast(floor((n / cast(nn as double)) *"
            " pow(sy / cast(n as double) - ssy / cast(nn as double), 2)"
            " * 1e8 + 0.5) as bigint)"
        ).alias("res_e8"),
    )
    return terms.groupBy("n_bins", "nn", "ssy").agg(
        F.sum("rel_e8").alias("r1"), F.sum("res_e8").alias("r2")
    ).select(
        F.col("n_bins").cast("bigint").alias("n_bins"),
        F.col("nn").cast("bigint").alias("n_users"),
        F.expr("cast(floor(ssy * 1000000.0 / nn + 0.5) as bigint)").alias(
            "base_rate_e6"
        ),
        F.col("r1").cast("bigint").alias("reliability_e8"),
        F.col("r2").cast("bigint").alias("resolution_e8"),
        F.expr(
            "cast(floor((ssy / cast(nn as double)) * (1 - ssy / cast(nn as double))"
            " * 1e8 + 0.5) as bigint)"
        ).alias("uncertainty_e8"),
    ).withColumn(
        "brier_e8",
        (
            F.col("reliability_e8") - F.col("resolution_e8") + F.col("uncertainty_e8")
        ).cast("bigint"),
    )


BRIER_SQL = f"""
WITH users AS (
  SELECT user_id, max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id
),
scored AS (
  SELECT CAST('0x' || substr(md5(user_id::VARCHAR), 1, 8) AS BIGINT) % {ISO_LEVELS} AS score, y
  FROM users
),
levels AS (SELECT score, count(*) AS n, sum(y) AS sy FROM scored GROUP BY score),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(sy) AS BIGINT) AS ssy,
               count(*)::BIGINT AS n_bins FROM levels),
terms AS (
  SELECT n_bins, nn, ssy,
         CAST(floor((n / CAST(nn AS DOUBLE)) *
              pow((2 * score + 1) / CAST(2 * {ISO_LEVELS} AS DOUBLE) - sy / CAST(n AS DOUBLE), 2)
              * 1e8 + (0.5)::DOUBLE) AS BIGINT) AS rel_e8,
         CAST(floor((n / CAST(nn AS DOUBLE)) *
              pow(sy / CAST(n AS DOUBLE) - ssy / CAST(nn AS DOUBLE), 2)
              * 1e8 + (0.5)::DOUBLE) AS BIGINT) AS res_e8
  FROM levels, tot
)
SELECT n_bins, nn AS n_users,
       CAST(floor(ssy * 1000000.0 / nn + (0.5)::DOUBLE) AS BIGINT) AS base_rate_e6,
       CAST(sum(rel_e8) AS BIGINT) AS reliability_e8,
       CAST(sum(res_e8) AS BIGINT) AS resolution_e8,
       CAST(floor((ssy / CAST(nn AS DOUBLE)) * (1 - ssy / CAST(nn AS DOUBLE))
            * 1e8 + (0.5)::DOUBLE) AS BIGINT) AS uncertainty_e8,
       CAST(CAST(sum(rel_e8) AS BIGINT) - CAST(sum(res_e8) AS BIGINT)
            + CAST(floor((ssy / CAST(nn AS DOUBLE)) * (1 - ssy / CAST(nn AS DOUBLE))
                    * 1e8 + (0.5)::DOUBLE) AS BIGINT) AS BIGINT) AS brier_e8
FROM terms
GROUP BY n_bins, nn, ssy
"""

QUERIES["events_brier_decomposition"] = events_brier_decomposition
ORACLES["events_brier_decomposition"] = BRIER_SQL
