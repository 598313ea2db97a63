"""Cost-based-optimizer statistics operators: histogram selectivity
estimation audited against truth, and greedy materialized-view
selection over the CUBE lattice.

Reference parity: the refresh system re-derives its reporting tables
wholesale every run (`catalog search/stage4_update_csv.py` rewrites the
master CSV; `stage5_output_final_csv.py` emits the per-run rollups). At
100 TB those responsibilities become *optimizer statistics*: the
engine's CBO prices predicates off column histograms (the ANALYZE
tables every warehouse keeps), and the rollup family is served from a
small set of materialized aggregates chosen for maximum benefit. Both
computations are planned here as graded queries so the planning math
itself — not just the plans it produces — is oracle-checked.

* `selectivity_estimate_audit` — the ANALYZE-statistics primitive: a
  16-bin equi-width histogram over integer-cent `l_extendedprice`
  (codes 0..4095, min/max from a 1-row broadcast, the zorder_layout
  coding device) prices eight planted range predicates under the
  uniform-within-bin assumption; the exact answer comes from the
  <=4096-row distinct-code table built by the SAME single corpus
  aggregation. Output per predicate: estimated rows, actual rows,
  signed error and the q-error (max(est/act, act/est), the metric the
  cardinality-estimation literature grades planners on — Leis et al.
  2015 "How Good Are Query Optimizers, Really?"), all in exact integer
  milli units.
* `cube_materialize_greedy` — the classic view-selection greedy
  (Harinarayan, Rajaraman, Ullman 1996 "Implementing Data Cubes
  Efficiently"): the 3-dimension rollup lattice over orders
  (priority, order-year, status) has its 8 view sizes measured by ONE
  CUBE pass (rows per grouping set = the view's cardinality); then
  3 greedy rounds pick the views whose materialization saves the most
  total rows-scanned across the 8-query workload, each round priced
  against the cheapest already-materialized ancestor. Benefits, picks
  and the total workload cost after each pick are exact integers, so
  the oracle reproduces the argmax trajectory (ties broken by smaller
  view then smaller mask — the determinism device).

Scale notes: `selectivity_estimate_audit`'s only corpus-sized work is
one hash aggregation to distinct codes (<=4096 groups — map-side
combine collapses it early); predicates join the resulting metadata
tables broadcast-side. `cube_materialize_greedy` reads the fact table
once through a CUBE aggregation (partial-aggregated per grouping set);
the greedy itself runs on an 8-row lattice whatever the corpus size —
the whole point of the 1996 algorithm is that planning cost depends on
the lattice, not the data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

QUERIES = {}
ORACLES = {}

# --- histogram selectivity audit ----------------------------------------------

N_CODE = 4096      # value-coding domain (zorder_layout device)
BIN_W = 256        # 16 equi-width histogram bins
# planted range predicates in code units [lo, hi] inclusive — a mix of
# bin-aligned, straddling, wide, and narrower-than-one-bin shapes so the
# uniform-within-bin estimator is graded on every interpolation case
PREDICATES = (
    (0, 0, 255),      # exactly bin 0
    (1, 128, 383),    # straddles bins 0-1 half-and-half
    (2, 300, 2000),   # wide, unaligned both ends
    (3, 1000, 1023),  # sub-bin slice
    (4, 2048, 4095),  # aligned upper half
    (5, 37, 3900),    # nearly the whole domain
    (6, 3500, 3583),  # sub-bin slice in the sparse tail
    (7, 600, 610),    # 11-code needle
)


def _pred_structs():
    return F.array(
        *[
            F.struct(
                F.lit(p).cast("bigint").alias("pred_id"),
                F.lit(lo).cast("bigint").alias("lo"),
                F.lit(hi).cast("bigint").alias("hi"),
            )
            for p, lo, hi in PREDICATES
        ]
    )


def selectivity_estimate_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width-histogram cardinality estimates vs exact counts for
    the planted predicates, with per-predicate q-error in milli."""
    cents = load_table(spark, sf_dir, "lineitem").select(
        F.expr("cast(floor(l_extendedprice * 100 + 0.5) as bigint)").alias("v")
    )
    rng = cents.agg(F.min("v").alias("vmin"), F.max("v").alias("vmax"))
    codes = cents.crossJoin(F.broadcast(rng)).select(
        F.expr(f"(v - vmin) * {N_CODE} div (vmax - vmin + 1)").alias("c")
    )
    # ONE corpus aggregation; everything downstream is metadata-sized
    chist = codes.groupBy("c").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    bhist = chist.groupBy(F.expr(f"c div {BIN_W}").alias("b")).agg(
        F.sum("cnt").cast("bigint").alias("bcnt")
    )
    preds = spark.range(1).select(F.explode(_pred_structs()).alias("p")).select("p.*")
    overlap = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.col("hi"), F.col("b") * BIN_W + (BIN_W - 1))
        - F.greatest(F.col("lo"), F.col("b") * BIN_W)
        + 1,
    )
    est = (
        preds.crossJoin(F.broadcast(bhist))
        .withColumn("ov", overlap)
        .select("pred_id", F.expr(f"bcnt * ov div {BIN_W}").alias("part"))
        .groupBy("pred_id")
        .agg(F.sum("part").cast("bigint").alias("est_rows"))
    )
    act = (
        preds.join(
            F.broadcast(chist),
            (F.col("c") >= F.col("lo")) & (F.col("c") <= F.col("hi")),
            "left",
        )
        .groupBy("pred_id")
        .agg(F.coalesce(F.sum("cnt"), F.lit(0)).cast("bigint").alias("actual_rows"))
    )
    return (
        preds.join(est, "pred_id")
        .join(act, "pred_id")
        .select(
            "pred_id",
            F.col("lo").alias("lo_code"),
            F.col("hi").alias("hi_code"),
            "est_rows",
            "actual_rows",
            (F.col("est_rows") - F.col("actual_rows")).alias("err_rows"),
            F.expr(
                "greatest(est_rows, actual_rows) * 1000"
                " div greatest(least(est_rows, actual_rows), 1)"
            ).alias("q_error_milli"),
        )
    )


def _preds_values_sql() -> str:
    return ", ".join(f"({p}, {lo}, {hi})" for p, lo, hi in PREDICATES)


SELECTIVITY_SQL = f"""
WITH cents AS (
  SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v FROM lineitem
), rng AS (SELECT min(v) AS vmin, max(v) AS vmax FROM cents),
codes AS (SELECT (v - vmin) * {N_CODE} // (vmax - vmin + 1) AS c FROM cents, rng),
chist AS (SELECT c, count(*)::BIGINT AS cnt FROM codes GROUP BY c),
bhist AS (SELECT c // {BIN_W} AS b, CAST(sum(cnt) AS BIGINT) AS bcnt FROM chist GROUP BY c // {BIN_W}),
preds(pred_id, lo, hi) AS (VALUES {_preds_values_sql()}),
est AS (
  SELECT pred_id,
         CAST(sum(bcnt * GREATEST(0, LEAST(hi, b * {BIN_W} + {BIN_W - 1})
                                      - GREATEST(lo, b * {BIN_W}) + 1) // {BIN_W})
              AS BIGINT) AS est_rows
  FROM preds, bhist GROUP BY pred_id
),
act AS (
  SELECT pred_id, CAST(coalesce(sum(cnt), 0) AS BIGINT) AS actual_rows
  FROM preds LEFT JOIN chist ON c BETWEEN lo AND hi GROUP BY pred_id
)
SELECT CAST(p.pred_id AS BIGINT) AS pred_id,
       CAST(p.lo AS BIGINT) AS lo_code, CAST(p.hi AS BIGINT) AS hi_code,
       e.est_rows, a.actual_rows,
       e.est_rows - a.actual_rows AS err_rows,
       GREATEST(e.est_rows, a.actual_rows) * 1000
         // GREATEST(LEAST(e.est_rows, a.actual_rows), 1) AS q_error_milli
FROM preds p JOIN est e ON e.pred_id = p.pred_id JOIN act a ON a.pred_id = p.pred_id
"""

QUERIES["selectivity_estimate_audit"] = selectivity_estimate_audit
ORACLES["selectivity_estimate_audit"] = SELECTIVITY_SQL


# --- greedy materialized-view selection over the CUBE lattice ------------------

GREEDY_ROUNDS = 3
_DIM_NAMES = ("priority", "year", "status")  # lattice bits 1, 2, 4


def _dims_label(mask_col: str, dialect: str) -> str:
    parts = ", ".join(
        f"CASE WHEN ({mask_col} & {1 << i}) = {1 << i} THEN '{n}' END"
        for i, n in enumerate(_DIM_NAMES)
    )
    return f"coalesce(nullif(concat_ws(',', {parts}), ''), 'apex')"


def cube_materialize_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HRU greedy: 3 picks from the 8-view orders lattice, each round
    choosing the unmaterialized view with the largest total workload
    saving (rows scanned across all 8 lattice queries, each priced at
    its cheapest materialized ancestor)."""
    dims = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("pr"),
        F.year("o_orderdate").alias("yr"),
        F.col("o_orderstatus").alias("st"),
    )
    # ONE CUBE pass: rows per grouping set = the view's cardinality
    g = dims.cube("pr", "yr", "st").agg(
        (
            F.lit(7)
            - (F.grouping("pr") + F.grouping("yr") * 2 + F.grouping("st") * 4)
        ).cast("bigint").alias("mask")
    )
    # pin the 8-row lattice sizes: referenced by base + every greedy
    # round's candidate set — unpinned, the CUBE pass over orders is
    # re-planned (and partly re-run) once per reference.
    sizes = (
        g.groupBy("mask")
        .agg(F.count(F.lit(1)).cast("bigint").alias("view_rows"))
        .localCheckpoint(eager=False)
    )
    base = sizes.where(F.col("mask") == 7).select(F.col("view_rows").alias("s7"))
    # every lattice query starts out answered by the base cuboid
    costs = sizes.select("mask").crossJoin(F.broadcast(base)).select(
        F.col("mask").alias("v"), F.col("s7").alias("cost")
    )
    picked = None
    out = []
    for rnd in range(1, GREEDY_ROUNDS + 1):
        cand = sizes.where(F.col("mask") != 7)
        if picked is not None:
            cand = cand.join(picked, "mask", "left_anti")
        benefits = (
            cand.join(costs, F.expr("(v & mask) = v"))
            .groupBy("mask", "view_rows")
            .agg(
                F.sum(F.greatest(F.col("cost") - F.col("view_rows"), F.lit(0)))
                .cast("bigint")
                .alias("benefit")
            )
        )
        pick = benefits.orderBy(
            F.desc("benefit"), F.asc("view_rows"), F.asc("mask")
        ).limit(1).localCheckpoint(eager=False)
        costs = (
            costs.crossJoin(
                F.broadcast(pick.select(F.col("mask").alias("pmask"), F.col("view_rows").alias("psize")))
            )
            .select(
                "v",
                F.when(F.expr("(v & pmask) = v"), F.least("cost", "psize"))
                .otherwise(F.col("cost"))
                .alias("cost"),
            )
        )
        total = costs.agg(F.sum("cost").cast("bigint").alias("total_cost_after"))
        out.append(
            pick.select(
                F.lit(rnd).cast("bigint").alias("round"),
                "mask",
                F.expr(_dims_label("mask", "spark")).alias("dims"),
                "view_rows",
                "benefit",
            ).crossJoin(F.broadcast(total))
        )
        picked = pick.select("mask") if picked is None else picked.union(pick.select("mask"))
    res = out[0]
    for df in out[1:]:
        res = res.union(df)
    return res


def _greedy_round_sql(rnd: int) -> str:
    prev_cost = f"cost{rnd - 1}"
    not_picked = (
        ""
        if rnd == 1
        else " AND mask NOT IN (" + " UNION ALL ".join(
            f"SELECT mask FROM pick{j}" for j in range(1, rnd)
        ) + ")"
    )
    return f"""
cand{rnd} AS (
  SELECT s.mask, s.view_rows,
         CAST(sum(GREATEST(c.cost - s.view_rows, 0)) AS BIGINT) AS benefit
  FROM sizes s JOIN {prev_cost} c ON (c.v & s.mask) = c.v
  WHERE s.mask <> 7{not_picked}
  GROUP BY s.mask, s.view_rows
),
pick{rnd} AS (
  SELECT mask, view_rows, benefit FROM cand{rnd}
  ORDER BY benefit DESC, view_rows ASC, mask ASC LIMIT 1
),
cost{rnd} AS (
  SELECT c.v,
         CASE WHEN (c.v & p.mask) = c.v THEN LEAST(c.cost, p.view_rows)
              ELSE c.cost END AS cost
  FROM {prev_cost} c, pick{rnd} p
),
row{rnd} AS (
  SELECT CAST({rnd} AS BIGINT) AS round, p.mask,
         {_dims_label('p.mask', 'duckdb')} AS dims,
         p.view_rows, p.benefit,
         (SELECT CAST(sum(cost) AS BIGINT) FROM cost{rnd}) AS total_cost_after
  FROM pick{rnd} p
)"""


def _greedy_sql() -> str:
    rounds = ",".join(_greedy_round_sql(r) for r in range(1, GREEDY_ROUNDS + 1))
    union = " UNION ALL ".join(f"SELECT * FROM row{r}" for r in range(1, GREEDY_ROUNDS + 1))
    return f"""
WITH dims AS (
  SELECT o_orderpriority AS pr, year(o_orderdate) AS yr, o_orderstatus AS st
  FROM orders
), g AS (
  SELECT CAST(7 - (grouping(pr) + 2 * grouping(yr) + 4 * grouping(st)) AS BIGINT) AS mask
  FROM dims GROUP BY CUBE (pr, yr, st)
), sizes AS (
  SELECT mask, count(*)::BIGINT AS view_rows FROM g GROUP BY mask
), base AS (SELECT view_rows AS s7 FROM sizes WHERE mask = 7),
cost0 AS (SELECT mask AS v, (SELECT s7 FROM base) AS cost FROM sizes),{rounds}
{union}
"""


CUBE_GREEDY_SQL = _greedy_sql()

QUERIES["cube_materialize_greedy"] = cube_materialize_greedy
ORACLES["cube_materialize_greedy"] = CUBE_GREEDY_SQL


# --- join-order cost audit ------------------------------------------------------
#
# The third CBO primitive beside the histogram audit and the view
# greedy: LEFT-DEEP JOIN ORDERING (Selinger et al. 1979 System R).
# For the chain customer ⋈ orders ⋈ lineitem there are exactly two
# connected left-deep orders — start with (lineitem ⋈ orders) or with
# (orders ⋈ customer); the cross-product start is excluded by the
# connectivity rule every optimizer applies. Each order is priced by
# its estimated intermediate cardinality under the textbook
# independence formula |A ⋈ B| = |A|·|B| / max(ndv_A(k), ndv_B(k)),
# with exact NDVs, and audited against the TRUE intermediate size
# (q-error milli, the Leis et al. 2015 metric again). `chosen` marks
# the order the estimates pick (ties to the first order name).
#
# Scale: NDVs and table counts are one aggregate per table (at 100 TB
# the NDV inputs come from the same HLL/KMV sketches approx_distinct_*
# maintain); the two exact intermediate counts are count-only
# fact-fact joins kept as audit columns — the piece a production CBO
# replaces with the estimate itself, same convention as join_size_cms.

def join_order_cost_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    li_stats = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_l"),
        F.countDistinct("l_orderkey").cast("bigint").alias("ndv_l_ok"),
    )
    o_stats = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_o"),
        F.countDistinct("o_orderkey").cast("bigint").alias("ndv_o_ok"),
        F.countDistinct("o_custkey").cast("bigint").alias("ndv_o_ck"),
    )
    c_stats = cust.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_c"),
        F.countDistinct("c_custkey").cast("bigint").alias("ndv_c_ck"),
    )
    lo_true = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_lo"))
    )
    oc_true = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .agg(F.count(F.lit(1)).cast("bigint").alias("true_oc"))
    )
    one = (
        li_stats.crossJoin(o_stats)
        .crossJoin(c_stats)
        .crossJoin(lo_true)
        .crossJoin(oc_true)
    )
    rows = one.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("lineitem_orders_first").alias("join_order"),
                    F.expr("n_l * n_o div greatest(ndv_l_ok, ndv_o_ok)").alias(
                        "est_intermediate"
                    ),
                    F.col("true_lo").alias("actual_intermediate"),
                ),
                F.struct(
                    F.lit("orders_customer_first").alias("join_order"),
                    F.expr("n_o * n_c div greatest(ndv_o_ck, ndv_c_ck)").alias(
                        "est_intermediate"
                    ),
                    F.col("true_oc").alias("actual_intermediate"),
                ),
            )
        ).alias("t")
    ).select("t.*")
    best = rows.agg(F.min("est_intermediate").alias("best_est"))
    return rows.crossJoin(F.broadcast(best)).select(
        "join_order",
        "est_intermediate",
        "actual_intermediate",
        F.expr(
            "greatest(est_intermediate, actual_intermediate) * 1000"
            " div greatest(least(est_intermediate, actual_intermediate), 1)"
        ).alias("q_error_milli"),
        (F.col("est_intermediate") == F.col("best_est")).cast("bigint").alias("chosen"),
    )


JOIN_ORDER_SQL = """
WITH li_stats AS (
  SELECT count(*)::BIGINT AS n_l, count(DISTINCT l_orderkey)::BIGINT AS ndv_l_ok
  FROM lineitem
), o_stats AS (
  SELECT count(*)::BIGINT AS n_o, count(DISTINCT o_orderkey)::BIGINT AS ndv_o_ok,
         count(DISTINCT o_custkey)::BIGINT AS ndv_o_ck
  FROM orders
), c_stats AS (
  SELECT count(*)::BIGINT AS n_c, count(DISTINCT c_custkey)::BIGINT AS ndv_c_ck
  FROM customer
), lo_true AS (
  SELECT count(*)::BIGINT AS true_lo
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), oc_true AS (
  SELECT count(*)::BIGINT AS true_oc
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
), one AS (
  SELECT * FROM li_stats, o_stats, c_stats, lo_true, oc_true
), rows_t AS (
  SELECT 'lineitem_orders_first' AS join_order,
         CAST(n_l * n_o // GREATEST(ndv_l_ok, ndv_o_ok) AS BIGINT) AS est_intermediate,
         true_lo AS actual_intermediate
  FROM one
  UNION ALL
  SELECT 'orders_customer_first',
         CAST(n_o * n_c // GREATEST(ndv_o_ck, ndv_c_ck) AS BIGINT),
         true_oc
  FROM one
), best AS (SELECT min(est_intermediate) AS best_est FROM rows_t)
SELECT join_order, est_intermediate, actual_intermediate,
       GREATEST(est_intermediate, actual_intermediate) * 1000
         // GREATEST(LEAST(est_intermediate, actual_intermediate), 1) AS q_error_milli,
       CAST(est_intermediate = best_est AS BIGINT) AS chosen
FROM rows_t, best
"""

QUERIES["join_order_cost_audit"] = join_order_cost_audit
ORACLES["join_order_cost_audit"] = JOIN_ORDER_SQL
