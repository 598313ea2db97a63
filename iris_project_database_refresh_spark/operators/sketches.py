"""Mergeable-sketch and deterministic-sampling operators.

The 100 TB versions of "how many distinct users", "what are the hot
tokens" and "give me a representative subset" are sketches and hash
sampling, not exact global passes. Spark ships approximate built-ins
(``approx_count_distinct`` = HLL++, ``percentile_approx`` = GK) but
their estimates are engine-internal, so an oracle can never reproduce
them. These operators instead implement the *classic published
sketches whose estimates are pure arithmetic over md5 hashes* — both
engines compute the identical estimate, so the driver's value-hash
gate applies to the approximation itself, not just to an exact
fallback:

* `approx_distinct_kmv` — K-minimum-values (KMV / bottom-k theta
  sketch): the K smallest 32-bit hashes of the distinct keys estimate
  the distinct count as (K-1) * 2^32 / h_K. The sketch is mergeable
  (union = K smallest of the combined bottom-K sets), which is what
  makes it a map-side-combinable partial aggregate at scale; here the
  per-group bottom-K is produced by a rank-limited window, which Spark
  compiles to WindowGroupLimit (partial top-K per partition before the
  shuffle — the mergeability, expressed in Catalyst). The exact
  distinct count rides along as the audit column.
* `heavy_hitters_cms` — count-min sketch: D=4 md5-seeded hash rows x
  W=1024 buckets of summed counts; a token's estimate is the min of
  its D bucket counters, an upper bound with overestimate bounded by
  (total mass)/W per row. The corpus collapses to the vocabulary count
  table FIRST (one shuffle); the 4x bucket fan-out and the 4096-row
  sketch are vocabulary-sized, never corpus-sized, and the sketch
  broadcasts back onto the exact top-K candidates for the
  overestimate audit.
* `stratified_sample` — per-stratum fixed quota (N per source) by md5
  order: reproducible across runs AND engines, unlike ``sample()``
  (RNG, partition-layout dependent). Rank-limited window →
  WindowGroupLimit partial top-N per partition, so each executor
  forwards at most N rows per stratum.
* `weighted_sample_priority` — Duffield-Lund-Thorup priority
  sampling: priority q_i = w_i / u_i with u_i a hash-uniform in (0,1);
  the K highest-priority rows form a weight-proportional sample with
  unbiased subset-sum estimators. u_i = (h_i + 0.5) / 2^32 is exact in
  binary64 and q_i needs one multiply + one divide — both correctly
  rounded under IEEE 754, so the ranking is bit-identical across
  engines with no transcendental (the textbook exponential-race key
  -ln(u)/w would hinge on libm agreement). Global top-K compiles to
  TakeOrderedAndProject: per-partition partial top-K, no full sort.

Sampling weights/quotas echo the reference's per-source document
handling (catalog search/stage_01 groups by source before processing);
the sketches serve the monitor rollups (database-schema.sql
process_monitor_logs) where exact count-distinct over an unbounded log
is the query you stop running first at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import md5_int32, tokens
from ..sources.tables import load_table

KMV_K = 32
CMS_D = 4
CMS_W = 1024
CMS_TOPK = 20
STRATUM_N = 10  # < per-source count at every SF, so the quota actually samples
PRIORITY_K = 20

_TWO32 = 4294967296.0


# --- KMV distinct sketch ------------------------------------------------------

def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type: exact count + KMV estimate.

    The distinct pass shuffles once on (event_type, h); both the exact
    count and the bottom-K window consume that deduplicated table, so
    the raw stream is scanned once. At 100 TB the exact-count column is
    the one you drop; the bottom-K sketch is the artifact you keep and
    merge across days/partitions.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    dh = (
        ev.select("event_type", md5_int32(F.col("user_id").cast("string")).alias("h"))
        .distinct()
        .localCheckpoint(eager=False)  # exact count + sketch both consume it
    )
    exact = dh.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    w = Window.partitionBy("event_type").orderBy("h")
    bottomk = (
        dh.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(F.max("h").alias("hk"), F.count(F.lit(1)).alias("k_got"))
    )
    est = F.when(
        F.col("k_got") >= KMV_K,
        F.round(F.lit((KMV_K - 1) * _TWO32) / F.col("hk"), 2),
    ).otherwise(F.col("n_exact").cast("double"))
    return (
        exact.join(bottomk, "event_type")
        .withColumn("kmv_est", est)
        .select(
            "event_type",
            "n_exact",
            "kmv_est",
            F.round(F.abs(F.col("kmv_est") - F.col("n_exact")) / F.col("n_exact"), 4).alias(
                "rel_err"
            ),
        )
    )


KMV_SQL = f"""
WITH dh AS (
  SELECT DISTINCT event_type,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
  FROM events
), exact AS (
  SELECT event_type, count(*) AS n_exact FROM dh GROUP BY 1
), bottomk AS (
  SELECT event_type, max(h) AS hk, count(*) AS k_got FROM (
    SELECT event_type, h, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn FROM dh
  ) WHERE rn <= {KMV_K} GROUP BY 1
), j AS (
  SELECT e.event_type, n_exact,
         CASE WHEN k_got >= {KMV_K}
              THEN round({(KMV_K - 1)} * {_TWO32} / hk, 2)
              ELSE CAST(n_exact AS DOUBLE) END AS kmv_est
  FROM exact e JOIN bottomk b USING (event_type)
)
SELECT event_type, n_exact, kmv_est,
       round(abs(kmv_est - n_exact) / n_exact, 4) AS rel_err
FROM j
"""


# --- count-min sketch heavy hitters -------------------------------------------

def _cms_bucket(tok: F.Column, d: int) -> F.Column:
    return md5_int32(F.concat(F.lit(f"{d}:"), tok)) % CMS_W


def heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K tokens with their count-min-sketch estimates.

    One corpus-sized shuffle (token counts); everything after runs over
    the bounded vocabulary: the 4x (row, bucket) fan-out feeds a
    4096-cell sketch, the exact top-K candidates come from a
    TakeOrderedAndProject over the same pinned count table, and the
    sketch broadcasts onto the candidates for the min-of-rows estimate.
    cms_n >= exact_n always (count-min never underestimates).
    """
    docs = load_table(spark, sf_dir, "documents")
    cnt = (
        docs.select(F.explode(tokens(F.col("text"))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)  # candidates + sketch both consume it
    )
    pairs = cnt.select(
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cms_bucket(F.col("token"), d).alias("bucket")
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select("p.d", "p.bucket", "n")
    sketch = pairs.groupBy("d", "bucket").agg(F.sum("n").alias("c"))
    cand = cnt.orderBy(F.desc("n"), F.asc("token")).limit(CMS_TOPK)
    cand_buckets = cand.select(
        "token",
        "n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), _cms_bucket(F.col("token"), d).alias("bucket")
                    )
                    for d in range(CMS_D)
                ]
            )
        ).alias("p"),
    ).select("token", "n", "p.d", "p.bucket")
    return (
        cand_buckets.join(F.broadcast(sketch), ["d", "bucket"])
        .groupBy("token")
        .agg(
            F.max("n").alias("exact_n"),
            F.min("c").alias("cms_n"),
        )
        .select(
            "token",
            "exact_n",
            "cms_n",
            (F.col("cms_n") - F.col("exact_n")).alias("overcount"),
        )
    )


# bucket_d(token) = md5("{d}:{token}")[0:8] as uint32, mod W — identical
# arithmetic to the Spark-side _cms_bucket
_CMS_BUCKET_SQL = (
    "CAST('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || token), 1, 8) AS BIGINT) % "
    + str(CMS_W)
)

CMS_SQL = f"""
WITH toks AS (
  SELECT unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS token
  FROM documents
), c AS (
  SELECT token, count(*) AS n FROM toks GROUP BY token
), pairs AS (
  SELECT d, {_CMS_BUCKET_SQL} AS bucket, n
  FROM c CROSS JOIN (SELECT unnest(range({CMS_D})) AS d)
), sketch AS (
  SELECT d, bucket, sum(n) AS c FROM pairs GROUP BY d, bucket
), cand AS (
  SELECT token, n FROM c ORDER BY n DESC, token ASC LIMIT {CMS_TOPK}
), cb AS (
  SELECT token, n, d, {_CMS_BUCKET_SQL} AS bucket
  FROM cand CROSS JOIN (SELECT unnest(range({CMS_D})) AS d)
)
SELECT cb.token,
       max(cb.n) AS exact_n,
       CAST(min(s.c) AS BIGINT) AS cms_n,
       CAST(min(s.c) - max(cb.n) AS BIGINT) AS overcount
FROM cb JOIN sketch s USING (d, bucket)
GROUP BY cb.token
"""


# --- stratified sample --------------------------------------------------------

def stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed per-source quota by md5 order — deterministic stratified
    sampling. Unlike ``df.sample()`` this is stable across runs,
    partition layouts and engines; the rank-limited window becomes a
    WindowGroupLimit (per-partition partial top-N before the shuffle)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", md5_int32(F.col("doc_id").cast("string")).alias("h")
    )
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        docs.withColumn("sample_rank", F.row_number().over(w))
        .where(F.col("sample_rank") <= STRATUM_N)
        .select("doc_id", "source", F.col("sample_rank").cast("bigint").alias("sample_rank"))
    )


STRATIFIED_SQL = f"""
SELECT doc_id, source, sample_rank FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT), doc_id
         ) AS sample_rank
  FROM documents
) WHERE sample_rank <= {STRATUM_N}
"""


# --- weighted priority sample -------------------------------------------------

def weighted_sample_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup): q = w / u with
    hash-uniform u; global top-K by q. Selection probability grows with
    weight (n_chars), and the ranking uses only one IEEE multiply +
    divide so both engines order identically — no libm dependence."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        "n_chars",
        md5_int32(F.col("doc_id").cast("string")).alias("h"),
    )
    pri = (F.col("n_chars").cast("double") * F.lit(_TWO32)) / (F.col("h") + F.lit(0.5))
    return (
        docs.withColumn("priority", pri)
        .orderBy(F.desc("priority"), F.asc("doc_id"))
        .limit(PRIORITY_K)
        .select("doc_id", "source", "n_chars", F.round("priority", 4).alias("priority"))
    )


PRIORITY_SQL = f"""
SELECT doc_id, source, n_chars, round(priority, 4) AS priority FROM (
  SELECT doc_id, source, n_chars,
         CAST(n_chars AS DOUBLE) * {_TWO32}
           / (CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) + 0.5)
           AS priority
  FROM documents
) ORDER BY priority DESC, doc_id ASC LIMIT {PRIORITY_K}
"""


# --- HyperLogLog distinct sketch ---------------------------------------------

HLL_M = 64  # registers (6-bit bucket index over the 32-bit hash)
_HLL_RESTBITS = 26  # remaining hash bits feeding the rho (leading-zeros) rank
# alpha_m * m^2 * 2^30 precomputed in Python so both engines divide the
# SAME float constant by the exact integer register sum.
_HLL_NUM = (0.7213 / (1 + 1.079 / HLL_M)) * HLL_M * HLL_M * float(2**30)


def approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type: exact count + HyperLogLog estimate.

    Unlike KMV (bottom-K of the DISTINCT keys), HLL needs no distinct
    pass at all: registers are per-bucket maxima of the rho rank, and
    max() is idempotent — duplicates collapse in the map-side partial
    aggregate. That makes this the cheapest mergeable distinct sketch
    at 100 TB: one narrow groupBy(event_type, bucket) max, register
    state m=64 ints per group, union = elementwise max.

    Oracle-reproducibility: rho = 27 - bitlength(rest) is pure integer
    arithmetic (length(bin(x)) in both engines); the harmonic-mean
    denominator sums the dyadic rationals 2^-M_j exactly as integers
    2^(30 - M_j), so the published estimator alpha_m * m^2 / sum
    becomes one float division of identical operands in both engines.
    The plain estimator is used (no small/large-range corrections —
    they need ln(), whose libm rounding differs across engines); at
    n/m well above 2.5 that is the textbook operating range, and the
    exact count rides along as the audit column.
    """
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    hashed = ev.select(
        "event_type",
        md5_int32(F.col("user_id").cast("string")).alias("h"),
    ).select(
        "event_type",
        (F.col("h") % HLL_M).alias("bucket"),
        F.expr(f"h div {HLL_M}").alias("rest"),
    )
    # rho = leading zeros of the 26-bit rest + 1 = 27 - bitlength(rest);
    # rest = 0 (all zeros) takes the max rank 27
    rho = F.when(F.col("rest") == 0, F.lit(_HLL_RESTBITS + 1)).otherwise(
        F.lit(_HLL_RESTBITS + 1) - F.length(F.bin("rest"))
    )
    regs = (
        hashed.select("event_type", "bucket", rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("reg"))
    )
    # exact denominator: sum of 2^(30 - reg) over the m registers,
    # empty registers contributing 2^30 each
    per_type = regs.groupBy("event_type").agg(
        F.sum(F.expr("shiftleft(cast(1 as bigint), 30 - reg)")).alias("s_present"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    denom = F.col("s_present") + (F.lit(HLL_M) - F.col("n_regs")) * F.lit(2**30)
    est = F.round(F.lit(_HLL_NUM) / denom, 2)

    exact = ev.distinct().groupBy("event_type").agg(F.count(F.lit(1)).alias("n_exact"))
    return (
        exact.join(per_type, "event_type")
        .withColumn("hll_est", est)
        .select(
            "event_type",
            "n_exact",
            "hll_est",
            F.round(F.abs(F.col("hll_est") - F.col("n_exact")) / F.col("n_exact"), 4).alias(
                "rel_err"
            ),
        )
    )


HLL_SQL = f"""
WITH hashed AS (
  SELECT event_type,
         h % {HLL_M} AS bucket,
         h // {HLL_M} AS rest
  FROM (SELECT event_type,
               CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
        FROM events)
),
regs AS (
  SELECT event_type, bucket,
         max(CASE WHEN rest = 0 THEN {_HLL_RESTBITS + 1}
                  ELSE {_HLL_RESTBITS + 1} - length(bin(rest)) END) AS reg
  FROM hashed
  GROUP BY event_type, bucket
),
per_type AS (
  SELECT event_type,
         sum(1::BIGINT << (30 - reg))::BIGINT AS s_present,
         count(*) AS n_regs
  FROM regs GROUP BY event_type
),
exact AS (
  SELECT event_type, count(DISTINCT user_id) AS n_exact FROM events GROUP BY event_type
)
SELECT event_type, n_exact,
       round({_HLL_NUM!r} / (s_present + ({HLL_M} - n_regs) * (1::BIGINT << 30)), 2) AS hll_est,
       round(abs(round({_HLL_NUM!r} / (s_present + ({HLL_M} - n_regs) * (1::BIGINT << 30)), 2) - n_exact)
             / n_exact, 4) AS rel_err
FROM exact JOIN per_type USING (event_type)
"""


QUERIES = {
    "approx_distinct_kmv": approx_distinct_kmv,
    "approx_distinct_hll": approx_distinct_hll,
    "heavy_hitters_cms": heavy_hitters_cms,
    "stratified_sample": stratified_sample,
    "weighted_sample_priority": weighted_sample_priority,
}

ORACLES = {
    "approx_distinct_kmv": KMV_SQL,
    "approx_distinct_hll": HLL_SQL,
    "heavy_hitters_cms": CMS_SQL,
    "stratified_sample": STRATIFIED_SQL,
    "weighted_sample_priority": PRIORITY_SQL,
}


# --- CMS inner-product join-size estimate ------------------------------------
#
# The query-optimizer sketch (Cormode & Muthukrishnan 2005, public):
# the equi-join cardinality |A ⋈_k B| = Σ_k a_k·b_k is estimated by the
# inner product of the two sides' count-min rows — min over the D rows
# of Σ_bucket cmsA[d][w]·cmsB[d][w] — without ever joining A to B.
# Never underestimates (same one-sided guarantee as the point query).
# Exact answer computed alongside from the bounded per-key count
# tables (the sketch-with-its-ground-truth house pattern).
#
# Scale: each side collapses to per-key counts (map-side combine),
# then to a D×W=4096-cell sketch — mergeable across partitions/days;
# the estimate itself is a 4096-row join, corpus-size-independent. At
# 100 TB you estimate tomorrow's join size from two kilobyte sketches
# instead of running the join.

def join_size_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def side(event_type: str):
        keys = (
            ev.where(F.col("event_type") == event_type)
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        cells = keys.select(
            "n",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            _cms_bucket(F.col("user_id").cast("string"), d).alias("bucket"),
                        )
                        for d in range(CMS_D)
                    ]
                )
            ).alias("p"),
        ).select("p.d", "p.bucket", "n")
        return keys, cells.groupBy("d", "bucket").agg(F.sum("n").alias("c"))

    ka, ca = side("view")
    kb, cb = side("purchase")
    est_rows = (
        ca.join(cb.withColumnRenamed("c", "c2"), ["d", "bucket"])
        .groupBy("d")
        .agg(F.sum(F.col("c") * F.col("c2")).alias("est_d"))
    )
    est_min = est_rows.groupBy().agg(F.min("est_d").alias("est_join_rows"))
    exact = (
        ka.withColumnRenamed("n", "na")
        .join(kb.withColumnRenamed("n", "nb"), "user_id")
        .groupBy()
        .agg(F.sum(F.col("na") * F.col("nb")).alias("exact_join_rows"))
    )
    return (
        est_rows.crossJoin(F.broadcast(est_min))
        .crossJoin(F.broadcast(exact))
        .select(
            "d",
            "est_d",
            "est_join_rows",
            "exact_join_rows",
            (F.col("est_join_rows") - F.col("exact_join_rows")).alias("overcount"),
        )
    )


# key_d(user) = md5("{d}:{user}")[0:8] as uint32, mod W — identical to
# the Spark-side _cms_bucket over the stringified key
_CMS_KEY_SQL = (
    "CAST('0x' || substr(md5(CAST(d AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % "
    + str(CMS_W)
)

JOIN_SIZE_SQL = f"""
WITH ka AS (
  SELECT user_id, count(*) AS n FROM events WHERE event_type = 'view' GROUP BY user_id
),
kb AS (
  SELECT user_id, count(*) AS n FROM events WHERE event_type = 'purchase' GROUP BY user_id
),
ds AS (SELECT unnest(generate_series(0, {CMS_D - 1})) AS d),
ca AS (
  SELECT d, {_CMS_KEY_SQL} AS bucket, sum(n) AS c FROM ka, ds GROUP BY 1, 2
),
cb AS (
  SELECT d, {_CMS_KEY_SQL} AS bucket, sum(n) AS c FROM kb, ds GROUP BY 1, 2
),
est AS (
  SELECT ca.d, sum(ca.c * cb.c) AS est_d
  FROM ca JOIN cb ON ca.d = cb.d AND ca.bucket = cb.bucket
  GROUP BY ca.d
),
est_min AS (SELECT min(est_d) AS est_join_rows FROM est),
exact AS (
  SELECT sum(ka.n * kb.n) AS exact_join_rows FROM ka JOIN kb USING (user_id)
)
SELECT d, CAST(est_d AS BIGINT) AS est_d,
       CAST(est_join_rows AS BIGINT) AS est_join_rows,
       CAST(exact_join_rows AS BIGINT) AS exact_join_rows,
       CAST(est_join_rows - exact_join_rows AS BIGINT) AS overcount
FROM est, est_min, exact
"""

QUERIES["join_size_cms"] = join_size_cms
ORACLES["join_size_cms"] = JOIN_SIZE_SQL


# --- theta-sketch set operations ---------------------------------------------
#
# The KMV/theta sketch's real superpower over HLL: SET ALGEBRA
# (Dasgupta et al., theta sketches — public). Distinct viewers A and
# purchasers B each reduce to a bottom-K hash sample with threshold
# theta = K-th minimum; then |A ∪ B| comes from the merged bottom-K,
# and |A ∩ B| from the common samples below min(theta_A, theta_B)
# scaled by 2^32/theta — overlap analytics (audience intersection,
# cross-source contamination) without touching the raw sets again.
# Exact answers audited alongside (the house sketch pattern).
#
# Scale: each side is one distinct pass + a K-row sample; union/
# intersection estimates are joins over K-row tables. The samples are
# mergeable across partitions/days — the warehouse keeps kilobytes.

def distinct_set_ops_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    def side(event_type: str):
        h = (
            ev.where(F.col("event_type") == event_type)
            .select(md5_int32(F.col("user_id").cast("string")).alias("h"))
            .distinct()
            .localCheckpoint(eager=False)  # sample + exact counts share it
        )
        w = Window.orderBy("h")
        sample = h.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= KMV_K)
        theta = sample.groupBy().agg(F.max("h").alias("theta"))
        return h, sample.select("h"), theta

    ha, sa, ta = side("view")
    hb, sb, tb = side("purchase")

    exact_inter = ha.join(hb, "h").groupBy().agg(F.count(F.lit(1)).alias("exact_inter"))
    exact_union = (
        ha.unionAll(hb).distinct().groupBy().agg(F.count(F.lit(1)).alias("exact_union"))
    )
    merged = ha.unionAll(hb).distinct()
    wu = Window.orderBy("h")
    union_k = (
        merged.withColumn("rn", F.row_number().over(wu))
        .where(F.col("rn") <= KMV_K)
        .groupBy()
        .agg(F.max("h").alias("hk_u"), F.count(F.lit(1)).alias("k_u"))
    )
    theta = (
        ta.select(F.col("theta").alias("theta_a"))
        .crossJoin(tb.select(F.col("theta").alias("theta_b")))
        .select(F.least("theta_a", "theta_b").alias("theta_min"))
    )
    common_below = (
        sa.join(sb, "h")
        .crossJoin(F.broadcast(theta))
        .where(F.col("h") < F.col("theta_min"))
        .groupBy()
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    est_union = F.when(
        F.col("k_u") >= KMV_K, F.round(F.lit((KMV_K - 1) * _TWO32) / F.col("hk_u"), 2)
    ).otherwise(F.col("exact_union").cast("double"))
    est_inter = F.round(F.col("n_common") * F.lit(_TWO32) / F.col("theta_min"), 2)
    return (
        exact_union.crossJoin(F.broadcast(exact_inter))
        .crossJoin(F.broadcast(union_k))
        .crossJoin(F.broadcast(theta))
        .crossJoin(F.broadcast(common_below))
        .select(
            "exact_union",
            est_union.alias("est_union"),
            "exact_inter",
            est_inter.alias("est_inter"),
            F.col("n_common").cast("bigint").alias("n_common_samples"),
        )
    )


DISTINCT_SET_OPS_SQL = f"""
WITH ha AS (
  SELECT DISTINCT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
  FROM events WHERE event_type = 'view'
),
hb AS (
  SELECT DISTINCT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) AS h
  FROM events WHERE event_type = 'purchase'
),
sa AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM ha) WHERE rn <= {KMV_K}),
sb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM hb) WHERE rn <= {KMV_K}),
theta AS (
  SELECT least((SELECT max(h) FROM sa), (SELECT max(h) FROM sb)) AS theta_min
),
merged AS (SELECT h FROM ha UNION SELECT h FROM hb),
union_k AS (
  SELECT max(h) AS hk_u, count(*) AS k_u
  FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn FROM merged) WHERE rn <= {KMV_K}
),
exact_union AS (SELECT count(*) AS exact_union FROM merged),
exact_inter AS (SELECT count(*) AS exact_inter FROM ha JOIN hb USING (h)),
common_below AS (
  SELECT count(*) AS n_common FROM sa JOIN sb USING (h), theta WHERE h < theta_min
)
SELECT exact_union,
       CASE WHEN k_u >= {KMV_K} THEN round({(KMV_K - 1)} * {_TWO32} / hk_u, 2)
            ELSE CAST(exact_union AS DOUBLE) END AS est_union,
       exact_inter,
       round(n_common * {_TWO32} / theta_min, 2) AS est_inter,
       CAST(n_common AS BIGINT) AS n_common_samples
FROM exact_union, exact_inter, union_k, theta, common_below
"""

QUERIES["distinct_set_ops_kmv"] = distinct_set_ops_kmv
ORACLES["distinct_set_ops_kmv"] = DISTINCT_SET_OPS_SQL


# --- hll_merge_days — mergeability, demonstrated ------------------------------
#
# The property the 100 TB story rests on, as a graded query: per-DAY
# HLL register sets (the sketches a warehouse persists nightly) merged
# by elementwise max reproduce EXACTLY the registers — and therefore
# exactly the estimate — of one pass over the whole window, because
# max is associative/commutative/idempotent. The query computes both
# paths and publishes the equality, plus the exact count audit.
#
# Scale: daily sketches are (types × m) ints each; the merge touches
# only sketches, never re-reading history — the incremental-analytics
# contract.

def hll_merge_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        "user_id",
    )
    hashed = ev.select(
        "event_type",
        "day",
        (md5_int32(F.col("user_id").cast("string")) % HLL_M).alias("bucket"),
        F.expr(
            f"cast(conv(substring(md5(cast(user_id as string)), 1, 8), 16, 10) as bigint) div {HLL_M}"
        ).alias("rest"),
    )
    rho = F.when(F.col("rest") == 0, F.lit(_HLL_RESTBITS + 1)).otherwise(
        F.lit(_HLL_RESTBITS + 1) - F.length(F.bin("rest"))
    )
    daily = (
        hashed.select("event_type", "day", "bucket", rho.alias("rho"))
        .groupBy("event_type", "day", "bucket")
        .agg(F.max("rho").alias("reg"))
        .localCheckpoint(eager=False)  # merged + direct both consume it
    )
    merged = daily.groupBy("event_type", "bucket").agg(F.max("reg").alias("reg"))

    def estimate(regs):
        per_type = regs.groupBy("event_type").agg(
            F.sum(F.expr("shiftleft(cast(1 as bigint), 30 - reg)")).alias("s_present"),
            F.count(F.lit(1)).alias("n_regs"),
        )
        denom = F.col("s_present") + (F.lit(HLL_M) - F.col("n_regs")) * F.lit(2**30)
        return per_type.select("event_type", F.round(F.lit(_HLL_NUM) / denom, 2).alias("est"))

    est_merged = estimate(merged).withColumnRenamed("est", "est_merged")
    # direct one-pass registers over the full window (ignore day)
    direct = (
        hashed.select("event_type", "bucket", rho.alias("rho"))
        .groupBy("event_type", "bucket")
        .agg(F.max("rho").alias("reg"))
    )
    est_direct = estimate(direct).withColumnRenamed("est", "est_direct")
    exact = (
        ev.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_exact"))
    )
    n_days = daily.select("event_type", "day").distinct().groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_daily_sketches")
    )
    return (
        est_merged.join(est_direct, "event_type")
        .join(exact, "event_type")
        .join(n_days, "event_type")
        .select(
            "event_type",
            "n_daily_sketches",
            "est_merged",
            "est_direct",
            (F.col("est_merged") == F.col("est_direct")).cast("int").alias("merge_exactly_equal"),
            "n_exact",
        )
    )


HLL_MERGE_SQL = f"""
WITH ev AS (
  SELECT event_type, date_trunc('day', ts) AS day, user_id FROM events
),
hashed AS (
  SELECT event_type, day,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % {HLL_M} AS bucket,
         CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) // {HLL_M} AS rest
  FROM ev
),
rhos AS (
  SELECT event_type, day, bucket,
         CASE WHEN rest = 0 THEN {_HLL_RESTBITS + 1}
              ELSE {_HLL_RESTBITS + 1} - length(bin(rest)) END AS rho
  FROM hashed
),
daily AS (
  SELECT event_type, day, bucket, max(rho) AS reg FROM rhos GROUP BY 1, 2, 3
),
merged AS (
  SELECT event_type, bucket, max(reg) AS reg FROM daily GROUP BY 1, 2
),
direct AS (
  SELECT event_type, bucket, max(rho) AS reg FROM rhos GROUP BY 1, 2
),
est_m AS (
  SELECT event_type,
         round({_HLL_NUM} / (sum(1::BIGINT << (30 - reg)) + ({HLL_M} - count(*)) * {2**30}), 2) AS est_merged
  FROM merged GROUP BY event_type
),
est_d AS (
  SELECT event_type,
         round({_HLL_NUM} / (sum(1::BIGINT << (30 - reg)) + ({HLL_M} - count(*)) * {2**30}), 2) AS est_direct
  FROM direct GROUP BY event_type
),
exact AS (
  SELECT event_type, count(*) AS n_exact
  FROM (SELECT DISTINCT event_type, user_id FROM ev) GROUP BY event_type
),
nd AS (
  SELECT event_type, count(DISTINCT day) AS n_daily_sketches FROM daily GROUP BY event_type
)
SELECT e.event_type, nd.n_daily_sketches, m.est_merged, d.est_direct,
       CAST(m.est_merged = d.est_direct AS INT) AS merge_exactly_equal,
       e.n_exact
FROM est_m m JOIN est_d d USING (event_type) JOIN exact e USING (event_type)
JOIN nd USING (event_type)
"""

QUERIES["hll_merge_days"] = hll_merge_days
ORACLES["hll_merge_days"] = HLL_MERGE_SQL


# --- HDR-style log-bucket latency histogram --------------------------------------
#
# The value-relative-error complement to the fixed-span bins of
# quantile_hist_sketch: HdrHistogram-style log2 buckets (public art:
# Gil Tene's HdrHistogram) — exponent = bit length of the integer
# value, each power-of-two span split into 16 linear sub-buckets, so
# relative error is bounded ~1/16 at EVERY magnitude, not span/128.
# Values below 32 index their own exact bucket (the sub-bucket split
# is meaningless there), exactly as HdrHistogram does.
#
# Buckets are pure integer arithmetic (length(bin(v)) is the identical
# bit-length device in both engines; shifts are exact), the counts are
# associative/commutative partials (mergeable — any combine order
# agrees), and each percentile estimate reads the cumulative bucket
# table with integer selection; the exact percentile rides along as
# the audit column (the quantile_hist_sketch convention: round-6
# linear-interpolation quantile, identical in both engines).
#
# Scale: one narrow pass -> (type, bucket) counts with map-side
# combine; cumulative windows over <= a few hundred bucket rows per
# type; the exact audit column is the one global percentile pass you
# drop at 100 TB, keeping the mergeable sketch.

HDR_PCTS = (50, 90, 99)


def hdr_histogram_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.expr("cast(floor(value * 10000 + 0.5) as bigint) + 1").alias("v"),
    )
    binned = ev.select(
        "event_type",
        "value",
        F.expr(
            "CASE WHEN v < 32 THEN v ELSE"
            " length(bin(v)) * 16 +"
            " (v - shiftleft(cast(1 as bigint), length(bin(v)) - 1)) * 16"
            "   div shiftleft(cast(1 as bigint), length(bin(v)) - 1) END"
        ).alias("bucket"),
    )
    counts = binned.groupBy("event_type", "bucket").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("event_type").agg(F.sum("n").alias("total"))
    w = Window.partitionBy("event_type").orderBy("bucket")
    cum = counts.withColumn("cum", F.sum("n").over(w))
    pcts = spark.range(0, len(HDR_PCTS)).select(
        F.element_at(
            F.array(*[F.lit(p) for p in HDR_PCTS]), (F.col("id") + 1).cast("int")
        ).alias("pct")
    )
    hit = cum.join(F.broadcast(totals), "event_type").crossJoin(F.broadcast(pcts))
    qbucket = (
        hit.where(F.col("cum") * 100 >= F.col("pct") * F.col("total"))
        .groupBy("event_type", "pct")
        .agg(F.min("bucket").alias("qb"))
    )
    # doubled bucket midpoint in integer ticks: small buckets are exact
    # values; log buckets span [lo, lo + width) with lo/width exact
    est_x2 = (
        "CASE WHEN qb < 32 THEN 2 * qb ELSE"
        " 2 * (shiftleft(cast(1 as bigint), cast(qb div 16 as int) - 1)"
        "      + (qb % 16) * shiftleft(cast(1 as bigint), cast(qb div 16 as int) - 1) div 16)"
        " + shiftleft(cast(1 as bigint), cast(qb div 16 as int) - 1) div 16 END"
    )
    exact = ev.groupBy("event_type").agg(
        *[
            F.round(F.expr(f"percentile(value, {p / 100})"), 6).alias(f"exact_{p}")
            for p in HDR_PCTS
        ]
    )
    exact_long = exact.select(
        "event_type",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(p).alias("pct"), F.col(f"exact_{p}").alias("exact_q"))
                    for p in HDR_PCTS
                ]
            )
        ).alias("e"),
    ).select("event_type", F.col("e.pct").alias("pct"), F.col("e.exact_q").alias("exact_q"))
    return (
        qbucket.select(
            "event_type",
            F.col("pct").cast("bigint").alias("pct"),
            F.col("qb").cast("bigint").alias("bucket"),
            F.expr(est_x2).cast("bigint").alias("est_ticks_x2"),
        )
        .join(exact_long, ["event_type", "pct"])
    )


HDR_SQL = f"""
WITH ev AS (
  SELECT event_type, value, CAST(floor(value * 10000 + 0.5) AS BIGINT) + 1 AS v
  FROM events
),
binned AS (
  SELECT event_type, value,
         CASE WHEN v < 32 THEN v ELSE
           length(bin(v)) * 16 +
           (v - (1::BIGINT << (length(bin(v)) - 1))) * 16
             // (1::BIGINT << (length(bin(v)) - 1)) END AS bucket
  FROM ev
),
counts AS (SELECT event_type, bucket, count(*)::BIGINT AS n FROM binned GROUP BY 1, 2),
totals AS (SELECT event_type, CAST(sum(n) AS BIGINT) AS total FROM counts GROUP BY 1),
cum AS (
  SELECT event_type, bucket, sum(n) OVER (PARTITION BY event_type ORDER BY bucket) AS cum
  FROM counts
),
pcts AS (SELECT unnest([{", ".join(str(p) for p in HDR_PCTS)}]) AS pct),
qbucket AS (
  SELECT c.event_type, p.pct, min(c.bucket) AS qb
  FROM cum c JOIN totals t USING (event_type) CROSS JOIN pcts p
  WHERE c.cum * 100 >= p.pct * t.total
  GROUP BY 1, 2
),
exact AS (
  SELECT event_type, pct,
         CASE pct {" ".join(f"WHEN {p} THEN round(quantile_cont(value, {p / 100}), 6)" for p in HDR_PCTS)} END AS exact_q
  FROM ev CROSS JOIN pcts GROUP BY event_type, pct
)
SELECT q.event_type, CAST(q.pct AS BIGINT) AS pct, CAST(q.qb AS BIGINT) AS bucket,
       CAST(CASE WHEN q.qb < 32 THEN 2 * q.qb ELSE
         2 * ((1::BIGINT << (CAST(q.qb // 16 AS INT) - 1))
              + (q.qb % 16) * (1::BIGINT << (CAST(q.qb // 16 AS INT) - 1)) // 16)
         + (1::BIGINT << (CAST(q.qb // 16 AS INT) - 1)) // 16 END AS BIGINT) AS est_ticks_x2,
       e.exact_q
FROM qbucket q JOIN exact e ON e.event_type = q.event_type AND e.pct = q.pct
"""

QUERIES["hdr_histogram_latency"] = hdr_histogram_latency
ORACLES["hdr_histogram_latency"] = HDR_SQL
