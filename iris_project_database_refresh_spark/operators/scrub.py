"""Corpus scrubbing + corpus-level statistics operators: PII redaction,
PMI collocations, and int8 embedding quantization.

Reference parity: the reference pipeline cleans content before
embedding (`semantic search/stage_02_section_processing.py` tag
stripping, `catalog search/stage3_generate_summaries.py` content
normalization); these add the scrubbing passes a pretraining-data
pipeline layers on top (C4/Gopher-style redaction, collocation
statistics for tokenizer/vocab work, storage-shrinking quantization for
embedding tables).

The synthetic corpus contains no real PII, so ``scrub_pii`` plants
deterministic contact strings in-query (the same pattern the
sectioning/paging operators use for headings and page tags) and the
oracle plants identically — both engines then scrub with the same
regexes.

Scale notes (100 TB):
- ``scrub_pii`` is pure per-row JVM regex — scan-rate, zero shuffle;
- ``collocations_pmi`` reduces the corpus to unigram/bigram count
  tables (one shuffle each, map-side partial aggs); the unigram side
  joins back in as a broadcast (vocabularies are bounded — millions of
  rows, not corpus-sized) and the totals as broadcast 1-row aggregates;
- ``embed_quantize`` is per-row array math, zero shuffle; floor(x+0.5)
  instead of round() so both engines derive identical integers from
  identical doubles regardless of their round-half conventions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table

EMAIL_RE = r"[A-Za-z0-9._]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
PHONE_RE = r"\b555-[0-9]{4}\b"


# --- PII scrubbing ------------------------------------------------------------

def _planted(docs: DataFrame) -> DataFrame:
    """Plant deterministic contact strings: every doc gets one email,
    one URL and one phone; every third doc an extra reply-to email."""
    did = F.col("doc_id").cast("string")
    extra = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(F.lit(" reply to admin"), did, F.lit("@corp.example.org")),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("From user"), did, F.lit("@example.com visit https://docs.example/"),
            did, F.lit(" or call 555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            extra, F.lit(" . "), F.col("text"),
        ).alias("content"),
    )


def scrub_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redact emails, URLs and phone numbers to typed placeholder
    tokens, reporting per-document match counts and the net character
    shrink. URL first (emails can be URL userinfo), then email, then
    phone."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    c = F.col("content")
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(c, URL_RE, "<URL>"), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    return _planted(docs).select(
        "doc_id",
        scrubbed.alias("scrubbed"),
        F.size(F.regexp_extract_all(c, F.lit(EMAIL_RE), F.lit(0))).cast("bigint").alias("n_emails"),
        F.size(F.regexp_extract_all(c, F.lit(URL_RE), F.lit(0))).cast("bigint").alias("n_urls"),
        F.size(F.regexp_extract_all(c, F.lit(PHONE_RE), F.lit(0))).cast("bigint").alias("n_phones"),
        (F.length(c) - F.length(scrubbed)).cast("bigint").alias("chars_removed"),
    )


_PLANTED_SQL = """
planted AS (
  SELECT doc_id,
         'From user' || CAST(doc_id AS VARCHAR) || '@example.com visit https://docs.example/'
           || CAST(doc_id AS VARCHAR) || ' or call 555-'
           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
           || CASE WHEN doc_id % 3 = 0
                   THEN ' reply to admin' || CAST(doc_id AS VARCHAR) || '@corp.example.org'
                   ELSE '' END
           || ' . ' || text AS content
  FROM documents
)
"""

SCRUB_PII_SQL = f"""
WITH {_PLANTED_SQL.strip()},
s AS (
  SELECT doc_id, content,
         regexp_replace(regexp_replace(regexp_replace(content,
             '{URL_RE}', '<URL>', 'g'),
             '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g') AS scrubbed
  FROM planted
)
SELECT doc_id, scrubbed,
       CAST(len(regexp_extract_all(content, '{EMAIL_RE}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(content, '{URL_RE}')) AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(content, '{PHONE_RE}')) AS BIGINT) AS n_phones,
       CAST(length(content) - length(scrubbed) AS BIGINT) AS chars_removed
FROM s
"""


# --- PMI collocations ---------------------------------------------------------

MIN_PAIR_COUNT = 5
TOP_COLLOCATIONS = 50


def collocations_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top bigram collocations by pointwise mutual information:
    log10((c12/N2) / ((c1/N1) * (c2/N1))). One shuffle each for the
    bigram and unigram count tables; unigram counts and both totals
    come back as broadcasts."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        F.filter(F.split("text", r"\s+"), lambda t: t != "").alias("toks")
    )
    # localCheckpoint pins the count tables so the four consumers
    # (u1, u2, total-tokens, total-bigrams) don't each re-scan the
    # corpus — without it the plan reads documents five times
    uni = (
        toks.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    pairs = toks.select(
        F.explode(
            F.when(F.size("toks") < 2, F.array().cast("array<struct<w1:string,w2:string>>"))
            .otherwise(
                F.zip_with(
                    F.slice(F.col("toks"), 1, F.size("toks") - 1),
                    F.slice(F.col("toks"), 2, F.size("toks") - 1),
                    lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
                )
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    big = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    n1 = uni.agg(F.sum("c").alias("n1"))
    n2 = big.agg(F.sum("c12").alias("n2"))
    u1 = uni.select(F.col("w").alias("u1w"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("u2w"), F.col("c").alias("c2"))
    pmi = F.round(
        F.log10(
            (F.col("c12") / F.col("n2"))
            / ((F.col("c1") / F.col("n1")) * (F.col("c2") / F.col("n1")))
        ),
        6,
    )
    return (
        big.where(F.col("c12") >= MIN_PAIR_COUNT)
        .join(F.broadcast(u1), F.col("w1") == F.col("u1w"))
        .join(F.broadcast(u2), F.col("w2") == F.col("u2w"))
        .join(F.broadcast(n1))
        .join(F.broadcast(n2))
        .select("w1", "w2", "c12", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(TOP_COLLOCATIONS)
    )


COLLOCATIONS_SQL = f"""
WITH t AS (
  SELECT list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
),
uni AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(toks) AS w FROM t)
  GROUP BY w
),
big AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2, count(*) AS c12
  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 2)
  GROUP BY 1, 2
),
tot AS (SELECT (SELECT sum(c) FROM uni) AS n1, (SELECT sum(c12) FROM big) AS n2)
SELECT w1, w2, c12,
       round(log10((c12 / CAST(n2 AS DOUBLE))
                   / ((u1.c / CAST(n1 AS DOUBLE)) * (u2.c / CAST(n1 AS DOUBLE)))), 6) AS pmi
FROM big
JOIN uni u1 ON w1 = u1.w
JOIN uni u2 ON w2 = u2.w
CROSS JOIN tot
WHERE c12 >= {MIN_PAIR_COUNT}
ORDER BY pmi DESC, w1, w2
LIMIT {TOP_COLLOCATIONS}
"""


# --- int8 embedding quantization ----------------------------------------------

def embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric per-vector int8 quantization of the embedding column:
    scale = max |x|, q_i = floor(x_i / scale * 127 + 0.5), plus the max
    absolute reconstruction error. floor(x + 0.5) on identical doubles
    is bit-identical across engines (round() half-conventions differ)."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    vec = emb.select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("v"),
    )
    scaled = vec.select(
        "vec_id", "v", F.array_max(F.transform("v", F.abs)).alias("scale")
    )
    q = F.when(F.col("scale") == 0, F.transform("v", lambda x: F.lit(0))).otherwise(
        F.transform("v", lambda x: F.floor(x / F.col("scale") * 127 + 0.5).cast("int"))
    )
    qcol = scaled.select("vec_id", "v", "scale", q.alias("q"))
    err = F.when(F.col("scale") == 0, F.lit(0.0)).otherwise(
        F.array_max(
            F.zip_with(
                F.col("v"),
                F.col("q"),
                lambda x, qi: F.abs(x - qi * F.col("scale") / 127),
            )
        )
    )
    # floor-based 6dp rounding, NOT F.round: Spark rounds the shortest
    # decimal repr (BigDecimal.valueOf) so 0.0012175-as-printed rounds
    # up even when the binary double is below the midpoint; floor on
    # identical doubles is bit-identical across engines.
    # err is computed in its OWN projection: putting it in the same
    # select as the `scale`-named rounded alias makes the lambda's
    # F.col("scale") resolve laterally to the rounded value.
    r6 = lambda c: F.floor(c * 1e6 + 0.5) / 1e6  # noqa: E731
    raw = qcol.select("vec_id", "q", "scale", err.alias("raw_err"))
    # qvec ships as a comma-joined string, not array<int>: the driver's
    # pandas canonicalization sorts every output column and cannot hash
    # lists — all query outputs must be flat scalar columns.
    return raw.select(
        "vec_id",
        F.concat_ws(",", F.transform("q", lambda x: x.cast("string"))).alias("qvec"),
        r6(F.col("scale")).alias("scale"),
        r6(F.col("raw_err")).alias("max_abs_err"),
    )


EMBED_QUANTIZE_SQL = """
WITH v AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
s AS (
  SELECT vec_id, v, list_max(list_transform(v, x -> abs(x))) AS scale FROM v
),
q AS (
  SELECT vec_id, v, scale,
         CASE WHEN scale = 0 THEN list_transform(v, x -> 0)
              ELSE list_transform(v, x -> CAST(floor(x / scale * 127 + 0.5) AS INT)) END AS qvec
  FROM s
)
SELECT vec_id,
       array_to_string(list_transform(qvec, x -> CAST(x AS VARCHAR)), ',') AS qvec,
       floor(scale * 1e6 + 0.5) / 1e6 AS scale,
       CASE WHEN scale = 0 THEN 0.0
            ELSE floor(list_max(list_transform(generate_series(1, len(v)),
                                i -> abs(v[i] - qvec[i] * scale / 127))) * 1e6 + 0.5) / 1e6
       END AS max_abs_err
FROM q
"""


# --- vocabulary statistics (Zipf curve + coverage) ----------------------------

VOCAB_TOP = 100


def vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary ranked by frequency with cumulative coverage —
    the tokenizer-design view (how many types cover 90% of tokens, the
    Zipf head/tail shape).

    The rank/cumsum windows run over the COUNT TABLE, not the corpus:
    vocabulary size is bounded (~1e6 types at any corpus size), so the
    unpartitioned window is a deliberate, documented exception to the
    no-global-window rule — its input is always small. The corpus-sized
    work is the one token-count shuffle."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    uni = (
        docs.select(F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    total = uni.agg(F.sum("c").alias("total"))
    order = Window.orderBy(F.desc("c"), "w")
    ranked = (
        uni.join(F.broadcast(total))
        .withColumn("rank", F.row_number().over(order))
        .withColumn("cum_c", F.sum("c").over(order.rowsBetween(Window.unboundedPreceding, 0)))
    )
    return (
        ranked.where(F.col("rank") <= VOCAB_TOP)
        .select(
            "rank",
            F.col("w").alias("token"),
            F.col("c").alias("count"),
            F.round(F.col("c") / F.col("total"), 6).alias("frequency"),
            F.round(F.col("cum_c") / F.col("total"), 6).alias("cum_coverage"),
        )
    )


VOCAB_STATS_SQL = f"""
WITH uni AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS w
        FROM documents)
  GROUP BY w
),
ranked AS (
  SELECT w, c,
         row_number() OVER (ORDER BY c DESC, w) AS rank,
         sum(c) OVER (ORDER BY c DESC, w ROWS UNBOUNDED PRECEDING) AS cum_c,
         (SELECT sum(c) FROM uni) AS total
  FROM uni
)
SELECT CAST(rank AS INT) AS rank, w AS token, c AS count,
       round(c / CAST(total AS DOUBLE), 6) AS frequency,
       round(cum_c / CAST(total AS DOUBLE), 6) AS cum_coverage
FROM ranked WHERE rank <= {VOCAB_TOP}
"""




# --- URL canonicalization dedup ----------------------------------------------
#
# The web-pipeline companion of `dedup_exact`: crawl corpora key their
# first dedup pass on a CANONICAL URL (CommonCrawl/C4 practice —
# lowercase scheme+host, strip www., default ports, fragments and
# tracking params, trailing slash) because the same page arrives under
# dozens of raw spellings. URLs are planted deterministically in-query
# (the house pattern): every group of 7 consecutive doc_ids shares a
# page identity but varies case, www., port, tracking params, fragment
# and trailing slash — so the canonicalizer must merge exactly those.
#
# Scale: the whole normalization chain is per-row JVM regex/array work
# (zero shuffle); the dedup itself is ONE canonical-key aggregation —
# identical shape to dedup_exact, scan-rate at 100 TB.

_URL_HOSTS = (
    "WWW.Example.COM",   # case + www
    "example.com:80",    # default port
    "Example.Com",       # case only
)
_URL_SUFFIXES = (
    "",
    "/",
    "?utm_source=feed",
    "?id=1&utm_medium=email",
    "#section-2",
)


def _planted_urls(docs: DataFrame) -> DataFrame:
    host = F.element_at(F.array(*[F.lit(h) for h in _URL_HOSTS]), (F.col("doc_id") % 3 + 1).cast("int"))
    suffix = F.element_at(
        F.array(*[F.lit(x) for x in _URL_SUFFIXES]), (F.col("doc_id") % 5 + 1).cast("int")
    )
    scheme = F.when(F.col("doc_id") % 2 == 0, F.lit("HTTP")).otherwise(F.lit("http"))
    return docs.select(
        "doc_id",
        F.concat(
            scheme, F.lit("://"), host, F.lit("/Docs/"),
            (F.col("doc_id") / 7).cast("bigint").cast("string"), suffix,
        ).alias("url"),
    )


def dedup_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    raw = _planted_urls(docs)
    parts = raw.select(
        "doc_id",
        "url",
        F.regexp_extract("url", r"^([^:]+)://", 1).alias("scheme"),
        F.regexp_extract("url", r"^[^:]+://([^/?#]+)", 1).alias("host"),
        F.regexp_extract("url", r"^[^:]+://[^/?#]+([^?#]*)", 1).alias("path"),
        F.regexp_extract("url", r"\?([^#]*)", 1).alias("query"),
    )
    canon_host = F.regexp_replace(
        F.regexp_replace(F.lower("host"), r"^www\.", ""), r":(80|443)$", ""
    )
    canon_path = F.when(F.col("path") == "/", F.col("path")).otherwise(
        F.regexp_replace("path", r"/$", "")
    )
    kept_params = F.filter(
        F.split("query", "&"),
        lambda p: (p != "") & ~p.rlike(r"^(utm_[a-z]+|fbclid)="),
    )
    canon_query = F.when(
        F.size(kept_params) > 0, F.concat(F.lit("?"), F.array_join(kept_params, "&"))
    ).otherwise(F.lit(""))
    canonical = F.concat(F.lower("scheme"), F.lit("://"), canon_host, canon_path, canon_query)
    return (
        parts.select("doc_id", "url", canonical.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min("doc_id").alias("keep_doc_id"),
            F.count(F.lit(1)).alias("n_urls"),
            F.countDistinct("url").alias("n_raw_forms"),
        )
    )


DEDUP_URL_SQL = r"""
WITH raw AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'http' END) || '://' ||
         (CASE doc_id % 3 WHEN 0 THEN 'WWW.Example.COM'
                          WHEN 1 THEN 'example.com:80'
                          ELSE 'Example.Com' END) ||
         '/Docs/' || CAST(doc_id // 7 AS VARCHAR) ||
         (CASE doc_id % 5 WHEN 0 THEN '' WHEN 1 THEN '/'
                          WHEN 2 THEN '?utm_source=feed'
                          WHEN 3 THEN '?id=1&utm_medium=email'
                          ELSE '#section-2' END) AS url
  FROM documents
), parts AS (
  SELECT doc_id, url,
         regexp_extract(url, '^([^:]+)://', 1) AS scheme,
         regexp_extract(url, '^[^:]+://([^/?#]+)', 1) AS host,
         regexp_extract(url, '^[^:]+://[^/?#]+([^?#]*)', 1) AS path,
         regexp_extract(url, '\?([^#]*)', 1) AS query
  FROM raw
), canon AS (
  SELECT doc_id, url,
         lower(scheme) || '://' ||
         regexp_replace(regexp_replace(lower(host), '^www\.', ''), ':(80|443)$', '') ||
         (CASE WHEN path = '/' THEN path ELSE regexp_replace(path, '/$', '') END) ||
         (CASE WHEN len(kept) > 0 THEN '?' || list_aggregate(kept, 'string_agg', '&') ELSE '' END)
           AS canonical_url
  FROM (
    SELECT *, list_filter(string_split(query, '&'),
                          p -> p <> '' AND NOT regexp_matches(p, '^(utm_[a-z]+|fbclid)=')) AS kept
    FROM parts
  )
)
SELECT canonical_url, min(doc_id) AS keep_doc_id,
       count(*) AS n_urls, count(DISTINCT url) AS n_raw_forms
FROM canon GROUP BY canonical_url
"""




# --- Zipf law fit -------------------------------------------------------------
#
# Fits log(freq) ~ alpha * log(rank) over the ranked vocabulary — the
# corpus-health diagnostic (natural text tracks Zipf with alpha near
# -1; generated/templated junk departs). Least squares runs on EXACT
# INTEGER sums: ln values quantize to 1e-4 fixed-point first (bounded
# ~1.4e5, so every sum stays far inside BIGINT), making the five sums
# order-independent — float summation order never touches the result,
# the device the repo uses everywhere floats would make a hash flaky.
# The ranked vocab is bounded (ZIPF_TOP rows); the only corpus-sized
# work is the word-count shuffle vocab_stats already models.

ZIPF_TOP = 500   # fit over the top-N ranks
_LQ = 10_000     # ln fixed-point scale


def zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    from pyspark.sql import Window as _W

    ranked = (
        counts.withColumn(
            "rank", F.row_number().over(_W.orderBy(F.desc("c"), F.asc("w")))
        )
        .where(F.col("rank") <= ZIPF_TOP)
        .select(
            F.expr(f"cast(floor(ln(rank) * {_LQ}) as bigint)").alias("x"),
            F.expr(f"cast(floor(ln(c) * {_LQ}) as bigint)").alias("y"),
        )
    )
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / (F.col("n") * _LQ), 6
        ).alias("intercept_ln"),
    )


ZIPF_SQL = f"""
WITH counts AS (
  SELECT w, count(*) AS c
  FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS w
        FROM documents)
  GROUP BY w
), ranked AS (
  SELECT CAST(floor(ln(rank) * {_LQ}) AS BIGINT) AS x,
         CAST(floor(ln(c) * {_LQ}) AS BIGINT) AS y
  FROM (SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS rank FROM counts)
  WHERE rank <= {ZIPF_TOP}
), sums AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM ranked
)
SELECT CAST(n AS BIGINT) AS n_terms,
       round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
       round((sy - (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE) * sx)
             / CAST(n * {_LQ} AS DOUBLE), 6) AS intercept_ln
FROM sums
"""


QUERIES = {
    "scrub_pii": scrub_pii,
    "collocations_pmi": collocations_pmi,
    "embed_quantize": embed_quantize,
    "vocab_stats": vocab_stats,
    "dedup_url_normalize": dedup_url_normalize,
    "zipf_fit": zipf_fit,
}

ORACLES = {
    "scrub_pii": SCRUB_PII_SQL,
    "collocations_pmi": COLLOCATIONS_SQL,
    "embed_quantize": EMBED_QUANTIZE_SQL,
    "vocab_stats": VOCAB_STATS_SQL,
    "dedup_url_normalize": DEDUP_URL_SQL,
    "zipf_fit": ZIPF_SQL,
}


# --- k-anonymity audit --------------------------------------------------------
#
# The privacy-governance companion of `scrub_pii`: before a dataset
# ships, audit how identifiable its quasi-identifier combinations are
# (public k-anonymity definition — every QI combination must be
# shared by >= k rows). QIs here are the customer dimension's
# (nation, market segment, account-balance band); the report gives
# the k-distribution: per equivalence-class-size band, how many
# classes and rows, plus the share of rows below the k=5 bar in
# integer basis points. One (QI) aggregation with map-side combine,
# then bounded rollups — the same shape as dedup_exact, scan-rate at
# any size.

K_ANON_BAR = 5


def privacy_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    classes = cust.groupBy(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.expr("cast(floor(c_acctbal / 1000) as bigint)").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("class_size"))
    total = classes.agg(F.sum("class_size").alias("total_rows"))
    banded = classes.select(
        F.when(F.col("class_size") == 1, "1 (unique)")
        .when(F.col("class_size") < K_ANON_BAR, f"2-{K_ANON_BAR - 1} (below bar)")
        .otherwise(f">={K_ANON_BAR} (anonymous)")
        .alias("k_band"),
        "class_size",
    )
    return (
        banded.groupBy("k_band")
        .agg(
            F.count(F.lit(1)).alias("n_classes"),
            F.sum("class_size").alias("n_rows"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "k_band",
            "n_classes",
            "n_rows",
            F.expr("cast(n_rows * 10000 div total_rows as bigint)").alias("rows_share_bp"),
        )
    )


K_ANONYMITY_SQL = f"""
WITH classes AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band,
         count(*) AS class_size
  FROM customer GROUP BY 1, 2, 3
), total AS (SELECT CAST(sum(class_size) AS BIGINT) AS total_rows FROM classes),
banded AS (
  SELECT CASE WHEN class_size = 1 THEN '1 (unique)'
              WHEN class_size < {K_ANON_BAR} THEN '2-{K_ANON_BAR - 1} (below bar)'
              ELSE '>={K_ANON_BAR} (anonymous)' END AS k_band,
         class_size
  FROM classes
)
SELECT k_band, count(*) AS n_classes,
       CAST(sum(class_size) AS BIGINT) AS n_rows,
       CAST(CAST(sum(class_size) AS BIGINT) * 10000 // total_rows AS BIGINT) AS rows_share_bp
FROM banded, total GROUP BY k_band, total_rows
"""

QUERIES["privacy_k_anonymity"] = privacy_k_anonymity
ORACLES["privacy_k_anonymity"] = K_ANONYMITY_SQL


# --- differential-privacy noisy counts ---------------------------------------
#
# The release mechanism after the k-anonymity audit: publish group
# counts with Laplace(sensitivity/epsilon) noise (the public DP
# mechanism). Randomness is the house hash-uniform device so the
# mechanism itself is engine-reproducible: u = md5(group) mod 1e6 /
# 1e6 (same double in both engines), noise = -b*sign(u-0.5)*
# ln(1-2|u-0.5|) via the inverse CDF. ln may differ by 1 ulp between
# engines — output rounded to 6dp keeps that ~1e-15 divergence
# invisible (same argument as the cosine device). True counts stay as
# audit columns, mirroring the sketch operators' estimate+exact
# pattern. One bounded aggregation, zero extra shuffles.

DP_EPSILON_X10 = 10  # epsilon = 1.0, spelled as an integer constant


def privacy_dp_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    counts = cust.groupBy(
        F.col("c_nationkey").alias("nation"), F.col("c_mktsegment").alias("segment")
    ).agg(F.count(F.lit(1)).alias("true_count"))
    u = (
        F.expr(
            "cast(conv(substring(md5(concat('dp:', cast(nation as string), ':', segment)), 1, 8), 16, 10) as bigint) % 1000000"
        )
        / 1000000.0
    )
    b = 10.0 / DP_EPSILON_X10  # sensitivity 1 / epsilon
    centered = u - F.lit(0.5)
    noise = -F.lit(b) * F.signum(centered) * F.log(1.0 - 2.0 * F.abs(centered))
    return counts.select(
        "nation",
        "segment",
        "true_count",
        F.round(F.col("true_count") + noise, 6).alias("noisy_count"),
        F.lit(DP_EPSILON_X10).cast("bigint").alias("epsilon_x10"),
    )


DP_COUNTS_SQL = f"""
WITH counts AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment, count(*) AS true_count
  FROM customer GROUP BY 1, 2
), noised AS (
  SELECT *,
         (CAST('0x' || substr(md5('dp:' || CAST(nation AS VARCHAR) || ':' || segment), 1, 8) AS BIGINT)
          % 1000000) / 1000000.0 AS u
  FROM counts
)
SELECT nation, segment, true_count,
       round(true_count + (-(10.0 / {DP_EPSILON_X10}) * sign(u - 0.5) * ln(1 - 2 * abs(u - 0.5))), 6)
         AS noisy_count,
       CAST({DP_EPSILON_X10} AS BIGINT) AS epsilon_x10
FROM noised
"""

QUERIES["privacy_dp_counts"] = privacy_dp_counts
ORACLES["privacy_dp_counts"] = DP_COUNTS_SQL


# --- l-diversity audit ---------------------------------------------------------
#
# The complement of `privacy_k_anonymity`: a class can be k-anonymous
# yet leak its sensitive attribute if every member shares one value.
# Sensitive attribute here: the customer's order-count band (0 / 1 /
# 2 / 3+ — a behavioral attribute the quasi-identifiers must not pin
# down). Classes are the same (nation, segment, balance-band) QIs;
# the report buckets classes by distinct-sensitive-value count with
# exact basis-point row shares. One orders aggregation joined to
# customers (both key-sized shuffles), then bounded class rollups.

L_DIV_BAR = 3


def privacy_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    ocnt = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )
    sens = (
        cust.join(ocnt, cust.c_custkey == ocnt.o_custkey, "left")
        .select(
            F.col("c_nationkey").alias("nation"),
            F.col("c_mktsegment").alias("segment"),
            F.expr("cast(floor(c_acctbal / 1000) as bigint)").alias("bal_band"),
            F.least(F.coalesce(F.col("n_orders"), F.lit(0)), F.lit(3))
            .cast("bigint")
            .alias("sens_band"),
        )
    )
    classes = sens.groupBy("nation", "segment", "bal_band").agg(
        F.count(F.lit(1)).alias("class_size"),
        F.countDistinct("sens_band").alias("l"),
    )
    total = classes.agg(F.sum("class_size").alias("total_rows"))
    banded = classes.select(
        F.when(F.col("l") == 1, "1 (homogeneous)")
        .when(F.col("l") < L_DIV_BAR, f"2-{L_DIV_BAR - 1} (weak)")
        .otherwise(f">={L_DIV_BAR} (diverse)")
        .alias("l_band"),
        "class_size",
    )
    return (
        banded.groupBy("l_band")
        .agg(F.count(F.lit(1)).alias("n_classes"), F.sum("class_size").alias("n_rows"))
        .crossJoin(F.broadcast(total))
        .select(
            "l_band",
            "n_classes",
            "n_rows",
            F.expr("cast(n_rows * 10000 div total_rows as bigint)").alias("rows_share_bp"),
        )
    )


L_DIVERSITY_SQL = f"""
WITH ocnt AS (
  SELECT o_custkey, count(*) AS n_orders FROM orders GROUP BY o_custkey
), sens AS (
  SELECT c.c_nationkey AS nation, c.c_mktsegment AS segment,
         CAST(floor(c.c_acctbal / 1000) AS BIGINT) AS bal_band,
         CAST(least(coalesce(o.n_orders, 0), 3) AS BIGINT) AS sens_band
  FROM customer c LEFT JOIN ocnt o ON c.c_custkey = o.o_custkey
), classes AS (
  SELECT nation, segment, bal_band, count(*) AS class_size,
         count(DISTINCT sens_band) AS l
  FROM sens GROUP BY 1, 2, 3
), total AS (SELECT CAST(sum(class_size) AS BIGINT) AS total_rows FROM classes),
banded AS (
  SELECT CASE WHEN l = 1 THEN '1 (homogeneous)'
              WHEN l < {L_DIV_BAR} THEN '2-{L_DIV_BAR - 1} (weak)'
              ELSE '>={L_DIV_BAR} (diverse)' END AS l_band,
         class_size
  FROM classes
)
SELECT l_band, count(*) AS n_classes, CAST(sum(class_size) AS BIGINT) AS n_rows,
       CAST(CAST(sum(class_size) AS BIGINT) * 10000 // total_rows AS BIGINT) AS rows_share_bp
FROM banded, total GROUP BY l_band, total_rows
"""

QUERIES["privacy_l_diversity"] = privacy_l_diversity
ORACLES["privacy_l_diversity"] = L_DIVERSITY_SQL


# --- t-closeness --------------------------------------------------------------
#
# Completes the release-audit ladder k-anonymity -> l-diversity ->
# t-closeness (Li, Li & Venkatasubramanian 2007, public art): a QI
# class can be k-anonymous and l-diverse yet still leak when its
# SENSITIVE-value distribution sits far from the corpus baseline.
# For the ordered sensitive attribute (account-balance band) the
# distance is the Earth Mover's Distance over ordered categories:
# EMD = sum |cumulative(p - q)| / (m - 1) — computed entirely in
# truncated-bp integers, identical in both engines.
#
# Scale: one shuffle to (class, band) counts; the dense class x band
# grid is a cross join of the bounded class table with the <=10-row
# band universe, so every window runs on grid rows, not corpus rows.

T_CLOSE_BAR_BP = 2000  # t = 0.2


def privacy_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.expr("cast(floor(c_acctbal / 2000) as bigint)").alias("band"),
    )
    cb = cust.groupBy("nation", "segment", "band").agg(
        F.count("*").cast("bigint").alias("n_cb")
    )
    classes = cb.groupBy("nation", "segment").agg(
        F.sum("n_cb").cast("bigint").alias("class_size")
    )
    bands = cust.groupBy("band").agg(F.count("*").cast("bigint").alias("n_b"))
    tot = bands.agg(
        F.sum("n_b").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("m_bands"),
    )
    grid = (
        classes.crossJoin(F.broadcast(bands))
        .join(cb, ["nation", "segment", "band"], "left")
        .select(
            "nation", "segment", "band", "class_size", "n_b",
            F.coalesce("n_cb", F.lit(0)).cast("bigint").alias("n_cb"),
        )
    )
    w = Window.partitionBy("nation", "segment").orderBy("band")
    cum = grid.crossJoin(F.broadcast(tot)).select(
        "nation", "segment", "band", "class_size", "m_bands",
        F.sum(
            F.expr(
                "cast(n_cb * 10000 div class_size as bigint)"
                " - cast(n_b * 10000 div n_total as bigint)"
            )
        ).over(w).alias("cum_bp"),
    )
    out = cum.groupBy("nation", "segment", "class_size", "m_bands").agg(
        F.expr("cast(sum(abs(cum_bp)) div (max(m_bands) - 1) as bigint)").alias("emd_bp")
    )
    return out.select(
        "nation", "segment", "class_size", "emd_bp",
        (F.col("emd_bp") > T_CLOSE_BAR_BP).cast("int").alias("t_violation"),
    )


T_CLOSENESS_SQL = f"""
WITH cust AS (
  SELECT c_nationkey AS nation, c_mktsegment AS segment,
         CAST(floor(c_acctbal / 2000) AS BIGINT) AS band
  FROM customer
),
cb AS (
  SELECT nation, segment, band, count(*)::BIGINT AS n_cb
  FROM cust GROUP BY 1, 2, 3
),
classes AS (
  SELECT nation, segment, CAST(sum(n_cb) AS BIGINT) AS class_size
  FROM cb GROUP BY 1, 2
),
bands AS (SELECT band, count(*)::BIGINT AS n_b FROM cust GROUP BY band),
tot AS (
  SELECT CAST(sum(n_b) AS BIGINT) AS n_total, count(*)::BIGINT AS m_bands FROM bands
),
grid AS (
  SELECT c.nation, c.segment, b.band, c.class_size, b.n_b,
         coalesce(x.n_cb, 0)::BIGINT AS n_cb
  FROM classes c CROSS JOIN bands b
  LEFT JOIN cb x ON x.nation = c.nation AND x.segment = c.segment AND x.band = b.band
),
cum AS (
  SELECT nation, segment, band, class_size, m_bands,
         sum(CAST(n_cb * 10000 // class_size AS BIGINT)
             - CAST(n_b * 10000 // n_total AS BIGINT))
           OVER (PARTITION BY nation, segment ORDER BY band) AS cum_bp
  FROM grid, tot
),
scored AS (
  SELECT nation, segment, class_size,
         CAST(sum(abs(cum_bp)) // (max(m_bands) - 1) AS BIGINT) AS emd_bp
  FROM cum GROUP BY nation, segment, class_size, m_bands
)
SELECT nation, segment, class_size, emd_bp,
       CAST(emd_bp > {T_CLOSE_BAR_BP} AS INT) AS t_violation
FROM scored
"""

QUERIES["privacy_t_closeness"] = privacy_t_closeness
ORACLES["privacy_t_closeness"] = T_CLOSENESS_SQL


# --- Heaps' law vocabulary-growth fit --------------------------------------------
#
# zipf_fit's companion corpus law: vocabulary grows as V(n) ~ K n^beta
# (Heaps 1978; beta ~ 0.4-0.6 for natural text) — the curve that tells
# a tokenizer/vocab planner how vocabulary scales with corpus size.
# Exact distributed construction with NO sequential scan: each token's
# FIRST document (min doc_id) marks where it enters the vocabulary;
# cumulative tokens and cumulative vocabulary at each document
# checkpoint are then two running sums over the bounded checkpoint
# grid, and the (ln N, ln V) points go through the ln-quantize integer
# OLS (the zipf device).  Checkpoints every HEAPS_EVERY documents keep
# the fit grid bounded at any SF.
#
# Scale: one explode -> (token, min doc) aggregate; per-doc token
# counts aggregate once; both collapse to the checkpoint grid before
# any window.

HEAPS_EVERY = 20  # checkpoint grid: every N-th document


def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("w"),
    )
    first_doc = toks.groupBy("w").agg(F.min("doc_id").alias("fd"))
    ck = F.expr(f"cast(ceil(cast(rk as double) / {HEAPS_EVERY}) as bigint)")
    # rank documents densely by doc_id so checkpoints are corpus positions
    from pyspark.sql import Window as _W

    doc_rank = docs.select("doc_id").withColumn(
        "rk", F.row_number().over(_W.orderBy("doc_id"))
    )
    tok_per_doc = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("tc"))
    per_ck_tokens = (
        doc_rank.join(tok_per_doc, "doc_id", "left")
        .select(ck.alias("ckp"), F.coalesce("tc", F.lit(0)).alias("tc"))
        .groupBy("ckp")
        .agg(F.sum("tc").alias("dt"))
    )
    per_ck_vocab = (
        first_doc.join(doc_rank, first_doc.fd == doc_rank.doc_id)
        .select(ck.alias("ckp"))
        .groupBy("ckp")
        .agg(F.count(F.lit(1)).alias("dv"))
    )
    w = _W.orderBy("ckp").rowsBetween(_W.unboundedPreceding, 0)
    grid = (
        per_ck_tokens.join(per_ck_vocab, "ckp", "left")
        .select("ckp", "dt", F.coalesce("dv", F.lit(0)).alias("dv"))
        .select(
            "ckp",
            F.sum("dt").over(w).alias("cum_tokens"),
            F.sum("dv").over(w).alias("cum_vocab"),
        )
        .where(F.col("cum_tokens") > 0)
    )
    pts = grid.select(
        F.expr(f"cast(floor(ln(cast(cum_tokens as double)) * {_LQ}) as bigint)").alias("x"),
        F.expr(f"cast(floor(ln(cast(cum_vocab as double)) * {_LQ}) as bigint)").alias("y"),
    )
    sums = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("n").cast("bigint").alias("n_checkpoints"),
        F.round(slope, 6).alias("heaps_beta"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / (F.col("n") * _LQ), 6
        ).alias("ln_k"),
    )


HEAPS_SQL = f"""
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS w
  FROM documents
),
first_doc AS (SELECT w, min(doc_id) AS fd FROM toks GROUP BY w),
doc_rank AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id) AS rk FROM documents
),
tok_per_doc AS (SELECT doc_id, count(*)::BIGINT AS tc FROM toks GROUP BY doc_id),
per_ck_tokens AS (
  SELECT CAST(ceil(CAST(rk AS DOUBLE) / {HEAPS_EVERY}) AS BIGINT) AS ckp,
         CAST(sum(coalesce(tc, 0)) AS BIGINT) AS dt
  FROM doc_rank LEFT JOIN tok_per_doc USING (doc_id)
  GROUP BY 1
),
per_ck_vocab AS (
  SELECT CAST(ceil(CAST(rk AS DOUBLE) / {HEAPS_EVERY}) AS BIGINT) AS ckp,
         count(*)::BIGINT AS dv
  FROM first_doc JOIN doc_rank ON fd = doc_id
  GROUP BY 1
),
grid AS (
  SELECT ckp,
         CAST(sum(dt) OVER (ORDER BY ckp ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens,
         CAST(sum(coalesce(dv, 0)) OVER (ORDER BY ckp ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_vocab
  FROM per_ck_tokens LEFT JOIN per_ck_vocab USING (ckp)
),
pts AS (
  SELECT CAST(floor(ln(CAST(cum_tokens AS DOUBLE)) * {_LQ}) AS BIGINT) AS x,
         CAST(floor(ln(CAST(cum_vocab AS DOUBLE)) * {_LQ}) AS BIGINT) AS y
  FROM grid WHERE cum_tokens > 0
),
sums AS (
  SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM pts
)
SELECT CAST(n AS BIGINT) AS n_checkpoints,
       round((n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS heaps_beta,
       round((sy - (n * sxy - sx * sy) / CAST(n * sxx - sx * sx AS DOUBLE) * sx)
             / CAST(n * {_LQ} AS DOUBLE), 6) AS ln_k
FROM sums
"""

QUERIES["heaps_law_fit"] = heaps_law_fit
ORACLES["heaps_law_fit"] = HEAPS_SQL


# --- training-data canary scan --------------------------------------------------
#
# The proactive complement of doc_decontaminate: secret CANARY strings
# (Carlini et al.'s exposure methodology, public art) are planted into
# a corpus so a later scan — or a model-memorization probe — can
# measure leakage.  Every 17th document gets a deterministic
# GUID-shaped canary spliced after its 5th token; the scan must
# recover every planted canary (recall 1.0), attribute it to the right
# source, and report zero hits for the 64 DECOY canaries that were
# never planted (false-positive floor).
#
# Plan: the scan is a broadcast join of the (planted + decoy) canary
# table against a contains() filter — one corpus pass, no shuffle on
# the fact side; per-source rollup bounded.

CANARY_EVERY = 17
CANARY_DECOYS = 64


def _canary(col):
    m = F.md5(F.concat(F.lit("canary:"), col.cast("string")))
    return F.concat_ws(
        "-",
        F.substring(m, 1, 8),
        F.substring(m, 9, 4),
        F.substring(m, 13, 4),
        F.substring(m, 17, 12),
    )


def text_canary_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    planted = docs.select(
        "doc_id",
        "source",
        F.when(
            F.col("doc_id") % CANARY_EVERY == 0,
            F.concat_ws(
                " ",
                F.array_join(F.slice(tokens(F.col("text")), 1, 5), " "),
                _canary(F.col("doc_id")),
                F.array_join(
                    F.slice(tokens(F.col("text")), 6, F.size(tokens(F.col("text")))), " "
                ),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    docs_n = planted.agg(F.count(F.lit(1)).alias("n_docs"))
    reg = (
        load_table(spark, sf_dir, "documents")
        .select("doc_id")
        .where(F.col("doc_id") % CANARY_EVERY == 0)
        .select(F.col("doc_id").alias("cid"), _canary(F.col("doc_id")).alias("canary"), F.lit(1).alias("is_planted"))
        .unionByName(
            spark.range(CANARY_DECOYS).select(
                (-F.col("id") - 1).alias("cid"),
                _canary(-F.col("id") - 1).alias("canary"),
                F.lit(0).alias("is_planted"),
            )
        )
    )
    hits = planted.join(
        F.broadcast(reg), F.expr("contains(text, canary)"), "inner"
    ).select("cid", "is_planted", "doc_id", "source")
    per = reg.join(
        hits.groupBy("cid").agg(
            F.count(F.lit(1)).alias("n_hits"), F.min("doc_id").alias("found_doc")
        ),
        "cid",
        "left",
    )
    return per.groupBy("is_planted").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_canaries"),
        F.coalesce(F.sum((F.col("n_hits") > 0).cast("int")), F.lit(0))
        .cast("bigint")
        .alias("n_found"),
        F.coalesce(F.sum("n_hits"), F.lit(0)).cast("bigint").alias("total_hits"),
        F.coalesce(
            F.sum(F.expr("case when n_hits > 0 and cid = found_doc then 1 else 0 end")),
            F.lit(0),
        )
        .cast("bigint")
        .alias("found_in_expected_doc"),
    )


CANARY_SQL = f"""
WITH canon AS (
  SELECT doc_id,
         substring(md5('canary:' || doc_id::VARCHAR), 1, 8) || '-' ||
         substring(md5('canary:' || doc_id::VARCHAR), 9, 4) || '-' ||
         substring(md5('canary:' || doc_id::VARCHAR), 13, 4) || '-' ||
         substring(md5('canary:' || doc_id::VARCHAR), 17, 12) AS canary
  FROM documents
),
planted AS (
  SELECT d.doc_id, d.source,
         CASE WHEN d.doc_id % {CANARY_EVERY} = 0 THEN
           concat_ws(' ',
             array_to_string(list_filter(string_split_regex(d.text, '\\s+'), x -> x <> '')[1:5], ' '),
             c.canary,
             array_to_string(list_filter(string_split_regex(d.text, '\\s+'), x -> x <> '')[6:], ' '))
         ELSE d.text END AS text
  FROM documents d JOIN canon c USING (doc_id)
),
reg AS (
  SELECT doc_id AS cid, canary, 1 AS is_planted FROM canon
  WHERE doc_id % {CANARY_EVERY} = 0
  UNION ALL
  SELECT -(i + 1) AS cid,
         substring(md5('canary:' || (-(i + 1))::VARCHAR), 1, 8) || '-' ||
         substring(md5('canary:' || (-(i + 1))::VARCHAR), 9, 4) || '-' ||
         substring(md5('canary:' || (-(i + 1))::VARCHAR), 13, 4) || '-' ||
         substring(md5('canary:' || (-(i + 1))::VARCHAR), 17, 12),
         0
  FROM unnest(generate_series(0, {CANARY_DECOYS - 1})) AS t(i)
),
hits AS (
  SELECT r.cid, r.is_planted, p.doc_id
  FROM planted p JOIN reg r ON contains(p.text, r.canary)
),
per AS (
  SELECT r.cid, r.is_planted, h.n_hits, h.found_doc
  FROM reg r LEFT JOIN (
    SELECT cid, count(*)::BIGINT AS n_hits, CAST(min(doc_id) AS BIGINT) AS found_doc
    FROM hits GROUP BY cid
  ) h ON r.cid = h.cid
)
SELECT is_planted, count(*)::BIGINT AS n_canaries,
       CAST(sum(CASE WHEN n_hits > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_found,
       CAST(coalesce(sum(n_hits), 0) AS BIGINT) AS total_hits,
       CAST(sum(CASE WHEN n_hits > 0 AND cid = found_doc THEN 1 ELSE 0 END) AS BIGINT) AS found_in_expected_doc
FROM per GROUP BY is_planted
"""

QUERIES["text_canary_scan"] = text_canary_scan
ORACLES["text_canary_scan"] = CANARY_SQL


# --- PII residual audit (second-pass scan AFTER scrubbing) ---------------------
#
# The audit a privacy pipeline runs after its scrubber: re-scan the
# SCRUBBED text with (a) the scrubber's own strict patterns — any hit
# is a scrubber regression, must be 0 — and (b) a LOOSER family the
# strict pass does not cover (obfuscated "user at host dot com"
# emails, SSN-shaped triples, dotted-quad IPs), planted so residual
# risk is real and per-class counts vary by document.  The weighted
# risk score is what a release gate thresholds on.
#
# Scale: pure per-row regexp_count projections over one scan — zero
# shuffle, zero Python, scan-rate.

OBF_EMAIL_RE = r"\b[a-z0-9]+ at [a-z]+ dot (com|org)\b"
SSN_RE = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
IP_RE = r"\b10\.[0-9]+\.[0-9]+\.[0-9]+\b"


def _planted_residuals(docs: DataFrame) -> DataFrame:
    """Scrubber-covered PII (email/url/phone) PLUS looser-family plants
    the strict patterns miss."""
    did = F.col("doc_id").cast("string")
    obf = F.when(
        F.col("doc_id") % 4 == 1,
        F.concat(F.lit(" contact user"), did, F.lit(" at example dot com")),
    ).otherwise(F.lit(""))
    ssn = F.when(
        F.col("doc_id") % 6 == 2,
        F.concat(F.lit(" ssn 123-45-"), F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0")),
    ).otherwise(F.lit(""))
    ip = F.when(
        F.col("doc_id") % 5 == 3,
        F.concat(
            F.lit(" ip 10.0."),
            (F.col("doc_id") % 256).cast("string"),
            F.lit("."),
            (F.col("doc_id") % 100).cast("string"),
        ),
    ).otherwise(F.lit(""))
    return docs.select(
        "doc_id",
        F.concat(
            F.lit("From user"), did, F.lit("@example.com visit https://docs.example/"),
            did, obf, ssn, ip, F.lit(" . "), F.col("text"),
        ).alias("content"),
    )


def privacy_pii_residual_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    c = F.col("content")
    scrubbed = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(c, URL_RE, "<URL>"), EMAIL_RE, "<EMAIL>"),
        PHONE_RE,
        "<PHONE>",
    )
    s = _planted_residuals(docs).select("doc_id", scrubbed.alias("s"))
    n = lambda pat: F.size(F.regexp_extract_all(F.col("s"), F.lit(pat), F.lit(0)))  # noqa: E731
    strict = (n(EMAIL_RE) + n(URL_RE) + n(PHONE_RE)).cast("bigint")
    obf, ssn, ip = n(OBF_EMAIL_RE).cast("bigint"), n(SSN_RE).cast("bigint"), n(IP_RE).cast("bigint")
    risk = strict * 10 + obf * 3 + ssn * 5 + ip * 1
    return s.select(
        "doc_id",
        strict.alias("strict_residual"),
        obf.alias("n_obfuscated_emails"),
        ssn.alias("n_ssn"),
        ip.alias("n_ip_addrs"),
        risk.alias("risk_score"),
        (risk == 0).cast("int").cast("bigint").alias("audit_pass"),
    )


PII_RESIDUAL_SQL = f"""
WITH planted AS (
  SELECT doc_id,
         'From user' || CAST(doc_id AS VARCHAR) || '@example.com visit https://docs.example/'
           || CAST(doc_id AS VARCHAR)
           || CASE WHEN doc_id % 4 = 1
                   THEN ' contact user' || CAST(doc_id AS VARCHAR) || ' at example dot com'
                   ELSE '' END
           || CASE WHEN doc_id % 6 = 2
                   THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                   ELSE '' END
           || CASE WHEN doc_id % 5 = 3
                   THEN ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 100 AS VARCHAR)
                   ELSE '' END
           || ' . ' || text AS content
  FROM documents
),
s AS (
  SELECT doc_id,
         regexp_replace(regexp_replace(regexp_replace(content,
             '{URL_RE}', '<URL>', 'g'),
             '{EMAIL_RE}', '<EMAIL>', 'g'),
             '{PHONE_RE}', '<PHONE>', 'g') AS s
  FROM planted
),
counted AS (
  SELECT doc_id,
         len(regexp_extract_all(s, '{EMAIL_RE}'))
           + len(regexp_extract_all(s, '{URL_RE}'))
           + len(regexp_extract_all(s, '{PHONE_RE}')) AS strict_residual,
         len(regexp_extract_all(s, '{OBF_EMAIL_RE}')) AS n_obf,
         len(regexp_extract_all(s, '{SSN_RE}')) AS n_ssn,
         len(regexp_extract_all(s, '{IP_RE}')) AS n_ip
  FROM s
)
SELECT doc_id,
       CAST(strict_residual AS BIGINT) AS strict_residual,
       CAST(n_obf AS BIGINT) AS n_obfuscated_emails,
       CAST(n_ssn AS BIGINT) AS n_ssn,
       CAST(n_ip AS BIGINT) AS n_ip_addrs,
       CAST(strict_residual * 10 + n_obf * 3 + n_ssn * 5 + n_ip AS BIGINT) AS risk_score,
       CAST(CASE WHEN strict_residual * 10 + n_obf * 3 + n_ssn * 5 + n_ip = 0
                 THEN 1 ELSE 0 END AS BIGINT) AS audit_pass
FROM counted
"""

QUERIES["privacy_pii_residual_audit"] = privacy_pii_residual_audit
ORACLES["privacy_pii_residual_audit"] = PII_RESIDUAL_SQL
