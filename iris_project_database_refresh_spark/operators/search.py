"""Retrieval operators: BM25 lexical ranking and reciprocal-rank-fusion
hybrid search.

The reference IS a retrieval system — a lexical catalog search
(``catalog search/stage*``) beside an embedding semantic search
(``semantic search/stage_04`` + pgvector ``<=>`` ordering). These two
operators complete that pair as engine primitives:

* `bm25_search` — Okapi BM25 (k1=1.2, b=0.75, Lucene's non-negative
  idf) for a fixed conjunctive term query. Shape: per-doc term
  frequencies are pure array expressions over the tokenized text (NO
  explode, NO shuffle — a 3-term query needs 3 ``size(filter(...))``
  counters per row); corpus statistics (N, avg length, per-term df)
  collapse to ONE 1-row aggregate that rejoins as a lazy broadcast
  cross join (the q11 pattern); top-k is orderBy+limit, which compiles
  to TakeOrderedAndProject (per-partition partial top-k, no global
  sort). The narrow per-doc projection is pinned so its two consumers
  (stats, scoring) tokenize the corpus once.
* `hybrid_search_rrf` — reciprocal rank fusion of the BM25 ranking
  with an embedding-cosine ranking against a fixed query vector
  (vec 0, broadcast), ``score = sum 1/(60 + rank)`` over the rankers
  that retrieved the doc (standard RRF; absent rank contributes 0 via
  the full-outer join). Ranks come from row_number over each ranker's
  ROUNDED score with an id tie-break, so both engines derive identical
  orderings. The rank windows are global but run over the bounded
  per-ranker candidate sets (top-100 each), never the corpus; at
  100 TB the candidate cut itself is the WindowGroupLimit partial
  top-k pattern used by knn_brute_force.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .embeddings import _as_double, _dot

QUERY_TERMS = ["hash", "join", "stream"]
BM25_K1 = 1.2
BM25_B = 0.75
TOP_K = 20
RRF_K = 60
CANDIDATES = 100


def _is_term(term: str):
    return lambda t: t == F.lit(term)


def _bm25_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    per_doc = docs.select(
        "doc_id",
        F.size(toks).alias("len_d"),
        *[
            # single-arg closure: a 2-arg lambda would be read by
            # F.filter as (element, index) and compare tokens to ints
            F.size(F.filter(toks, _is_term(term))).alias(f"tf_{i}")
            for i, term in enumerate(QUERY_TERMS)
        ],
    ).localCheckpoint(eager=False)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("len_d").alias("avg_len"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(QUERY_TERMS))
        ],
    )
    terms = [
        F.log(
            (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5) + 1.0
        )
        * (F.col(f"tf_{i}") * (BM25_K1 + 1))
        / (
            F.col(f"tf_{i}")
            + BM25_K1 * (1 - BM25_B + BM25_B * F.col("len_d") / F.col("avg_len"))
        )
        for i in range(len(QUERY_TERMS))
    ]
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .select("doc_id", F.round(sum(terms[1:], terms[0]), 6).alias("score"))
        .where(F.col("score") > 0)
    )


def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(TOP_K)
    )


_TF_SQL = ", ".join(
    f"len(list_filter(toks, t -> t = '{term}')) AS tf_{i}"
    for i, term in enumerate(QUERY_TERMS)
)
# every constant is anchored to DOUBLE so DuckDB's DECIMAL literal
# arithmetic can't diverge from Spark's pure-double evaluation
_SCORE_SQL = " + ".join(
    f"ln((n_docs - df_{i} + 0.5::DOUBLE) / (df_{i} + 0.5::DOUBLE) + 1.0)"
    f" * (tf_{i} * ({BM25_K1}::DOUBLE + 1))"
    f" / (tf_{i} + {BM25_K1}::DOUBLE * (1 - {BM25_B}::DOUBLE + {BM25_B}::DOUBLE * len_d / avg_len))"
    for i in range(len(QUERY_TERMS))
)
_DF_SQL = ", ".join(
    f"CAST(sum(CASE WHEN tf_{i} > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS df_{i}"
    for i in range(len(QUERY_TERMS))
)
_BM25_SCORED_SQL = f"""
WITH per_doc AS (
  SELECT doc_id, len(toks) AS len_d, {_TF_SQL}
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents)
),
stats AS (
  SELECT count(*) AS n_docs, avg(len_d) AS avg_len, {_DF_SQL} FROM per_doc
),
scored AS (
  SELECT doc_id, round({_SCORE_SQL}, 6) AS score
  FROM per_doc CROSS JOIN stats
)
SELECT doc_id, score FROM scored WHERE score > 0
"""

BM25_SQL = f"""
WITH base AS ({_BM25_SCORED_SQL})
SELECT doc_id, score FROM base ORDER BY score DESC, doc_id LIMIT {TOP_K}
"""


def hybrid_search_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    wa = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (
        _bm25_scored(spark, sf_dir)
        .select("doc_id", F.row_number().over(wa).alias("rank_lex"))
        .where(F.col("rank_lex") <= CANDIDATES)
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.sqrt(_dot(F.col("v"), F.col("v"))).alias("qn")
    )
    cos = emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(
            _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.sqrt(_dot(F.col("v"), F.col("v")))),
            6,
        ).alias("cosine"),
    )
    wb = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    sem = (
        cos.select("doc_id", F.row_number().over(wb).alias("rank_sem"))
        .where(F.col("rank_sem") <= CANDIDATES)
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_sem",
        F.round(
            F.coalesce(1.0 / (RRF_K + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (RRF_K + F.col("rank_sem")), F.lit(0.0)),
            6,
        ).alias("rrf_score"),
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(TOP_K)


HYBRID_SQL = f"""
WITH scored AS ({_BM25_SCORED_SQL}),
lex AS (
  SELECT doc_id, rank_lex FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_lex FROM scored
  ) WHERE rank_lex <= {CANDIDATES}
),
emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv, sqrt(list_dot_product(v, v)) AS qn FROM emb WHERE vec_id = 0),
cos AS (
  SELECT vec_id AS doc_id,
         round(list_dot_product(qv, v) / (qn * sqrt(list_dot_product(v, v))), 6) AS cosine
  FROM emb CROSS JOIN q
),
sem AS (
  SELECT doc_id, rank_sem FROM (
    SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS rank_sem FROM cos
  ) WHERE rank_sem <= {CANDIDATES}
)
SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
       rank_lex, rank_sem,
       round(coalesce(1.0::DOUBLE / ({RRF_K} + rank_lex), 0.0)
             + coalesce(1.0::DOUBLE / ({RRF_K} + rank_sem), 0.0), 6) AS rrf_score
FROM lex FULL OUTER JOIN sem USING (doc_id)
ORDER BY rrf_score DESC, doc_id LIMIT {TOP_K}
"""


QUERIES = {
    "bm25_search": bm25_search,
    "hybrid_search_rrf": hybrid_search_rrf,
}

ORACLES = {
    "bm25_search": BM25_SQL,
    "hybrid_search_rrf": HYBRID_SQL,
}


# --- bm25_prf_search — pseudo-relevance-feedback expansion --------------------
#
# Rocchio-style PRF (classic public IR): run the base BM25 query, take
# the top FB_DOCS results as pseudo-relevant, mine the EXP_TERMS most
# frequent non-stopword/non-query terms from them, and re-rank with
# the expanded query (expansion terms down-weighted by EXP_WEIGHT).
# The catalog-search flow a retrieval deployment actually ships when
# recall matters.
#
# Determinism device: the expansion is pivoted to a ONE-ROW broadcast
# (term1, term2 columns), so the re-scoring stays a fixed expression
# tree — no data-dependent float summation order for engines to
# disagree on. Ranks/selection use rounded scores with id/term
# tie-breaks throughout.
#
# Scale: feedback mining explodes tokens of FB_DOCS documents only
# (bounded); the re-rank is one more narrow pass over the corpus with
# two size(filter()) counters + the same 1-row stats broadcast as the
# base ranking; top-k is TakeOrderedAndProject.

FB_DOCS = 5
EXP_TERMS = 2
EXP_WEIGHT = 0.5

from .textqc import STOPWORDS as _STOPWORDS  # noqa: E402


def bm25_prf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = _bm25_scored(spark, sf_dir).localCheckpoint(eager=False)
    fb = base.orderBy(F.desc("score"), F.asc("doc_id")).limit(FB_DOCS)

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    banned = list(_STOPWORDS["en"]) + QUERY_TERMS
    fb_terms = (
        docs.join(fb.select("doc_id"), "doc_id")
        .select(F.explode(toks).alias("term"))
        .where(~F.col("term").isin(*banned))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("term"))
        .limit(EXP_TERMS)
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("term"))
    exp_row = (
        fb_terms.withColumn("r", F.row_number().over(w))
        .groupBy()
        .agg(
            F.max(F.when(F.col("r") == 1, F.col("term"))).alias("term1"),
            F.max(F.when(F.col("r") == 2, F.col("term"))).alias("term2"),
        )
    )

    per_doc = docs.crossJoin(F.broadcast(exp_row)).select(
        "doc_id",
        F.size(toks).alias("len_d"),
        F.size(F.filter(toks, lambda t: t == F.col("term1"))).alias("etf_1"),
        F.size(F.filter(toks, lambda t: t == F.col("term2"))).alias("etf_2"),
    ).localCheckpoint(eager=False)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("len_d").alias("avg_len"),
        F.sum((F.col("etf_1") > 0).cast("long")).cast("double").alias("edf_1"),
        F.sum((F.col("etf_2") > 0).cast("long")).cast("double").alias("edf_2"),
    )

    def bm25_term(tf, df):
        return (
            F.log((F.col("n_docs") - df + 0.5) / (df + 0.5) + 1.0)
            * (tf * (BM25_K1 + 1))
            / (tf + BM25_K1 * (1 - BM25_B + BM25_B * F.col("len_d") / F.col("avg_len")))
        )

    exp_score = (
        per_doc.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            F.round(
                bm25_term(F.col("etf_1"), F.col("edf_1"))
                + bm25_term(F.col("etf_2"), F.col("edf_2")),
                6,
            ).alias("exp_score"),
        )
    )
    final = (
        base.join(exp_score, "doc_id", "full")
        .select(
            "doc_id",
            F.round(
                F.coalesce("score", F.lit(0.0)) + EXP_WEIGHT * F.coalesce("exp_score", F.lit(0.0)),
                6,
            ).alias("score"),
        )
        .where(F.col("score") > 0)
    )
    return final.orderBy(F.desc("score"), F.asc("doc_id")).limit(TOP_K)


_BANNED_SQL = ", ".join(f"'{t}'" for t in sorted(set(list(_STOPWORDS["en"]) + QUERY_TERMS)))

BM25_PRF_SQL = f"""
WITH base AS ({_BM25_SCORED_SQL}),
fb AS (SELECT doc_id FROM base ORDER BY score DESC, doc_id LIMIT {FB_DOCS}),
fb_terms AS (
  SELECT term, count(*) AS cnt
  FROM (SELECT unnest(list_filter(string_split_regex(d.text, '\\s+'), t -> t <> '')) AS term
        FROM documents d JOIN fb USING (doc_id))
  WHERE term NOT IN ({_BANNED_SQL})
  GROUP BY term
  ORDER BY cnt DESC, term ASC
  LIMIT {EXP_TERMS}
),
exp_row AS (
  SELECT max(CASE WHEN r = 1 THEN term END) AS term1,
         max(CASE WHEN r = 2 THEN term END) AS term2
  FROM (SELECT term, row_number() OVER (ORDER BY cnt DESC, term ASC) AS r FROM fb_terms)
),
per_doc AS (
  SELECT doc_id, len(toks) AS len_d,
         len(list_filter(toks, t -> t = term1)) AS etf_1,
         len(list_filter(toks, t -> t = term2)) AS etf_2
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents), exp_row
),
stats AS (
  SELECT count(*) AS n_docs, avg(len_d) AS avg_len,
         CAST(sum(CASE WHEN etf_1 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS edf_1,
         CAST(sum(CASE WHEN etf_2 > 0 THEN 1 ELSE 0 END) AS DOUBLE) AS edf_2
  FROM per_doc
),
exp_score AS (
  SELECT doc_id,
         round(
           ln((n_docs - edf_1 + 0.5::DOUBLE) / (edf_1 + 0.5::DOUBLE) + 1.0)
             * (etf_1 * ({BM25_K1}::DOUBLE + 1))
             / (etf_1 + {BM25_K1}::DOUBLE * (1 - {BM25_B}::DOUBLE + {BM25_B}::DOUBLE * len_d / avg_len))
         + ln((n_docs - edf_2 + 0.5::DOUBLE) / (edf_2 + 0.5::DOUBLE) + 1.0)
             * (etf_2 * ({BM25_K1}::DOUBLE + 1))
             / (etf_2 + {BM25_K1}::DOUBLE * (1 - {BM25_B}::DOUBLE + {BM25_B}::DOUBLE * len_d / avg_len)),
         6) AS exp_score
  FROM per_doc CROSS JOIN stats
),
final AS (
  SELECT coalesce(b.doc_id, e.doc_id) AS doc_id,
         round(coalesce(b.score, 0) + {EXP_WEIGHT}::DOUBLE * coalesce(e.exp_score, 0), 6) AS score
  FROM base b FULL OUTER JOIN exp_score e ON b.doc_id = e.doc_id
)
SELECT doc_id, score FROM final WHERE score > 0
ORDER BY score DESC, doc_id LIMIT {TOP_K}
"""

QUERIES["bm25_prf_search"] = bm25_prf_search
ORACLES["bm25_prf_search"] = BM25_PRF_SQL


# --- multi-query retrieval evaluation (MRR) ----------------------------------
#
# The measurement harness for the retrieval family (recall-harness
# pattern: ann_recall_eval / dedup_recall_eval / matryoshka_recall):
# self-retrieval MRR. Each planted query takes its terms from one
# document (its MRR_TERMS lexicographically-smallest distinct tokens (order-free: DuckDB's list_distinct does not preserve occurrence order)), so that document is
# the known-relevant answer; the reciprocal rank of the source doc
# under BM25 measures ranking quality end-to-end. Unlike the
# fixed-query operators above (per-row array counters), this is the
# GENERIC inverted-index BM25: tokens explode once to a postings
# table, query terms broadcast, per-(query, doc) scores from one
# postings⋈terms join — the multi-tenant shape a search service runs.
# Ranks use rounded scores + doc_id tie-breaks (engine-equal); the
# per-query rank windows run over matched candidates only, and at
# 100 TB the candidate cut is the WindowGroupLimit partial top-k
# pattern (knn_brute_force note).

MRR_QUERIES = 8   # query_id < 8: query terms come from that doc
MRR_TERMS = 3


def bm25_self_retrieval_mrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    base = docs.select("doc_id", toks.alias("toks")).localCheckpoint(eager=False)
    postings = (
        base.select("doc_id", F.size("toks").alias("len_d"), F.explode("toks").alias("term"))
        .groupBy("doc_id", "len_d", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = postings.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("toks")).alias("avg_len")
    )
    qterms = (
        base.where(F.col("doc_id") < MRR_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice(F.array_sort(F.array_distinct("toks")), 1, MRR_TERMS)).alias("term"),
        )
        .distinct()
    )
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.sum(
                    F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
                    * (F.col("tf") * (BM25_K1 + 1))
                    / (
                        F.col("tf")
                        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("len_d") / F.col("avg_len"))
                    )
                ),
                6,
            ).alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    ranked = scored.withColumn("rank", F.row_number().over(w))
    per_q = ranked.groupBy("query_id").agg(F.count(F.lit(1)).alias("n_candidates"))
    self_rank = ranked.where(F.col("doc_id") == F.col("query_id")).select(
        "query_id", F.col("rank").cast("bigint").alias("self_rank")
    )
    return per_q.join(self_rank, "query_id").select(
        "query_id",
        "n_candidates",
        "self_rank",
        F.expr("cast(10000 div self_rank as bigint)").alias("reciprocal_rank_bp"),
    )


BM25_MRR_SQL = f"""
WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
), postings AS (
  SELECT doc_id, len_d, term, count(*) AS tf
  FROM (SELECT doc_id, len(toks) AS len_d, unnest(toks) AS term FROM base)
  GROUP BY doc_id, len_d, term
), df_t AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY term
), stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avg_len FROM base
), qterms AS (
  SELECT DISTINCT doc_id AS query_id, unnest(list_sort(list_distinct(toks))[1:{MRR_TERMS}]) AS term
  FROM base WHERE doc_id < {MRR_QUERIES}
), scored AS (
  SELECT query_id, p.doc_id,
         round(sum(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * ({BM25_K1} + 1))
           / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * len_d / avg_len))
         ), 6) AS score
  FROM postings p JOIN qterms q USING (term) JOIN df_t USING (term), stats
  GROUP BY query_id, p.doc_id
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT q.query_id,
       (SELECT count(*) FROM ranked r2 WHERE r2.query_id = q.query_id) AS n_candidates,
       CAST(q.rank AS BIGINT) AS self_rank,
       CAST(10000 // q.rank AS BIGINT) AS reciprocal_rank_bp
FROM ranked q WHERE q.doc_id = q.query_id
"""

QUERIES["bm25_self_retrieval_mrr"] = bm25_self_retrieval_mrr
ORACLES["bm25_self_retrieval_mrr"] = BM25_MRR_SQL


# --- trigram fuzzy search ------------------------------------------------------
#
# The typo-tolerant lookup next to `fuzzy_match_names`' edit-distance
# pass (reference parity: stage4's filename fuzzy-matching problem,
# solved the way search engines do it — pg_trgm / Lucene fuzzy):
# character-trigram Jaccard between planted misspelled queries (every
# 97th part name with its 3rd character dropped) and the part-name
# corpus. Shape: query trigram sets explode into an inverted-index
# probe (join keyed on the trigram, AQE-covered), shared-trigram
# counts per (query, part) bound the candidate set, exact Jaccard
# ranks top-3 per query via a window over those bounded candidates —
# the corpus is never cross-joined. Trigram sets are order-free
# (array_distinct / list_distinct order divergence can't matter: only
# membership and cardinality are used).

TRGM_TOP = 3


def trigram_fuzzy_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = load_table(spark, sf_dir, "part").select(
        "p_partkey", F.lower("p_name").alias("lower_name")
    )
    tg = F.array_distinct(
        F.expr(
            "CASE WHEN length(lower_name) < 3 THEN array() "
            "ELSE transform(sequence(1, length(lower_name) - 2), i -> substring(lower_name, i, 3)) END"
        )
    )
    corpus = parts.select("p_partkey", tg.alias("tgs")).select(
        "p_partkey", F.size("tgs").alias("n_b"), F.explode("tgs").alias("tg")
    )
    queries = (
        parts.where(F.col("p_partkey") % 97 == 0)
        .select(
            F.col("p_partkey").alias("query_id"),
            # planted typo: drop the 3rd character
            F.concat(
                F.substring("lower_name", 1, 2), F.expr("substring(lower_name, 4)")
            ).alias("lower_name"),
        )
        .select("query_id", tg.alias("tgs"))
        .select("query_id", F.size("tgs").alias("n_a"), F.explode("tgs").alias("tg"))
    )
    shared = (
        corpus.join(F.broadcast(queries), "tg")
        .groupBy("query_id", "n_a", "p_partkey", "n_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    scored = shared.select(
        "query_id",
        "p_partkey",
        "shared",
        F.round(
            F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")), 6
        ).alias("jaccard"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("jaccard"), "p_partkey")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= TRGM_TOP)
        .select("query_id", "rank", "p_partkey", "shared", "jaccard")
    )


TRIGRAM_SEARCH_SQL = f"""
WITH parts AS (
  SELECT p_partkey, lower(p_name) AS nm FROM part
), corpus AS (
  SELECT p_partkey, len(tgs) AS n_b, unnest(tgs) AS tg
  FROM (SELECT p_partkey, list_distinct(CASE WHEN length(nm) < 3 THEN []
          ELSE list_transform(generate_series(1, length(nm) - 2), i -> substr(nm, i, 3)) END) AS tgs
        FROM parts)
), queries AS (
  SELECT query_id, len(tgs) AS n_a, unnest(tgs) AS tg
  FROM (SELECT p_partkey AS query_id,
               list_distinct(CASE WHEN length(q) < 3 THEN []
                 ELSE list_transform(generate_series(1, length(q) - 2), i -> substr(q, i, 3)) END) AS tgs
        FROM (SELECT p_partkey, substr(nm, 1, 2) || substr(nm, 4) AS q
              FROM parts WHERE p_partkey % 97 = 0))
), shared AS (
  SELECT q.query_id, q.n_a, c.p_partkey, c.n_b, count(*) AS shared
  FROM corpus c JOIN queries q ON c.tg = q.tg
  GROUP BY 1, 2, 3, 4
), scored AS (
  SELECT query_id, p_partkey, CAST(shared AS BIGINT) AS shared,
         round(shared / CAST(n_a + n_b - shared AS DOUBLE), 6) AS jaccard
  FROM shared
)
SELECT query_id, rank, p_partkey, shared, jaccard FROM (
  SELECT *, CAST(row_number() OVER (PARTITION BY query_id
             ORDER BY jaccard DESC, p_partkey) AS BIGINT) AS rank
  FROM scored
) WHERE rank <= {TRGM_TOP}
"""

QUERIES["trigram_fuzzy_search"] = trigram_fuzzy_search
ORACLES["trigram_fuzzy_search"] = TRIGRAM_SEARCH_SQL


# --- RAG context packing ------------------------------------------------------
#
# The reference's serving path ends with "take the top retrieved
# chunks and fit them into the model's context window" (the retrieval
# -> prompt assembly step between `semantic search/stage_04`'s index
# and the chat model).  This operator is that step as a graded query:
# BM25 top-100 candidates in rank order, greedy-with-skip packing
# under a CONTEXT_BUDGET token budget with a fixed per-chunk
# separator overhead — a chunk that does not fit is skipped and
# packing continues (the standard context assembler), so budget
# utilization stays high even when a long chunk sits at rank 2.
#
# Scale design: the corpus-sized work is the production BM25 pipeline
# + one TakeOrderedAndProject top-100 cut; the fold runs over the
# bounded 100-struct candidate list (pack_best_fit's bounded-shelf
# class).  Rank = position in the (-score, doc_id) sorted list, so no
# window at all.  Oracle: same fold as a recursive CTE.

CONTEXT_BUDGET = 400
SEP_TOKENS = 8


def rag_context_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    lens = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("ntok"),
    )
    cands = (
        _bm25_scored(spark, sf_dir)
        .join(lens, "doc_id")
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(CANDIDATES)
    )
    packed = cands.agg(
        F.sort_array(
            F.collect_list(F.struct((-F.col("score")).alias("negs"), "doc_id", "score", "ntok"))
        ).alias("arr")
    ).select(
        "arr",
        F.expr(
            f"""
            aggregate(arr,
              named_struct('used', cast(0 as bigint),
                           'flags', slice(array(cast(0 as bigint)), 1, 0)),
              (acc, d) -> IF(acc.used + d.ntok + {SEP_TOKENS} <= {CONTEXT_BUDGET},
                named_struct('used', acc.used + d.ntok + {SEP_TOKENS},
                             'flags', acc.flags || array(acc.used + d.ntok + {SEP_TOKENS})),
                named_struct('used', acc.used,
                             'flags', acc.flags || array(cast(-1 as bigint)))))
            """
        ).alias("st"),
    )
    rows = packed.select(
        F.posexplode(F.arrays_zip(F.col("arr"), F.col("st.flags"))).alias("pos", "z")
    ).where(F.col("z.flags") >= 0)
    w = Window.orderBy("pos")
    return rows.select(
        F.row_number().over(w).cast("bigint").alias("ctx_rank"),
        (F.col("pos") + 1).cast("bigint").alias("bm25_rank"),
        F.col("z.arr.doc_id").alias("doc_id"),
        F.col("z.arr.score").alias("score"),
        F.col("z.arr.ntok").cast("bigint").alias("n_tokens"),
        F.col("z.flags").alias("cum_tokens"),
        (F.lit(CONTEXT_BUDGET) - F.col("z.flags")).cast("bigint").alias("budget_left"),
    )


RAG_PACK_SQL = f"""
WITH RECURSIVE scored AS ({_BM25_SCORED_SQL}),
lens AS (
  SELECT doc_id, len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS ntok
  FROM documents
),
cands AS (
  SELECT s.doc_id, s.score, l.ntok
  FROM scored s JOIN lens l USING (doc_id)
  ORDER BY s.score DESC, s.doc_id LIMIT {CANDIDATES}
),
arr AS (
  SELECT list_sort(list(struct_pack(negs := -score, doc_id := doc_id,
                                    score := score, ntok := ntok))) AS a,
         count(*)::BIGINT AS n
  FROM cands
),
walk AS (
  SELECT a, n, 0::BIGINT AS i, 0::BIGINT AS used, 0::BIGINT AS cum FROM arr
  UNION ALL
  SELECT a, n, i + 1,
         CASE WHEN used + a[(i + 1)::INT].ntok + {SEP_TOKENS} <= {CONTEXT_BUDGET}
              THEN used + a[(i + 1)::INT].ntok + {SEP_TOKENS} ELSE used END,
         CASE WHEN used + a[(i + 1)::INT].ntok + {SEP_TOKENS} <= {CONTEXT_BUDGET}
              THEN used + a[(i + 1)::INT].ntok + {SEP_TOKENS} ELSE -1 END
  FROM walk WHERE i < n
),
picked AS (
  SELECT i AS bm25_rank, a[i::INT].doc_id AS doc_id, a[i::INT].score AS score,
         a[i::INT].ntok AS n_tokens, cum
  FROM walk WHERE i >= 1 AND cum >= 0
)
SELECT CAST(row_number() OVER (ORDER BY bm25_rank) AS BIGINT) AS ctx_rank,
       CAST(bm25_rank AS BIGINT) AS bm25_rank,
       doc_id, score,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum AS BIGINT) AS cum_tokens,
       CAST({CONTEXT_BUDGET} - cum AS BIGINT) AS budget_left
FROM picked
"""

QUERIES["rag_context_pack"] = rag_context_pack
ORACLES["rag_context_pack"] = RAG_PACK_SQL


# --- corpus-derived stopword discovery ---------------------------------------
#
# Where a stopword list actually comes from (Luhn / Zipf practice —
# the hand lists in textqc.STOPWORDS are someone else's corpus
# statistics): tokens whose document frequency crosses DF_STOP_BP of
# the corpus carry little discrimination power (idf ~ 0) and BM25 /
# tfidf pipelines prune them at index-build time.  Emits the
# candidate list with df share, corpus tf mass share, and the exact
# integer idf-milli the scorer would assign — the artifact the
# inverted-index builder consumes.
#
# Plan: one (token, doc) distinct + one token aggregation (map-side
# combine) against 1-row corpus totals; candidates are the Zipf head,
# so the output is bounded by construction.

DF_STOP_BP = 6000  # in >= 60% of documents -> stopword candidate


def stopword_discovery(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    tok_doc = docs.select("doc_id", F.explode(toks).alias("tok"))
    df_counts = tok_doc.distinct().groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    tf_counts = tok_doc.groupBy("tok").agg(F.count(F.lit(1)).alias("tf"))
    totals = docs.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        tok_doc.agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    return (
        df_counts.join(tf_counts, "tok")
        .crossJoin(F.broadcast(totals))
        .where(F.expr(f"df * 10000 div n_docs >= {DF_STOP_BP}"))
        .select(
            "tok",
            F.col("df").cast("bigint").alias("df"),
            F.expr("cast(df * 10000 div n_docs as bigint)").alias("df_bp"),
            F.expr("cast(tf * 10000 div n_tokens as bigint)").alias("tf_mass_bp"),
            F.expr(
                "cast(floor(ln(cast(n_docs as double) / df) * 1000) as bigint)"
            ).alias("idf_milli"),
        )
    )


STOPWORD_SQL = f"""
WITH tok_doc AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
  FROM documents
),
df_counts AS (
  SELECT tok, count(*)::BIGINT AS df FROM (SELECT DISTINCT doc_id, tok FROM tok_doc) GROUP BY tok
),
tf_counts AS (SELECT tok, count(*)::BIGINT AS tf FROM tok_doc GROUP BY tok),
totals AS (
  SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
         (SELECT count(*) FROM tok_doc)::BIGINT AS n_tokens
)
SELECT tok, df,
       CAST(df * 10000 // n_docs AS BIGINT) AS df_bp,
       CAST(tf * 10000 // n_tokens AS BIGINT) AS tf_mass_bp,
       CAST(floor(ln(CAST(n_docs AS DOUBLE) / df) * 1000) AS BIGINT) AS idf_milli
FROM df_counts JOIN tf_counts USING (tok), totals
WHERE df * 10000 // n_docs >= {DF_STOP_BP}
"""

QUERIES["stopword_discovery"] = stopword_discovery
ORACLES["stopword_discovery"] = STOPWORD_SQL


# --- nDCG@10 retrieval-quality eval -------------------------------------------
#
# The graded-relevance metric next to bm25_self_retrieval_mrr's
# binary one (public IR art: Järvelin & Kekäläinen 2002): ground
# truth per (query, doc) is the GRADED count of query terms the doc
# contains (0..MRR_TERMS — deterministic, no judgments needed), gain
# is 2^rel − 1, and the rank discounts 1/log2(r+1) are the 10
# PUBLISHED constants hard-coded in micro units in BOTH engines (the
# Benford device — no runtime log2), so DCG/IDCG are exact integer
# sums and nDCG lands in bp via integer division.  IDCG re-ranks the
# SAME candidate set by grade (ties to doc_id), the standard
# per-query ideal.
#
# Scale: rides the production BM25 postings/qterms pipeline —
# broadcast query terms, one (query, doc) agg; ranking windows are
# per-query (8 queries × bounded candidates), cut at K before the
# gain math.

NDCG_K = 10
# round(1e6 / log2(r+1)) for r = 1..10
NDCG_DISC_MICRO = (1000000, 630930, 500000, 430677, 386853,
                   356207, 333333, 315465, 301030, 289065)


def bm25_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    base = docs.select("doc_id", toks.alias("toks")).localCheckpoint(eager=False)
    postings = (
        base.select("doc_id", F.size("toks").alias("len_d"), F.explode("toks").alias("term"))
        .groupBy("doc_id", "len_d", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = postings.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    stats = base.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg(F.size("toks")).alias("avg_len")
    )
    qterms = (
        base.where(F.col("doc_id") < MRR_QUERIES)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.slice(F.array_sort(F.array_distinct("toks")), 1, MRR_TERMS)).alias("term"),
        )
        .distinct()
    )
    scored = (
        postings.join(F.broadcast(qterms), "term")
        .join(F.broadcast(df_t), "term")
        .crossJoin(F.broadcast(stats))
        .groupBy("query_id", "doc_id")
        .agg(
            F.round(
                F.sum(
                    F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
                    * (F.col("tf") * (BM25_K1 + 1))
                    / (
                        F.col("tf")
                        + BM25_K1 * (1 - BM25_B + BM25_B * F.col("len_d") / F.col("avg_len"))
                    )
                ),
                6,
            ).alias("score"),
            F.count(F.lit(1)).cast("bigint").alias("rel"),
        )
    )
    disc = "array({})".format(", ".join(str(v) for v in NDCG_DISC_MICRO))
    ranked = scored.select(
        "query_id", "doc_id", "rel",
        F.row_number()
        .over(Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id")))
        .alias("rank"),
        F.row_number()
        .over(Window.partitionBy("query_id").orderBy(F.desc("rel"), F.asc("doc_id")))
        .alias("irank"),
    )
    per_q = ranked.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
        F.expr(
            f"cast(sum(case when rank <= {NDCG_K} then"
            f" (shiftleft(1L, cast(rel as int)) - 1) * element_at({disc}, rank)"
            " else 0 end) as bigint)"
        ).alias("dcg_micro"),
        F.expr(
            f"cast(sum(case when irank <= {NDCG_K} then"
            f" (shiftleft(1L, cast(rel as int)) - 1) * element_at({disc}, irank)"
            " else 0 end) as bigint)"
        ).alias("idcg_micro"),
    )
    return per_q.select(
        "query_id", "n_candidates", "dcg_micro", "idcg_micro",
        F.expr("cast(dcg_micro * 10000 div idcg_micro as bigint)").alias("ndcg_bp"),
    )


_NDCG_DISC_SQL = "[" + ", ".join(str(v) for v in NDCG_DISC_MICRO) + "]"

BM25_NDCG_SQL = f"""
WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
), postings AS (
  SELECT doc_id, len_d, term, count(*) AS tf
  FROM (SELECT doc_id, len(toks) AS len_d, unnest(toks) AS term FROM base)
  GROUP BY doc_id, len_d, term
), df_t AS (
  SELECT term, count(DISTINCT doc_id) AS df FROM postings GROUP BY term
), stats AS (
  SELECT count(*) AS n_docs, avg(len(toks)) AS avg_len FROM base
), qterms AS (
  SELECT DISTINCT doc_id AS query_id, unnest(list_sort(list_distinct(toks))[1:{MRR_TERMS}]) AS term
  FROM base WHERE doc_id < {MRR_QUERIES}
), scored AS (
  SELECT query_id, p.doc_id,
         round(sum(
           ln((n_docs - df + 0.5) / (df + 0.5) + 1.0)
           * (tf * ({BM25_K1} + 1))
           / (tf + {BM25_K1} * (1 - {BM25_B} + {BM25_B} * len_d / avg_len))
         ), 6) AS score,
         count(*)::BIGINT AS rel
  FROM postings p JOIN qterms q USING (term) JOIN df_t USING (term), stats
  GROUP BY query_id, p.doc_id
), ranked AS (
  SELECT query_id, doc_id, rel,
         row_number() OVER (PARTITION BY query_id ORDER BY score DESC, doc_id ASC) AS rank,
         row_number() OVER (PARTITION BY query_id ORDER BY rel DESC, doc_id ASC) AS irank
  FROM scored
), per_q AS (
  SELECT query_id, count(*)::BIGINT AS n_candidates,
         CAST(sum(CASE WHEN rank <= {NDCG_K} THEN
              ((1::BIGINT << CAST(rel AS INT)) - 1) * ({_NDCG_DISC_SQL})[rank]
              ELSE 0 END) AS BIGINT) AS dcg_micro,
         CAST(sum(CASE WHEN irank <= {NDCG_K} THEN
              ((1::BIGINT << CAST(rel AS INT)) - 1) * ({_NDCG_DISC_SQL})[irank]
              ELSE 0 END) AS BIGINT) AS idcg_micro
  FROM ranked GROUP BY query_id
)
SELECT query_id, n_candidates, dcg_micro, idcg_micro,
       CAST(dcg_micro * 10000 // idcg_micro AS BIGINT) AS ndcg_bp
FROM per_q
"""

QUERIES["bm25_ndcg_eval"] = bm25_ndcg_eval
ORACLES["bm25_ndcg_eval"] = BM25_NDCG_SQL


# --- Prefix autocomplete index ------------------------------------------------
#
# The type-ahead artifact a search box needs beside the BM25 index
# (public art: prefix completion tables; the reference's catalog
# search UI is the consumer shape): for every 2-char prefix of the
# corpus vocabulary, the top-AC_TOP completions ranked by corpus
# term frequency (ties to the lexicographically smaller term), with
# the prefix's total mass and the coverage share the shown
# completions capture.
#
# Scale: one token count (the vocab agg every lexical operator
# shares), prefix truncation on the BOUNDED vocab table, per-prefix
# rank window on vocab rows (not corpus rows), TakeOrderedAndProject
# semantics — output bounded by 26² × AC_TOP.

AC_TOP = 3


def prefix_autocomplete(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    vocab = (
        docs.select(F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
        .where(F.length("term") >= 2)
    )
    pre = vocab.select(F.substring("term", 1, 2).alias("prefix"), "term", "tf")
    w = Window.partitionBy("prefix").orderBy(F.desc("tf"), F.asc("term"))
    ranked = pre.withColumn("rank", F.row_number().over(w))
    mass = pre.groupBy("prefix").agg(
        F.sum("tf").cast("bigint").alias("prefix_mass"),
        F.count("*").cast("bigint").alias("n_terms"),
    )
    shown = ranked.where(F.col("rank") <= AC_TOP)
    shown_mass = shown.groupBy("prefix").agg(
        F.sum("tf").cast("bigint").alias("shown_mass")
    )
    return (
        shown.join(mass, "prefix")
        .join(shown_mass, "prefix")
        .select(
            "prefix",
            F.col("rank").cast("bigint").alias("rank"),
            "term", "tf", "n_terms", "prefix_mass",
            F.expr("cast(shown_mass * 10000 div prefix_mass as bigint)").alias(
                "coverage_bp"
            ),
        )
    )


AUTOCOMPLETE_SQL = f"""
WITH vocab AS (
  SELECT term, count(*)::BIGINT AS tf FROM (
    SELECT unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS term
    FROM documents
  ) GROUP BY term HAVING length(term) >= 2
),
pre AS (SELECT substr(term, 1, 2) AS prefix, term, tf FROM vocab),
ranked AS (
  SELECT prefix, term, tf,
         row_number() OVER (PARTITION BY prefix ORDER BY tf DESC, term ASC) AS rank
  FROM pre
),
mass AS (
  SELECT prefix, CAST(sum(tf) AS BIGINT) AS prefix_mass, count(*)::BIGINT AS n_terms
  FROM pre GROUP BY prefix
),
shown AS (SELECT * FROM ranked WHERE rank <= {AC_TOP}),
shown_mass AS (
  SELECT prefix, CAST(sum(tf) AS BIGINT) AS shown_mass FROM shown GROUP BY prefix
)
SELECT s.prefix, CAST(s.rank AS BIGINT) AS rank, s.term, s.tf, m.n_terms, m.prefix_mass,
       CAST(sm.shown_mass * 10000 // m.prefix_mass AS BIGINT) AS coverage_bp
FROM shown s JOIN mass m ON s.prefix = m.prefix JOIN shown_mass sm ON s.prefix = sm.prefix
"""

QUERIES["prefix_autocomplete"] = prefix_autocomplete
ORACLES["prefix_autocomplete"] = AUTOCOMPLETE_SQL


# --- query-likelihood language-model retrieval --------------------------------
#
# The third classical ranking family next to BM25 (probabilistic) and
# cosine (vector): score(q,d) = sum_t ln P(t|d) under Dirichlet
# smoothing (Zhai & Lafferty 2001, mu = 2000) — the ranking an LM-based
# retrieval stack computes.
#
# Determinism device: the smoothed probability is the RATIONAL
# (tf*cf_total + mu*cf_t) / (cf_total*(len_d + mu)) with exact BIGINT
# numerator and denominator, so the score is a SUM OF ln-QUANTIZED
# INTEGERS: q(x) = floor(ln(x)*1e4) of each side, score_q4 =
# sum_t q(num_t) - |q|*q(den) — exact integer output, no float
# summation order anywhere (the zipf_fit ln device).
#
# Scale: identical shape to bm25_search — per-doc tf via
# size(filter(tokens)) (no explode, no shuffle), ONE 1-row corpus-stats
# aggregate rejoined as a broadcast, top-k via orderBy+limit
# (TakeOrderedAndProject).

QL_MU = 2000


def query_likelihood_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    per_doc = docs.select(
        "doc_id",
        F.size(toks).alias("len_d"),
        *[
            F.size(F.filter(toks, _is_term(term))).alias(f"tf_{i}")
            for i, term in enumerate(QUERY_TERMS)
        ],
    ).localCheckpoint(eager=False)
    stats = per_doc.agg(
        F.sum("len_d").alias("cf_total"),
        *[F.sum(f"tf_{i}").alias(f"cf_{i}") for i in range(len(QUERY_TERMS))],
    )
    nterm = len(QUERY_TERMS)
    num_q = " + ".join(
        f"cast(floor(ln(cast(tf_{i} * cf_total + {QL_MU} * cf_{i} as double)) * 10000) as bigint)"
        for i in range(nterm)
    )
    den_q = (
        f"{nterm} * cast(floor(ln(cast(cf_total * (len_d + {QL_MU}) as double)) * 10000) as bigint)"
    )
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .where(F.expr(" + ".join(f"tf_{i}" for i in range(nterm))) > 0)
        .select("doc_id", F.expr(f"({num_q}) - ({den_q})").alias("ql_score_q4"))
        .orderBy(F.desc("ql_score_q4"), F.asc("doc_id"))
        .limit(TOP_K)
    )


_QL_TF = ", ".join(
    f"len(list_filter(toks, t -> t = '{term}')) AS tf_{i}"
    for i, term in enumerate(QUERY_TERMS)
)
_QL_CF = ", ".join(
    f"CAST(sum(tf_{i}) AS BIGINT) AS cf_{i}" for i in range(len(QUERY_TERMS))
)
_QL_NUM = " + ".join(
    f"CAST(floor(ln(CAST(tf_{i} * cf_total + {QL_MU} * cf_{i} AS DOUBLE)) * 10000) AS BIGINT)"
    for i in range(len(QUERY_TERMS))
)
_QL_DEN = (
    f"{len(QUERY_TERMS)} * CAST(floor(ln(CAST(cf_total * (len_d + {QL_MU}) AS DOUBLE)) * 10000) AS BIGINT)"
)

QUERY_LIKELIHOOD_SQL = f"""
WITH per_doc AS (
  SELECT doc_id, len(toks) AS len_d, {_QL_TF}
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents)
),
stats AS (
  SELECT CAST(sum(len_d) AS BIGINT) AS cf_total, {_QL_CF} FROM per_doc
)
SELECT doc_id, ({_QL_NUM}) - ({_QL_DEN}) AS ql_score_q4
FROM per_doc CROSS JOIN stats
WHERE {" + ".join(f"tf_{i}" for i in range(len(QUERY_TERMS)))} > 0
ORDER BY ql_score_q4 DESC, doc_id LIMIT {TOP_K}
"""

QUERIES["query_likelihood_search"] = query_likelihood_search
ORACLES["query_likelihood_search"] = QUERY_LIKELIHOOD_SQL


# --- Borda-count rank fusion ---------------------------------------------------
#
# The positional alternative to hybrid_search_rrf's reciprocal fusion
# (Borda 1781 via the metasearch literature — Aslam & Montague 2001):
# each ranker awards CANDIDATES+1-rank points to its top CANDIDATES,
# fused by integer point sum. Where RRF compresses rank differences
# deep in the list, Borda keeps them linear — the two disagree exactly
# where a ranking analyst wants to compare them.
#
# Shape mirrors hybrid_search_rrf: bounded per-ranker candidate cuts
# (rounded scores, id tie-breaks), full-outer join of two top-100
# lists, pure-integer scoring, top-k limit.

def rank_fusion_borda(spark: SparkSession, sf_dir: str) -> DataFrame:
    wa = Window.orderBy(F.desc("score"), F.asc("doc_id"))
    lex = (
        _bm25_scored(spark, sf_dir)
        .select("doc_id", F.row_number().over(wa).alias("rank_lex"))
        .where(F.col("rank_lex") <= CANDIDATES)
    )
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    q = emb.where(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.sqrt(_dot(F.col("v"), F.col("v"))).alias("qn")
    )
    cos = emb.crossJoin(F.broadcast(q)).select(
        F.col("vec_id").alias("doc_id"),
        F.round(
            _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.sqrt(_dot(F.col("v"), F.col("v")))),
            6,
        ).alias("cosine"),
    )
    wb = Window.orderBy(F.desc("cosine"), F.asc("doc_id"))
    sem = (
        cos.select("doc_id", F.row_number().over(wb).alias("rank_sem"))
        .where(F.col("rank_sem") <= CANDIDATES)
    )
    fused = lex.join(sem, "doc_id", "full_outer").select(
        "doc_id",
        "rank_lex",
        "rank_sem",
        (
            F.coalesce(F.lit(CANDIDATES) + 1 - F.col("rank_lex"), F.lit(0))
            + F.coalesce(F.lit(CANDIDATES) + 1 - F.col("rank_sem"), F.lit(0))
        ).cast("bigint").alias("borda_score"),
    )
    return fused.orderBy(F.desc("borda_score"), F.asc("doc_id")).limit(TOP_K)


BORDA_SQL = f"""
WITH scored AS ({_BM25_SCORED_SQL}),
lex AS (
  SELECT doc_id, rank_lex FROM (
    SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank_lex FROM scored
  ) WHERE rank_lex <= {CANDIDATES}
),
emb AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
q AS (SELECT v AS qv, sqrt(list_dot_product(v, v)) AS qn FROM emb WHERE vec_id = 0),
cos AS (
  SELECT vec_id AS doc_id,
         round(list_dot_product(qv, v) / (qn * sqrt(list_dot_product(v, v))), 6) AS cosine
  FROM emb CROSS JOIN q
),
sem AS (
  SELECT doc_id, rank_sem FROM (
    SELECT doc_id, row_number() OVER (ORDER BY cosine DESC, doc_id) AS rank_sem FROM cos
  ) WHERE rank_sem <= {CANDIDATES}
)
SELECT coalesce(lex.doc_id, sem.doc_id) AS doc_id,
       rank_lex, rank_sem,
       CAST(coalesce({CANDIDATES} + 1 - rank_lex, 0)
            + coalesce({CANDIDATES} + 1 - rank_sem, 0) AS BIGINT) AS borda_score
FROM lex FULL OUTER JOIN sem USING (doc_id)
ORDER BY borda_score DESC, doc_id LIMIT {TOP_K}
"""

QUERIES["rank_fusion_borda"] = rank_fusion_borda
ORACLES["rank_fusion_borda"] = BORDA_SQL


# --- MaxScore/WAND upper-bound planning ----------------------------------------
#
# The planning table dynamic-pruning retrieval runs on (Turtle & Flood
# 1995 MaxScore; Broder et al. 2003 WAND): per query term, the maximum
# score any single posting can contribute (the term upper bound kept in
# the index), and the essential/non-essential split against the top-k
# entry threshold theta — terms whose ascending upper-bound prefix sum
# cannot reach theta are non-essential: a document appearing ONLY in
# those lists can never enter the top-k, so their postings are skipped.
# Reuses bm25_search's exact scoring device (per-term contributions
# rounded to 6dp, so every downstream sum/compare runs on identical
# IEEE doubles in both engines); theta is the TOP_K-th full score.
#
# Scale: one pinned tokenize pass (the bm25 shape), a 1-row stats
# broadcast, per-term maxima in ONE aggregate, theta from a
# TakeOrderedAndProject cut; the output is |query| rows — planning
# cost rides the index-stats pass retrieval already pays, never a
# second corpus scan.


def search_wand_upper_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    per_doc = docs.select(
        "doc_id",
        F.size(toks).alias("len_d"),
        *[
            F.size(F.filter(toks, _is_term(term))).alias(f"tf_{i}")
            for i, term in enumerate(QUERY_TERMS)
        ],
    ).localCheckpoint(eager=False)
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("len_d").alias("avg_len"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(QUERY_TERMS))
        ],
    )
    term_exprs = [
        F.round(
            F.log(
                (F.col("n_docs") - F.col(f"df_{i}") + 0.5) / (F.col(f"df_{i}") + 0.5)
                + 1.0
            )
            * (F.col(f"tf_{i}") * (BM25_K1 + 1))
            / (
                F.col(f"tf_{i}")
                + BM25_K1 * (1 - BM25_B + BM25_B * F.col("len_d") / F.col("avg_len"))
            ),
            6,
        ).alias(f"s_{i}")
        for i in range(len(QUERY_TERMS))
    ]
    scored = per_doc.crossJoin(F.broadcast(stats)).select(
        "doc_id",
        *term_exprs,
        *[F.col(f"df_{i}") for i in range(len(QUERY_TERMS))],
    ).localCheckpoint(eager=False)
    full = scored.select(
        "doc_id",
        F.round(
            sum([F.col(f"s_{i}") for i in range(1, len(QUERY_TERMS))], F.col("s_0")), 6
        ).alias("score"),
    )
    theta = (
        full.orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(TOP_K)
        .agg(F.round(F.min("score"), 6).alias("theta_r6"))
    )
    ubs_wide = scored.agg(
        *[F.coalesce(F.max(f"s_{i}"), F.lit(0.0)).alias(f"ub_{i}") for i in range(len(QUERY_TERMS))],
        *[F.max(f"df_{i}").alias(f"dfv_{i}") for i in range(len(QUERY_TERMS))],
    )
    rows = ubs_wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(term).alias("term"),
                        F.col(f"ub_{i}").alias("ub_r6"),
                        F.col(f"dfv_{i}").cast("bigint").alias("df"),
                    )
                    for i, term in enumerate(QUERY_TERMS)
                ]
            )
        ).alias("t")
    ).select("t.*")
    w = Window.orderBy(F.asc("ub_r6"), F.asc("term")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        rows.crossJoin(F.broadcast(theta))
        .select(
            "term",
            "df",
            "ub_r6",
            F.round(F.sum("ub_r6").over(w), 6).alias("prefix_ub_r6"),
            "theta_r6",
        )
        .select(
            "term",
            "df",
            "ub_r6",
            "prefix_ub_r6",
            "theta_r6",
            (F.col("prefix_ub_r6") > F.col("theta_r6")).cast("bigint").alias("essential"),
        )
    )


_WAND_SCORE_SQL = ", ".join(
    f"round(ln((n_docs - df_{i} + 0.5::DOUBLE) / (df_{i} + 0.5::DOUBLE) + 1.0)"
    f" * (tf_{i} * ({BM25_K1}::DOUBLE + 1))"
    f" / (tf_{i} + {BM25_K1}::DOUBLE * (1 - {BM25_B}::DOUBLE + {BM25_B}::DOUBLE * len_d / avg_len)), 6) AS s_{i}"
    for i in range(len(QUERY_TERMS))
)
_WAND_FULL_SQL = " + ".join(f"s_{i}" for i in range(len(QUERY_TERMS)))
_WAND_ROWS_SQL = " UNION ALL ".join(
    f"SELECT '{term}' AS term, CAST(df_{i} AS BIGINT) AS df,"
    f" coalesce((SELECT max(s_{i}) FROM scored), 0.0) AS ub_r6 FROM stats"
    for i, term in enumerate(QUERY_TERMS)
)

WAND_SQL = f"""
WITH per_doc AS (
  SELECT doc_id, len(toks) AS len_d, {_TF_SQL}
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents)
),
stats AS (
  SELECT count(*) AS n_docs, avg(len_d) AS avg_len, {_DF_SQL} FROM per_doc
),
scored AS (
  SELECT doc_id, {_WAND_SCORE_SQL} FROM per_doc CROSS JOIN stats
),
theta AS (
  SELECT round(min(score), 6) AS theta_r6 FROM (
    SELECT round({_WAND_FULL_SQL}, 6) AS score, doc_id
    FROM scored ORDER BY score DESC, doc_id LIMIT {TOP_K}
  )
),
rows_t AS ({_WAND_ROWS_SQL}),
pref AS (
  SELECT term, df, ub_r6,
         round(sum(ub_r6) OVER (ORDER BY ub_r6 ASC, term ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS prefix_ub_r6
  FROM rows_t
)
SELECT term, df, ub_r6, prefix_ub_r6, theta_r6,
       CAST(prefix_ub_r6 > theta_r6 AS BIGINT) AS essential
FROM pref, theta
"""

QUERIES["search_wand_upper_bounds"] = search_wand_upper_bounds
ORACLES["search_wand_upper_bounds"] = WAND_SQL


# --- rank-biased overlap between the two production rankers ------------------------
#
# The top-weighted ranking-similarity metric IR evaluation actually
# uses (Webber, Moffat & Zobel 2010 RBO): how much do the BM25 and the
# Dirichlet query-likelihood top-20s agree, weighted so rank 1
# disagreements cost more than rank 20 ones.  RBO@D = sum_{d<=D}
# (1-p)p^(d-1) * X_d/d with X_d = |topd(A) ∩ topd(B)|.  The overlap
# profile X_1..X_20 is 20 conditional sums over the joined rank pair
# table (max(rank_a, rank_b) <= d), collapsed to ONE row; the weighted
# sum is an UNROLLED literal chain — every p^(d-1) coefficient is
# embedded as the same python-repr double literal in both engines and
# the additions run in the same textual order, so the final double is
# bit-identical before its 6dp round (the identical-IEEE-double
# device, chain-ordered).
#
# Scale: both rankers are TakeOrderedAndProject top-20 cuts over the
# corpus scans they already pay; everything after is a 20x20 rank
# join and a 1-row fold.

RBO_P = 0.9
RBO_DEPTH = 20
_RBO_COEFS = [(1 - RBO_P) * RBO_P ** (d - 1) for d in range(1, RBO_DEPTH + 1)]


def search_rank_biased_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    lex = (
        _bm25_scored(spark, sf_dir)
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(RBO_DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score"), F.asc("doc_id")))
            .alias("ra"),
        )
    )
    ql = (
        query_likelihood_search(spark, sf_dir)
        .limit(RBO_DEPTH)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("ql_score_q4"), F.asc("doc_id")))
            .alias("rb"),
        )
    )
    both = lex.join(ql, "doc_id")
    overlaps = both.agg(
        *[
            F.sum(
                (F.greatest("ra", "rb") <= d).cast("bigint")
            ).alias(f"x_{d}")
            for d in range(1, RBO_DEPTH + 1)
        ],
        F.count(F.lit(1)).cast("bigint").alias("n_common"),
    ).na.fill(0)
    chain = " + ".join(
        f"({c!r} * (cast(coalesce(x_{d}, 0) as double) / {d}))"
        for d, c in enumerate(_RBO_COEFS, start=1)
    )
    return overlaps.select(
        F.expr(f"round({chain}, 6)").alias("rbo_r6"),
        F.coalesce("x_5", F.lit(0)).alias("overlap_5"),
        F.coalesce("x_10", F.lit(0)).alias("overlap_10"),
        F.coalesce("x_20", F.lit(0)).alias("overlap_20"),
        "n_common",
    )


def _rbo_sql() -> str:
    xs = ",\n         ".join(
        f"CAST(sum(CASE WHEN GREATEST(ra, rb) <= {d} THEN 1 ELSE 0 END) AS BIGINT) AS x_{d}"
        for d in range(1, RBO_DEPTH + 1)
    )
    chain = " + ".join(
        f"({c!r} * (CAST(coalesce(x_{d}, 0) AS DOUBLE) / {d}))"
        for d, c in enumerate(_RBO_COEFS, start=1)
    )
    return f"""
WITH lexs AS ({_BM25_SCORED_SQL.strip()}),
lex AS (
  SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS ra
  FROM (SELECT doc_id, score FROM lexs ORDER BY score DESC, doc_id LIMIT {RBO_DEPTH})
),
qls AS ({QUERY_LIKELIHOOD_SQL.strip()}),
ql AS (
  SELECT doc_id, row_number() OVER (ORDER BY ql_score_q4 DESC, doc_id) AS rb FROM qls
),
both_r AS (SELECT l.doc_id, ra, rb FROM lex l JOIN ql q ON q.doc_id = l.doc_id),
ov AS (
  SELECT {xs},
         count(*)::BIGINT AS n_common
  FROM both_r
)
SELECT round({chain}, 6) AS rbo_r6,
       coalesce(x_5, 0) AS overlap_5,
       coalesce(x_10, 0) AS overlap_10,
       coalesce(x_20, 0) AS overlap_20,
       n_common
FROM ov
"""


RBO_SQL = _rbo_sql()

QUERIES["search_rank_biased_overlap"] = search_rank_biased_overlap
ORACLES["search_rank_biased_overlap"] = RBO_SQL


# --- RAG citation support (faithfulness / attribution audit) ------------------
#
# The grounding metric a RAG deployment runs over every generated
# answer (RAGAS-faithfulness style, n-gram flavor): what fraction of
# the answer's word trigrams appear in its retrieved context documents?
# Per answer: the best single context (citation candidate), the UNION
# support across all its contexts (1 - hallucination-rate proxy), and
# the count of unsupported trigrams (the spans a reviewer must check).
# Answers are planted as every doc_id % 9 == 4 with retrieved set
# {a+1, a+2, a+3} — the metric, not the retriever, is under test
# (retrieval itself is bm25_search / knn_* / hybrid_search_rrf).
#
# Scale design: trigram sets are (doc, trigram) DISTINCT rows — the
# support computation is an equi-join on (ctx_id, trigram) + two
# hash-aggs, never a string scan of context text; work is token-grain
# and the answer fan-out is the fixed |retrieved set| = 3.

RAG_CIT_K = 3  # retrieved contexts per answer


def _trigram_rows(docs: DataFrame) -> DataFrame:
    """(doc_id, tg): DISTINCT word trigrams per document."""
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    base = docs.select("doc_id", toks.alias("t")).where(F.size("t") >= 3)
    tg = F.transform(
        F.sequence(F.lit(1), F.size("t") - 2),
        lambda i: F.concat_ws(
            " ",
            F.element_at(F.col("t"), i),
            F.element_at(F.col("t"), i + 1),
            F.element_at(F.col("t"), i + 2),
        ),
    )
    return base.select("doc_id", F.explode(F.array_distinct(tg)).alias("tg"))


def rag_citation_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    tri = _trigram_rows(load_table(spark, sf_dir, "documents").select("doc_id", "text"))
    ans = tri.where(F.pmod(F.col("doc_id"), 9) == 4)
    atot = ans.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_trigrams"))
    ansk = ans.select(
        "doc_id",
        "tg",
        F.explode(F.sequence(F.lit(1), F.lit(RAG_CIT_K))).alias("k"),
    ).select("doc_id", "tg", (F.col("doc_id") + F.col("k")).alias("ctx_id"))
    m = ansk.join(
        tri.select(F.col("doc_id").alias("ctx_id"), "tg"), ["ctx_id", "tg"]
    )
    per_ctx = m.groupBy("doc_id", "ctx_id").agg(F.count(F.lit(1)).alias("n_match"))
    best = (
        per_ctx.groupBy("doc_id")
        .agg(F.max(F.struct("n_match", (-F.col("ctx_id")).alias("negc"))).alias("s"))
        .select("doc_id", (-F.col("s.negc")).alias("best_ctx_id"), F.col("s.n_match").alias("bn"))
    )
    uni = m.select("doc_id", "tg").distinct().groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_any")
    )
    out = (
        atot.join(best, "doc_id", "left")
        .join(uni, "doc_id", "left")
        .select(
            "doc_id",
            F.col("n_trigrams").cast("bigint").alias("n_trigrams"),
            F.coalesce("best_ctx_id", F.lit(-1)).cast("bigint").alias("best_ctx_id"),
            F.expr("coalesce(bn, 0) * 1000 div n_trigrams").alias("best_support_milli"),
            F.expr("coalesce(n_any, 0) * 1000 div n_trigrams").alias("union_support_milli"),
            (F.col("n_trigrams") - F.coalesce("n_any", F.lit(0)))
            .cast("bigint")
            .alias("n_unsupported"),
        )
    )
    return out


RAG_CITATION_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS t
  FROM documents
),
tri AS (
  SELECT DISTINCT doc_id, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS tg
  FROM (SELECT * FROM toks WHERE len(t) >= 3),
       unnest(generate_series(1, len(t) - 2)) AS g(i)
),
ans AS (SELECT * FROM tri WHERE doc_id % 9 = 4),
atot AS (SELECT doc_id, count(*) AS n_trigrams FROM ans GROUP BY doc_id),
ansk AS (
  SELECT a.doc_id, a.tg, a.doc_id + k AS ctx_id
  FROM ans a, unnest(generate_series(1, {RAG_CIT_K})) AS g(k)
),
m AS (
  SELECT x.doc_id, x.ctx_id, x.tg
  FROM ansk x JOIN tri c ON c.doc_id = x.ctx_id AND c.tg = x.tg
),
per_ctx AS (SELECT doc_id, ctx_id, count(*) AS n_match FROM m GROUP BY 1, 2),
best AS (
  SELECT doc_id,
         -(max(struct_pack(n := n_match, negc := -ctx_id)).negc) AS best_ctx_id,
         max(struct_pack(n := n_match, negc := -ctx_id)).n AS bn
  FROM per_ctx GROUP BY doc_id
),
uni AS (SELECT doc_id, count(DISTINCT tg) AS n_any FROM m GROUP BY doc_id)
SELECT a.doc_id,
       CAST(a.n_trigrams AS BIGINT) AS n_trigrams,
       CAST(coalesce(b.best_ctx_id, -1) AS BIGINT) AS best_ctx_id,
       CAST(coalesce(b.bn, 0) * 1000 // a.n_trigrams AS BIGINT) AS best_support_milli,
       CAST(coalesce(u.n_any, 0) * 1000 // a.n_trigrams AS BIGINT) AS union_support_milli,
       CAST(a.n_trigrams - coalesce(u.n_any, 0) AS BIGINT) AS n_unsupported
FROM atot a
LEFT JOIN best b USING (doc_id)
LEFT JOIN uni u USING (doc_id)
"""

QUERIES["rag_citation_support"] = rag_citation_support
ORACLES["rag_citation_support"] = RAG_CITATION_SQL
