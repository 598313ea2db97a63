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
