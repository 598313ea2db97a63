"""TF-IDF top terms per source.

Reference parity: the catalog pipeline's summary stage distills "what
is this document about" (`catalog search/stage3_generate_summaries.py`
builds document_description / document_usage via an LLM). The
deterministic analogue: per-source top terms by TF-IDF — explode →
two aggregations → broadcast joins → per-source ranking, fully inside
whole-stage codegen.

Scale: the (source, token) partial aggregation is map-side combinable;
document frequency is a token-keyed agg whose result (vocabulary-sized)
broadcasts; the final window partitions by source. No step depends on
corpus size beyond the initial scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

TOP_TERMS = 5


def top_terms_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("token")
    )
    tf = toks.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_tok = tf.groupBy("token").agg(F.countDistinct("source").alias("df"))
    n_sources = docs.agg(F.countDistinct("source").alias("n_sources"))
    scored = (
        tf.join(F.broadcast(df_tok), "token")
        .crossJoin(F.broadcast(n_sources))
        .withColumn("tfidf", F.round(F.col("tf") * F.log(F.col("n_sources") / F.col("df")), 6))
    )
    w = Window.partitionBy("source").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= TOP_TERMS)
        .select("source", "token", "tf", "df", "tfidf", F.col("term_rank").cast("bigint").alias("term_rank"))
    )


TOP_TERMS_SQL = f"""
WITH toks AS (
  SELECT source, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS token
  FROM documents
), tf AS (
  SELECT source, token, count(*) AS tf FROM toks GROUP BY 1, 2
), df_tok AS (
  SELECT token, count(DISTINCT source) AS df FROM tf GROUP BY 1
), scored AS (
  SELECT tf.source, tf.token, tf.tf, df_tok.df,
         round(tf.tf * ln((SELECT count(DISTINCT source) FROM documents) / CAST(df_tok.df AS DOUBLE)), 6) AS tfidf
  FROM tf JOIN df_tok USING (token)
)
SELECT source, token, tf, df, tfidf, term_rank FROM (
  SELECT *, row_number() OVER (PARTITION BY source ORDER BY tfidf DESC, token ASC) AS term_rank
  FROM scored
) WHERE term_rank <= {TOP_TERMS}
"""

QUERIES = {"top_terms_tfidf": top_terms_tfidf}
ORACLES = {"top_terms_tfidf": TOP_TERMS_SQL}


# --- TextRank keyword extraction -----------------------------------------------------
#
# The graph-ranking member of the keyword family beside tf-idf and
# RAKE (Mihalcea & Tarau 2004 TextRank): words vote for the words they
# co-occur with — weighted PageRank over the adjacency-window-2
# co-occurrence graph, so a word is important when important words
# appear next to it. The corpus collapses to (word, next_word) pair
# counts in ONE explode + hash aggregation (the Zipf-head device: the
# graph is bounded by vocabulary², never corpus size); 3 unrolled
# rounds of the weighted update r'(v) = (100-d)/100 + d/100 * sum_u
# w_uv/W_u * r(u) run in scaled integers with truncating division
# (the pagerank device, weight-proportional instead of out-degree).
#
# Scale: one corpus pass to pair counts; every iteration is a join on
# the bounded vocabulary graph. At 100 TB the pair table is still
# vocabulary-sized — map-side combine does all the heavy lifting.

TEXTRANK_SCALE = 10**9
TEXTRANK_TOKEN_CAP = 256  # pairs mined from each document HEAD (lead-biased, the
                          # usual keyword-extractor practice; caps pair volume)
TEXTRANK_DAMP = 85      # d in percent
TEXTRANK_ROUNDS = 3
TEXTRANK_TOP = 20


def keyword_extract_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    toks = "slice(filter(split(text, '\\\\s+'), t -> t != ''), 1, TOKCAP)".replace(
        "TOKCAP", str(TEXTRANK_TOKEN_CAP)
    )
    # ONE tokenize + explode, canonicalized (least, greatest) so the
    # corpus aggregates straight to UNDIRECTED pair counts map-side;
    # the direction doubling then happens on the vocabulary²-sized
    # aggregate, not on corpus pairs (a union of two corpus selects
    # would tokenize and explode everything twice)
    # materialize the token array FIRST: referencing the tokenize
    # expression inside the transform lambda re-evaluates it per
    # element (no CSE inside lambdas) — a quadratic blowup measured at
    # >10x this operator's whole cost
    pairs = docs.select(F.expr(toks).alias("ts")).select(
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(ts) - 1, 0)),"
                " i -> struct(element_at(ts, i) as x, element_at(ts, i + 1) as y))"
            )
        ).alias("p")
    ).select(
        F.least("p.x", "p.y").alias("a"), F.greatest("p.x", "p.y").alias("b")
    ).where(F.col("a") != F.col("b"))
    und = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).cast("bigint").alias("w"))
    # the aggregated graph is vocabulary-sized: pin it on ONE partition
    # so the 3 iteration rounds don't pay 32-task scheduling per stage,
    # and broadcast the rank vector so each round is exchange-free
    edges = (
        und.union(und.select(F.col("b").alias("a"), F.col("a").alias("b"), "w"))
        .coalesce(1)
        .localCheckpoint(eager=False)
    )
    wout = edges.groupBy("a").agg(F.sum("w").cast("bigint").alias("wu"))
    g = edges.join(wout, "a")
    ranks = wout.select(F.col("a").alias("v"), F.lit(TEXTRANK_SCALE).cast("bigint").alias("r"))
    base = (100 - TEXTRANK_DAMP) * TEXTRANK_SCALE // 100
    for _ in range(TEXTRANK_ROUNDS):
        contrib = (
            g.join(F.broadcast(ranks), g["a"] == ranks["v"])
            .select(
                "b",
                F.expr(f"{TEXTRANK_DAMP} * r * w div (100 * wu)").alias("m"),
            )
            .groupBy("b")
            .agg(F.sum("m").cast("bigint").alias("mass"))
        )
        ranks = (
            wout.select(F.col("a").alias("v"))
            .join(F.broadcast(contrib.withColumnRenamed("b", "v")), "v", "left")
            .select("v", (F.lit(base) + F.coalesce("mass", F.lit(0))).cast("bigint").alias("r"))
        )
    deg = edges.groupBy("a").agg(F.count(F.lit(1)).cast("bigint").alias("degree"))
    return (
        ranks.join(deg, ranks["v"] == deg["a"])
        .select(F.col("v").alias("word"), F.col("r").alias("rank_scaled"), "degree")
        .orderBy(F.desc("rank_scaled"), F.asc("word"))
        .limit(TEXTRANK_TOP)
    )


def _textrank_round_sql(prev: str, out: str) -> str:
    base = (100 - TEXTRANK_DAMP) * TEXTRANK_SCALE // 100
    return f"""{out} AS (
  SELECT n.v, CAST({base} + coalesce(m.mass, 0) AS BIGINT) AS r
  FROM (SELECT DISTINCT a AS v FROM edges) n
  LEFT JOIN (
    SELECT g.b, CAST(sum({TEXTRANK_DAMP} * p.r * g.w // (100 * g.wu)) AS BIGINT) AS mass
    FROM gw g JOIN {prev} p ON p.v = g.a
    GROUP BY g.b
  ) m ON m.b = n.v
)"""


def _textrank_sql() -> str:
    rounds = []
    prev = "r0"
    for i in range(TEXTRANK_ROUNDS):
        rounds.append(_textrank_round_sql(prev, f"r{i + 1}"))
        prev = f"r{i + 1}"
    return f"""
WITH toks AS (
  SELECT list_slice(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''), 1, 256) AS ts FROM documents
),
pairs AS (
  SELECT LEAST(p.x, p.y) AS a, GREATEST(p.x, p.y) AS b FROM (
    SELECT unnest(list_transform(generate_series(1, GREATEST(len(ts) - 1, 0)),
                  i -> struct_pack(x := ts[i], y := ts[i + 1]))) AS p
    FROM toks
  ) WHERE p.x <> p.y
),
und AS (SELECT a, b, count(*)::BIGINT AS w FROM pairs GROUP BY a, b),
edges AS (
  SELECT a, b, w FROM und UNION ALL SELECT b AS a, a AS b, w FROM und
),
wout AS (SELECT a, CAST(sum(w) AS BIGINT) AS wu FROM edges GROUP BY a),
gw AS (SELECT e.a, e.b, e.w, o.wu FROM edges e JOIN wout o ON o.a = e.a),
r0 AS (SELECT a AS v, CAST({TEXTRANK_SCALE} AS BIGINT) AS r FROM wout),
{",".join(rounds)},
deg AS (SELECT a, count(*)::BIGINT AS degree FROM edges GROUP BY a)
SELECT p.v AS word, p.r AS rank_scaled, d.degree
FROM {prev} p JOIN deg d ON d.a = p.v
ORDER BY rank_scaled DESC, word ASC
LIMIT {TEXTRANK_TOP}
"""


TEXTRANK_SQL = _textrank_sql()

QUERIES["keyword_extract_textrank"] = keyword_extract_textrank
ORACLES["keyword_extract_textrank"] = TEXTRANK_SQL
