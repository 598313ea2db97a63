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
