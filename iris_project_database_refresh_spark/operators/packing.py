"""Sequence packing: concat-and-chunk documents into fixed-length
training examples.

The standard LLM-pretraining data layout: the corpus is one token
stream in a deterministic document order, sliced into EXAMPLE_TOKENS
windows; documents straddle example boundaries. This operator reports
the example-level manifest (docs per example, boundary docs, token
counts) — the bookkeeping a packing job emits.

Scale design: the only global state is each document's exclusive
prefix-sum offset, computed with ``functions.distributed.global_cumsum``
(range-repartition + per-partition sums + broadcast offsets — the
two-pass pattern that replaces a single-task global window). Everything
after is per-row arithmetic: a doc spanning examples e0..e1 explodes to
one row per touched example (fan-out = ceil(n/EXAMPLE_TOKENS)+1), then
one groupBy on example_id. Fully linear, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.distributed import global_cumsum
from ..functions.text import tokens
from ..sources.tables import load_table

EXAMPLE_TOKENS = 64


def pack_examples(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    sized = docs.select("doc_id", F.size(tokens(F.col("text"))).alias("n")).where(F.col("n") > 0)
    off = global_cumsum(sized, "doc_id", "n", out_col="off")

    B = EXAMPLE_TOKENS
    e0 = (F.col("off") / B).cast("bigint")
    e1 = ((F.col("off") + F.col("n") - 1) / B).cast("bigint")
    spans = off.select(
        "doc_id", "n", "off", F.explode(F.sequence(e0, e1)).alias("example_id")
    )
    tokens_in = F.least(F.col("off") + F.col("n"), (F.col("example_id") + 1) * B) - F.greatest(
        F.col("off"), F.col("example_id") * B
    )
    return (
        spans.withColumn("tok", tokens_in)
        .groupBy("example_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").cast("bigint").alias("n_tokens"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
    )


PACK_SQL = f"""
WITH sized AS (
  SELECT doc_id, len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS n
  FROM documents
  WHERE len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) > 0
),
off_t AS (
  SELECT doc_id, n,
         coalesce(sum(n) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS off
  FROM sized
),
spans AS (
  SELECT doc_id, n, off, e AS example_id
  FROM off_t, (SELECT unnest(generate_series(CAST(off // {EXAMPLE_TOKENS} AS BIGINT),
                                             CAST((off + n - 1) // {EXAMPLE_TOKENS} AS BIGINT))) AS e)
)
SELECT CAST(example_id AS BIGINT) AS example_id,
       count(*) AS n_docs,
       CAST(sum(least(off + n, (example_id + 1) * {EXAMPLE_TOKENS})
                - greatest(off, example_id * {EXAMPLE_TOKENS})) AS BIGINT) AS n_tokens,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM spans
GROUP BY example_id
"""

QUERIES = {"pack_examples": pack_examples}
ORACLES = {"pack_examples": PACK_SQL}
