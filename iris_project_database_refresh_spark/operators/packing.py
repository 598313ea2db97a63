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


# --- no-split best-fit packing ------------------------------------------------
#
# The truncation-free alternative to concat-and-chunk (public result:
# best-fit packing removes the truncations that hurt LM quality —
# "Fewer Truncations Improve Language Modeling", Ding et al. 2024).
# Documents NEVER split: within each (source, shelf) group, docs sort
# by (len desc, doc_id) and a first-fit-decreasing fold places each in
# the fullest bin it fits (ties to the lowest bin index), opening a
# new bin otherwise. Grouping into SHELF-sized folds is the
# distributed form — packing runs within bounded groups exactly like
# practical implementations pack within partitions, which also bounds
# the fold state (≤ SHELF bin loads) and the fold cost (≤ SHELF²) per
# group. The report compares realized fill against the concat lower
# bound ceil(tokens/C): the price of never truncating, per source.
#
# Engine parity: the fold is pure integer arithmetic; the oracle runs
# the identical FFD recursion as a recursive CTE (the tokenizer_segment
# device) with 1-indexed list surgery on the bin-load list.

PACK_C = 256   # bin capacity (tokens)
PACK_SHELF = 64  # docs per fold group


def pack_best_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    sized = docs.select(
        "doc_id",
        "source",
        F.size(tokens(F.col("text"))).cast("bigint").alias("n"),
    ).where((F.col("n") > 0) & (F.col("n") <= PACK_C))
    from pyspark.sql import Window as _W

    ranked = sized.withColumn(
        "shelf",
        F.expr(f"cast((row_number() over (partition by source order by md5(cast(doc_id as string)), doc_id) - 1) div {PACK_SHELF} as bigint)"),
    )
    grouped = ranked.groupBy("source", "shelf").agg(
        F.expr("array_sort(collect_list(struct(-n as negn, doc_id, n)))").alias("items"),
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n").alias("tokens"),
    )
    # FFD fold: state = bin loads; best fitting bin = max load that
    # still fits, ties to the first (lowest-index) such bin.
    fold = F.expr(
        f"""
        aggregate(
          items,
          cast(array() as array<bigint>),
          (bins, it) -> CASE
            WHEN size(filter(bins, b -> b + it.n <= {PACK_C})) > 0 THEN
              transform(bins, (b, i) ->
                CASE WHEN i = array_position(bins,
                        array_max(filter(bins, b2 -> b2 + it.n <= {PACK_C}))) - 1
                     THEN b + it.n ELSE b END)
            ELSE concat(bins, array(it.n))
          END)
        """
    )
    packed = grouped.select(
        "source", "shelf", "n_docs", "tokens", F.size(fold).cast("bigint").alias("n_bins")
    )
    return packed.groupBy("source").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("tokens").alias("total_tokens"),
        F.sum("n_bins").alias("bins_ffd"),
        F.expr(f"cast((sum(tokens) + {PACK_C} - 1) div {PACK_C} as bigint)").alias(
            "bins_concat_lower_bound"
        ),
        F.expr(f"cast(sum(tokens) * 10000 div (sum(n_bins) * {PACK_C}) as bigint)").alias(
            "fill_bp"
        ),
    )


PACK_BEST_FIT_SQL = f"""
WITH RECURSIVE sized AS (
  SELECT doc_id, source,
         len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS n
  FROM documents
  WHERE len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) > 0
    AND len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) <= {PACK_C}
), ranked AS (
  SELECT *, (row_number() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) - 1) // {PACK_SHELF} AS shelf
  FROM sized
), grouped AS (
  SELECT source, shelf,
         list_transform(
           list_sort(list(struct_pack(negn := -n, doc_id := doc_id, n := n))),
           s -> s.n) AS lens,
         count(*) AS n_docs, sum(n) AS tokens
  FROM ranked GROUP BY source, shelf
), steps AS (
  SELECT source, shelf, lens, n_docs, tokens,
         0 AS k, CAST([] AS BIGINT[]) AS bins
  FROM grouped
  UNION ALL
  SELECT source, shelf, lens, n_docs, tokens, k + 1,
         CASE
           WHEN len(list_filter(bins, b -> b + lens[k + 1] <= {PACK_C})) > 0 THEN
             list_transform(range(1, len(bins) + 1), i ->
               CASE WHEN i = list_position(bins,
                       list_max(list_filter(bins, b -> b + lens[k + 1] <= {PACK_C})))
                    THEN bins[i] + lens[k + 1] ELSE bins[i] END)
           ELSE list_append(bins, lens[k + 1])
         END
  FROM steps WHERE k < len(lens)
), final AS (
  SELECT source, shelf, n_docs, tokens, len(bins) AS n_bins
  FROM steps WHERE k = len(lens)
)
SELECT source,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(tokens) AS BIGINT) AS total_tokens,
       CAST(sum(n_bins) AS BIGINT) AS bins_ffd,
       CAST((sum(tokens) + {PACK_C} - 1) // {PACK_C} AS BIGINT) AS bins_concat_lower_bound,
       CAST(sum(tokens) * 10000 // (sum(n_bins) * {PACK_C}) AS BIGINT) AS fill_bp
FROM final GROUP BY source
"""

QUERIES["pack_best_fit"] = pack_best_fit
ORACLES["pack_best_fit"] = PACK_BEST_FIT_SQL


# --- deterministic epoch shuffle plan ----------------------------------------
#
# The data-loader contract between this engine and a training run:
# each epoch reads the corpus in a pseudorandom order that is (a)
# exactly reproducible from (seed, doc_id) — restarts and data-
# parallel workers agree with no coordination — and (b) different
# across epochs. Order key = md5(seed || doc_id) (the house
# hash-uniform device, engine-portable); shards = key ranges so each
# worker's slice is contiguous in shuffle order (a range partition,
# not a gather). The report proves the contract: per (epoch, shard)
# doc counts plus first/last order-key fingerprints; the same corpus
# reshuffles across the two epochs while each epoch is individually
# reproducible (cross-epoch divergence tested).

SHUFFLE_EPOCHS = (1, 2)
SHUFFLE_SHARDS = 8


def epoch_shuffle_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    epochs = docs.select(
        "doc_id",
        F.explode(F.array(*[F.lit(e) for e in SHUFFLE_EPOCHS])).alias("epoch"),
    )
    key = F.md5(F.concat(F.lit("epoch-"), F.col("epoch").cast("string"), F.lit(":"), F.col("doc_id").cast("string")))
    keyed = epochs.select(
        "epoch",
        "doc_id",
        key.alias("okey"),
        # shard = top-4-bits range of the hash key: contiguous in shuffle order
        F.expr(f"cast(conv(substring(md5(concat('epoch-', cast(epoch as string), ':', cast(doc_id as string))), 1, 8), 16, 10) as bigint) * {SHUFFLE_SHARDS} div 4294967296").alias("shard"),
    )
    return keyed.groupBy("epoch", "shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("okey").alias("first_key"),
        F.max("okey").alias("last_key"),
    )


EPOCH_SHUFFLE_SQL = f"""
WITH epochs AS (
  SELECT doc_id, e AS epoch
  FROM documents, (SELECT unnest([{", ".join(str(e) for e in SHUFFLE_EPOCHS)}]) AS e)
), keyed AS (
  SELECT epoch, doc_id,
         md5('epoch-' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS okey,
         CAST('0x' || substr(md5('epoch-' || CAST(epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT)
           * {SHUFFLE_SHARDS} // 4294967296 AS shard
  FROM epochs
)
SELECT epoch, shard, count(*) AS n_docs, min(okey) AS first_key, max(okey) AS last_key
FROM keyed GROUP BY epoch, shard
"""

QUERIES["epoch_shuffle_plan"] = epoch_shuffle_plan
ORACLES["epoch_shuffle_plan"] = EPOCH_SHUFFLE_SQL


# --- deterministic k-fold assignment audit -------------------------------------
#
# The train/validation splitter an eval pipeline needs to be REPRODUCIBLE
# and stratification-clean: fold = md5(doc_id) % K (stable across runs
# and engines — the house md5-derived-constant device, never
# df.sample()), audited per source with exact share basis points and a
# per-source imbalance measure (max fold share − min fold share). One
# scan, one (source, fold) aggregation; the imbalance window runs over
# the bounded (source, fold) grid.

K_FOLDS = 5


def kfold_assignment_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    fold = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % K_FOLDS
    )
    per = docs.groupBy("source", fold.alias("fold")).agg(
        F.count(F.lit(1)).alias("n_docs")
    )
    w = _W.partitionBy("source")
    return per.select(
        "source",
        "fold",
        "n_docs",
        F.expr("n_docs * 10000").alias("_n4"),
        F.sum("n_docs").over(w).alias("_tot"),
        F.max("n_docs").over(w).alias("_mx"),
        F.min("n_docs").over(w).alias("_mn"),
    ).select(
        "source",
        "fold",
        "n_docs",
        F.expr("_n4 div _tot").alias("share_bp"),
        F.expr("(_mx - _mn) * 10000 div _tot").alias("source_imbalance_bp"),
    )


KFOLD_SQL = f"""
WITH per AS (
  SELECT source,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % {K_FOLDS} AS fold,
         count(*) AS n_docs
  FROM documents GROUP BY 1, 2
)
SELECT source, fold, n_docs,
       CAST(n_docs * 10000 // CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT) AS BIGINT) AS share_bp,
       CAST((max(n_docs) OVER (PARTITION BY source) - min(n_docs) OVER (PARTITION BY source))
           * 10000 // CAST(sum(n_docs) OVER (PARTITION BY source) AS BIGINT) AS BIGINT) AS source_imbalance_bp
FROM per
"""

QUERIES["kfold_assignment_audit"] = kfold_assignment_audit
ORACLES["kfold_assignment_audit"] = KFOLD_SQL


# --- LPT makespan shard assignment ----------------------------------------------
#
# pack_examples fills fixed-length sequences; pack_best_fit minimizes
# bins — this one balances a FIXED number of parallel shards (the
# training-data reality: W writer tasks, minimize the slowest).
# Graham's LPT rule (1969): sort jobs by size descending, assign each
# to the currently least-loaded shard; guaranteed within 4/3 of the
# optimal makespan.  The greedy is genuinely sequential (each choice
# changes the next argmin) → the fold device with an ARRAY of shard
# loads as state, argmin = array_position(loads, array_min(loads))
# (first minimum — deterministic tie-break in both engines).
#
# Plan: doc sizes are one narrow scan; the fold runs over the sorted
# size list (one row per group — parallelize by packing family/source
# at scale); output is the bounded W-row shard table with the 4/3
# bound shipped as an audit column.

LPT_SHARDS = 8


def shard_makespan_lpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.octet_length(F.encode("text", "utf-8")).cast("bigint").alias("bytes")
    )
    jobs = docs.groupBy().agg(
        F.reverse(F.sort_array(F.collect_list(F.struct("bytes", "doc_id")))).alias("js"),
        F.sum("bytes").alias("total"),
        F.max("bytes").alias("biggest"),
    )
    folded = jobs.select(
        "total",
        "biggest",
        F.expr("size(js)").cast("bigint").alias("n_docs"),
        F.expr(
            f"""
            aggregate(js,
              named_struct('loads', transform(sequence(1, {LPT_SHARDS}), x -> cast(0 as bigint)),
                           'counts', transform(sequence(1, {LPT_SHARDS}), x -> cast(0 as bigint))),
              (acc, j) -> named_struct(
                'loads', transform(acc.loads, (v, k) ->
                   case when k = cast(array_position(acc.loads, array_min(acc.loads)) - 1 as int)
                        then v + j.bytes else v end),
                'counts', transform(acc.counts, (v, k) ->
                   case when k = cast(array_position(acc.loads, array_min(acc.loads)) - 1 as int)
                        then v + 1 else v end)))
            """
        ).alias("st"),
    )
    shard = folded.select(
        "total",
        "biggest",
        "n_docs",
        F.posexplode(F.arrays_zip(F.col("st.loads"), F.col("st.counts"))).alias("shard", "z"),
    ).select(
        F.col("shard").cast("bigint").alias("shard"),
        F.col("z.loads").alias("shard_bytes"),
        F.col("z.counts").alias("shard_docs"),
        "n_docs",
        "total",
        F.expr(f"greatest(total div {LPT_SHARDS} + case when total % {LPT_SHARDS} > 0 then 1 else 0 end, biggest)")
        .cast("bigint")
        .alias("lower_bound"),
    )
    return shard.select(
        "shard",
        "shard_bytes",
        "shard_docs",
        "n_docs",
        "lower_bound",
        F.expr("shard_bytes * 1000 div lower_bound").cast("bigint").alias("vs_lb_milli"),
    )


SHARD_LPT_SQL = f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, octet_length(encode(text))::BIGINT AS bytes FROM documents
),
jobs AS (
  SELECT list_reverse(list_sort(list(struct_pack(bytes := bytes, doc_id := doc_id)))) AS js,
         CAST(sum(bytes) AS BIGINT) AS total,
         CAST(max(bytes) AS BIGINT) AS biggest,
         count(*)::BIGINT AS n_docs
  FROM docs
),
walk AS (
  SELECT js, total, biggest, n_docs, 0::BIGINT AS i,
         list_transform(range({LPT_SHARDS}), x -> 0::BIGINT) AS loads,
         list_transform(range({LPT_SHARDS}), x -> 0::BIGINT) AS counts
  FROM jobs
  UNION ALL
  SELECT js, total, biggest, n_docs, i + 1,
         list_transform(range(1, {LPT_SHARDS} + 1), k ->
           CASE WHEN k = list_position(loads, list_min(loads))
                THEN loads[k::INT] + js[(i + 1)::INT].bytes ELSE loads[k::INT] END),
         list_transform(range(1, {LPT_SHARDS} + 1), k ->
           CASE WHEN k = list_position(loads, list_min(loads))
                THEN counts[k::INT] + 1 ELSE counts[k::INT] END)
  FROM walk WHERE i < n_docs
),
final AS (SELECT * FROM walk WHERE i = n_docs),
lb AS (
  SELECT *, greatest(total // {LPT_SHARDS}
                     + CASE WHEN total % {LPT_SHARDS} > 0 THEN 1 ELSE 0 END,
                     biggest) AS lower_bound
  FROM final
)
SELECT CAST(s - 1 AS BIGINT) AS shard,
       CAST(loads[s::INT] AS BIGINT) AS shard_bytes,
       CAST(counts[s::INT] AS BIGINT) AS shard_docs,
       n_docs, CAST(lower_bound AS BIGINT) AS lower_bound,
       CAST(loads[s::INT] * 1000 // lower_bound AS BIGINT) AS vs_lb_milli
FROM lb, unnest(range(1, {LPT_SHARDS} + 1)) AS u(s)
"""

QUERIES["shard_makespan_lpt"] = shard_makespan_lpt
ORACLES["shard_makespan_lpt"] = SHARD_LPT_SQL


# --- attention fragmentation of the packed layout ------------------------------
#
# The metric behind document-masked packing (and the reason it exists):
# in a packed example of L tokens holding doc spans l_1..l_k, a causal
# attention WITHOUT a document mask lets (L^2 - sum l_i^2) of the L^2
# token pairs cross document boundaries — cross-doc contamination a
# packing job must either mask or accept.  Reported per example over
# the pack_examples layout: contamination share, within-doc share,
# interior boundaries, tail padding, and the largest single-doc share
# (how "pure" the example is).  The gate a pretraining data job
# thresholds before choosing mask strategy.
#
# Scale: the same span explode + ONE example-grain hash-agg as
# pack_examples — two extra integer sums (tok^2, max tok), no new
# shuffle, no Python.


def pack_attention_fragmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
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
    g = (
        spans.withColumn("tok", tokens_in)
        .groupBy("example_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").alias("L"),
            F.sum(F.col("tok") * F.col("tok")).alias("sq"),
            F.max("tok").alias("mx"),
        )
    )
    return g.select(
        F.col("example_id").cast("bigint").alias("example_id"),
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.col("L").cast("bigint").alias("n_tokens"),
        F.expr("1000 * (L * L - sq) div (L * L)").alias("cross_doc_milli"),
        F.expr("1000 * sq div (L * L)").alias("within_doc_milli"),
        (F.col("n_docs") - 1).cast("bigint").alias("n_boundaries"),
        (F.lit(B) - F.col("L")).cast("bigint").alias("pad_tokens"),
        F.expr(f"1000 * mx div greatest(L, 1)").alias("largest_doc_share_milli"),
    )


PACK_FRAG_SQL = f"""
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
  SELECT doc_id, n, off, e AS example_id,
         least(off + n, (e + 1) * {EXAMPLE_TOKENS}) - greatest(off, e * {EXAMPLE_TOKENS}) AS tok
  FROM off_t, (SELECT unnest(generate_series(CAST(off // {EXAMPLE_TOKENS} AS BIGINT),
                                             CAST((off + n - 1) // {EXAMPLE_TOKENS} AS BIGINT))) AS e)
),
g AS (
  SELECT example_id, count(*) AS n_docs, sum(tok) AS l, sum(tok * tok) AS sq, max(tok) AS mx
  FROM spans GROUP BY example_id
)
SELECT CAST(example_id AS BIGINT) AS example_id,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(l AS BIGINT) AS n_tokens,
       CAST(1000 * (l * l - sq) // (l * l) AS BIGINT) AS cross_doc_milli,
       CAST(1000 * sq // (l * l) AS BIGINT) AS within_doc_milli,
       CAST(n_docs - 1 AS BIGINT) AS n_boundaries,
       CAST({EXAMPLE_TOKENS} - l AS BIGINT) AS pad_tokens,
       CAST(1000 * mx // greatest(l, 1) AS BIGINT) AS largest_doc_share_milli
FROM g
"""

QUERIES["pack_attention_fragmentation"] = pack_attention_fragmentation
ORACLES["pack_attention_fragmentation"] = PACK_FRAG_SQL
