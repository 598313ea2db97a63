"""Corpus language-model operators: a BPE training step and a smoothed
bigram LM document scorer.

Reference parity: the reference counts tokens with a BPE tokenizer's
notion of subwords (`semantic search/stage_01_chapter_processing.py:314`
count_tokens) and filters/scores documents before embedding; training
the tokenizer itself and perplexity-scoring the corpus are the two
corpus-level models a 100 TB training-data pipeline adds on top.

* `bpe_merge_step` — ONE iteration of byte-pair-encoding training,
  exactly as a distributed engine runs it: aggregate the corpus to its
  word vocabulary once (all later work is bounded by vocab size, not
  corpus size), count adjacent symbol pairs weighted by word frequency,
  pick the argmax merge (count desc, pair asc — deterministic), apply
  it to every word with the greedy left-to-right non-overlapping fold,
  and emit the post-merge pair counts that seed the next iteration.
  The merge application is a genuinely sequential per-word recursion —
  F.aggregate on Spark, a recursive CTE on DuckDB (list_reduce proved
  nondeterministic on larger vectorized inputs; see the inline SQL
  comment) with identical branch logic, pure integers elsewhere, so
  the oracle hash-matches an iterative trainer's step.

* `quality_bigram_logprob` — per-document mean/min log10 P(w_i|w_{i-1})
  under the corpus's own add-k-smoothed bigram model (k=0.5): the
  conditional-perplexity filter that catches shuffled-word junk which
  the unigram scorer (textqc.quality_unigram_logprob) cannot see.

Scale: the vocabulary/bigram tables are the Zipf head — tiny next to
the corpus; the per-doc pass is explode → two key joins (AQE handles
hot-token skew) → one agg. BPE's fold runs over words of bounded
length, zero Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.tables import load_table

TOP_PAIRS = 10
ADD_K = 0.5

QUERIES = {}
ORACLES = {}


def _vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.col("text"))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )


_CHARS = "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
_PAIRS = (
    "CASE WHEN size(syms) < 2 THEN array() "
    "ELSE transform(sequence(1, size(syms) - 1), "
    "i -> struct(element_at(syms, i) AS ma, element_at(syms, i + 1) AS mb)) END"
)


def bpe_merge_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab = _vocab(spark, sf_dir).withColumn("syms", F.expr(_CHARS))
    pair_counts = (
        vocab.select("wcnt", F.explode(F.expr(_PAIRS)).alias("p"))
        .groupBy(F.col("p.ma").alias("ma"), F.col("p.mb").alias("mb"))
        .agg(F.sum("wcnt").alias("n"))
    )
    best = (
        pair_counts.orderBy(F.desc("n"), "ma", "mb")
        .limit(1)
        .select(F.col("ma").alias("best_a"), F.col("mb").alias("best_b"))
    )
    merged = (
        vocab.crossJoin(F.broadcast(best))
        .withColumn(
            "msyms",
            F.aggregate(
                F.col("syms"),
                F.expr("cast(array() as array<string>)"),
                lambda acc, s: F.when(
                    (F.size(acc) > 0)
                    & (F.element_at(acc, -1) == F.col("best_a"))
                    & (s == F.col("best_b")),
                    F.concat(
                        F.slice(acc, 1, F.size(acc) - 1),
                        F.array(F.concat(F.col("best_a"), F.col("best_b"))),
                    ),
                ).otherwise(F.concat(acc, F.array(s))),
            ),
        )
        .withColumnRenamed("msyms", "newsyms")
    )
    after = (
        merged.select(
            "wcnt",
            "best_a",
            "best_b",
            F.explode(
                F.expr(_PAIRS.replace("syms", "newsyms"))
            ).alias("p"),
        )
        .groupBy(
            F.concat(F.col("best_a"), F.col("best_b")).alias("new_symbol"),
            F.concat_ws(" ", F.col("p.ma"), F.col("p.mb")).alias("pair"),
        )
        .agg(F.sum("wcnt").alias("pair_count"))
    )
    return after.orderBy(F.desc("pair_count"), "pair").limit(TOP_PAIRS)


BPE_SQL = f"""
WITH RECURSIVE vocab AS (
  SELECT word, count(*) AS wcnt,
         list_transform(generate_series(1, length(word)), i -> substr(word, i, 1)) AS syms
  FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS word
        FROM documents)
  GROUP BY word
),
pair_counts AS (
  SELECT p.ma AS ma, p.mb AS mb, sum(wcnt) AS n
  FROM (SELECT wcnt,
               unnest(CASE WHEN len(syms) < 2 THEN []
                      ELSE list_transform(generate_series(1, len(syms) - 1),
                           i -> struct_pack(ma := syms[i], mb := syms[i + 1])) END) AS p
        FROM vocab)
  GROUP BY 1, 2
),
best AS (
  SELECT ma AS best_a, mb AS best_b FROM pair_counts ORDER BY n DESC, ma, mb LIMIT 1
),
-- greedy merge application as a recursive CTE (no lambda folds: DuckDB
-- 1.0's list_reduce is nondeterministic on larger vectorized inputs)
walk AS (
  SELECT word, wcnt, best_a, best_b, syms, len(syms)::BIGINT AS L,
         1::BIGINT AS i, []::VARCHAR[] AS acc
  FROM vocab, best
  UNION ALL
  SELECT word, wcnt, best_a, best_b, syms, L, i + 1,
         CASE WHEN len(acc) > 0 AND acc[len(acc)] = best_a AND syms[i::INT] = best_b
              THEN list_append(acc[1:len(acc) - 1], best_a || best_b)
              ELSE list_append(acc, syms[i::INT]) END
  FROM walk WHERE i <= L
),
merged AS (
  SELECT wcnt, best_a, best_b, acc AS newsyms FROM walk WHERE i = L + 1
),
after AS (
  SELECT best_a || best_b AS new_symbol,
         p.ma || ' ' || p.mb AS pair,
         CAST(sum(wcnt) AS BIGINT) AS pair_count
  FROM (SELECT wcnt, best_a, best_b,
               unnest(CASE WHEN len(newsyms) < 2 THEN []
                      ELSE list_transform(generate_series(1, len(newsyms) - 1),
                           i -> struct_pack(ma := newsyms[i], mb := newsyms[i + 1])) END) AS p
        FROM merged)
  GROUP BY 1, 2
)
SELECT new_symbol, pair, pair_count
FROM after ORDER BY pair_count DESC, pair LIMIT {TOP_PAIRS}
"""

QUERIES["bpe_merge_step"] = bpe_merge_step
ORACLES["bpe_merge_step"] = BPE_SQL


# --- add-k smoothed bigram LM scoring ----------------------------------------

def quality_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "CASE WHEN size(toks) < 2 THEN array() "
                "ELSE transform(sequence(1, size(toks) - 1), "
                "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2)) END"
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))

    uni = (
        docs.select(F.explode(tokens(F.col("text"))).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    vsize = uni.agg(F.count(F.lit(1)).alias("v"))

    lp = F.log10(
        (F.col("c2") + F.lit(ADD_K)) / (F.col("c1") + F.lit(ADD_K) * F.col("v"))
    )
    scored = (
        bigrams.join(bi, ["w1", "w2"])
        .join(uni, "w1")
        .crossJoin(F.broadcast(vsize))
        .select("doc_id", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.round(F.avg("lp"), 6).alias("mean_log10_prob"),
        F.round(F.min("lp"), 6).alias("min_log10_prob"),
    )


BIGRAM_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
),
bigrams AS (
  SELECT doc_id, p.w1 AS w1, p.w2 AS w2
  FROM (SELECT doc_id,
               unnest(CASE WHEN len(toks) < 2 THEN []
                      ELSE list_transform(generate_series(1, len(toks) - 1),
                           i -> struct_pack(w1 := toks[i], w2 := toks[i + 1])) END) AS p
        FROM toks)
),
uni AS (
  SELECT w1, count(*) AS c1
  FROM (SELECT unnest(toks) AS w1 FROM toks)
  GROUP BY w1
),
bi AS (SELECT w1, w2, count(*) AS c2 FROM bigrams GROUP BY w1, w2),
vsize AS (SELECT count(*) AS v FROM uni)
SELECT doc_id,
       count(*) AS n_bigrams,
       round(avg(log10((c2 + {ADD_K}) / (c1 + {ADD_K} * v))), 6) AS mean_log10_prob,
       round(min(log10((c2 + {ADD_K}) / (c1 + {ADD_K} * v))), 6) AS min_log10_prob
FROM bigrams JOIN bi USING (w1, w2) JOIN uni USING (w1), vsize
GROUP BY doc_id
"""

QUERIES["quality_bigram_logprob"] = quality_bigram_logprob
ORACLES["quality_bigram_logprob"] = BIGRAM_SQL


# --- greedy longest-match subword segmentation -------------------------------

VOCAB_K = 64  # multi-char subword vocabulary size (singles are implicit)
MAX_PIECE = 4


def tokenizer_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply a subword tokenizer: greedy longest-match segmentation of
    every word against a corpus-derived vocabulary (the top VOCAB_K
    2..4-char substrings by weighted frequency; single characters are
    the implicit fallback) — the WordPiece-style inference pass to
    `bpe_merge_step`'s training pass, and the deterministic stand-in
    for the reference's tiktoken counting
    (`semantic search/stage_01_chapter_processing.py:314`).

    Scale shape: segmentation cost is bounded by the DISTINCT-word
    table, not the corpus — each distinct word is segmented once by a
    JVM fold (longest-match-at-position is a recursion, inexpressible
    as SQL windows) and the per-word piece count joins back onto the
    exploded corpus. The vocabulary rides a 1-row sorted-array
    broadcast. The oracle runs the identical fold via a recursive CTE
    with the same step logic (not list_reduce, which was found
    nondeterministic — see the inline SQL comment).
    """
    vocab_words = _vocab(spark, sf_dir)  # (word, wcnt), distinct words

    subs = vocab_words.select(
        "wcnt",
        F.explode(
            F.expr(
                f"flatten(transform(sequence(2, {MAX_PIECE}), "
                "l -> CASE WHEN length(word) >= l THEN "
                "transform(sequence(1, length(word) - l + 1), i -> substring(word, i, l)) "
                "ELSE cast(array() as array<string>) END))"
            )
        ).alias("sub"),
    )
    top = (
        subs.groupBy("sub")
        .agg(F.sum("wcnt").alias("n"))
        .orderBy(F.desc("n"), "sub")
        .limit(VOCAB_K)
        .agg(F.sort_array(F.collect_list("sub")).alias("vocab"))
    )

    fold = f"""
    aggregate(sequence(1, length(word)), named_struct('pos', 1, 'n', 0),
      (acc, j) -> CASE WHEN j != acc.pos THEN acc
        WHEN length(word) - acc.pos >= 3 AND array_contains(vocab, substring(word, acc.pos, 4)) THEN named_struct('pos', acc.pos + 4, 'n', acc.n + 1)
        WHEN length(word) - acc.pos >= 2 AND array_contains(vocab, substring(word, acc.pos, 3)) THEN named_struct('pos', acc.pos + 3, 'n', acc.n + 1)
        WHEN length(word) - acc.pos >= 1 AND array_contains(vocab, substring(word, acc.pos, 2)) THEN named_struct('pos', acc.pos + 2, 'n', acc.n + 1)
        ELSE named_struct('pos', acc.pos + 1, 'n', acc.n + 1) END,
      acc -> acc.n)
    """
    segmented = vocab_words.crossJoin(F.broadcast(top)).select(
        "word", F.expr(fold).cast("bigint").alias("n_pieces")
    )

    doc_words = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    )
    return (
        doc_words.join(segmented, "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_pieces").alias("n_pieces"),
            F.round(F.sum("n_pieces") / F.count(F.lit(1)), 6).alias("pieces_per_word"),
        )
    )


SEGMENT_SQL = f"""
WITH RECURSIVE vocab_words AS (
  SELECT word, count(*) AS wcnt
  FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS word
        FROM documents)
  GROUP BY word
),
subs AS (
  SELECT sub, sum(wcnt) AS n
  FROM (SELECT wcnt,
               unnest(flatten(list_transform(generate_series(2, {MAX_PIECE}),
                 l -> CASE WHEN length(word) >= l
                      THEN list_transform(generate_series(1, length(word) - l + 1),
                                          i -> substr(word, i, l))
                      ELSE [] END))) AS sub
        FROM vocab_words)
  GROUP BY sub
),
top_subs AS (
  SELECT sub FROM subs ORDER BY n DESC, sub LIMIT {VOCAB_K}
),
-- per-(word, position) longest vocab match as a plain relational join,
-- then the greedy walk as a recursive CTE (bounded by word length).
-- DuckDB 1.0's list_reduce gives nondeterministic results on larger
-- vectorized inputs (observed: same query, different per-row folds
-- run-to-run), so the oracle uses no folds at all — the recursive CTE
-- is the same device the connected-components oracle relies on.
positions AS (
  SELECT word, unnest(generate_series(1, length(word))) AS j FROM vocab_words
),
matched AS (
  SELECT p.word, p.j, coalesce(max(CASE WHEN ts.sub IS NOT NULL THEN c.l END), 1)::BIGINT AS ml
  FROM positions p
  LEFT JOIN (SELECT word, j, l
             FROM positions, (SELECT unnest([2, 3, {MAX_PIECE}]) AS l)
             WHERE j + l - 1 <= length(word)) c
    ON p.word = c.word AND p.j = c.j
  LEFT JOIN top_subs ts ON substr(c.word, c.j::INT, c.l::INT) = ts.sub
  GROUP BY p.word, p.j
),
walk AS (
  SELECT word, 1::BIGINT AS pos, 0::BIGINT AS n, length(word)::BIGINT AS len
  FROM vocab_words
  UNION ALL
  SELECT w.word, w.pos + m.ml, w.n + 1, w.len
  FROM walk w JOIN matched m ON m.word = w.word AND m.j = w.pos
  WHERE w.pos <= w.len
),
segmented AS (
  SELECT word, max(n)::BIGINT AS n_pieces FROM walk WHERE pos > len GROUP BY word
)
SELECT doc_id,
       count(*) AS n_words,
       sum(n_pieces)::BIGINT AS n_pieces,
       round(sum(n_pieces) / CAST(count(*) AS DOUBLE), 6) AS pieces_per_word
FROM (SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS word
      FROM documents) dw
JOIN segmented USING (word)
GROUP BY doc_id
"""

QUERIES["tokenizer_segment"] = tokenizer_segment
ORACLES["tokenizer_segment"] = SEGMENT_SQL


# --- greedy bigram decoding ----------------------------------------------------
#
# Deterministic inference on the engine: from each source's most
# frequent token, follow the argmax bigram DECODE_STEPS times — the
# greedy-decode smoke test an LM-data pipeline runs to eyeball what
# its n-gram statistics actually encode (and a showcase that iterative
# inference is expressible as bounded relational rounds). The bigram
# argmax table is one corpus aggregation + a per-w1 keyed window
# (vocabulary-sized keyed partitions, no global window); each decode
# step is a tiny-broadcast ⋈ vocab-keyed join, DECODE_STEPS bounded.
# Ties everywhere break (count DESC, token ASC). Chains that reach a
# token with no outgoing bigram stop early — row count is the graded
# signal for that.

DECODE_STEPS = 8


def bigram_greedy_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    toks = docs.select("source", F.filter(F.split("text", r"\s+"), lambda t: t != "").alias("toks"))
    # per-source start token: most frequent token (count desc, token asc)
    per_src = (
        toks.select("source", F.explode("toks").alias("w"))
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    start = (
        per_src.withColumn(
            "rn", F.row_number().over(_W.partitionBy("source").orderBy(F.desc("c"), "w"))
        )
        .where(F.col("rn") == 1)
        .select("source", F.col("w").alias("token"))
    )
    # bigram argmax: w1 -> next (count desc, w2 asc)
    pairs = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) < 2 THEN array() "
                "ELSE zip_with(slice(toks, 1, size(toks) - 1), slice(toks, 2, size(toks) - 1), "
                "(a, b) -> struct(a AS w1, b AS w2)) END"
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    best = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("rn", F.row_number().over(_W.partitionBy("w1").orderBy(F.desc("c"), "w2")))
        .where(F.col("rn") == 1)
        .select("w1", F.col("w2").alias("nxt"))
        .localCheckpoint(eager=False)  # pinned: probed every decode step
    )
    # ONE walk accumulating the whole path, then a single posexplode —
    # the former per-step frames union re-evaluated every chain prefix
    # independently (Σ i = 44 probe joins across the 9 frames); the
    # left-join chain probes `best` once per step (8 scans of the pin)
    # and null propagation reproduces the early stop exactly: a token
    # with no outgoing bigram yields NULL, every later hop stays NULL,
    # and the final filter drops precisely the steps the inner-join
    # form never emitted.
    walk = start.select("source", F.col("token").alias("t0"))
    for i in range(1, DECODE_STEPS + 1):
        b_i = best.select(F.col("w1").alias(f"_w{i}"), F.col("nxt").alias(f"t{i}"))
        walk = (
            F.broadcast(walk)
            .join(b_i, F.col(f"t{i - 1}") == F.col(f"_w{i}"), "left")
            .drop(f"_w{i}")
        )
    return (
        walk.select(
            "source",
            F.posexplode(
                F.array(*[F.col(f"t{i}") for i in range(DECODE_STEPS + 1)])
            ).alias("step", "token"),
        )
        .where(F.col("token").isNotNull())
        .select("source", F.col("step").cast("bigint").alias("step"), "token")
    )


def _decode_sql() -> str:
    steps = ",\n".join(
        f"""g{i} AS (
  SELECT g.source, {i}::BIGINT AS step, b.nxt AS token
  FROM g{i - 1} g JOIN best b ON b.w1 = g.token
)"""
        for i in range(1, DECODE_STEPS + 1)
    )
    union = "\nUNION ALL\n".join(
        f"SELECT source, step, token FROM g{i}" for i in range(DECODE_STEPS + 1)
    )
    return f"""
WITH t AS (
  SELECT source, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
),
per_src AS (
  SELECT source, w, count(*) AS c
  FROM (SELECT source, unnest(toks) AS w FROM t) GROUP BY 1, 2
),
start AS (
  SELECT source, w AS token FROM (
    SELECT source, w, row_number() OVER (PARTITION BY source ORDER BY c DESC, w ASC) AS rn
    FROM per_src
  ) WHERE rn = 1
),
pairs AS (
  SELECT toks[i] AS w1, toks[i + 1] AS w2, count(*) AS c
  FROM (SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i
        FROM t WHERE len(toks) >= 2)
  GROUP BY 1, 2
),
best AS (
  SELECT w1, w2 AS nxt FROM (
    SELECT w1, w2, row_number() OVER (PARTITION BY w1 ORDER BY c DESC, w2 ASC) AS rn
    FROM pairs
  ) WHERE rn = 1
),
g0 AS (SELECT source, 0::BIGINT AS step, token FROM start),
{steps}
{union}
"""


BIGRAM_DECODE_SQL = _decode_sql()

QUERIES["bigram_greedy_decode"] = bigram_greedy_decode
ORACLES["bigram_greedy_decode"] = BIGRAM_DECODE_SQL


# --- multi-round BPE training ------------------------------------------------
#
# The trainer that bpe_merge_step is one iteration of: BPE_ROUNDS
# merges learned end-to-end (Sennrich et al. 2016, the standard
# subword-vocabulary construction).  Each round re-counts adjacent
# symbol pairs over the CURRENT vocabulary (weighted by word
# frequency), picks the argmax merge (count desc, pair asc —
# deterministic), and applies it with the greedy left-to-right fold
# before the next round counts again — the actual merge-table
# artifact a tokenizer ships.
#
# Scale: the corpus collapses to its word vocabulary ONCE; all R
# rounds run over the vocab (Zipf head — bounded), each round one
# bounded pair count + a 1-row broadcast argmax + a per-word fold.
# The Spark loop pins the vocabulary between rounds (lazy
# localCheckpoint) so round R's plan does not inline R nested folds.
# Oracle: R unrolled CTE blocks, each with the recursive merge walk.

BPE_ROUNDS = 4


def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    vocab = _vocab(spark, sf_dir).withColumn("syms", F.expr(_CHARS)).select(
        "wcnt", "syms"
    )
    results = []
    for r in range(1, BPE_ROUNDS + 1):
        vocab = vocab.localCheckpoint(eager=False)
        pair_counts = (
            vocab.select("wcnt", F.explode(F.expr(_PAIRS)).alias("p"))
            .groupBy(F.col("p.ma").alias("ma"), F.col("p.mb").alias("mb"))
            .agg(F.sum("wcnt").alias("n"))
        )
        best = pair_counts.orderBy(F.desc("n"), "ma", "mb").limit(1)
        results.append(
            best.select(
                F.lit(r).cast("bigint").alias("round"),
                F.concat_ws(" ", "ma", "mb").alias("pair"),
                F.concat("ma", "mb").alias("new_symbol"),
                F.col("n").cast("bigint").alias("support_count"),
            )
        )
        bcols = best.select(
            F.col("ma").alias("best_a"), F.col("mb").alias("best_b")
        )
        vocab = (
            vocab.crossJoin(F.broadcast(bcols))
            .withColumn(
                "msyms",
                F.aggregate(
                    F.col("syms"),
                    F.expr("cast(array() as array<string>)"),
                    lambda acc, s: F.when(
                        (F.size(acc) > 0)
                        & (F.element_at(acc, -1) == F.col("best_a"))
                        & (s == F.col("best_b")),
                        F.concat(
                            F.slice(acc, 1, F.size(acc) - 1),
                            F.array(F.concat(F.col("best_a"), F.col("best_b"))),
                        ),
                    ).otherwise(F.concat(acc, F.array(s))),
                ),
            )
            .select("wcnt", F.col("msyms").alias("syms"))
        )
    out = results[0]
    for p in results[1:]:
        out = out.unionByName(p)
    return out


def _bpe_train_sql() -> str:
    pairs_of = (
        "CASE WHEN len({s}) < 2 THEN [] "
        "ELSE list_transform(generate_series(1, len({s}) - 1), "
        "i -> struct_pack(ma := {s}[i], mb := {s}[i + 1])) END"
    )
    blocks = [
        """vocab0 AS (
  SELECT count(*)::BIGINT AS wcnt,
         list_transform(generate_series(1, length(word)), i -> substr(word, i, 1)) AS syms
  FROM (SELECT unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS word
        FROM documents)
  GROUP BY word
)"""
    ]
    for r in range(1, BPE_ROUNDS + 1):
        v0, v1 = f"vocab{r - 1}", f"vocab{r}"
        blocks.append(
            f"""pc{r} AS (
  SELECT p.ma AS ma, p.mb AS mb, CAST(sum(wcnt) AS BIGINT) AS n
  FROM (SELECT wcnt, unnest({pairs_of.format(s="syms")}) AS p FROM {v0})
  GROUP BY 1, 2
),
best{r} AS (SELECT ma, mb, n FROM pc{r} ORDER BY n DESC, ma, mb LIMIT 1),
walk{r} AS (
  SELECT wcnt, ma AS best_a, mb AS best_b, syms, len(syms)::BIGINT AS L,
         1::BIGINT AS i, []::VARCHAR[] AS acc
  FROM {v0}, best{r}
  UNION ALL
  SELECT wcnt, best_a, best_b, syms, L, i + 1,
         CASE WHEN len(acc) > 0 AND acc[len(acc)] = best_a AND syms[i::INT] = best_b
              THEN list_append(acc[1:len(acc) - 1], best_a || best_b)
              ELSE list_append(acc, syms[i::INT]) END
  FROM walk{r} WHERE i <= L
),
{v1} AS (SELECT wcnt, acc AS syms FROM walk{r} WHERE i = L + 1)"""
        )
    arms = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS round, ma || ' ' || mb AS pair,"
        f" ma || mb AS new_symbol, n AS support_count FROM best{r}"
        for r in range(1, BPE_ROUNDS + 1)
    )
    return "WITH RECURSIVE " + ",\n".join(blocks) + "\n" + arms


BPE_TRAIN_SQL = _bpe_train_sql()

QUERIES["bpe_train_merges"] = bpe_train_merges
ORACLES["bpe_train_merges"] = BPE_TRAIN_SQL


# --- Kneser-Ney smoothed bigram table ------------------------------------------
#
# The third smoothing rung after add-k (quality_bigram_logprob): KN
# (Kneser & Ney 1995, absolute discounting + continuation probability)
# is what production n-gram LMs actually ship.  For the corpus's top
# bigrams the query emits the full KN decomposition next to the MLE:
#
#   P_KN(w2|w1) = max(c12 - d, 0)/c1  +  d * N1+(w1.)/c1 * Pcont(w2)
#   Pcont(w2)   = N1+(.w2) / n_bigram_types
#
# with d = 0.75 = 3/4, so 4*c12 - 3 keeps the discount exactly
# integral; probabilities land in micro units through a FIXED chain of
# truncating divs (identical composition in both engines — the device
# accepts the composed-div quantization because both engines compute
# the identical integers).  Left counts c1 = sum_w2 c12 are the
# bigram-consistent marginals, as the estimator requires.
#
# Scale: one explode to bigram counts (Zipf head after the groupBy);
# the three marginals (left counts, left/right continuation fan-outs,
# type total) are aggregates OF THE COUNTS table, broadcast back; the
# top-N cut is TakeOrderedAndProject.

KN_TOP = 30


def ngram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", tokens(F.col("text")).alias("toks"))
    bigrams = toks.select(
        F.explode(
            F.expr(
                "CASE WHEN size(toks) < 2 THEN array() "
                "ELSE transform(sequence(1, size(toks) - 1), "
                "i -> struct(element_at(toks, i) AS w1, element_at(toks, i + 1) AS w2)) END"
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bi = bigrams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    left = bi.groupBy("w1").agg(
        F.sum("c12").alias("c1"), F.count(F.lit(1)).alias("n1f")
    )
    right = bi.groupBy("w2").agg(F.count(F.lit(1)).alias("n1b"))
    types = bi.agg(F.count(F.lit(1)).alias("n_types"))
    return (
        bi.join(F.broadcast(left), "w1")
        .join(F.broadcast(right), "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            F.col("c12").cast("bigint").alias("c12"),
            F.col("c1").cast("bigint").alias("c1"),
            F.col("n1f").cast("bigint").alias("n1f"),
            F.col("n1b").cast("bigint").alias("n1b"),
            F.expr("c12 * 1000000 div c1").cast("bigint").alias("p_mle_micro"),
            F.expr(
                "greatest(4 * c12 - 3, 0) * 1000000 div (4 * c1)"
                " + ((3 * n1f * 1000000 div (4 * c1)) * n1b) div n_types"
            ).cast("bigint").alias("p_kn_micro"),
        )
        .orderBy(F.desc("c12"), F.asc("w1"), F.asc("w2"))
        .limit(KN_TOP)
    )


KNESER_NEY_SQL = f"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
),
bigrams AS (
  SELECT p.w1 AS w1, p.w2 AS w2
  FROM (SELECT unnest(CASE WHEN len(toks) < 2 THEN []
               ELSE list_transform(generate_series(1, len(toks) - 1),
                    i -> struct_pack(w1 := toks[i], w2 := toks[i + 1])) END) AS p
        FROM toks)
),
bi AS (SELECT w1, w2, count(*)::BIGINT AS c12 FROM bigrams GROUP BY w1, w2),
lft AS (SELECT w1, CAST(sum(c12) AS BIGINT) AS c1, count(*)::BIGINT AS n1f FROM bi GROUP BY w1),
rgt AS (SELECT w2, count(*)::BIGINT AS n1b FROM bi GROUP BY w2),
types AS (SELECT count(*)::BIGINT AS n_types FROM bi)
SELECT w1, w2, c12, c1, n1f, n1b,
       CAST(c12 * 1000000 // c1 AS BIGINT) AS p_mle_micro,
       CAST(greatest(4 * c12 - 3, 0) * 1000000 // (4 * c1)
            + ((3 * n1f * 1000000 // (4 * c1)) * n1b) // n_types AS BIGINT) AS p_kn_micro
FROM bi JOIN lft USING (w1) JOIN rgt USING (w2) CROSS JOIN types
ORDER BY c12 DESC, w1, w2 LIMIT {KN_TOP}
"""

QUERIES["ngram_kneser_ney"] = ngram_kneser_ney
ORACLES["ngram_kneser_ney"] = KNESER_NEY_SQL


# --- Good-Turing frequency re-estimation --------------------------------------
#
# The third leg of the smoothing family next to add-k
# (quality_bigram_logprob) and Kneser-Ney (ngram_kneser_ney): Good's
# (1953) frequency-of-frequencies re-estimate r* = (r+1) N_{r+1} / N_r,
# the classic answer to "how much probability mass belongs to words we
# have never seen?" (p0 = N_1 / N).  A corpus-health dashboard reads
# the r*-vs-r deflation directly: heavy singleton mass means the crawl
# is still discovering vocabulary (cf. heaps_law_fit).
#
# Runs over word TRIGRAMS: the unigram vocabulary of any corpus head
# is all high-frequency (no N_1 mass to re-estimate), while the
# trigram table has the long singleton tail Good-Turing exists for —
# the same grain doc_decontaminate/corpus_ngram_novelty key on.
#
# Scale: ONE explode → trigram-count aggregation (the Zipf-head
# reduction every LM operator here rides); the frequency-of-
# frequencies table is O(distinct counts) rows, and the head rows
# r ≤ GT_MAX_R are a constant-size output.  All arithmetic is exact
# integers — milli/micro fixed-point via truncating div — so the
# oracle hash-matches without any float device.

GT_MAX_R = 10


def good_turing_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select(tokens(F.col("text")).alias("toks"))
        .select(
            F.explode(
                F.expr(
                    "CASE WHEN size(toks) < 3 THEN array() "
                    "ELSE transform(sequence(1, size(toks) - 2), "
                    "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),"
                    " element_at(toks, i + 2))) END"
                )
            ).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("r"))
    )
    nr = wc.groupBy("r").agg(F.count(F.lit(1)).alias("n_r"))
    tot = nr.agg(
        F.sum(F.expr("r * n_r")).alias("n_tokens"),
        F.sum(F.expr("case when r = 1 then n_r else 0 end")).alias("n1"),
    )
    nxt = nr.select((F.col("r") - 1).alias("r"), F.col("n_r").alias("n_r_next"))
    head = (
        nr.where(F.col("r") <= GT_MAX_R)
        .join(F.broadcast(nxt), "r", "left")
        .crossJoin(F.broadcast(tot))
    )
    return head.select(
        F.col("r").cast("bigint").alias("r"),
        F.col("n_r").cast("bigint").alias("n_r"),
        F.coalesce("n_r_next", F.lit(0)).cast("bigint").alias("n_r_next"),
        F.expr(
            "case when coalesce(n_r_next, 0) > 0 then"
            " (r + 1) * n_r_next * 1000 div n_r"
            " else cast(null as bigint) end"
        ).alias("r_star_milli"),
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.expr("n1 * 1000000 div n_tokens").cast("bigint").alias("p_unseen_micro"),
    )


GOOD_TURING_SQL = f"""
WITH toks AS (
  SELECT list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t FROM documents
),
wc AS (
  SELECT w, count(*)::BIGINT AS r
  FROM (SELECT t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS w
        FROM toks, unnest(range(1, len(t) - 1)) AS u(i)
        WHERE len(t) >= 3)
  GROUP BY w
),
nr AS (SELECT r, count(*)::BIGINT AS n_r FROM wc GROUP BY r),
tot AS (
  SELECT CAST(sum(r * n_r) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN r = 1 THEN n_r ELSE 0 END) AS BIGINT) AS n1
  FROM nr
)
SELECT nr.r, nr.n_r,
       COALESCE(nxt.n_r, 0)::BIGINT AS n_r_next,
       CASE WHEN COALESCE(nxt.n_r, 0) > 0 THEN
         CAST((nr.r + 1) * nxt.n_r * 1000 // nr.n_r AS BIGINT)
       ELSE CAST(NULL AS BIGINT) END AS r_star_milli,
       tot.n_tokens,
       CAST(tot.n1 * 1000000 // tot.n_tokens AS BIGINT) AS p_unseen_micro
FROM nr LEFT JOIN nr nxt ON nxt.r = nr.r + 1
CROSS JOIN tot
WHERE nr.r <= {GT_MAX_R}
"""

QUERIES["good_turing_counts"] = good_turing_counts
ORACLES["good_turing_counts"] = GOOD_TURING_SQL


# --- SentencePiece-style unigram vocabulary prune scoring -----------------------
#
# The third tokenizer-training primitive (after the BPE merge step and
# the Kneser-Ney table): unigram-LM vocabulary pruning (Kudo 2018).
# Each candidate piece is scored by the corpus log-likelihood LOST if
# it were removed from the vocabulary and its occurrences fell back to
# the character model: delta(piece) = count(piece) * (ln p(piece) -
# sum_chars ln p(char)).  SentencePiece prunes the lowest-delta tail
# each EM round; the output here is that prune shortlist — the 50
# safest removals — plus each piece's exact count and scaled delta.
#
# Pieces are character trigrams of the lowercased text (the corpus's
# word vocabulary is deliberately tiny; the trigram grain has a real
# frequency tail).  ln is the identical-IEEE-double device quantized
# to 1e-4 (floor(ln(c) * 10000)), so every delta is exact integer
# arithmetic in both engines.
#
# Scale: two explode→hash-agg passes (map-side combine bounds shuffle
# rows by distinct pieces per partition, not corpus size); the scoring
# join runs on the VOCAB (distinct trigrams x 3 char positions) with
# the char table broadcast — nothing pair-wise, nothing corpus-grain
# after the counts exist.  The final top-50 is TakeOrderedAndProject.

_UP_LQ = 10_000
UNIGRAM_PRUNE_TOPK = 50


def unigram_prune_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        F.lower("text").alias("t")
    ).where(F.length("t") >= 3)
    tris = (
        docs.select(
            F.explode(
                F.expr("transform(sequence(1, length(t) - 2), i -> substring(t, i, 3))")
            ).alias("tri")
        )
        .groupBy("tri")
        .agg(F.count(F.lit(1)).alias("c_tri"))
    )
    chars = (
        docs.select(
            F.explode(
                F.expr("transform(sequence(1, length(t)), i -> substring(t, i, 1))")
            ).alias("ch")
        )
        .groupBy("ch")
        .agg(F.count(F.lit(1)).alias("c_ch"))
    )
    n_tri = tris.agg(F.sum("c_tri").alias("n_tri"))
    n_ch = chars.agg(F.sum("c_ch").alias("n_ch"))
    lnq = lambda c: F.expr(f"cast(floor(ln(cast({c} as double)) * {_UP_LQ}) as bigint)")
    per_pos = (
        tris.select(
            "tri", "c_tri", F.explode(F.sequence(F.lit(1), F.lit(3))).alias("pos")
        )
        .withColumn("ch", F.expr("substring(tri, pos, 1)"))
        .join(F.broadcast(chars), "ch")
        .groupBy("tri", "c_tri")
        .agg(F.sum(lnq("c_ch")).alias("sum_lnq_cch"))
    )
    scored = (
        per_pos.crossJoin(F.broadcast(n_tri))
        .crossJoin(F.broadcast(n_ch))
        .select(
            "tri",
            F.col("c_tri").cast("bigint").alias("piece_count"),
            (
                F.col("c_tri")
                * (
                    (lnq("c_tri") - lnq("n_tri"))
                    - (F.col("sum_lnq_cch") - 3 * lnq("n_ch"))
                )
            ).cast("bigint").alias("delta_llq"),
        )
    )
    return scored.orderBy(F.col("delta_llq").asc(), F.col("tri").asc()).limit(
        UNIGRAM_PRUNE_TOPK
    )


UNIGRAM_PRUNE_SQL = f"""
WITH docs AS (
  SELECT lower(text) AS t FROM documents WHERE length(lower(text)) >= 3
),
tris AS (
  SELECT tri, count(*)::BIGINT AS c_tri
  FROM docs, unnest(list_transform(generate_series(1, length(t) - 2),
                                   i -> substr(t, i, 3))) u(tri)
  GROUP BY tri
),
chars AS (
  SELECT ch, count(*)::BIGINT AS c_ch
  FROM docs, unnest(list_transform(generate_series(1, length(t)),
                                   i -> substr(t, i, 1))) u(ch)
  GROUP BY ch
),
n_tri AS (SELECT CAST(sum(c_tri) AS BIGINT) AS n_tri FROM tris),
n_ch AS (SELECT CAST(sum(c_ch) AS BIGINT) AS n_ch FROM chars),
per_pos AS (
  SELECT t.tri, t.c_tri,
         CAST(sum(CAST(floor(ln(CAST(c.c_ch AS DOUBLE)) * {_UP_LQ}) AS BIGINT)) AS BIGINT) AS sum_lnq_cch
  FROM tris t
  CROSS JOIN (VALUES (1), (2), (3)) p(pos)
  JOIN chars c ON c.ch = substr(t.tri, p.pos, 1)
  GROUP BY t.tri, t.c_tri
)
SELECT tri, c_tri AS piece_count,
       CAST(c_tri * (
         (CAST(floor(ln(CAST(c_tri AS DOUBLE)) * {_UP_LQ}) AS BIGINT)
          - CAST(floor(ln(CAST(n_tri.n_tri AS DOUBLE)) * {_UP_LQ}) AS BIGINT))
         - (sum_lnq_cch - 3 * CAST(floor(ln(CAST(n_ch.n_ch AS DOUBLE)) * {_UP_LQ}) AS BIGINT))
       ) AS BIGINT) AS delta_llq
FROM per_pos CROSS JOIN n_tri CROSS JOIN n_ch
ORDER BY delta_llq ASC, tri ASC
LIMIT {UNIGRAM_PRUNE_TOPK}
"""

QUERIES["unigram_prune_scores"] = unigram_prune_scores
ORACLES["unigram_prune_scores"] = UNIGRAM_PRUNE_SQL


# --- unigram-LM Viterbi segmentation (SentencePiece inference) -----------------
#
# The INFERENCE half of the unigram tokenizer lifecycle (Kudo 2018,
# "Subword Regularization"; SentencePiece's default model): segment
# each word into the piece sequence maximizing the summed piece
# log-probs via Viterbi DP — the optimal-segmentation counterpart to
# tokenizer_segment's greedy longest-match and the consumer of
# unigram_prune_scores' vocabulary shaping.  Pieces are 1..3 chars;
# single chars are always in-vocab (the SentencePiece fallback
# guarantee), 2-3 char pieces are vocab members iff their 32-bit md5
# hash % 4 == 0, and piece scores are planted arithmetically
# (milli log-probs: longer pieces score higher, hash jitter breaks
# ties) so the oracle reproduces the DP exactly.
#
# Scale shape: the DP runs once per DISTINCT word (a JVM aggregate()
# fold building the best-score + backpointer arrays, then a second
# fold backtraces — both O(word length)), and the per-word result
# broadcasts back onto the exploded corpus; the oracle runs the
# identical recursion as a recursive CTE with the same positive-range
# argmax encoding (cand + BIG) * 8 + j.

UV_MAX_PIECE = 3
_UV_BIG = 1_000_000  # shifts candidates positive so encode/decode is sign-safe

# planted milli log-prob of a piece: longer pieces win, hash jitters
_UV_SCORE = (
    "(-2200 + 320 * length({p}) + "
    "pmod(cast(conv(substring(md5({p}), 1, 8), 16, 10) as bigint), 97))"
)
_UV_SCORE_SQL = (
    "(-2200 + 320 * length({p}) + "
    "CAST('0x' || substr(md5({p}), 1, 8) AS BIGINT) % 97)"
)
# vocab membership: 1-char always; 2-3 char iff hash % 4 == 0
_UV_IN = "(length({p}) = 1 OR pmod(cast(conv(substring(md5({p}), 1, 8), 16, 10) as bigint), 4) = 0)"
_UV_IN_SQL = "(length({p}) = 1 OR CAST('0x' || substr(md5({p}), 1, 8) AS BIGINT) % 4 = 0)"


def tokenizer_unigram_viterbi(spark: SparkSession, sf_dir: str) -> DataFrame:
    words = _vocab(spark, sf_dir).select("word")

    def cand(j: int) -> str:
        p = f"substring(word, i - {j - 1}, {j})"
        return (
            f"CASE WHEN i >= {j} AND {_UV_IN.format(p=p)} "
            f"THEN (element_at(acc.best, i - {j} + 1) + {_UV_SCORE.format(p=p)} "
            f"+ {_UV_BIG}) * 8 + {j} ELSE -1 END"
        )

    forward = f"""
    aggregate(sequence(1, length(word)),
      named_struct('best', array(cast(0 as bigint)), 'jarr', cast(array() as array<int>)),
      (acc, i) -> named_struct(
        'best', acc.best || array((greatest({cand(1)}, {cand(2)}, {cand(3)}) div 8) - {_UV_BIG}),
        'jarr', acc.jarr || array(cast(greatest({cand(1)}, {cand(2)}, {cand(3)}) % 8 as int))))
    """
    back = """
    aggregate(sequence(1, length(word)),
      named_struct('pos', length(word), 'n', 0, 'lens', cast(array() as array<int>)),
      (acc, s) -> CASE WHEN acc.pos <= 0 THEN acc ELSE named_struct(
        'pos', acc.pos - element_at(jarr, acc.pos),
        'n', acc.n + 1,
        'lens', array(element_at(jarr, acc.pos)) || acc.lens) END)
    """
    per_word = (
        words.select("word", F.expr(forward).alias("fw"))
        .select("word", F.element_at("fw.best", -1).alias("score_milli"), F.col("fw.jarr").alias("jarr"))
        .select("word", "score_milli", F.expr(back).alias("bt"))
        .select(
            "word",
            "score_milli",
            F.col("bt.n").alias("n_pieces"),
            F.md5(
                F.encode(F.array_join(F.transform("bt.lens", lambda x: x.cast("string")), "|"), "utf-8")
            ).alias("seg_md5"),
        )
    )
    doc_words = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("word")
    )
    return (
        doc_words.join(F.broadcast(per_word), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_words"),
            F.sum("n_pieces").cast("bigint").alias("n_pieces"),
            F.sum("score_milli").cast("bigint").alias("viterbi_score_milli"),
        )
        .select(
            "doc_id", "n_words", "n_pieces", "viterbi_score_milli",
            F.expr("n_pieces * 1000 div n_words").alias("fertility_milli"),
        )
    )


def _uv_cand_sql(j: int) -> str:
    p = f"substr(word, i + 1 - {j - 1}, {j})"
    return (
        f"CASE WHEN i + 1 >= {j} AND {_UV_IN_SQL.format(p=p)} "
        f"THEN (best[i + 1 - {j} + 1] + {_UV_SCORE_SQL.format(p=p)} "
        f"+ {_UV_BIG}) * 8 + {j} ELSE -1 END"
    )


UNIGRAM_VITERBI_SQL = f"""
WITH RECURSIVE words AS (
  SELECT word FROM (
    SELECT unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS word
    FROM documents) GROUP BY word
),
fw AS (
  SELECT word, 0 AS i, [CAST(0 AS BIGINT)] AS best, CAST([] AS INT[]) AS jarr FROM words
  UNION ALL
  SELECT word, i + 1,
         best || [greatest({_uv_cand_sql(1)}, {_uv_cand_sql(2)}, {_uv_cand_sql(3)}) // 8 - {_UV_BIG}],
         jarr || [CAST(greatest({_uv_cand_sql(1)}, {_uv_cand_sql(2)}, {_uv_cand_sql(3)}) % 8 AS INT)]
  FROM fw WHERE i < length(word)
),
done AS (
  SELECT word, best[length(word) + 1] AS score_milli, jarr
  FROM fw WHERE i = length(word)
),
bt AS (
  SELECT word, score_milli, jarr, length(word) AS pos, 0 AS n, CAST([] AS INT[]) AS lens
  FROM done
  UNION ALL
  SELECT word, score_milli, jarr, pos - jarr[pos], n + 1, [jarr[pos]] || lens
  FROM bt WHERE pos > 0
),
per_word AS (
  SELECT word, score_milli, n AS n_pieces,
         md5(array_to_string(list_transform(lens, x -> x::VARCHAR), '|')) AS seg_md5
  FROM bt WHERE pos = 0
),
doc_words AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS word
  FROM documents
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_words,
       CAST(sum(n_pieces) AS BIGINT) AS n_pieces,
       CAST(sum(score_milli) AS BIGINT) AS viterbi_score_milli,
       CAST(sum(n_pieces) * 1000 // count(*) AS BIGINT) AS fertility_milli
FROM doc_words JOIN per_word USING (word)
GROUP BY doc_id
"""

QUERIES["tokenizer_unigram_viterbi"] = tokenizer_unigram_viterbi
ORACLES["tokenizer_unigram_viterbi"] = UNIGRAM_VITERBI_SQL
