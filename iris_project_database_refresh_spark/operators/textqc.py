"""Text analysis operators: language ID, quality scoring, fingerprinting.

Reference parity: the catalog pipeline derives per-document scope/usage
metadata (`catalog search/stage3_generate_summaries.py`) and validates
content before deployment (`catalog search/stage5_output_final_csv.py:261`
validate_csv_data). Those LLM-backed steps are re-expressed as
deterministic, oracle-checkable heuristics — the standard text-QC
operators an LLM-training-data pipeline needs.

Everything is built-in expressions (split/filter/size/md5) — zero
Python in the row path, so these run at parquet scan rate on a
cluster: one narrow map stage, no shuffle except fingerprint
clustering (one hash-partition on an md5 key, near-uniform by
construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.tables import load_table

# Real stopword profiles per supported language. The synthetic corpus is
# English-vocabulary regardless of its `lang` label, so `lang_id` honestly
# reports what the text contains; accuracy against the label is part of
# the output, not assumed.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "in", "to", "is"),
    "es": ("el", "la", "los", "de", "y", "que", "en"),
    "fr": ("le", "la", "les", "et", "de", "un", "une"),
    "de": ("der", "die", "das", "und", "ein", "zu", "ist"),
    "zh": ("de", "shi", "zai", "le", "he", "you", "wo"),
}
LANGS = tuple(sorted(STOPWORDS))


def _score(toks, words: tuple[str, ...]):
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language identification.

    argmax over per-language stopword hit counts with deterministic
    lexicographic tie-break; score 0 → 'und' (undetermined).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    scored = docs.select(
        "doc_id",
        F.col("lang").alias("label_lang"),
        *[_score(toks, STOPWORDS[lang]).alias(f"score_{lang}") for lang in LANGS],
    )
    best = F.greatest(*[F.col(f"score_{lang}") for lang in LANGS])
    pred = F.when(best == 0, F.lit("und"))
    for lang in LANGS:  # first lexicographic lang achieving the max wins
        pred = pred.when(F.col(f"score_{lang}") == best, F.lit(lang))
    return scored.select(
        "doc_id",
        "label_lang",
        pred.alias("pred_lang"),
        best.cast("bigint").alias("best_score"),
        (pred == F.col("label_lang")).cast("int").alias("is_correct"),
    )


def _sql_score(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_filter(toks, t -> t IN ({words})))"


LANG_ID_SQL = f"""
WITH scored AS (
  SELECT doc_id, lang AS label_lang,
         {", ".join(f"{_sql_score(lang)} AS score_{lang}" for lang in LANGS)}
  FROM (SELECT doc_id, lang, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks FROM documents)
), best AS (
  SELECT *, greatest({", ".join(f"score_{lang}" for lang in LANGS)}) AS best_score FROM scored
)
SELECT doc_id, label_lang,
       CASE WHEN best_score = 0 THEN 'und'
            {" ".join(f"WHEN score_{lang} = best_score THEN '{lang}'" for lang in LANGS)}
       END AS pred_lang,
       best_score,
       CAST(CASE WHEN best_score = 0 THEN 'und'
            {" ".join(f"WHEN score_{lang} = best_score THEN '{lang}'" for lang in LANGS)}
       END = label_lang AS INT) AS is_correct
FROM best
"""


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features + bucket.

    Mirrors stage5 validate_csv_data's required-field/zero-length checks
    plus the standard training-data quality heuristics (length, lexical
    diversity, stopword density). Includes the reference's token
    estimator (`semantic search/stage_01_chapter_processing.py:314`
    count_tokens: clamp(chars/3.5, chars//10, chars//2)).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_chars = F.length("text")
    est = F.greatest(
        F.floor(n_chars / 10),
        F.least(F.floor(n_chars / 3.5), F.floor(n_chars / 2)),
    ).cast("bigint")
    d = docs.select(
        "doc_id",
        "source",
        n_chars.cast("bigint").alias("n_chars"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_uniq_tokens"),
        est.alias("est_tokens"),
        _score(toks, STOPWORDS["en"]).cast("bigint").alias("n_stopwords"),
    )
    uniq_ratio = F.round(F.col("n_uniq_tokens") / F.col("n_tokens"), 6)
    stop_ratio = F.round(F.col("n_stopwords") / F.col("n_tokens"), 6)
    avg_tok = F.round((F.col("n_chars") - (F.col("n_tokens") - 1)) / F.col("n_tokens"), 6)
    return d.select(
        "*",
        uniq_ratio.alias("uniq_ratio"),
        stop_ratio.alias("stopword_ratio"),
        avg_tok.alias("avg_token_len"),
        F.when(F.col("n_tokens") < 20, "too_short")
        .when(uniq_ratio < 0.4, "repetitive")
        .otherwise("ok")
        .alias("quality_bucket"),
    )


QUALITY_SQL = """
WITH d AS (
  SELECT doc_id, source,
         CAST(length(text) AS BIGINT) AS n_chars,
         len(toks) AS n_tokens,
         len(list_distinct(toks)) AS n_uniq_tokens,
         CAST(greatest(length(text) // 10,
                       least(CAST(floor(length(text) / 3.5) AS BIGINT), length(text) // 2)) AS BIGINT) AS est_tokens,
         len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'in', 'to', 'is'))) AS n_stopwords
  FROM (SELECT *, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks FROM documents)
)
SELECT *,
       round(n_uniq_tokens / CAST(n_tokens AS DOUBLE), 6) AS uniq_ratio,
       round(n_stopwords / CAST(n_tokens AS DOUBLE), 6) AS stopword_ratio,
       round((n_chars - (n_tokens - 1)) / CAST(n_tokens AS DOUBLE), 6) AS avg_token_len,
       CASE WHEN n_tokens < 20 THEN 'too_short'
            WHEN round(n_uniq_tokens / CAST(n_tokens AS DOUBLE), 6) < 0.4 THEN 'repetitive'
            ELSE 'ok' END AS quality_bucket
FROM d
"""


def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """md5 content fingerprint + duplicate-cluster assignment.

    The cluster representative is min(doc_id) per fingerprint — the
    keep-first rule the catalog merge uses for re-processed files
    (`catalog search/stage4_update_csv.py:379` delete-then-append keyed
    on document identity). One shuffle on the fingerprint (uniform key).
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("fingerprint")
    return (
        docs.select("doc_id", "source", F.md5("text").alias("fingerprint"))
        .withColumn("cluster_id", F.min("doc_id").over(w))
        .withColumn("is_dup", (F.col("doc_id") != F.col("cluster_id")).cast("int"))
    )


FINGERPRINT_SQL = """
SELECT doc_id, source, md5(text) AS fingerprint,
       min(doc_id) OVER (PARTITION BY md5(text)) AS cluster_id,
       CAST(doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS INT) AS is_dup
FROM documents
"""


QUERIES = {
    "lang_id": lang_id,
    "quality_score": quality_score,
    "doc_fingerprint": doc_fingerprint,
}

ORACLES = {
    "lang_id": LANG_ID_SQL,
    "quality_score": QUALITY_SQL,
    "doc_fingerprint": FINGERPRINT_SQL,
}


# --- deterministic stratified sampling (data-mixing weights) -----------------

def corpus_sample_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source mixing-weight sampling: each source gets a
    deterministic sampling rate, membership decided by an md5
    hash-bernoulli on doc_id — reproducible across engines and runs,
    unlike ``df.sample()`` whose RNG stream is engine-specific. This is
    the training-data mixing primitive (upweight/downweight sources);
    the survivors plus per-source audit counts come back in one pass.

    Scale: per-row hash + filter (scan-rate), then one tiny agg on
    source — no data movement proportional to the corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    # rate in percent: deterministic per source name, spanning 20-90
    rate = 20 + F.pmod(F.length("source") * 37 + F.ascii(F.substring("source", -1, 1)), F.lit(71))
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast("bigint"),
        F.lit(100),
    )
    flagged = docs.select(
        "doc_id", "source", rate.cast("bigint").alias("rate_pct"), bucket.alias("bucket")
    ).withColumn("sampled", (F.col("bucket") < F.col("rate_pct")).cast("int"))
    return flagged.groupBy("source", "rate_pct").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("sampled").alias("n_sampled"),
        F.round(F.sum("sampled") / F.count(F.lit(1)), 6).alias("realized_rate"),
    )


SAMPLE_MIX_SQL = """
WITH flagged AS (
  SELECT doc_id, source,
         CAST(20 + (length(source) * 37 + ascii(source[-1])) % 71 AS BIGINT) AS rate_pct,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 100 AS bucket
  FROM documents
)
SELECT source, rate_pct,
       count(*) AS n_docs,
       CAST(sum(CAST(bucket < rate_pct AS INT)) AS BIGINT) AS n_sampled,
       round(sum(CAST(bucket < rate_pct AS INT)) / CAST(count(*) AS DOUBLE), 6) AS realized_rate
FROM flagged
GROUP BY source, rate_pct
"""

QUERIES["corpus_sample_mix"] = corpus_sample_mix
ORACLES["corpus_sample_mix"] = SAMPLE_MIX_SQL


# --- repetition stats (Gopher-style quality rules) ---------------------------

def quality_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document repetition signals: fraction of duplicate word
    trigrams and the share of the most frequent trigram — the standard
    repetition filters for pretraining corpora (catches boilerplate and
    degenerate repetition). Trigrams are md5-derived integer rolling
    hashes (the dedup representation), the top-count comes from a fold
    over the SORTED hash array (longest equal run) — O(k log k) per doc
    instead of the O(k^2) distinct-times-filter string scan, zero
    shuffle, scan-rate.

    Each stage (token hashes, trigram hashes, per-doc stats) is its own
    projection so the arrays materialize ONCE per row: higher-order
    lambdas are interpreted, so an inlined sub-expression referenced k
    times is re-evaluated k times — with `th` inlined into the trigram
    lambda this query was ~40x slower (56 s -> 1.4 s at sf0.1).
    CollapseProject keeps the stages separate because each array is
    non-cheap and referenced more than once downstream."""
    docs = load_table(spark, sf_dir, "documents")
    hashed = docs.select(
        "doc_id",
        F.transform(
            tokens(F.col("text")),
            lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint"),
        ).alias("th"),
    )
    trigrams = hashed.select(
        "doc_id",
        F.when(F.size("th") < 3, F.array().cast("array<bigint>"))
        .otherwise(
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.size("th") - 2, F.lit(1))),
                lambda i: (
                    (F.element_at(F.col("th"), i) * 31 + F.element_at(F.col("th"), i + 1))
                    * 31
                    + F.element_at(F.col("th"), i + 2)
                )
                % 4294967296,
            )
        )
        .alias("tri"),
    )
    acc0 = F.struct(
        F.lit(-1).cast("bigint").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(acc, x):
        run = F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            x.alias("prev"), run.alias("run"), F.greatest(acc["best"], run).alias("best")
        )

    top = F.aggregate(F.array_sort(F.col("tri")), acc0, step, lambda a: a["best"])
    base = trigrams.select(
        "doc_id",
        F.size("tri").alias("n_tri"),
        F.size(F.array_distinct("tri")).alias("n_uniq"),
        F.when(top > 0, top).alias("top_count"),
    )
    return base.select(
        "doc_id",
        F.col("n_tri").cast("bigint").alias("n_trigrams"),
        F.col("n_uniq").cast("bigint").alias("n_unique_trigrams"),
        F.when(F.col("n_tri") > 0, F.round((F.col("n_tri") - F.col("n_uniq")) / F.col("n_tri"), 6))
        .otherwise(F.lit(0.0))
        .alias("dup_trigram_fraction"),
        F.coalesce(F.col("top_count"), F.lit(0)).cast("bigint").alias("top_trigram_count"),
        F.when(F.col("n_tri") > 0, F.round(F.coalesce(F.col("top_count"), F.lit(0)) / F.col("n_tri"), 6))
        .otherwise(F.lit(0.0))
        .alias("top_trigram_share"),
    )


QUALITY_REPETITION_SQL = """
WITH t AS (
  SELECT doc_id,
         CASE WHEN len(th) < 3 THEN []
              ELSE list_transform(generate_series(1, len(th) - 2),
                                  i -> ((th[i] * 31 + th[i + 1]) * 31 + th[i + 2]) % 4294967296) END AS tri
  FROM (SELECT doc_id,
               list_transform(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''),
                              t -> CAST('0x' || substr(md5(t), 1, 8) AS BIGINT)) AS th
        FROM documents)
),
counts AS (
  SELECT doc_id, h, count(*) AS c
  FROM (SELECT doc_id, unnest(tri) AS h FROM t)
  GROUP BY doc_id, h
),
tops AS (SELECT doc_id, max(c) AS top_count FROM counts GROUP BY doc_id),
s AS (
  SELECT t.doc_id, len(tri) AS n_tri, len(list_distinct(tri)) AS n_uniq, tops.top_count
  FROM t LEFT JOIN tops ON t.doc_id = tops.doc_id
)
SELECT doc_id,
       CAST(n_tri AS BIGINT) AS n_trigrams,
       CAST(n_uniq AS BIGINT) AS n_unique_trigrams,
       CASE WHEN n_tri > 0 THEN round((n_tri - n_uniq) / CAST(n_tri AS DOUBLE), 6) ELSE 0.0 END AS dup_trigram_fraction,
       CAST(coalesce(top_count, 0) AS BIGINT) AS top_trigram_count,
       CASE WHEN n_tri > 0 THEN round(coalesce(top_count, 0) / CAST(n_tri AS DOUBLE), 6) ELSE 0.0 END AS top_trigram_share
FROM s
"""


# --- unigram log-probability scoring (perplexity-filter analogue) ------------

def quality_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean unigram log10-probability under the corpus's
    own unigram distribution — the deterministic stand-in for
    perplexity filtering (low scores = rare-token-heavy / junk docs).

    Plan: one groupBy on token builds the vocabulary with counts; the
    per-doc pass explodes tokens and joins the vocab on token (Zipf
    skew on hot tokens — AQE skew handling; the vocab could also be
    broadcast when it fits), then one agg per doc. The corpus total is
    a 1-row broadcast.
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .select("doc_id", F.log10(F.col("cnt") / F.col("total")).alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.round(F.avg("lp"), 6).alias("mean_log10_prob"),
        F.round(F.min("lp"), 6).alias("min_log10_prob"),
    )


QUALITY_UNIGRAM_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS token
  FROM documents
),
vocab AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
total AS (SELECT sum(cnt) AS total FROM vocab)
SELECT doc_id,
       count(*) AS n_tokens,
       round(avg(log10(cnt / CAST(total AS DOUBLE))), 6) AS mean_log10_prob,
       round(min(log10(cnt / CAST(total AS DOUBLE))), 6) AS min_log10_prob
FROM toks JOIN vocab USING (token), total
GROUP BY doc_id
"""

QUERIES["quality_repetition"] = quality_repetition
ORACLES["quality_repetition"] = QUALITY_REPETITION_SQL
QUERIES["quality_unigram_logprob"] = quality_unigram_logprob
ORACLES["quality_unigram_logprob"] = QUALITY_UNIGRAM_SQL


# --- language-ID confusion matrix --------------------------------------------

def lang_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier evaluation as a query: the (label, prediction)
    confusion matrix for the stopword language identifier, with
    per-cell share of the label's row — precision/recall read straight
    off it. Composes the lang_id operator (one narrow pass) with one
    bounded (label, pred) aggregation; row totals broadcast back. The
    evaluation-harness pattern ann_recall_eval applies to ANN, applied
    to classification."""
    preds = lang_id(spark, sf_dir).select("label_lang", "pred_lang")
    cells = preds.groupBy("label_lang", "pred_lang").agg(F.count(F.lit(1)).alias("n"))
    totals = cells.groupBy("label_lang").agg(F.sum("n").alias("row_total"))
    return cells.join(F.broadcast(totals), "label_lang").select(
        "label_lang",
        "pred_lang",
        "n",
        F.round(F.col("n") / F.col("row_total"), 6).alias("row_share"),
        (F.col("label_lang") == F.col("pred_lang")).alias("is_diagonal"),
    )


LANG_CONFUSION_SQL = f"""
WITH preds AS ({LANG_ID_SQL}),
cells AS (
  SELECT label_lang, pred_lang, count(*) AS n
  FROM preds GROUP BY label_lang, pred_lang
),
totals AS (SELECT label_lang, sum(n) AS row_total FROM cells GROUP BY label_lang)
SELECT label_lang, pred_lang, n,
       round(n / CAST(row_total AS DOUBLE), 6) AS row_share,
       label_lang = pred_lang AS is_diagonal
FROM cells JOIN totals USING (label_lang)
"""

QUERIES["lang_confusion"] = lang_confusion
ORACLES["lang_confusion"] = LANG_CONFUSION_SQL


# --- Gopher-style quality rules ----------------------------------------------
#
# The published rule-based document filter from the Gopher corpus work
# (Rae et al. 2021, public): word-count bounds, mean-word-length bounds,
# minimum alphabetic-word ratio, minimum stopword evidence. Every
# threshold comparison runs on integers (sum_chars >= 3*n_words instead
# of mean >= 3.0), so no floating-point boundary exists for the two
# engines to disagree on. One narrow map stage — scan-rate at 100 TB.

GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WL = 3  # mean word length in [3, 10]
GOPHER_MAX_MEAN_WL = 10
GOPHER_ALPHA_NUM = 4  # alpha-word ratio >= 4/5
GOPHER_ALPHA_DEN = 5
GOPHER_MIN_STOP_HITS = 2


def quality_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document Gopher rule flags + overall pass verdict."""
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        F.expr(
            "aggregate(transform(filter(split(text, '\\\\s+'), t -> t <> ''),"
            " t -> length(t)), 0L, (a, x) -> a + CAST(x AS LONG))"
        ).alias("sum_chars"),
        F.size(F.filter(toks, lambda t: t.rlike("[a-z]"))).cast("bigint").alias("alpha_words"),
        F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS["en"]))).cast("bigint").alias("stop_hits"),
    )
    ok_count = (F.col("n_words") >= GOPHER_MIN_WORDS) & (F.col("n_words") <= GOPHER_MAX_WORDS)
    ok_mwl = (F.col("sum_chars") >= GOPHER_MIN_MEAN_WL * F.col("n_words")) & (
        F.col("sum_chars") <= GOPHER_MAX_MEAN_WL * F.col("n_words")
    )
    ok_alpha = F.col("alpha_words") * GOPHER_ALPHA_DEN >= GOPHER_ALPHA_NUM * F.col("n_words")
    ok_stop = F.col("stop_hits") >= GOPHER_MIN_STOP_HITS
    return base.select(
        "doc_id",
        "n_words",
        "sum_chars",
        "alpha_words",
        "stop_hits",
        ok_count.cast("int").alias("ok_word_count"),
        ok_mwl.cast("int").alias("ok_mean_word_len"),
        ok_alpha.cast("int").alias("ok_alpha_ratio"),
        ok_stop.cast("int").alias("ok_stopwords"),
        (ok_count & ok_mwl & ok_alpha & ok_stop).cast("int").alias("gopher_pass"),
    )


_EN_STOPS_SQL = ", ".join(f"'{w}'" for w in STOPWORDS["en"])

GOPHER_SQL = f"""
WITH base AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0) AS BIGINT) AS sum_chars,
         CAST(len(list_filter(toks, t -> regexp_matches(t, '[a-z]'))) AS BIGINT) AS alpha_words,
         CAST(len(list_filter(toks, t -> t IN ({_EN_STOPS_SQL}))) AS BIGINT) AS stop_hits
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents)
)
SELECT doc_id, n_words, sum_chars, alpha_words, stop_hits,
       CAST(n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS} AS INT) AS ok_word_count,
       CAST(sum_chars >= {GOPHER_MIN_MEAN_WL} * n_words
            AND sum_chars <= {GOPHER_MAX_MEAN_WL} * n_words AS INT) AS ok_mean_word_len,
       CAST(alpha_words * {GOPHER_ALPHA_DEN} >= {GOPHER_ALPHA_NUM} * n_words AS INT) AS ok_alpha_ratio,
       CAST(stop_hits >= {GOPHER_MIN_STOP_HITS} AS INT) AS ok_stopwords,
       CAST(n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
            AND sum_chars >= {GOPHER_MIN_MEAN_WL} * n_words
            AND sum_chars <= {GOPHER_MAX_MEAN_WL} * n_words
            AND alpha_words * {GOPHER_ALPHA_DEN} >= {GOPHER_ALPHA_NUM} * n_words
            AND stop_hits >= {GOPHER_MIN_STOP_HITS} AS INT) AS gopher_pass
FROM base
"""

QUERIES["quality_gopher_rules"] = quality_gopher_rules
ORACLES["quality_gopher_rules"] = GOPHER_SQL


# --- dataset_card_stats ------------------------------------------------------
#
# The per-source "dataset card" a training-data pipeline publishes with
# every corpus release (datasheet/data-statement practice, public):
# volume (docs, tokens, chars), exact-duplication rate, language
# breakdown (dominant language + its share), and a quality pass rate
# (the Gopher word-count band reused from quality_gopher_rules). The
# reference's stage5 validation emits exactly this shape per
# document_source (`stage5_output_final_csv.py` validate_csv_data +
# record counts); this is its corpus-statistics generalization.
#
# Scale: one scan; per-(source, lang) partials collapse into per-source
# rows (two bounded aggregations with map-side combine); the dominant
# language is max(struct(count, lang)) over the bounded per-source-lang
# table — deterministic, no window over the corpus. Distinct-text
# counting reuses the md5 fingerprint (the 100 TB path swaps in
# approx_count_distinct, as table_profile documents).

def dataset_card_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    base = docs.select(
        "source",
        "lang",
        F.size(toks).cast("bigint").alias("n_words"),
        F.col("n_chars").cast("bigint").alias("n_chars"),
        F.md5("text").alias("fp"),
    )
    per_lang = base.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("n_docs_lang"))
    lang_top = (
        per_lang.groupBy("source")
        .agg(
            F.max(F.struct(F.col("n_docs_lang"), F.col("lang"))).alias("top"),
            F.count(F.lit(1)).alias("n_langs"),
        )
        .select(
            "source",
            F.col("top.lang").alias("top_lang"),
            F.col("top.n_docs_lang").alias("top_lang_docs"),
            "n_langs",
        )
    )
    per_source = base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("n_tokens"),
        F.sum("n_chars").alias("sum_chars"),
        F.count_distinct("fp").alias("n_unique_docs"),
        F.sum(
            ((F.col("n_words") >= 50) & (F.col("n_words") <= 100000)).cast("bigint")
        ).alias("n_quality_pass"),
    )
    return (
        per_source.join(lang_top, "source")
        .select(
            "source",
            "n_docs",
            "n_tokens",
            "sum_chars",
            F.expr("n_tokens div n_docs").alias("mean_tokens"),
            F.expr("(n_docs - n_unique_docs) * 10000 div n_docs").alias("dup_bp"),
            "top_lang",
            F.expr("top_lang_docs * 10000 div n_docs").alias("top_lang_bp"),
            "n_langs",
            F.expr("n_quality_pass * 10000 div n_docs").alias("quality_bp"),
        )
    )


DATASET_CARD_SQL = """
WITH base AS (
  SELECT source, lang,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT) AS n_words,
         CAST(n_chars AS BIGINT) AS n_chars,
         md5(text) AS fp
  FROM documents
),
per_lang AS (
  SELECT source, lang, count(*) AS n_docs_lang FROM base GROUP BY source, lang
),
lang_top AS (
  SELECT source,
         (max(struct_pack(n_docs_lang := n_docs_lang, lang := lang))).lang AS top_lang,
         (max(struct_pack(n_docs_lang := n_docs_lang, lang := lang))).n_docs_lang AS top_lang_docs,
         count(*) AS n_langs
  FROM per_lang GROUP BY source
),
per_source AS (
  SELECT source,
         count(*) AS n_docs,
         sum(n_words) AS n_tokens,
         sum(n_chars) AS sum_chars,
         count(DISTINCT fp) AS n_unique_docs,
         sum(CASE WHEN n_words BETWEEN 50 AND 100000 THEN 1 ELSE 0 END) AS n_quality_pass
  FROM base GROUP BY source
)
SELECT s.source,
       s.n_docs,
       CAST(s.n_tokens AS BIGINT) AS n_tokens,
       CAST(s.sum_chars AS BIGINT) AS sum_chars,
       CAST(s.n_tokens // s.n_docs AS BIGINT) AS mean_tokens,
       CAST((s.n_docs - s.n_unique_docs) * 10000 // s.n_docs AS BIGINT) AS dup_bp,
       l.top_lang,
       CAST(l.top_lang_docs * 10000 // s.n_docs AS BIGINT) AS top_lang_bp,
       CAST(l.n_langs AS BIGINT) AS n_langs,
       CAST(s.n_quality_pass * 10000 // s.n_docs AS BIGINT) AS quality_bp
FROM per_source s JOIN lang_top l USING (source)
"""

QUERIES["dataset_card_stats"] = dataset_card_stats
ORACLES["dataset_card_stats"] = DATASET_CARD_SQL


# --- corpus_ppl_buckets ------------------------------------------------------
#
# CCNet's head/middle/tail partitioning (Wenzek et al. 2019, public):
# score every document under a language model, split each source into
# perplexity tertiles, and let downstream sampling prefer the head.
# The LM score is the deterministic unigram mean log-prob from
# quality_unigram_logprob (same plan: vocab join + 1-row broadcast
# total); the tertile runs per source over the ROUNDED score with a
# doc_id tie-break, so bucket assignment is engine-deterministic.
#
# Scale: the ntile window partitions by source — no global window; the
# per-source ordering is over per-doc rows (already collapsed from
# tokens), the same bounded-window shape as customer_rfm.

def corpus_ppl_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", "source", F.explode(tokens(F.col("text"))).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    scored = (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .groupBy("doc_id", "source")
        .agg(F.round(F.avg(F.log10(F.col("cnt") / F.col("total"))), 6).alias("mean_lp"))
    )
    w = Window.partitionBy("source").orderBy(F.desc("mean_lp"), F.asc("doc_id"))
    return scored.select(
        "doc_id",
        "source",
        "mean_lp",
        F.ntile(3).over(w).cast("bigint").alias("ppl_bucket"),
    )


CORPUS_PPL_SQL = """
WITH toks AS (
  SELECT doc_id, source,
         unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS token
  FROM documents
),
vocab AS (SELECT token, count(*) AS cnt FROM toks GROUP BY token),
total AS (SELECT sum(cnt) AS total FROM vocab),
scored AS (
  SELECT doc_id, source,
         round(avg(log10(cnt / CAST(total AS DOUBLE))), 6) AS mean_lp
  FROM toks JOIN vocab USING (token), total
  GROUP BY doc_id, source
)
SELECT doc_id, source, mean_lp,
       CAST(ntile(3) OVER (PARTITION BY source ORDER BY mean_lp DESC, doc_id ASC) AS BIGINT) AS ppl_bucket
FROM scored
"""

QUERIES["corpus_ppl_buckets"] = corpus_ppl_buckets
ORACLES["corpus_ppl_buckets"] = CORPUS_PPL_SQL


# --- quality_filter_verdict --------------------------------------------------
#
# The whole filter battery composed into the single keep/drop decision
# a corpus build actually executes (Gopher rules + repetition filters +
# LM score floor), with a reason bitmask so dropped documents are
# auditable. Each signal is the already-oracle-checked operator's
# output (engine-equal bit-for-bit), so the thresholds compare
# identical values in both engines.
#
# Scale: three per-doc signal tables (each one narrow pass or one
# bounded shuffle, audited at their own entries) joined on doc_id —
# co-partitioned hash joins, no new corpus-sized work.

REASON_GOPHER = 1
REASON_REPETITION = 2
REASON_LM = 4
DUP_TRI_MAX = 0.0151          # duplicate-trigram fraction cap
TOP_TRI_MAX = 0.1011          # single-trigram dominance cap
MEAN_LP_MIN = -1.5001         # unigram LM score floor (log10)


def quality_filter_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    g = quality_gopher_rules(spark, sf_dir).select("doc_id", "gopher_pass")
    r = quality_repetition(spark, sf_dir).select(
        "doc_id", "dup_trigram_fraction", "top_trigram_share"
    )
    u = quality_unigram_logprob(spark, sf_dir).select("doc_id", "mean_log10_prob")
    j = g.join(r, "doc_id").join(u, "doc_id")
    rep_ok = (F.col("dup_trigram_fraction") <= DUP_TRI_MAX) & (
        F.col("top_trigram_share") <= TOP_TRI_MAX
    )
    lm_ok = F.col("mean_log10_prob") >= MEAN_LP_MIN
    reason = (
        F.when(F.col("gopher_pass") == 0, REASON_GOPHER).otherwise(0)
        + F.when(~rep_ok, REASON_REPETITION).otherwise(0)
        + F.when(~lm_ok, REASON_LM).otherwise(0)
    )
    return j.select(
        "doc_id",
        "gopher_pass",
        rep_ok.cast("int").alias("repetition_pass"),
        lm_ok.cast("int").alias("lm_pass"),
        reason.cast("bigint").alias("drop_reasons"),
        (reason == 0).cast("int").alias("keep"),
    )


QUALITY_VERDICT_SQL = f"""
WITH g AS ({GOPHER_SQL.strip()}),
r AS ({QUALITY_REPETITION_SQL.strip()}),
u AS ({QUALITY_UNIGRAM_SQL.strip()}),
j AS (
  SELECT g.doc_id, g.gopher_pass, r.dup_trigram_fraction, r.top_trigram_share,
         u.mean_log10_prob
  FROM g JOIN r USING (doc_id) JOIN u USING (doc_id)
)
SELECT doc_id,
       gopher_pass,
       CAST(dup_trigram_fraction <= {DUP_TRI_MAX} AND top_trigram_share <= {TOP_TRI_MAX} AS INT) AS repetition_pass,
       CAST(mean_log10_prob >= {MEAN_LP_MIN} AS INT) AS lm_pass,
       CAST(CASE WHEN gopher_pass = 0 THEN {REASON_GOPHER} ELSE 0 END
          + CASE WHEN NOT (dup_trigram_fraction <= {DUP_TRI_MAX} AND top_trigram_share <= {TOP_TRI_MAX}) THEN {REASON_REPETITION} ELSE 0 END
          + CASE WHEN NOT (mean_log10_prob >= {MEAN_LP_MIN}) THEN {REASON_LM} ELSE 0 END AS BIGINT) AS drop_reasons,
       CAST(gopher_pass = 1
            AND dup_trigram_fraction <= {DUP_TRI_MAX} AND top_trigram_share <= {TOP_TRI_MAX}
            AND mean_log10_prob >= {MEAN_LP_MIN} AS INT) AS keep
FROM j
"""

QUERIES["quality_filter_verdict"] = quality_filter_verdict
ORACLES["quality_filter_verdict"] = QUALITY_VERDICT_SQL


# --- readability scoring ------------------------------------------------------
#
# Flesch reading-ease / Flesch-Kincaid grade as a corpus QC feature
# (the classic readability pair; public formulas). Syllables use the
# standard dependency-free proxy — vowel-group count — which is what
# readability tooling falls back to without a pronunciation dict.
# All scores are exact integers in milli-points: the formulas'
# constants scale to integers (206.835 -> 206835) and the two ratios
# become integer divisions, so both engines produce bit-identical
# scores (positive operands: trunc == floor in Spark div and DuckDB //).
# Pure per-row JVM regex + arithmetic — zero shuffle, scan-rate.

def readability_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    stats = docs.select(
        "doc_id",
        F.greatest(F.size(tokens(F.col("text"))), F.lit(1)).cast("bigint").alias("n_words"),
        F.greatest(
            F.size(F.regexp_extract_all("text", F.lit(r"[.!?]"), 0)), F.lit(1)
        ).cast("bigint").alias("n_sentences"),
        F.greatest(
            F.size(F.regexp_extract_all(F.lower("text"), F.lit(r"[aeiouy]+"), 0)), F.lit(1)
        ).cast("bigint").alias("n_syllables"),
    )
    return stats.select(
        "*",
        F.expr(
            "206835 - (1015000 * n_words) div n_sentences - (84600 * n_syllables) div n_words"
        ).alias("flesch_milli"),
        F.expr(
            "(390 * n_words) div n_sentences + (11800 * n_syllables) div n_words - 15590"
        ).alias("fk_grade_milli"),
    )


READABILITY_SQL = """
WITH stats AS (
  SELECT doc_id,
         greatest(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')), 1) AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]')), 1) AS n_sentences,
         greatest(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1) AS n_syllables
  FROM documents
)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       CAST(n_sentences AS BIGINT) AS n_sentences,
       CAST(n_syllables AS BIGINT) AS n_syllables,
       CAST(206835 - (1015000 * n_words) // n_sentences
                   - (84600 * n_syllables) // n_words AS BIGINT) AS flesch_milli,
       CAST((390 * n_words) // n_sentences
          + (11800 * n_syllables) // n_words - 15590 AS BIGINT) AS fk_grade_milli
FROM stats
"""

QUERIES["readability_scores"] = readability_scores
ORACLES["readability_scores"] = READABILITY_SQL


# --- temperature-scaled mixture weights --------------------------------------
#
# The data-mixing step between dataset cards and sampling: rebalance
# per-source sampling shares with temperature alpha = 0.5 (the
# multilingual/multi-corpus practice — upsample small sources,
# downsample dominant ones; alpha = 0.5 makes the reweighting
# IEEE-exact because p^0.5 is a correctly-rounded sqrt in both
# engines, the same determinism argument as the cosine device).
# `corpus_sample_mix` consumes shares like these; `effective_epochs`
# (alpha share / natural share) is the upsampling factor a training
# run would apply per source. One bounded per-source aggregation; the
# share normalization is a 1-row lazy broadcast.

def mixture_weights_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens(F.col("text")))).cast("bigint").alias("n_tokens"),
    )
    totals = per_src.agg(
        F.sum("n_tokens").alias("tot_tokens"),
        F.sum(F.sqrt(F.col("n_tokens").cast("double"))).alias("tot_sqrt"),
    )
    joined = per_src.crossJoin(F.broadcast(totals))
    nat_bp = F.expr("cast(n_tokens * 10000 div tot_tokens as bigint)")
    alpha_share = F.round(F.sqrt(F.col("n_tokens").cast("double")) / F.col("tot_sqrt"), 6)
    return joined.select(
        "source",
        "n_docs",
        "n_tokens",
        nat_bp.alias("natural_share_bp"),
        alpha_share.alias("alpha_share"),
        F.round(
            F.sqrt(F.col("n_tokens").cast("double"))
            / F.col("tot_sqrt")
            / (F.col("n_tokens") / F.col("tot_tokens")),
            4,
        ).alias("effective_epochs"),
    )


MIXTURE_WEIGHTS_SQL = """
WITH per_src AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))) AS BIGINT)
           AS n_tokens
  FROM documents GROUP BY source
), totals AS (
  SELECT sum(n_tokens) AS tot_tokens, sum(sqrt(n_tokens::DOUBLE)) AS tot_sqrt FROM per_src
)
SELECT source, n_docs, n_tokens,
       CAST(n_tokens * 10000 // tot_tokens AS BIGINT) AS natural_share_bp,
       round(sqrt(n_tokens::DOUBLE) / tot_sqrt, 6) AS alpha_share,
       round(sqrt(n_tokens::DOUBLE) / tot_sqrt / (n_tokens / tot_tokens::DOUBLE), 4)
         AS effective_epochs
FROM per_src, totals
"""

QUERIES["mixture_weights_temperature"] = mixture_weights_temperature
ORACLES["mixture_weights_temperature"] = MIXTURE_WEIGHTS_SQL


# --- corpus n-gram novelty curve ---------------------------------------------
#
# Dataset-saturation diagnostic: as the corpus grows (doc_id order =
# ingestion order), what share of each document's 3-grams has never
# appeared before? A collapsing novelty curve says new data is
# repeating old data — the signal that guides further collection.
# First-occurrence attribution is ONE aggregation (ngram -> min
# doc_id); each doc's novelty is then a per-row comparison after the
# rejoin. Two shuffles total (ngram attribution + rejoin), both on
# hash-uniform keys; per-day/source rollup on bounded tables.

def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = tokens(F.col("text"))
    grams = docs.select("doc_id", "source", toks.alias("toks")).select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "CASE WHEN size(toks) < 3 THEN array() "
                "ELSE transform(sequence(1, size(toks) - 2), "
                "i -> md5(concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))) END"
            )
        ).alias("gram"),
    )
    first_seen = grams.groupBy("gram").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.groupBy("doc_id", "source", "gram")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(first_seen, "gram")
        .groupBy("doc_id", "source")
        .agg(
            F.sum("n").alias("n_grams"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), F.col("n")).otherwise(0)).alias("novel_grams"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_grams").alias("total_grams"),
        F.sum("novel_grams").alias("novel_grams"),
        F.expr("cast(sum(novel_grams) * 10000 div sum(n_grams) as bigint)").alias("novelty_bp"),
    )


CORPUS_NOVELTY_SQL = """
WITH t AS (
  SELECT doc_id, source, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), grams AS (
  SELECT doc_id, source,
         md5(toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS gram
  FROM t, LATERAL (SELECT unnest(generate_series(1, greatest(len(toks) - 2, 0))) AS i) ix
), first_seen AS (
  SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram
), per_doc AS (
  SELECT g.doc_id, g.source,
         CAST(sum(cnt) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN cnt ELSE 0 END) AS BIGINT) AS novel_grams
  FROM (SELECT doc_id, source, gram, count(*) AS cnt FROM grams GROUP BY 1, 2, 3) g
  JOIN first_seen f USING (gram)
  GROUP BY g.doc_id, g.source
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_grams) AS BIGINT) AS total_grams,
       CAST(sum(novel_grams) AS BIGINT) AS novel_grams,
       CAST(CAST(sum(novel_grams) AS BIGINT) * 10000 // sum(n_grams) AS BIGINT) AS novelty_bp
FROM per_doc GROUP BY source
"""

QUERIES["corpus_ngram_novelty"] = corpus_ngram_novelty
ORACLES["corpus_ngram_novelty"] = CORPUS_NOVELTY_SQL


# --- compressibility estimate -------------------------------------------------
#
# Storage planning without running a compressor: a corpus's gzip-class
# ratio tracks its internal repetition, which the distinct-shingle
# ratio measures directly (distinct 4-gram bytes / total 4-gram
# bytes — a dictionary coder can only deduplicate what repeats).
# Per-source estimate in basis points with doc/byte totals; two
# aggregations (per-source totals + per-source distinct shingles), no
# pair joins — the cheap sibling of dedup_substring_stats.

def compression_ratio_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = tokens(F.col("text"))
    grams = docs.select("source", toks.alias("toks")).select(
        "source",
        F.explode(
            F.expr(
                "CASE WHEN size(toks) < 4 THEN array() "
                "ELSE transform(sequence(1, size(toks) - 3), "
                "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1), "
                "element_at(toks, i + 2), element_at(toks, i + 3))) END"
            )
        ).alias("gram"),
    ).select("source", "gram", F.length("gram").alias("glen"))
    totals = grams.groupBy("source").agg(
        F.count(F.lit(1)).alias("total_grams"), F.sum("glen").alias("total_bytes")
    )
    uniq = (
        grams.groupBy("source", "gram")
        .agg(F.first("glen").alias("glen"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("uniq_grams"), F.sum("glen").alias("uniq_bytes"))
    )
    return totals.join(uniq, "source").select(
        "source",
        "total_grams",
        "uniq_grams",
        F.expr("cast(uniq_bytes * 10000 div total_bytes as bigint)").alias("est_ratio_bp"),
    )


COMPRESSION_EST_SQL = """
WITH t AS (
  SELECT source, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), grams AS (
  SELECT source,
         toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2] || ' ' || toks[i + 3] AS gram
  FROM t, LATERAL (SELECT unnest(generate_series(1, greatest(len(toks) - 3, 0))) AS i) ix
), totals AS (
  SELECT source, count(*) AS total_grams, CAST(sum(length(gram)) AS BIGINT) AS total_bytes
  FROM grams GROUP BY source
), uniq AS (
  SELECT source, count(*) AS uniq_grams, CAST(sum(length(gram)) AS BIGINT) AS uniq_bytes
  FROM (SELECT DISTINCT source, gram FROM grams) GROUP BY source
)
SELECT t.source, t.total_grams, u.uniq_grams,
       CAST(u.uniq_bytes * 10000 // t.total_bytes AS BIGINT) AS est_ratio_bp
FROM totals t JOIN uniq u USING (source)
"""

QUERIES["compression_ratio_estimate"] = compression_ratio_estimate
ORACLES["compression_ratio_estimate"] = COMPRESSION_EST_SQL


# --- boilerplate prefix detection --------------------------------------------
#
# Header/footer boilerplate shows up as documents within a source
# sharing the same opening tokens (letterheads, nav bars, license
# banners). Per source: the modal 8-token prefix, how many docs carry
# it, and the share in basis points — above a threshold the cleaning
# pipeline strips it (the dedup_lines decision at prefix grain). One
# (source, prefix-hash) count, argmax per source on the bounded count
# table, zero joins back to the corpus.

BOILER_PREFIX_TOKENS = 8


def boilerplate_prefix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = tokens(F.col("text"))
    prefixed = docs.select(
        "source",
        F.md5(F.array_join(F.slice(toks, 1, BOILER_PREFIX_TOKENS), " ")).alias("prefix_md5"),
    )
    counts = prefixed.groupBy("source", "prefix_md5").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy("source").agg(
        F.sum("n").alias("n_docs"), F.count(F.lit(1)).alias("n_distinct_prefixes")
    )
    from pyspark.sql import Window as _W

    w = _W.partitionBy("source").orderBy(F.desc("n"), F.asc("prefix_md5"))
    modal = counts.withColumn("r", F.row_number().over(w)).where(F.col("r") == 1).select(
        "source", F.col("prefix_md5").alias("modal_prefix_md5"), F.col("n").alias("modal_count")
    )
    return modal.join(totals, "source").select(
        "source",
        "n_docs",
        "n_distinct_prefixes",
        "modal_prefix_md5",
        "modal_count",
        F.expr("cast(modal_count * 10000 div n_docs as bigint)").alias("modal_share_bp"),
    )


BOILERPLATE_SQL = f"""
WITH prefixed AS (
  SELECT source,
         md5(array_to_string(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')[1:{BOILER_PREFIX_TOKENS}], ' ')) AS prefix_md5
  FROM documents
), counts AS (
  SELECT source, prefix_md5, count(*) AS n FROM prefixed GROUP BY 1, 2
), totals AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n_docs, count(*) AS n_distinct_prefixes
  FROM counts GROUP BY source
), modal AS (
  SELECT source, prefix_md5 AS modal_prefix_md5, n AS modal_count FROM (
    SELECT *, row_number() OVER (PARTITION BY source ORDER BY n DESC, prefix_md5 ASC) AS r
    FROM counts
  ) WHERE r = 1
)
SELECT m.source, t.n_docs, t.n_distinct_prefixes, m.modal_prefix_md5,
       CAST(m.modal_count AS BIGINT) AS modal_count,
       CAST(m.modal_count * 10000 // t.n_docs AS BIGINT) AS modal_share_bp
FROM modal m JOIN totals t USING (source)
"""

QUERIES["boilerplate_prefix_stats"] = boilerplate_prefix_stats
ORACLES["boilerplate_prefix_stats"] = BOILERPLATE_SQL


# --- character-class profile --------------------------------------------------
#
# The lowest-level corpus QC: per source, what fraction of characters
# are alphabetic / digits / whitespace / punctuation (mojibake,
# base64 blobs and table dumps all skew this profile before any
# tokenizer sees them). Exact integer counts via regexp stripping
# (count = len - len(without class)); shares in basis points. Pure
# per-row JVM regex + one bounded aggregation.

def corpus_char_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")

    def n_class(pat: str):
        return (F.length("text") - F.length(F.regexp_replace("text", pat, ""))).cast("bigint")

    per_doc = docs.select(
        "source",
        F.length("text").cast("bigint").alias("n_chars"),
        n_class("[A-Za-z]").alias("n_alpha"),
        n_class("[0-9]").alias("n_digit"),
        n_class(r"\s").alias("n_space"),
    )
    agg = per_doc.groupBy("source").agg(
        F.sum("n_chars").alias("n_chars"),
        F.sum("n_alpha").alias("n_alpha"),
        F.sum("n_digit").alias("n_digit"),
        F.sum("n_space").alias("n_space"),
    )
    return agg.select(
        "source",
        "n_chars",
        F.expr("cast(n_alpha * 10000 div n_chars as bigint)").alias("alpha_bp"),
        F.expr("cast(n_digit * 10000 div n_chars as bigint)").alias("digit_bp"),
        F.expr("cast(n_space * 10000 div n_chars as bigint)").alias("space_bp"),
        F.expr(
            "cast((n_chars - n_alpha - n_digit - n_space) * 10000 div n_chars as bigint)"
        ).alias("other_bp"),
    )


CHAR_PROFILE_SQL = """
WITH per_doc AS (
  SELECT source,
         CAST(length(text) AS BIGINT) AS n_chars,
         CAST(length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_alpha,
         CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS BIGINT) AS n_digit,
         CAST(length(text) - length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS n_space
  FROM documents
), agg AS (
  SELECT source, CAST(sum(n_chars) AS BIGINT) AS n_chars, CAST(sum(n_alpha) AS BIGINT) AS n_alpha,
         CAST(sum(n_digit) AS BIGINT) AS n_digit, CAST(sum(n_space) AS BIGINT) AS n_space
  FROM per_doc GROUP BY source
)
SELECT source, n_chars,
       CAST(n_alpha * 10000 // n_chars AS BIGINT) AS alpha_bp,
       CAST(n_digit * 10000 // n_chars AS BIGINT) AS digit_bp,
       CAST(n_space * 10000 // n_chars AS BIGINT) AS space_bp,
       CAST((n_chars - n_alpha - n_digit - n_space) * 10000 // n_chars AS BIGINT) AS other_bp
FROM agg
"""

QUERIES["corpus_char_profile"] = corpus_char_profile
ORACLES["corpus_char_profile"] = CHAR_PROFILE_SQL


# --- classifier accuracy sliced by length ------------------------------------
#
# The slice analysis an evaluation report runs after the confusion
# matrix: classifier accuracy as a function of input length (language
# ID degrades on short inputs — fewer stopword hits to vote with).
# Reuses lang_id's per-doc verdicts, bands docs by token count, and
# reports per-band accuracy in basis points — the curve that sets the
# minimum-length gate upstream filters enforce. Per-band rollup over
# the per-doc verdict table; one aggregation.

def langid_accuracy_by_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.size(tokens(F.col("text"))).cast("bigint").alias("n_tokens")
    )
    verdicts = lang_id(spark, sf_dir).select("doc_id", "is_correct")
    banded = verdicts.join(docs, "doc_id").select(
        F.when(F.col("n_tokens") < 20, "short (<20)")
        .when(F.col("n_tokens") < 60, "medium (20-59)")
        .otherwise("long (>=60)")
        .alias("length_band"),
        "is_correct",
    )
    return banded.groupBy("length_band").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_correct").cast("bigint").alias("n_correct"),
        F.expr("cast(sum(is_correct) * 10000 div count(1) as bigint)").alias("accuracy_bp"),
    )


LANGID_BY_LENGTH_SQL = f"""
WITH verdicts AS ({{lang_id_sql}}),
banded AS (
  SELECT CASE WHEN len(list_filter(string_split_regex(d.text, '\\s+'), x -> x <> '')) < 20 THEN 'short (<20)'
              WHEN len(list_filter(string_split_regex(d.text, '\\s+'), x -> x <> '')) < 60 THEN 'medium (20-59)'
              ELSE 'long (>=60)' END AS length_band,
         v.is_correct
  FROM verdicts v JOIN documents d USING (doc_id)
)
SELECT length_band, count(*) AS n_docs,
       CAST(sum(is_correct) AS BIGINT) AS n_correct,
       CAST(CAST(sum(is_correct) AS BIGINT) * 10000 // count(*) AS BIGINT) AS accuracy_bp
FROM banded GROUP BY length_band
"""

QUERIES["langid_accuracy_by_length"] = langid_accuracy_by_length
ORACLES["langid_accuracy_by_length"] = LANGID_BY_LENGTH_SQL.format(lang_id_sql=LANG_ID_SQL.strip())


# --- token-mass inequality (Gini) --------------------------------------------
#
# Data-balance diagnostic: is a source's token mass spread across its
# documents or concentrated in a few? Gini coefficient per source
# from the rank formula G = (2 Σ i·x_i) / (n Σ x) − (n+1)/n over docs
# sorted by token count (doc_id tie-break) — every sum an exact
# integer, the division done once at the end (output in basis
# points, floor). The per-source rank window runs over collapsed
# per-doc rows (the corpus_ppl_buckets shape).

def source_token_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.size(tokens(F.col("text"))).cast("bigint").alias("x")
    )
    w = _W.partitionBy("source").orderBy("x", "doc_id")
    ranked = docs.select("source", "x", F.row_number().over(w).cast("bigint").alias("i"))
    sums = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum(F.expr("i * x")).alias("six"),
    )
    gini_bp = F.expr("cast((2 * six * 10000) div (n * sx) - ((n + 1) * 10000) div n as bigint)")
    return sums.select(
        "source",
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("sx").alias("total_tokens"),
        gini_bp.alias("gini_bp"),
    )


SOURCE_GINI_SQL = """
WITH docs AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT) AS x
  FROM documents
), ranked AS (
  SELECT source, x,
         CAST(row_number() OVER (PARTITION BY source ORDER BY x, doc_id) AS BIGINT) AS i
  FROM docs
), sums AS (
  SELECT source, count(*) AS n, CAST(sum(x) AS BIGINT) AS sx, CAST(sum(i * x) AS BIGINT) AS six
  FROM ranked GROUP BY source
)
SELECT source, CAST(n AS BIGINT) AS n_docs, sx AS total_tokens,
       CAST((2 * six * 10000) // (n * sx) - ((n + 1) * 10000) // n AS BIGINT) AS gini_bp
FROM sums
"""

QUERIES["source_token_gini"] = source_token_gini
ORACLES["source_token_gini"] = SOURCE_GINI_SQL


# --- tokenizer vocabulary coverage --------------------------------------------
#
# The tokenizer-design question next to `vocab_stats`' Zipf view: if
# the tokenizer keeps only the top-VC_VOCAB corpus types, what OOV
# rate does each source eat? Top types are ranked over the COUNT
# TABLE (one corpus-sized token aggregation — the same shuffle
# vocab_stats pays), broadcast as the vocabulary, and the corpus
# streams once more against it: per-doc OOV counts roll up to
# per-source totals, integer basis points, and a fully-covered-docs
# count. At 100 TB the vocabulary is a few MB broadcast; both corpus
# passes are embarrassingly parallel.

VC_VOCAB = 500


def tokenizer_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = docs.select("doc_id", "source", F.explode(tokens(F.col("text"))).alias("token"))
    counts = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    # distributed top-K (TakeOrderedAndProject), NOT a global ranking
    # window — the type table of a web-scale corpus is itself huge
    vocab = (
        counts.orderBy(F.desc("cnt"), "token")
        .limit(VC_VOCAB)
        .select("token", F.lit(1).alias("in_vocab"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "token", "left")
        .groupBy("source", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0)).alias("n_oov"),
        )
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("total_tokens"),
        F.sum("n_oov").alias("total_oov"),
        F.expr("sum(n_oov) * 10000 div sum(n_toks)").alias("oov_bp"),
        F.sum((F.col("n_oov") == 0).cast("bigint")).alias("n_docs_fully_covered"),
    )


VOCAB_COVERAGE_SQL = f"""
WITH toks AS (
  SELECT doc_id, source,
         unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS token
  FROM documents
), counts AS (
  SELECT token, count(*) AS cnt FROM toks GROUP BY token
), vocab AS (
  SELECT token FROM counts ORDER BY cnt DESC, token LIMIT {VC_VOCAB}
), per_doc AS (
  SELECT t.source, t.doc_id, count(*) AS n_toks,
         sum(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM toks t LEFT JOIN vocab v ON t.token = v.token
  GROUP BY t.source, t.doc_id
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(n_toks) AS BIGINT) AS total_tokens,
       CAST(sum(n_oov) AS BIGINT) AS total_oov,
       CAST(CAST(sum(n_oov) AS BIGINT) * 10000 // CAST(sum(n_toks) AS BIGINT) AS BIGINT) AS oov_bp,
       CAST(sum(CASE WHEN n_oov = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_fully_covered
FROM per_doc GROUP BY source
"""

QUERIES["tokenizer_vocab_coverage"] = tokenizer_vocab_coverage
ORACLES["tokenizer_vocab_coverage"] = VOCAB_COVERAGE_SQL


# --- code-switch segmentation -------------------------------------------------
#
# Language-mix WITHIN a document (the multilingual-corpus QC step after
# per-doc lang_id): the token stream splits into fixed 24-token
# segments, each segment gets the same stopword-argmax language the
# doc-level classifier uses (lexicographic tie-break, 'und' on zero
# hits), and the per-doc rollup reports segment count, distinct
# languages, switch points (adjacent segments disagreeing) and the
# dominant language's share — code-switching documents confuse both
# tokenizers and language filters, so the mixing rate is a routing
# signal (split vs route-whole-doc vs drop).
#
# Scale design: pure per-row array expressions (nested lambdas over
# the bounded segment list) — zero shuffle, scan-rate; the per-segment
# scoring is O(segments x stopword-profile), both compile-time
# constants per token.

SEG_TOKENS = 24


def lang_switch_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    base = docs.select(
        "doc_id",
        toks.alias("toks"),
        F.greatest(F.ceil(F.size(toks) / SEG_TOKENS).cast("int"), F.lit(1)).alias("ns"),
    )

    def seg_lang(w):
        seg = F.slice(F.col("toks"), w * SEG_TOKENS + 1, SEG_TOKENS)
        scores = {
            lang: F.size(F.filter(seg, lambda t: t.isin(*STOPWORDS[lang])))
            for lang in LANGS
        }
        best = F.greatest(*scores.values())
        pred = F.when(best == 0, F.lit("und"))
        for lang in LANGS:
            pred = pred.when(scores[lang] == best, F.lit(lang))
        return pred

    langed = base.select(
        "doc_id",
        "ns",
        F.transform(F.sequence(F.lit(0), F.col("ns") - 1), seg_lang).alias("langs"),
    )
    switches = F.when(
        F.col("ns") >= 2,
        F.size(
            F.filter(
                F.expr("transform(sequence(2, ns), i -> langs[i-1] <> langs[i-2])"),
                lambda x: x,
            )
        ),
    ).otherwise(F.lit(0))
    ranked = F.array_sort(
        F.transform(
            F.array_distinct(F.col("langs")),
            lambda l: F.struct(
                (-F.size(F.filter(F.col("langs"), lambda x: x == l))).alias("negc"),
                l.alias("lang"),
            ),
        )
    )
    dom = F.get(ranked, 0)
    return langed.select(
        "doc_id",
        F.col("ns").cast("bigint").alias("n_segments"),
        F.size(F.array_distinct("langs")).cast("bigint").alias("n_distinct_langs"),
        switches.cast("bigint").alias("n_switches"),
        dom["lang"].alias("dom_lang"),
        F.expr("cast((-element_at(array_sort(transform(array_distinct(langs), "
               "l -> struct(-size(filter(langs, x -> x = l)) as negc, l as lang))), 1).negc)"
               " * 10000 div ns as bigint)").alias("dom_share_bp"),
    )


def _seg_lang_sql() -> str:
    seg = f"list_slice(toks, w * {SEG_TOKENS} + 1, w * {SEG_TOKENS} + {SEG_TOKENS})"
    scores = {
        lang: f"len(list_filter({seg}, t -> t IN ({', '.join(repr(w_) for w_ in STOPWORDS[lang])})))"
        for lang in LANGS
    }
    best = f"greatest({', '.join(scores.values())})"
    whens = " ".join(f"WHEN {scores[lang]} = {best} THEN '{lang}'" for lang in LANGS)
    return f"CASE WHEN {best} = 0 THEN 'und' {whens} END"


LANG_SWITCH_SQL = f"""
WITH base AS (
  SELECT doc_id, toks,
         greatest(CAST(ceil(len(toks) / {SEG_TOKENS}.0) AS INT), 1) AS ns
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents)
),
langed AS (
  SELECT doc_id, ns,
         list_transform(range(0, ns), w -> {_seg_lang_sql()}) AS langs
  FROM base
)
SELECT doc_id,
       CAST(ns AS BIGINT) AS n_segments,
       CAST(len(list_distinct(langs)) AS BIGINT) AS n_distinct_langs,
       CAST(coalesce(list_sum(list_transform(range(2, ns + 1),
            i -> CASE WHEN langs[i] <> langs[i-1] THEN 1 ELSE 0 END)), 0) AS BIGINT)
         AS n_switches,
       list_sort(list_transform(list_distinct(langs),
           l -> struct_pack(negc := -len(list_filter(langs, x -> x = l)), lang := l)))[1].lang
         AS dom_lang,
       CAST((-list_sort(list_transform(list_distinct(langs),
           l -> struct_pack(negc := -len(list_filter(langs, x -> x = l)), lang := l)))[1].negc)
           * 10000 // ns AS BIGINT) AS dom_share_bp
FROM langed
"""

QUERIES["lang_switch_stats"] = lang_switch_stats
ORACLES["lang_switch_stats"] = LANG_SWITCH_SQL


# --- per-source vocabulary divergence -----------------------------------------
#
# KL(source || corpus) over the unigram distribution, restricted to the
# corpus's top-100 head vocabulary with a single OOV bucket (the
# Zipf-head device: the head carries the mass, the tail folds into one
# bucket, so the statistic is exact over a BOUNDED support no matter
# the corpus size).  This is the training-mix diagnostic next to
# corpus_sample_mix / mixture_weights_temperature: a source whose
# vocabulary diverges hard from the corpus mean shifts the mixture
# more than its token share suggests (public art: data-mixture KL
# weighting, DoReMi-style diagnostics).
#
# Determinism: the PSI integer pipeline — add-one smoothing,
# proportions as truncated ppm of positive integers, ln floor-
# quantized 1e-4 → KL as an exact integer scaled 1e10.
#
# Scale design: one (source, token) count with map-side partials, a
# top-100 TakeOrderedAndProject, a broadcast head join, then all
# remaining work on the bounded sources x 101-bucket grid.

KL_HEAD_V = 100
KL_ALERT_SCALED = 500_000_000  # KL > 0.05 at the 1e10 integer scale


def source_ngram_kl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    tokc = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    corpus = tokc.groupBy("tok").agg(F.sum("cnt").alias("ccnt"))
    head = corpus.orderBy(F.col("ccnt").desc(), F.col("tok")).limit(KL_HEAD_V)
    bucketed = (
        tokc.join(
            F.broadcast(head.select("tok", F.lit(True).alias("is_head"))), "tok", "left"
        )
        .select(
            "source",
            F.when(F.col("is_head"), F.col("tok")).otherwise(F.lit("<oov>")).alias("bucket"),
            "cnt",
        )
        .groupBy("source", "bucket")
        .agg(F.sum("cnt").alias("scnt"))
    ).localCheckpoint(eager=False)
    cbucket = bucketed.groupBy("bucket").agg(F.sum("scnt").alias("ccnt"))
    stot = bucketed.groupBy("source").agg(F.sum("scnt").alias("ts"))
    nb = cbucket.agg(F.count(F.lit(1)).alias("b"), F.sum("ccnt").alias("tc"))
    grid = (
        stot.crossJoin(F.broadcast(cbucket))
        .join(bucketed, ["source", "bucket"], "left")
        .crossJoin(F.broadcast(nb))
        .select(
            "source",
            "ts",
            "tc",
            "b",
            (F.coalesce(F.col("scnt"), F.lit(0)) + 1).alias("cs1"),
            (F.col("ccnt") + 1).alias("cc1"),
        )
    )
    scored = grid.select(
        "source",
        "ts",
        F.expr("cs1 * 1000000 div (ts + b)").alias("ps_ppm"),
        F.expr(
            "CAST(floor(ln(cs1 * (tc + b)) * 10000) AS BIGINT)"
            " - CAST(floor(ln(cc1 * (ts + b)) * 10000) AS BIGINT)"
        ).alias("lr_q"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.max("ts").cast("bigint").alias("n_tokens"),
            F.sum(F.col("ps_ppm") * F.col("lr_q")).cast("bigint").alias("kl_scaled"),
        )
        .select(
            "source",
            "n_tokens",
            "kl_scaled",
            (F.col("kl_scaled") > KL_ALERT_SCALED).cast("int").alias("skew_flag"),
        )
    )


SOURCE_KL_SQL = f"""
WITH tokc AS (
  SELECT source, tok, count(*) AS cnt
  FROM (SELECT source, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS tok
        FROM documents)
  GROUP BY source, tok
),
head AS (
  SELECT tok FROM (SELECT tok, CAST(sum(cnt) AS BIGINT) AS ccnt FROM tokc GROUP BY tok)
  ORDER BY ccnt DESC, tok LIMIT {KL_HEAD_V}
),
bucketed AS (
  SELECT source,
         CASE WHEN h.tok IS NOT NULL THEN t.tok ELSE '<oov>' END AS bucket,
         CAST(sum(cnt) AS BIGINT) AS scnt
  FROM tokc t LEFT JOIN head h ON t.tok = h.tok
  GROUP BY 1, 2
),
cbucket AS (SELECT bucket, CAST(sum(scnt) AS BIGINT) AS ccnt FROM bucketed GROUP BY bucket),
stot AS (SELECT source, CAST(sum(scnt) AS BIGINT) AS ts FROM bucketed GROUP BY source),
nb AS (SELECT count(*)::BIGINT AS b, CAST(sum(ccnt) AS BIGINT) AS tc FROM cbucket),
grid AS (
  SELECT s.source, s.ts, nb.tc, nb.b,
         coalesce(bk.scnt, 0) + 1 AS cs1,
         cb.ccnt + 1 AS cc1
  FROM stot s CROSS JOIN cbucket cb
  LEFT JOIN bucketed bk ON bk.source = s.source AND bk.bucket = cb.bucket
  CROSS JOIN nb
),
scored AS (
  SELECT source, ts,
         cs1 * 1000000 // (ts + b) AS ps_ppm,
         CAST(floor(ln(cs1 * (tc + b)) * 10000) AS BIGINT)
           - CAST(floor(ln(cc1 * (ts + b)) * 10000) AS BIGINT) AS lr_q
  FROM grid
)
SELECT source,
       CAST(max(ts) AS BIGINT) AS n_tokens,
       CAST(sum(ps_ppm * lr_q) AS BIGINT) AS kl_scaled,
       CAST(CAST(sum(ps_ppm * lr_q) AS BIGINT) > {KL_ALERT_SCALED} AS INT) AS skew_flag
FROM scored GROUP BY source
"""

QUERIES["source_ngram_kl"] = source_ngram_kl
ORACLES["source_ngram_kl"] = SOURCE_KL_SQL


# --- curriculum phase plan ----------------------------------------------------
#
# Quality-ordered curriculum construction (public art: curriculum /
# quality-ascending data ordering — train early on plentiful average
# data, finish on the cleanest slice): documents rank by an exact
# integer quality composite (lexical-diversity bp + stopword-
# naturalness bp, the quality_score features in integer form) and
# split into three phases at the corpus quality tertiles.  The rollup
# is the schedule a training run consumes: docs, token budget and
# mean quality per phase.
#
# Scale: NO global sort — tertile edges are one 1-row percentile
# aggregate (mergeable GK sketch at 100 TB) broadcast back, phase
# assignment is an array count per row (the equidepth device: edges
# snapped to an integer grid x3000 where interpolated thirds are
# exact, so both engines bin identically); one bounded phase rollup.

def curriculum_phase_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    n_chars = F.length("text")
    est = F.greatest(
        F.floor(n_chars / 10),
        F.least(F.floor(n_chars / 3.5), F.floor(n_chars / 2)),
    ).cast("bigint")
    base = docs.select(
        "doc_id",
        est.alias("est_tokens"),
        F.expr(
            "cast(size(array_distinct(filter(split(text, '\\\\s+'), t -> t != ''))) * 10000"
            " div size(filter(split(text, '\\\\s+'), t -> t != '')) as bigint)"
            " + cast(size(filter(filter(split(text, '\\\\s+'), t -> t != ''),"
            " t -> t in ('the', 'a', 'of', 'and', 'in', 'to', 'is'))) * 10000"
            " div size(filter(split(text, '\\\\s+'), t -> t != '')) as bigint)"
        ).alias("q_bp"),
    ).localCheckpoint(eager=False)
    edges = base.agg(
        F.expr(
            "transform(percentile(q_bp, array(0.3333333333333333, 0.6666666666666666)),"
            " e -> cast(floor(e * 3000 + 0.5) as bigint))"
        ).alias("edges")
    )
    phased = base.crossJoin(F.broadcast(edges)).select(
        "est_tokens",
        "q_bp",
        (F.size(F.filter("edges", lambda e: e < F.col("q_bp") * 3000)) + 1).alias("phase"),
    )
    tot = phased.agg(
        F.count(F.lit(1)).alias("all_docs"), F.sum("est_tokens").alias("all_tokens")
    )
    return (
        phased.groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("est_tokens").alias("n_tokens"),
            F.sum("q_bp").alias("sq"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("phase").cast("bigint").alias("phase"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_tokens").cast("bigint").alias("n_tokens"),
            F.expr("cast(sq div n_docs as bigint)").alias("mean_q_bp"),
            F.expr("cast(n_docs * 10000 div all_docs as bigint)").alias("docs_share_bp"),
            F.expr("cast(n_tokens * 10000 div all_tokens as bigint)").alias(
                "token_share_bp"
            ),
        )
    )


CURRICULUM_SQL = """
WITH base AS (
  SELECT doc_id,
         CAST(greatest(length(text) // 10,
              least(CAST(floor(length(text) / 3.5) AS BIGINT), length(text) // 2)) AS BIGINT)
           AS est_tokens,
         CAST(len(list_distinct(toks)) * 10000 // len(toks) AS BIGINT)
           + CAST(len(list_filter(toks, t -> t IN ('the', 'a', 'of', 'and', 'in', 'to', 'is')))
                  * 10000 // len(toks) AS BIGINT) AS q_bp
  FROM (SELECT doc_id, text, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents)
),
edges AS (
  SELECT list_transform(quantile_cont(q_bp, [0.3333333333333333, 0.6666666666666666]),
                        e -> CAST(floor(e * 3000 + 0.5) AS BIGINT)) AS edges
  FROM base
),
phased AS (
  SELECT est_tokens, q_bp,
         len(list_filter(edges, e -> e < q_bp * 3000)) + 1 AS phase
  FROM base, edges
),
tot AS (
  SELECT count(*)::BIGINT AS all_docs, CAST(sum(est_tokens) AS BIGINT) AS all_tokens
  FROM phased
)
SELECT CAST(phase AS BIGINT) AS phase,
       count(*)::BIGINT AS n_docs,
       CAST(sum(est_tokens) AS BIGINT) AS n_tokens,
       CAST(CAST(sum(q_bp) AS BIGINT) // count(*) AS BIGINT) AS mean_q_bp,
       CAST(count(*) * 10000 // all_docs AS BIGINT) AS docs_share_bp,
       CAST(CAST(sum(est_tokens) AS BIGINT) * 10000 // all_tokens AS BIGINT) AS token_share_bp
FROM phased, tot GROUP BY phase, all_docs, all_tokens
"""

QUERIES["curriculum_phase_plan"] = curriculum_phase_plan
ORACLES["curriculum_phase_plan"] = CURRICULUM_SQL


# --- LLM-watermark detection --------------------------------------------------
#
# Synthetic-text screening for training corpora (public art:
# Kirchenbauer et al. 2023 — a watermarking LLM biases sampling toward
# a context-keyed pseudo-random "green list"; a detector recomputes
# the same keyed partition and tests whether green-token share
# exceeds the 50% null): for every adjacent token pair, the successor
# is "green" iff the md5 of (prev, token) has even parity — exactly
# reproducible in both engines — and the per-doc one-sided z-score of
# the green share against Binomial(n, 1/2) flags documents that a
# watermarking sampler produced.  Natural text sits at ~z 0; the
# planted detector threshold z >= 4 keeps the false-positive rate at
# the 3e-5 level the screening use-case needs.
#
# Scale: per-row array math over adjacent pairs (no explode, no
# shuffle); z quantized to milli via the exact integer numerator over
# sqrt(n) (sqrt is correctly-rounded IEEE — the safe function).

def text_watermark_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    base = docs.select("doc_id", toks.alias("toks")).where(F.size("toks") >= 2)
    greens = F.expr(
        "size(filter(sequence(2, size(toks)), i ->"
        " conv(substring(md5(concat(toks[i-2], '|', toks[i-1])), 1, 8), 16, 10) % 2 = 0))"
    )
    scored = base.select(
        "doc_id",
        (F.size("toks") - 1).cast("bigint").alias("n_pairs"),
        greens.cast("bigint").alias("n_green"),
    )
    z_milli = F.expr(
        "cast(floor((2 * n_green - n_pairs) * 1000 / sqrt(cast(n_pairs as double)) + 0.5)"
        " as bigint)"
    )
    return scored.select(
        "doc_id",
        "n_pairs",
        "n_green",
        F.expr("cast(n_green * 10000 div n_pairs as bigint)").alias("green_share_bp"),
        z_milli.alias("z_milli"),
        (z_milli >= 4000).cast("int").alias("watermark_flag"),
    )


WATERMARK_SQL = """
WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
),
eligible AS (SELECT * FROM base WHERE len(toks) >= 2),
scored AS (
  SELECT doc_id,
         CAST(len(toks) - 1 AS BIGINT) AS n_pairs,
         CAST(len(list_filter(range(2, len(toks) + 1), i ->
              CAST('0x' || substr(md5(toks[i-1] || '|' || toks[i]), 1, 8) AS BIGINT) % 2 = 0))
              AS BIGINT) AS n_green
  FROM eligible
)
SELECT doc_id, n_pairs, n_green,
       CAST(n_green * 10000 // n_pairs AS BIGINT) AS green_share_bp,
       CAST(floor((2 * n_green - n_pairs) * 1000 / sqrt(CAST(n_pairs AS DOUBLE)) + 0.5)
            AS BIGINT) AS z_milli,
       CAST(CAST(floor((2 * n_green - n_pairs) * 1000 / sqrt(CAST(n_pairs AS DOUBLE)) + 0.5)
            AS BIGINT) >= 4000 AS INT) AS watermark_flag
FROM scored
"""

QUERIES["text_watermark_detect"] = text_watermark_detect
ORACLES["text_watermark_detect"] = WATERMARK_SQL


# --- RAKE keyword extraction --------------------------------------------------
#
# Rapid Automatic Keyword Extraction (Rose et al. 2010, public art) —
# the unsupervised phrase-keyword layer above top_terms_tfidf's
# unigram scores: candidate phrases are maximal stopword-free token
# runs (capped at RAKE_MAX_WORDS), word scores are deg(w)/freq(w)
# over phrase instances in exact milli (deg·1000 div freq), and a
# phrase scores the sum of its word scores.  Corpus-level top-20 with
# score-then-phrase ordering for cross-engine determinism.
#
# Scale: one corpus-wide posexplode + per-doc window to number the
# phrase runs (pos is unique per doc so the default RANGE frame is
# deterministic), then every aggregation runs on phrase instances or
# the bounded vocabulary; the word-score join is a broadcast (vocab-
# bounded) and the final cut is a TakeOrderedAndProject, not a global
# sort.

RAKE_MAX_WORDS = 4
RAKE_TOP_K = 20


def keyword_extract_rake(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pe = docs.select(
        "doc_id", F.posexplode(tokens(F.col("text"))).alias("pos", "tok")
    ).withColumn("is_break", F.col("tok").isin(*STOPWORDS["en"]).cast("int"))
    pids = pe.withColumn(
        "pid",
        F.sum("is_break").over(
            Window.partitionBy("doc_id").orderBy("pos")
        ),
    )
    inst = (
        pids.where(F.col("is_break") == 0)
        .groupBy("doc_id", "pid")
        .agg(
            F.concat_ws(
                " ",
                F.transform(
                    F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                    lambda s: s.tok,
                ),
            ).alias("phrase"),
            F.count("*").cast("bigint").alias("n_words"),
        )
        .where(F.col("n_words") <= RAKE_MAX_WORDS)
        .localCheckpoint(eager=False)  # pin: feeds word stats AND phrase rollup
    )
    wstat = (
        inst.select(F.explode(F.split("phrase", " ")).alias("tok"), "n_words")
        .groupBy("tok")
        .agg(
            F.count("*").cast("bigint").alias("freq"),
            F.sum("n_words").cast("bigint").alias("deg"),
        )
        .select("tok", F.expr("cast(deg * 1000 div freq as bigint)").alias("wscore"))
    )
    uphrase = inst.groupBy("phrase").agg(
        F.max("n_words").alias("n_words"), F.count("*").cast("bigint").alias("n_occ")
    )
    scored = (
        uphrase.select("phrase", "n_words", "n_occ", F.explode(F.split("phrase", " ")).alias("tok"))
        .join(F.broadcast(wstat), "tok")
        .groupBy("phrase", "n_words", "n_occ")
        .agg(F.sum("wscore").cast("bigint").alias("score_milli"))
    )
    return scored.orderBy(F.col("score_milli").desc(), F.col("phrase")).limit(RAKE_TOP_K)


RAKE_SQL = """
WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
),
pe AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(toks) + 1),
                i -> struct_pack(pos := i, tok := toks[i])), recursive := true)
  FROM base
),
marked AS (
  SELECT doc_id, pos, tok,
         CAST(tok IN ('the', 'a', 'of', 'and', 'in', 'to', 'is') AS INT) AS is_break
  FROM pe
),
pids AS (
  SELECT doc_id, pos, tok, is_break,
         sum(is_break) OVER (PARTITION BY doc_id ORDER BY pos) AS pid
  FROM marked
),
inst AS (
  SELECT doc_id, pid, string_agg(tok, ' ' ORDER BY pos) AS phrase,
         count(*)::BIGINT AS n_words
  FROM pids WHERE is_break = 0 GROUP BY doc_id, pid HAVING count(*) <= {MAXW}
),
wtoks AS (SELECT unnest(string_split(phrase, ' ')) AS tok, n_words FROM inst),
wstat AS (
  SELECT tok, CAST(sum(n_words) * 1000 // count(*) AS BIGINT) AS wscore
  FROM wtoks GROUP BY tok
),
uphrase AS (
  SELECT phrase, max(n_words)::BIGINT AS n_words, count(*)::BIGINT AS n_occ
  FROM inst GROUP BY phrase
),
ptoks AS (
  SELECT phrase, n_words, n_occ, unnest(string_split(phrase, ' ')) AS tok FROM uphrase
),
scored AS (
  SELECT p.phrase, p.n_words, p.n_occ, CAST(sum(w.wscore) AS BIGINT) AS score_milli
  FROM ptoks p JOIN wstat w USING (tok)
  GROUP BY p.phrase, p.n_words, p.n_occ
)
SELECT phrase, n_words, n_occ, score_milli
FROM scored ORDER BY score_milli DESC, phrase LIMIT {K}
""".format(MAXW=RAKE_MAX_WORDS, K=RAKE_TOP_K)

QUERIES["keyword_extract_rake"] = keyword_extract_rake
ORACLES["keyword_extract_rake"] = RAKE_SQL


# --- OCR artifact screen ------------------------------------------------------
#
# The scanned-document QC gate (public art: OCR post-correction
# surveys; the docx/excel→PDF prep pipelines ingest exactly the
# documents this screen triages): three classic OCR artifact rates
# per document — linebreak hyphenation (tokens ending '-'),
# digit-letter confusions (mixed alphanumeric tokens: 0/O, 1/l
# class), and single-character debris — rolled up per source with a
# flag rate.  Artifacts are PLANTED deterministically (every 9th doc:
# every 7th token gains a trailing hyphen, every 11th a leading
# digit — Spark's indexed transform lambda vs DuckDB's
# list_transform(range) device), so the screen provably separates
# artifact docs from clean ones.
#
# Scale: per-row array math (no explode), one bounded per-source agg.

OCR_FLAG_BP = 300


def ocr_artifact_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    base = docs.select(
        "doc_id", "source", tokens(F.col("text")).alias("toks"),
        (F.col("doc_id") % 9 == 4).cast("int").alias("planted"),
    )
    mangled = base.select(
        "doc_id", "source", "planted",
        F.expr(
            "case when planted = 1 then transform(toks, (t, i) ->"
            " case when i % 7 = 3 then concat(t, '-')"
            "      when i % 11 = 5 then concat('0', t)"
            "      else t end) else toks end"
        ).alias("toks"),
    )
    rate = (
        lambda cond, name: F.expr(
            f"cast(size(filter(toks, t -> {cond})) * 10000 div"
            " greatest(size(toks), 1) as bigint)"
        ).alias(name)
    )
    scored = mangled.select(
        "doc_id", "source", "planted",
        F.size("toks").cast("bigint").alias("n_tokens"),
        rate("t like '%-'", "hyphen_bp"),
        rate("t rlike '^[0-9]+[a-z]' or t rlike '^[a-z]+[0-9]'", "mixed_bp"),
        rate("length(t) = 1", "single_bp"),
    ).withColumn(
        "ocr_flag",
        ((F.col("hyphen_bp") + F.col("mixed_bp")) > OCR_FLAG_BP).cast("int"),
    )
    return scored.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("planted").cast("bigint").alias("n_planted"),
        F.sum("ocr_flag").cast("bigint").alias("n_flagged"),
        F.expr("cast(sum(ocr_flag) * 10000 div count(*) as bigint)").alias("flagged_bp"),
        F.expr("cast(sum(hyphen_bp) div count(*) as bigint)").alias("hyphen_bp_mean"),
        F.expr("cast(sum(mixed_bp) div count(*) as bigint)").alias("mixed_bp_mean"),
        F.expr("cast(sum(single_bp) div count(*) as bigint)").alias("single_bp_mean"),
    )


OCR_SQL = f"""
WITH base AS (
  SELECT doc_id, source,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks,
         CAST(doc_id % 9 = 4 AS INT) AS planted
  FROM documents
),
mangled AS (
  SELECT doc_id, source, planted,
         CASE WHEN planted = 1 THEN
           list_transform(range(1, len(toks) + 1), i ->
             CASE WHEN (i - 1) % 7 = 3 THEN toks[i] || '-'
                  WHEN (i - 1) % 11 = 5 THEN '0' || toks[i]
                  ELSE toks[i] END)
         ELSE toks END AS toks
  FROM base
),
scored AS (
  SELECT doc_id, source, planted,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(len(list_filter(toks, t -> t LIKE '%-')) * 10000
              // greatest(len(toks), 1) AS BIGINT) AS hyphen_bp,
         CAST(len(list_filter(toks, t -> regexp_matches(t, '^[0-9]+[a-z]')
              OR regexp_matches(t, '^[a-z]+[0-9]'))) * 10000
              // greatest(len(toks), 1) AS BIGINT) AS mixed_bp,
         CAST(len(list_filter(toks, t -> length(t) = 1)) * 10000
              // greatest(len(toks), 1) AS BIGINT) AS single_bp
  FROM mangled
),
flagged AS (
  SELECT *, CAST(hyphen_bp + mixed_bp > {OCR_FLAG_BP} AS INT) AS ocr_flag FROM scored
)
SELECT source, count(*)::BIGINT AS n_docs,
       CAST(sum(planted) AS BIGINT) AS n_planted,
       CAST(sum(ocr_flag) AS BIGINT) AS n_flagged,
       CAST(sum(ocr_flag) * 10000 // count(*) AS BIGINT) AS flagged_bp,
       CAST(sum(hyphen_bp) // count(*) AS BIGINT) AS hyphen_bp_mean,
       CAST(sum(mixed_bp) // count(*) AS BIGINT) AS mixed_bp_mean,
       CAST(sum(single_bp) // count(*) AS BIGINT) AS single_bp_mean
FROM flagged GROUP BY source
"""

QUERIES["ocr_artifact_stats"] = ocr_artifact_stats
ORACLES["ocr_artifact_stats"] = OCR_SQL


# --- Blocklist content screen -------------------------------------------------
#
# The C4-style lexicon filter (public practice: "List of Dirty Naughty
# ... Words" screening in C4/CommonCrawl pipelines — stage5's content
# validation generalized): per document, blocklist-token hits and
# density in bp, mapped to the three-way action a filtering pipeline
# takes (drop / review / keep), rolled up per (source, action) with
# within-source shares.  The blocklist here is a placeholder lexicon
# of corpus-native tokens, exercising the exact mechanics (set
# membership at scan rate, density thresholds) a production list
# plugs into.
#
# Scale: per-row array math, one bounded (source, action) agg — the
# same shape as quality_filter_verdict; a real 100 TB run broadcasts
# the lexicon (thousands of terms) into the same filter() lambda.

BLOCKLIST = ("crash", "slow", "error", "fail", "drop")
BLOCK_DROP_BP = 500
BLOCK_REVIEW_BP = 200


def blocklist_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = tokens(F.col("text"))
    base = docs.select(
        "doc_id", "source",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.filter(toks, lambda t: t.isin(*BLOCKLIST)))
        .cast("bigint")
        .alias("n_hits"),
    )
    scored = base.select(
        "source", "n_hits",
        F.expr("cast(n_hits * 10000 div greatest(n_tokens, 1) as bigint)").alias(
            "density_bp"
        ),
    ).select(
        "source", "n_hits", "density_bp",
        F.when(F.col("density_bp") > BLOCK_DROP_BP, "drop")
        .when(F.col("density_bp") > BLOCK_REVIEW_BP, "review")
        .otherwise("keep")
        .alias("action"),
    )
    per_source = scored.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_source_docs")
    )
    out = scored.groupBy("source", "action").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_hits").cast("bigint").alias("n_hits"),
        F.expr("cast(sum(density_bp) div count(*) as bigint)").alias("mean_density_bp"),
    )
    return out.join(per_source, "source").select(
        "source", "action", "n_docs", "n_hits", "mean_density_bp",
        F.expr("cast(n_docs * 10000 div n_source_docs as bigint)").alias("docs_share_bp"),
    )


BLOCKLIST_SQL = f"""
WITH base AS (
  SELECT doc_id, source,
         CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
              AS BIGINT) AS n_tokens,
         CAST(len(list_filter(string_split_regex(text, '\\s+'),
              t -> t IN ('crash', 'slow', 'error', 'fail', 'drop'))) AS BIGINT) AS n_hits
  FROM documents
),
scored AS (
  SELECT source, n_hits,
         CAST(n_hits * 10000 // greatest(n_tokens, 1) AS BIGINT) AS density_bp
  FROM base
),
actioned AS (
  SELECT source, n_hits, density_bp,
         CASE WHEN density_bp > {BLOCK_DROP_BP} THEN 'drop'
              WHEN density_bp > {BLOCK_REVIEW_BP} THEN 'review'
              ELSE 'keep' END AS action
  FROM scored
),
per_source AS (
  SELECT source, count(*)::BIGINT AS n_source_docs FROM actioned GROUP BY source
),
rolled AS (
  SELECT source, action, count(*)::BIGINT AS n_docs,
         CAST(sum(n_hits) AS BIGINT) AS n_hits,
         CAST(sum(density_bp) // count(*) AS BIGINT) AS mean_density_bp
  FROM actioned GROUP BY source, action
)
SELECT r.source, r.action, r.n_docs, r.n_hits, r.mean_density_bp,
       CAST(r.n_docs * 10000 // p.n_source_docs AS BIGINT) AS docs_share_bp
FROM rolled r JOIN per_source p ON r.source = p.source
"""

QUERIES["blocklist_screen"] = blocklist_screen
ORACLES["blocklist_screen"] = BLOCKLIST_SQL


# --- quality-threshold sweep ----------------------------------------------------
#
# The sweep pattern (dedup_band_sweep / sessionize_gap_sweep /
# ivf_nprobe_sweep) applied to perplexity-style filtering: before a
# corpus ships, the curator needs the retention curve — at each
# candidate quality bar, how many documents and tokens survive and how
# does the mean quality of the survivors move?  Thresholds are the
# corpus's own score deciles (data-driven, like corpus_ppl_buckets'
# tertiles), so the sweep is meaningful at any corpus scale.
#
# Device: per-token log-probs land as floor(ln(cnt/total)·1e4) exact
# integers (the zipf/dirichlet ln-quantize device) — per-doc scores are
# integer truncating means, deciles are values at deterministic row
# positions, and every kept/total sum is exact — no float summation
# anywhere, unlike the display-grade avg in quality_unigram_logprob.
#
# Plan: the same explode → vocab join → per-doc agg the unigram scorer
# runs, then a 9-row broadcast of decile thresholds cross-joined onto
# the bounded per-doc score table; one final 9-group agg.

def quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("token"))
    vocab = toks.groupBy("token").agg(F.count(F.lit(1)).alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("total"))
    lp = (
        toks.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .select(
            "doc_id",
            F.expr("cast(floor(ln(cnt / cast(total as double)) * 10000) as bigint)").alias(
                "lq"
            ),
        )
    )
    per_doc = lp.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("nt"), F.sum("lq").alias("s")
    ).select("doc_id", "nt", F.expr("s div nt").alias("score"))
    nd = per_doc.agg(
        F.count(F.lit(1)).alias("n"), F.sum("nt").alias("all_tokens")
    )
    # doc-grain global rank via the distributed two-pass device, not a
    # single-task window (round-6 verdict scale-killer family)
    from ..functions.distributed import global_ordered

    ranked = global_ordered(per_doc, ["score", "doc_id"], rank_col="rn").crossJoin(
        F.broadcast(nd)
    )
    deciles = (
        ranked.join(
            F.broadcast(
                spark.range(1, 10).select(F.col("id").cast("bigint").alias("decile"))
            ),
            F.expr("rn = (decile * n) div 10"),
        )
        .select("decile", F.col("score").alias("thr_e4"), "n", "all_tokens")
    )
    sweep = per_doc.crossJoin(F.broadcast(deciles)).groupBy(
        "decile", "thr_e4", "n", "all_tokens"
    ).agg(
        F.sum((F.col("score") >= F.col("thr_e4")).cast("int")).alias("docs_kept"),
        F.sum(F.expr("case when score >= thr_e4 then nt else 0 end")).alias("tokens_kept"),
        F.sum(F.expr("case when score >= thr_e4 then score else 0 end")).alias("kept_sum"),
    )
    return sweep.select(
        "decile",
        "thr_e4",
        F.col("docs_kept").cast("bigint").alias("docs_kept"),
        F.expr("docs_kept * 10000 div n").cast("bigint").alias("docs_kept_bp"),
        F.col("tokens_kept").cast("bigint").alias("tokens_kept"),
        F.expr("tokens_kept * 10000 div all_tokens").cast("bigint").alias("tokens_kept_bp"),
        F.expr("case when docs_kept > 0 then kept_sum div docs_kept end")
        .cast("bigint")
        .alias("mean_kept_score_e4"),
    )


QUALITY_SWEEP_SQL = """
WITH toks AS (
  SELECT doc_id, unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS token
  FROM documents
),
vocab AS (SELECT token, count(*)::BIGINT AS cnt FROM toks GROUP BY token),
total AS (SELECT CAST(sum(cnt) AS BIGINT) AS total FROM vocab),
lp AS (
  SELECT doc_id,
         CAST(floor(ln(cnt / CAST(total AS DOUBLE)) * 10000) AS BIGINT) AS lq
  FROM toks JOIN vocab USING (token), total
),
per_doc AS (
  SELECT doc_id, count(*)::BIGINT AS nt, CAST(sum(lq) // count(*) AS BIGINT) AS score
  FROM lp GROUP BY doc_id
),
nd AS (SELECT count(*)::BIGINT AS n, CAST(sum(nt) AS BIGINT) AS all_tokens FROM per_doc),
ranked AS (
  SELECT score, row_number() OVER (ORDER BY score, doc_id) AS rn FROM per_doc
),
deciles AS (
  SELECT d.decile, r.score AS thr_e4, nd.n, nd.all_tokens
  FROM ranked r
  CROSS JOIN nd
  JOIN (VALUES (1),(2),(3),(4),(5),(6),(7),(8),(9)) d(decile)
    ON r.rn = (d.decile * nd.n) // 10
),
sweep AS (
  SELECT decile, thr_e4, n, all_tokens,
         CAST(sum(CASE WHEN score >= thr_e4 THEN 1 ELSE 0 END) AS BIGINT) AS docs_kept,
         CAST(sum(CASE WHEN score >= thr_e4 THEN nt ELSE 0 END) AS BIGINT) AS tokens_kept,
         CAST(sum(CASE WHEN score >= thr_e4 THEN score ELSE 0 END) AS BIGINT) AS kept_sum
  FROM per_doc CROSS JOIN deciles
  GROUP BY decile, thr_e4, n, all_tokens
)
SELECT CAST(decile AS BIGINT) AS decile, thr_e4, docs_kept,
       CAST(docs_kept * 10000 // n AS BIGINT) AS docs_kept_bp,
       tokens_kept,
       CAST(tokens_kept * 10000 // all_tokens AS BIGINT) AS tokens_kept_bp,
       CASE WHEN docs_kept > 0 THEN CAST(kept_sum // docs_kept AS BIGINT)
            ELSE CAST(NULL AS BIGINT) END AS mean_kept_score_e4
FROM sweep
"""

QUERIES["quality_threshold_sweep"] = quality_threshold_sweep
ORACLES["quality_threshold_sweep"] = QUALITY_SWEEP_SQL


# --- code-vs-prose detection ----------------------------------------------------
#
# A pretraining corpus routes code and prose to different pipelines
# (tokenizer, quality rules, dedup grain all differ) — this is the
# router, and the classic heuristic battery works: statement
# terminators, brace density, indented-line share.  Every 11th
# document is deterministically code-ified in-query (semicolons every
# 4th token, braces every 9th, a newline+indent every 6th — the
# OCR-plant device applied to code syntax), so the detector's
# precision/recall are measurable against ground truth, not assumed.
#
# Per-doc features are pure string/array arithmetic (zero shuffle);
# the rollup is one bounded source agg with exact-integer confusion
# counts.

CODE_EVERY = 11
CODE_SEMI_MILLI = 100  # >= 0.1 semicolons/token
CODE_INDENT_BP = 1000  # >= 10% indented lines


def _codeified(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text", tokens(F.col("text")).alias("toks")
    )
    code_text = F.expr(
        """
        array_join(transform(toks, (t, i) ->
          concat(case when i > 0 and i % 6 = 0 then '\n    '
                      when i > 0 then ' ' else '' end,
                 case when i % 9 = 0 then concat('{', t, '}')
                      when i % 4 = 3 then concat(t, ';')
                      else t end)), '')
        """
    )
    # toks stays the ORIGINAL token list (its size is the feature
    # denominator in both engines; the code-ified text has the same
    # token count anyway — separators are whitespace)
    return base.select(
        "doc_id",
        "source",
        F.when(F.col("doc_id") % CODE_EVERY == 0, code_text)
        .otherwise(F.col("text"))
        .alias("text"),
        (F.col("doc_id") % CODE_EVERY == 0).cast("int").alias("planted_code"),
        "toks",
    )


def text_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _codeified(spark, sf_dir)
    feats = d.select(
        "source",
        "planted_code",
        F.expr("size(toks)").alias("nt"),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit(";"), F.lit("")))).alias(
            "n_semi"
        ),
        (F.length("text") - F.length(F.replace(F.col("text"), F.lit("{"), F.lit("")))).alias(
            "n_brace"
        ),
        F.expr("size(split(text, '\n'))").alias("n_lines"),
        F.expr("size(filter(split(text, '\n'), l -> l like '    %'))").alias("n_indent"),
    ).select(
        "source",
        "planted_code",
        F.expr("case when nt > 0 then n_semi * 1000 div nt else 0 end").alias("semi_milli"),
        F.expr("case when nt > 0 then n_brace * 1000 div nt else 0 end").alias("brace_milli"),
        F.expr("case when n_lines > 0 then n_indent * 10000 div n_lines else 0 end").alias(
            "indent_bp"
        ),
    )
    verdict = (
        f"case when semi_milli >= {CODE_SEMI_MILLI}"
        f" and indent_bp >= {CODE_INDENT_BP} then 1 else 0 end"
    )
    return feats.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("planted_code").cast("bigint").alias("planted_code"),
        F.sum(F.expr(verdict)).cast("bigint").alias("detected_code"),
        F.sum(F.expr(f"case when planted_code = 1 and {verdict} = 1 then 1 else 0 end"))
        .cast("bigint")
        .alias("true_pos"),
        F.sum(F.expr(f"case when planted_code = 0 and {verdict} = 1 then 1 else 0 end"))
        .cast("bigint")
        .alias("false_pos"),
        F.expr("cast(sum(semi_milli) div count(1) as bigint)").alias("mean_semi_milli"),
    )


CODE_DETECT_SQL = f"""
WITH base AS (
  SELECT doc_id, source, text,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks,
         CAST(doc_id % {CODE_EVERY} = 0 AS INT) AS planted_code
  FROM documents
),
built AS (
  SELECT doc_id, source, toks, planted_code,
         CASE WHEN planted_code = 1 THEN
           list_aggregate(list_transform(range(1, len(toks) + 1), i ->
             concat(CASE WHEN (i - 1) > 0 AND (i - 1) % 6 = 0 THEN chr(10) || '    '
                         WHEN (i - 1) > 0 THEN ' ' ELSE '' END,
                    CASE WHEN (i - 1) % 9 = 0 THEN concat('{{', toks[i], '}}')
                         WHEN (i - 1) % 4 = 3 THEN concat(toks[i], ';')
                         ELSE toks[i] END)), 'string_agg', '')
         ELSE text END AS text
  FROM base
),
feats AS (
  SELECT source, planted_code,
         CASE WHEN len(toks) > 0
              THEN (length(text) - length(replace(text, ';', ''))) * 1000 // len(toks)
              ELSE 0 END AS semi_milli,
         CASE WHEN len(string_split(text, chr(10))) > 0
              THEN len(list_filter(string_split(text, chr(10)), l -> l LIKE '    %'))
                   * 10000 // len(string_split(text, chr(10)))
              ELSE 0 END AS indent_bp
  FROM built
)
SELECT source, count(*)::BIGINT AS n_docs,
       CAST(sum(planted_code) AS BIGINT) AS planted_code,
       CAST(sum(CASE WHEN semi_milli >= {CODE_SEMI_MILLI} AND indent_bp >= {CODE_INDENT_BP}
                     THEN 1 ELSE 0 END) AS BIGINT) AS detected_code,
       CAST(sum(CASE WHEN planted_code = 1 AND semi_milli >= {CODE_SEMI_MILLI}
                      AND indent_bp >= {CODE_INDENT_BP} THEN 1 ELSE 0 END) AS BIGINT) AS true_pos,
       CAST(sum(CASE WHEN planted_code = 0 AND semi_milli >= {CODE_SEMI_MILLI}
                      AND indent_bp >= {CODE_INDENT_BP} THEN 1 ELSE 0 END) AS BIGINT) AS false_pos,
       CAST(sum(semi_milli) // count(*) AS BIGINT) AS mean_semi_milli
FROM feats
GROUP BY source
"""

QUERIES["text_code_detect"] = text_code_detect
ORACLES["text_code_detect"] = CODE_DETECT_SQL


# --- held-out perplexity (train/eval split) -------------------------------------
#
# corpus_ppl_buckets scores documents under a LM trained on the WHOLE
# corpus — fine for ranking, but methodologically it rewards
# memorization.  This is the honest version: train the add-k unigram
# LM on even doc_ids only, score BOTH halves, and ship the
# train-vs-heldout NLL gap — the overfitting number a data-quality
# pipeline should be watching (plus the held-out OOV rate the
# whole-corpus version cannot have by construction).  The split is
# (doc_id div 20) % 2 — doc_id PARITY is confounded with source in
# this corpus (source = doc_id % 20), so a parity split would put
# every source entirely in one half.  Runs at TRIGRAM grain — the
# corpus-head word vocabulary is fully shared between halves (no OOV,
# no gap to measure); trigrams have the singleton tail that makes
# held-out evaluation mean something (same grain as
# good_turing_counts).  Add-k with k = 1/2 keeps
# P(g) = (2c+1)/(2N + V + 1) an exact integer rational; per-gram NLL
# e4-quantizes the identical-double ln, so every sum is exact.
#
# Plan: one explode; the vocabulary join is the Zipf-head join every
# LM operator rides (AQE hot-token handling); two bounded source aggs.

def quality_heldout_ppl(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = docs.select(
        "source",
        (F.expr("(doc_id div 20) % 2") == 1).cast("int").alias("is_eval"),
        tokens(F.col("text")).alias("toks"),
    ).select(
        "source",
        "is_eval",
        F.explode(
            F.expr(
                "CASE WHEN size(toks) < 3 THEN array() "
                "ELSE transform(sequence(1, size(toks) - 2), "
                "i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),"
                " element_at(toks, i + 2))) END"
            )
        ).alias("w"),
    )
    train = toks.where(F.col("is_eval") == 0)
    vocab = train.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    stats = vocab.agg(
        F.sum("c").alias("n_train"), F.count(F.lit(1)).alias("v_train")
    )
    scored = (
        toks.join(vocab, "w", "left")
        .crossJoin(F.broadcast(stats))
        .select(
            "source",
            "is_eval",
            F.col("c").isNull().cast("int").alias("oov"),
            F.expr(
                "cast(floor(-ln((2 * coalesce(c, 0) + 1)"
                " / cast(2 * n_train + v_train + 1 as double)) * 10000) as bigint)"
            ).alias("nll_e4"),
        )
    )
    agg = scored.groupBy("source", "is_eval").agg(
        F.count(F.lit(1)).alias("nt"),
        F.sum("oov").alias("n_oov"),
        F.sum("nll_e4").alias("s_nll"),
    )
    wide = (
        agg.groupBy("source")
        .pivot("is_eval", [0, 1])
        .sum("nt", "n_oov", "s_nll")
        .select(
            "source",
            F.col("0_sum(nt)").alias("train_tokens"),
            F.col("1_sum(nt)").alias("eval_tokens"),
            F.col("1_sum(n_oov)").alias("eval_oov"),
            F.col("0_sum(s_nll)").alias("train_s"),
            F.col("1_sum(s_nll)").alias("eval_s"),
        )
    )
    return wide.select(
        "source",
        F.col("train_tokens").cast("bigint").alias("train_tokens"),
        F.col("eval_tokens").cast("bigint").alias("eval_tokens"),
        F.expr("eval_oov * 10000 div eval_tokens").cast("bigint").alias("eval_oov_bp"),
        F.expr("train_s div train_tokens").cast("bigint").alias("train_nll_e4"),
        F.expr("eval_s div eval_tokens").cast("bigint").alias("eval_nll_e4"),
        F.expr("eval_s div eval_tokens - train_s div train_tokens")
        .cast("bigint")
        .alias("overfit_gap_e4"),
    )


HELDOUT_PPL_SQL = """
WITH tl AS (
  SELECT source, CAST((doc_id // 20) % 2 = 1 AS INT) AS is_eval,
         list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t
  FROM documents
),
toks AS (
  SELECT source, is_eval, t[i] || ' ' || t[i + 1] || ' ' || t[i + 2] AS w
  FROM tl, unnest(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
),
vocab AS (
  SELECT w, count(*)::BIGINT AS c FROM toks WHERE is_eval = 0 GROUP BY w
),
stats AS (
  SELECT CAST(sum(c) AS BIGINT) AS n_train, count(*)::BIGINT AS v_train FROM vocab
),
scored AS (
  SELECT source, is_eval,
         CAST(v.c IS NULL AS INT) AS oov,
         CAST(floor(-ln((2 * coalesce(v.c, 0) + 1)
              / CAST(2 * n_train + v_train + 1 AS DOUBLE)) * 10000) AS BIGINT) AS nll_e4
  FROM toks t LEFT JOIN vocab v USING (w) CROSS JOIN stats
),
agg AS (
  SELECT source, is_eval, count(*)::BIGINT AS nt,
         CAST(sum(oov) AS BIGINT) AS n_oov, CAST(sum(nll_e4) AS BIGINT) AS s_nll
  FROM scored GROUP BY 1, 2
)
SELECT a0.source,
       a0.nt AS train_tokens, a1.nt AS eval_tokens,
       CAST(a1.n_oov * 10000 // a1.nt AS BIGINT) AS eval_oov_bp,
       CAST(a0.s_nll // a0.nt AS BIGINT) AS train_nll_e4,
       CAST(a1.s_nll // a1.nt AS BIGINT) AS eval_nll_e4,
       CAST(a1.s_nll // a1.nt - a0.s_nll // a0.nt AS BIGINT) AS overfit_gap_e4
FROM (SELECT * FROM agg WHERE is_eval = 0) a0
JOIN (SELECT * FROM agg WHERE is_eval = 1) a1 USING (source)
"""

QUERIES["quality_heldout_ppl"] = quality_heldout_ppl
ORACLES["quality_heldout_ppl"] = HELDOUT_PPL_SQL


# --- quality-weighted importance resampling plan --------------------------------
#
# The step between scoring documents and training on them: turn a
# per-document quality signal into importance weights, then report per
# source what the weighting actually does to the data — effective
# sample size ESS = (sum w)^2 / sum w^2 (Kish 1965; the "how much did
# weighting shrink my corpus" diagnostic every weighted-sampling run
# checks) and the quality-proportional resample allocation against a
# global budget of one draw per document (the DoReMi-style mixture
# reweighting, at source grain).  Weights are integer milli
# (1000 * unique-token ratio, truncating div) so every sum, square and
# allocation is exact in both engines.
#
# Scale: one scan -> one source-grain hash-agg (map-side combining) +
# a 1-row broadcast total; sums bounded by docs x 1000 so the squared
# terms stay far inside BIGINT at any per-source shard a real layout
# would feed this.


def quality_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = F.expr("1000 * n_uniq div n_tok")
    d = (
        docs.select("source", tokens(F.col("text")).alias("t"))
        .select(
            "source",
            F.size("t").alias("n_tok"),
            F.size(F.array_distinct("t")).alias("n_uniq"),
        )
        .select("source", w.alias("w"))
    )
    per_src = d.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("w").cast("bigint").alias("sum_w"),
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("sum_w2"),
    )
    tot = per_src.agg(
        F.sum("n_docs").alias("total_docs"), F.sum("sum_w").alias("total_w")
    )
    return (
        per_src.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            F.col("sum_w").alias("sum_w_milli"),
            F.expr("1000 * sum_w * sum_w div sum_w2").alias("ess_milli"),
            F.expr("(1000 * sum_w * sum_w div sum_w2) div n_docs").alias(
                "ess_ratio_milli"
            ),
            F.expr("total_docs * sum_w div total_w").alias("resample_target"),
            F.expr("10000 * sum_w div total_w").alias("weight_share_bp"),
        )
    )


QUALITY_RESAMPLE_SQL = """
WITH d AS (
  SELECT source,
         1000 * len(list_distinct(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')))
           // len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS w
  FROM documents
),
per_src AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         sum(w)::BIGINT AS sum_w, sum(w * w)::BIGINT AS sum_w2
  FROM d GROUP BY source
),
tot AS (SELECT sum(n_docs)::BIGINT AS total_docs, sum(sum_w)::BIGINT AS total_w FROM per_src)
SELECT source,
       n_docs,
       sum_w AS sum_w_milli,
       CAST(1000 * sum_w * sum_w // sum_w2 AS BIGINT) AS ess_milli,
       CAST((1000 * sum_w * sum_w // sum_w2) // n_docs AS BIGINT) AS ess_ratio_milli,
       CAST(total_docs * sum_w // total_w AS BIGINT) AS resample_target,
       CAST(10000 * sum_w // total_w AS BIGINT) AS weight_share_bp
FROM per_src, tot
"""

QUERIES["quality_importance_resampling"] = quality_importance_resampling
ORACLES["quality_importance_resampling"] = QUALITY_RESAMPLE_SQL


# --- MATTR lexical diversity (moving-average type-token ratio) ----------------
#
# Covington & McFall (2010): plain TTR falls with document length by
# construction, so corpora mixing long and short documents can't be
# compared on it — MATTR fixes the window (MATTR_W tokens), computes
# TTR per window, and averages, giving a length-robust lexical-
# diversity score (the corpus-QC number next to quality_repetition's
# dup-grams and vocab_stats' global TTR). Windows slide at stride
# MATTR_S (the sampled-starts estimator); documents shorter than one
# window fall back to their plain TTR (flagged by n_windows = 0).
# Integer-exact: per-window distinct counts, basis points via div.
# Scale: pure per-row JVM list ops over one documents scan — ZERO
# shuffle, the cheapest plan class in the repo.

MATTR_W = 25
MATTR_S = 12


def text_mattr_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    staged = docs.select(
        "doc_id",
        F.expr("filter(split(text, '\\\\s+'), t -> t != '')").alias("toks"),
    ).select(
        "doc_id",
        "toks",
        F.expr("size(toks)").cast("bigint").alias("n_tokens"),
        F.expr(
            # explicit < W gate: truncating div yields 0 (not -1) for
            # sizes in [W-S+1, W-1], so the greatest(0, ...) form alone
            # would claim one short window for 14..24-token docs and
            # deflate mattr_bp below the doc's plain TTR
            f"cast(case when size(toks) < {MATTR_W} then 0"
            f" else (size(toks) - {MATTR_W}) div {MATTR_S} + 1 end as bigint)"
        ).alias("n_windows"),
        F.expr(
            "case when size(toks) = 0 then cast(0 as bigint)"
            " else cast(size(array_distinct(toks)) * 10000 div size(toks) as bigint) end"
        ).alias("ttr_bp"),
    )
    return staged.withColumn(
        "mattr_bp",
        F.expr(
            f"""
            case when n_windows = 0 then ttr_bp
            else cast(aggregate(
                   transform(sequence(0, int(n_windows) - 1), k ->
                     size(array_distinct(slice(toks, k * {MATTR_S} + 1, {MATTR_W})))),
                   cast(0 as bigint), (a, x) -> a + x)
                 * 10000 div (n_windows * {MATTR_W}) as bigint) end"""
        ),
    ).drop("toks")


MATTR_SQL = f"""
WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
),
staged AS (
  SELECT doc_id, toks,
         CAST(len(toks) AS BIGINT) AS n_tokens,
         CAST(CASE WHEN len(toks) < {MATTR_W} THEN 0
              ELSE (len(toks) - {MATTR_W}) // {MATTR_S} + 1 END AS BIGINT) AS n_windows,
         CAST(CASE WHEN len(toks) = 0 THEN 0
              ELSE len(list_distinct(toks)) * 10000 // len(toks) END AS BIGINT) AS ttr_bp
  FROM base
)
SELECT doc_id, n_tokens, n_windows, ttr_bp,
       CAST(CASE WHEN n_windows = 0 THEN ttr_bp
            ELSE coalesce(list_sum(list_transform(range(0, n_windows), k ->
                   len(list_distinct(list_slice(toks, k * {MATTR_S} + 1,
                                                k * {MATTR_S} + {MATTR_W}))))), 0)
                 * 10000 // (n_windows * {MATTR_W}) END AS BIGINT) AS mattr_bp
FROM staged
"""

QUERIES["text_mattr_diversity"] = text_mattr_diversity
ORACLES["text_mattr_diversity"] = MATTR_SQL
