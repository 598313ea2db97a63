"""Text preparation operators: tag stripping, forced sentence splits.

Reference parity:
* `semantic search/stage_04_embedding_generation.py:406`
  ``remove_html_tags`` — strip PageHeader/PageFooter HTML comments
  (case-insensitive, exact stage-2 attribute shape), collapse the
  leftover blank lines to one, trim. Run on every chunk before
  embedding.
* `catalog search/stage3_generate_summaries.py:759`
  ``force_split_content`` — split content into exactly N sections by
  distributing sentences evenly (first ``len % N`` sections get one
  extra); the char-count fallback for sentence-poor content is
  simplified to token-even distribution (documented, mirrored in the
  oracle). `:631` ``split_page_into_sections`` min-section semantics
  are what this guarantees.

Scale design: both operators are pure per-row expressions
(regexp_replace / array slicing over the token array) — zero shuffle,
zero Python, scan-rate at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.tables import load_table
from .sectioning import _FILT_TOKS_SQL, HEAD_EVERY, PUNCT_SQL, punct_tokens

TAG_RE = r'(?i)<!--\s*Page(?:Header|Footer)\s+PageNumber="\d+"\s+PageReference="[^"]*"\s*-->'
COLLAPSE_RE = r"\n\s*\n\s*\n+"
FORCE_SECTIONS = 3


# --- strip_page_tags ---------------------------------------------------------

def _tagged_content(docs: DataFrame) -> DataFrame:
    """(doc_id, content): every HEAD_EVERY-token block wrapped in the
    exact stage-2 PageHeader/PageFooter tag pair."""
    toks = tokens(F.col("text"))
    n_blocks = F.greatest(F.ceil(F.size(toks) / HEAD_EVERY).cast("int"), F.lit(1))

    def block(w: Column) -> Column:
        page = (w + 1).cast("string")
        return F.concat(
            F.lit('<!-- PageHeader PageNumber="'), page,
            F.lit('" PageReference="p'), page, F.lit('" -->\n'),
            F.array_join(F.slice(toks, w * HEAD_EVERY + 1, HEAD_EVERY), " "),
            F.lit('\n<!-- PageFooter PageNumber="'), page,
            F.lit('" PageReference="p'), page, F.lit('" -->'),
        )

    content = F.array_join(F.transform(F.sequence(F.lit(0), n_blocks - 1), block), "\n\n")
    return docs.select("doc_id", content.alias("content"))


def strip_page_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tagged = _tagged_content(docs)
    cleaned = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.col("content"), TAG_RE, ""), COLLAPSE_RE, "\n\n"
        )
    )
    return tagged.select(
        "doc_id",
        cleaned.alias("clean_content"),
        F.size(F.regexp_extract_all(F.col("content"), F.lit(TAG_RE), F.lit(0)))
        .cast("bigint")
        .alias("n_tags_removed"),
        F.length("content").cast("bigint").alias("chars_before"),
        F.length(cleaned).cast("bigint").alias("chars_after"),
    )


_TAGGED_SQL = f"""
tagged AS (
  SELECT doc_id,
         array_to_string(list_transform(generate_series(0,
             greatest(CAST(ceil(len(toks) / {HEAD_EVERY}.0) AS INT), 1) - 1),
           w -> '<!-- PageHeader PageNumber="' || (w + 1) || '" PageReference="p' || (w + 1) || '" -->' || chr(10)
                || array_to_string(list_slice(toks, w * {HEAD_EVERY} + 1, (w + 1) * {HEAD_EVERY}), ' ')
                || chr(10) || '<!-- PageFooter PageNumber="' || (w + 1) || '" PageReference="p' || (w + 1) || '" -->'
         ), chr(10) || chr(10)) AS content
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents)
)
"""

STRIP_TAGS_SQL = f"""
WITH {_TAGGED_SQL.strip()}
SELECT doc_id,
       trim(regexp_replace(regexp_replace(content, '{TAG_RE}', '', 'g'),
                           '{COLLAPSE_RE}', chr(10) || chr(10), 'g')) AS clean_content,
       CAST(len(regexp_extract_all(content, '{TAG_RE}')) AS BIGINT) AS n_tags_removed,
       CAST(length(content) AS BIGINT) AS chars_before,
       CAST(length(trim(regexp_replace(regexp_replace(content, '{TAG_RE}', '', 'g'),
                        '{COLLAPSE_RE}', chr(10) || chr(10), 'g'))) AS BIGINT) AS chars_after
FROM tagged
"""


# --- force_split_sentences ---------------------------------------------------

def force_split_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = punct_tokens(tokens(F.col("text")))
    base = docs.select("doc_id", toks.alias("toks"), F.size(toks).alias("n"))

    tk = lambda i: F.element_at(F.col("toks"), i)  # noqa: E731
    n = F.col("n")
    # sentence boundaries: after tokens ending [.!?], always after the last
    # (array_sort: distinct is not order-preserving in every engine)
    bpos = F.array_sort(F.array_distinct(
        F.concat(
            F.filter(
                F.sequence(F.lit(1), F.greatest(n, F.lit(1))),
                lambda i: (i <= n) & F.substring(tk(i), -1, 1).isin(".", "!", "?"),
            ),
            F.when(n > 0, F.array(n)).otherwise(F.array().cast("array<int>")),
        )
    ))
    pre = base.withColumn("bpos", bpos).withColumn("m", F.size("bpos"))

    m = F.col("m")
    k_eff = F.least(F.lit(FORCE_SECTIONS), m)

    def section(i: Column) -> Column:
        # sentences distributed evenly: first (m % k) sections get one extra
        bs = F.floor(m / k_eff).cast("int")
        extra = (m % k_eff).cast("int")
        s_i = (i - 1) * bs + F.least(i - 1, extra) + 1  # first sentence (1-based)
        e_i = s_i + bs + F.when(i <= extra, 1).otherwise(0) - 1  # last sentence
        tok_from = (
            F.when(s_i == 1, F.lit(0)).otherwise(F.element_at(F.col("bpos"), s_i - 1)) + 1
        )
        tok_to = F.element_at(F.col("bpos"), e_i)
        return F.struct(
            i.cast("bigint").alias("section_id"),
            F.array_join(F.slice(F.col("toks"), tok_from, tok_to - tok_from + 1), " ").alias(
                "section_content"
            ),
            (e_i - s_i + 1).cast("bigint").alias("n_sentences"),
            (tok_to - tok_from + 1).cast("bigint").alias("n_tokens"),
        )

    empty = F.array(
        F.struct(
            F.lit(1).cast("bigint").alias("section_id"),
            F.lit("").alias("section_content"),
            F.lit(0).cast("bigint").alias("n_sentences"),
            F.lit(0).cast("bigint").alias("n_tokens"),
        )
    )
    secs = F.when(m == 0, empty).otherwise(
        F.transform(F.sequence(F.lit(1), k_eff.cast("int")), section)
    )
    return pre.select("doc_id", F.inline(secs))


FORCE_SPLIT_SQL = f"""
WITH base AS (
  SELECT doc_id, toks, len(toks) AS n
  FROM (SELECT doc_id, {PUNCT_SQL.format(toks=_FILT_TOKS_SQL)} AS toks
        FROM documents)
),
pre AS (
  SELECT doc_id, toks, n,
         list_sort(list_distinct(list_concat(
             list_filter(generate_series(1, greatest(n, 1)),
                         i -> i <= n AND toks[i][-1] IN ('.', '!', '?')),
             CASE WHEN n > 0 THEN [n] ELSE [] END))) AS bpos
  FROM base
),
sized AS (SELECT *, len(bpos) AS m, least({FORCE_SECTIONS}, len(bpos)) AS k FROM pre)
SELECT doc_id,
       CAST(i AS BIGINT) AS section_id,
       CASE WHEN m = 0 THEN ''
            ELSE array_to_string(list_slice(toks,
                   coalesce(bpos[(i - 1) * (m // k) + least(i - 1, m % k)], 0) + 1,
                   bpos[(i - 1) * (m // k) + least(i - 1, m % k)
                        + (m // k) + CASE WHEN i <= m % k THEN 1 ELSE 0 END]), ' ')
       END AS section_content,
       CAST(CASE WHEN m = 0 THEN 0
            ELSE (m // k) + CASE WHEN i <= m % k THEN 1 ELSE 0 END END AS BIGINT) AS n_sentences,
       CAST(CASE WHEN m = 0 THEN 0
            ELSE bpos[(i - 1) * (m // k) + least(i - 1, m % k)
                      + (m // k) + CASE WHEN i <= m % k THEN 1 ELSE 0 END]
                 - coalesce(bpos[(i - 1) * (m // k) + least(i - 1, m % k)], 0)
       END AS BIGINT) AS n_tokens
FROM sized, (SELECT unnest(generate_series(1, greatest(k, 1))) AS i)
"""


QUERIES = {
    "strip_page_tags": strip_page_tags,
    "force_split_sentences": force_split_sentences,
}

ORACLES = {
    "strip_page_tags": STRIP_TAGS_SQL,
    "force_split_sentences": FORCE_SPLIT_SQL,
}


# --- text_normalize ----------------------------------------------------------
#
# Whitespace/control normalization — the C4-style cleanup (Raffel et
# al. 2020, public) every corpus ingest runs before tokenization, and
# the generalization of the reference's own cleanup passes
# (`stage_04_embedding_generation.py:406` remove_html_tags ends with
# exactly this collapse-and-trim; the docx/excel prep pipelines emit
# tab/CR-ridden text this pass repairs). Dirt is PLANTED in-query (the
# house pattern): leading tabs, doubled spaces for even doc_ids, a
# trailing space-CR tail — so normalization provably restores the
# original text bit-for-bit (`restored` == 1 for every row, tested).
#
# Scale: pure per-row regexp_replace chain — zero shuffle, zero
# Python, scan-rate at 100 TB.

def _dirty(docs: DataFrame) -> Column:
    doubled = F.when(F.col("doc_id") % 2 == 0, F.regexp_replace("text", " ", "  ")).otherwise(
        F.col("text")
    )
    return F.concat(F.lit("\t\t"), doubled, F.lit(" \r "))


def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    raw = _dirty(docs)
    clean = F.trim(
        F.regexp_replace(F.regexp_replace(raw, "[\\t\\r]", " "), " {2,}", " ")
    )
    return docs.select(
        "doc_id",
        F.length(raw).cast("bigint").alias("n_raw"),
        F.length(clean).cast("bigint").alias("n_clean"),
        (F.length(raw) - F.length(clean)).cast("bigint").alias("n_removed"),
        (clean == F.col("text")).cast("int").alias("restored"),
        F.md5(clean).alias("clean_hash"),
    )


TEXT_NORMALIZE_SQL = r"""
WITH dirty AS (
  SELECT doc_id, text,
         chr(9) || chr(9) ||
         CASE WHEN doc_id % 2 = 0 THEN replace(text, ' ', '  ') ELSE text END
         || ' ' || chr(13) || ' ' AS raw
  FROM documents
),
cleaned AS (
  SELECT doc_id, text, raw,
         trim(regexp_replace(regexp_replace(raw, '[\t\r]', ' ', 'g'), ' {2,}', ' ', 'g')) AS clean
  FROM dirty
)
SELECT doc_id,
       CAST(length(raw) AS BIGINT) AS n_raw,
       CAST(length(clean) AS BIGINT) AS n_clean,
       CAST(length(raw) - length(clean) AS BIGINT) AS n_removed,
       CAST(clean = text AS INT) AS restored,
       md5(clean) AS clean_hash
FROM cleaned
"""

QUERIES["text_normalize"] = text_normalize
ORACLES["text_normalize"] = TEXT_NORMALIZE_SQL


# --- dialogue turn structuring (instruct-data prep) ---------------------------
#
# The conversation-shaped sibling of the section/chunk structurers: an
# instruction-tuning pipeline receives role-tagged transcripts and
# must (a) split them into ordered turns, (b) type each turn's role,
# (c) validate strict USER/ASSISTANT alternation before the pair
# builder consumes them. Transcripts are planted deterministically
# from the document's own tokens (TURN_TOKENS per turn, newline
# separated, "ROLE: content"); every 11th document swaps one role so
# the validator has real violations to catch (tested). Parsing is a
# per-row split + regex — zero shuffle, scan-rate, like the page-tag
# operators it generalizes.

TURN_TOKENS = 12
MAX_TURNS = 6


def dialogue_turns_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    n_turns = F.least(F.floor(F.size("toks") / TURN_TOKENS), F.lit(MAX_TURNS)).cast("int")
    base = docs.select("doc_id", toks.alias("toks")).select(
        "doc_id", "toks", n_turns.alias("n_turns")
    ).where(F.col("n_turns") >= 2)
    # role for turn i (1-based): USER on odd turns, ASSISTANT on even —
    # except the planted violation: doc_id % 11 == 0 flips turn 2
    role = (
        "CASE WHEN doc_id % 11 = 0 AND i = 2 THEN 'USER' "
        "WHEN i % 2 = 1 THEN 'USER' ELSE 'ASSISTANT' END"
    )
    transcript = F.expr(
        f"""
        array_join(transform(sequence(1, n_turns), i ->
          concat({role}, ': ',
                 array_join(slice(toks, (i - 1) * {TURN_TOKENS} + 1, {TURN_TOKENS}), ' '))),
          '\n')
        """
    )
    planted = base.select("doc_id", transcript.alias("transcript"))
    turns = planted.select(
        "doc_id",
        F.posexplode(F.split("transcript", "\n")).alias("turn_idx0", "line"),
    ).select(
        "doc_id",
        (F.col("turn_idx0") + 1).cast("bigint").alias("turn_idx"),
        F.regexp_extract("line", r"^(USER|ASSISTANT): ", 1).alias("role"),
        F.size(F.filter(F.split(F.regexp_replace("line", r"^(USER|ASSISTANT): ", ""), " "),
                        lambda t: t != "")).cast("bigint").alias("n_tokens"),
    )
    expected = F.when(F.col("turn_idx") % 2 == 1, "USER").otherwise("ASSISTANT")
    return turns.select(
        "*", (F.col("role") == expected).cast("int").alias("role_ok")
    )


DIALOGUE_TURNS_SQL = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks,
         least(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
               // {TURN_TOKENS}, {MAX_TURNS}) AS n_turns
  FROM documents
), eligible AS (
  SELECT * FROM base WHERE n_turns >= 2
), turns AS (
  SELECT doc_id, i AS turn_idx,
         CASE WHEN doc_id % 11 = 0 AND i = 2 THEN 'USER'
              WHEN i % 2 = 1 THEN 'USER' ELSE 'ASSISTANT' END AS role,
         len(toks[(i - 1) * {TURN_TOKENS} + 1 : (i - 1) * {TURN_TOKENS} + {TURN_TOKENS}]) AS n_tokens
  FROM eligible, (SELECT unnest(generate_series(1, {MAX_TURNS})) AS i)
  WHERE i <= n_turns
)
SELECT doc_id, CAST(turn_idx AS BIGINT) AS turn_idx, role,
       CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(role = CASE WHEN turn_idx % 2 = 1 THEN 'USER' ELSE 'ASSISTANT' END AS INT) AS role_ok
FROM turns
"""

QUERIES["dialogue_turns_parse"] = dialogue_turns_parse
ORACLES["dialogue_turns_parse"] = DIALOGUE_TURNS_SQL


# --- SFT pair building over validated dialogues ------------------------------
#
# The consumer of `dialogue_turns_parse`'s gate: documents whose
# transcripts pass strict alternation become (prompt, response)
# training pairs — one pair per ASSISTANT turn, prompt = every turn
# before it, response = the turn itself. Content fidelity is graded
# by md5 of the actual prompt/response text (not just token
# arithmetic), and a context-window fit flag models the pair
# builder's length gate. Violating docs (the planted every-11th) are
# excluded by the same rule the validator flags — tested. Zero
# shuffle: plant, filter and fan-out are per-row; one row per pair.

SFT_CTX_TOKENS = 48


def sft_pairs_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    n_turns = F.least(F.floor(F.size("toks") / TURN_TOKENS), F.lit(MAX_TURNS)).cast("int")
    base = (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", "toks", n_turns.alias("n_turns"))
        .where(F.col("n_turns") >= 2)
        # the alternation gate: the planted violation docs are excluded
        .where(F.col("doc_id") % 11 != 0)
    )
    pairs = base.select(
        "doc_id",
        "n_turns",
        "toks",
        F.explode(F.expr("filter(sequence(1, n_turns), i -> i % 2 = 0)")).alias("i"),
    )
    prompt = F.expr(f"array_join(slice(toks, 1, (i - 1) * {TURN_TOKENS}), ' ')")
    response = F.expr(f"array_join(slice(toks, (i - 1) * {TURN_TOKENS} + 1, {TURN_TOKENS}), ' ')")
    return pairs.select(
        "doc_id",
        (F.col("i") / 2).cast("bigint").alias("pair_idx"),
        F.expr(f"cast((i - 1) * {TURN_TOKENS} as bigint)").alias("prompt_tokens"),
        F.lit(TURN_TOKENS).cast("bigint").alias("response_tokens"),
        F.md5(prompt).alias("prompt_md5"),
        F.md5(response).alias("response_md5"),
        (F.expr(f"i * {TURN_TOKENS}") <= SFT_CTX_TOKENS).cast("int").alias("fits_context"),
    )


SFT_PAIRS_SQL = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks,
         least(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
               // {TURN_TOKENS}, {MAX_TURNS}) AS n_turns
  FROM documents
), eligible AS (
  SELECT * FROM base WHERE n_turns >= 2 AND doc_id % 11 <> 0
), pairs AS (
  SELECT doc_id, n_turns, toks, i
  FROM eligible, (SELECT unnest(generate_series(2, {MAX_TURNS}, 2)) AS i)
  WHERE i <= n_turns
)
SELECT doc_id,
       CAST(i // 2 AS BIGINT) AS pair_idx,
       CAST((i - 1) * {TURN_TOKENS} AS BIGINT) AS prompt_tokens,
       CAST({TURN_TOKENS} AS BIGINT) AS response_tokens,
       md5(list_aggregate(toks[1 : (i - 1) * {TURN_TOKENS}], 'string_agg', ' ')) AS prompt_md5,
       md5(list_aggregate(toks[(i - 1) * {TURN_TOKENS} + 1 : i * {TURN_TOKENS}], 'string_agg', ' ')) AS response_md5,
       CAST(i * {TURN_TOKENS} <= {SFT_CTX_TOKENS} AS INT) AS fits_context
FROM pairs
"""

QUERIES["sft_pairs_build"] = sft_pairs_build
ORACLES["sft_pairs_build"] = SFT_PAIRS_SQL


# --- span annotations with offset integrity ----------------------------------
#
# The annotation-store shape an NER/labeling pipeline emits: (doc_id,
# start, end, label, surface) character spans — and the integrity
# property that makes annotations usable at all: substr(text, start,
# len) must reproduce the surface exactly (span drift silently
# corrupts training labels). Spans are derived over the whitespace-
# NORMALIZED text (annotation stores normalize first; the offsets are
# then exact): token character offsets via a window prefix sum over
# the exploded token list, target-vocabulary tokens become spans, and
# the substr check is emitted as a graded column. One doc_id-keyed
# window; everything else per-row.

SPAN_TARGETS = ("spark", "table", "stream")


def text_span_annotations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    # token-level rows carry ONLY (doc_id, pos, tok) through the
    # prefix-sum window — duplicating the full normalized text per
    # token row was measured 7x slower; the text rejoins at SPAN
    # grain (a few rows per doc) for the substr integrity check.
    base = docs.select("doc_id", F.posexplode(toks).alias("pos", "tok"))
    from pyspark.sql import Window as _W

    w = _W.partitionBy("doc_id").orderBy("pos").rowsBetween(_W.unboundedPreceding, -1)
    offs = base.select(
        "doc_id",
        "pos",
        "tok",
        F.coalesce(F.sum(F.length("tok") + 1).over(w), F.lit(0)).cast("bigint").alias("start"),
    )
    norm = docs.select("doc_id", F.array_join(toks, " ").alias("norm_text"))
    spans = (
        offs.where(F.col("tok").isin(*SPAN_TARGETS))
        .join(norm, "doc_id")
        .select(
            "doc_id",
            (F.col("pos") + 1).cast("bigint").alias("span_idx_in_doc"),
            "start",
            (F.col("start") + F.length("tok")).cast("bigint").alias("end"),
            F.col("tok").alias("label"),
            F.expr("substring(norm_text, start + 1, length(tok))").alias("surface"),
        )
    )
    return spans.select(
        "*",
        (F.col("surface") == F.col("label")).cast("int").alias("offset_ok"),
    )


TEXT_SPANS_SQL = f"""
WITH t AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS toks
  FROM documents
), base AS (
  SELECT doc_id, array_to_string(toks, ' ') AS norm_text,
         toks[i] AS tok, i AS pos
  FROM t, LATERAL (SELECT unnest(generate_series(1, len(toks))) AS i) ix
), offs AS (
  SELECT doc_id, norm_text, pos, tok,
         CAST(coalesce(sum(length(tok) + 1) OVER (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start
  FROM base
)
SELECT doc_id,
       CAST(pos AS BIGINT) AS span_idx_in_doc,
       start,
       CAST(start + length(tok) AS BIGINT) AS "end",
       tok AS label,
       substring(norm_text, CAST(start + 1 AS INT), length(tok)) AS surface,
       CAST(substring(norm_text, CAST(start + 1 AS INT), length(tok)) = tok AS INT) AS offset_ok
FROM offs
WHERE tok IN ({", ".join(repr(t) for t in SPAN_TARGETS)})
"""

QUERIES["text_span_annotations"] = text_span_annotations
ORACLES["text_spans_annotations" if False else "text_span_annotations"] = TEXT_SPANS_SQL


# --- SFT eligibility lint report ----------------------------------------------
#
# The gate report in front of `sft_pairs_build`: per source, how much
# of the corpus survives each lint rule of the pair builder — too
# short to hold a (prompt, response) exchange, strict-alternation
# violations (the planted every-11th transcripts
# `dialogue_turns_parse` flags), and the eligible remainder with its
# pair yield. The dataset-card-style table a curation run prints
# before committing an SFT export. One scan, per-row arithmetic, a
# single source-grain aggregation — basis points are exact integers.

def sft_lint_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    n_turns = F.least(F.floor(F.size(toks) / TURN_TOKENS), F.lit(MAX_TURNS)).cast("bigint")
    shaped = docs.select(
        "source",
        "doc_id",
        n_turns.alias("n_turns"),
        (n_turns < 2).cast("bigint").alias("too_short"),
        ((n_turns >= 2) & (F.col("doc_id") % 11 == 0)).cast("bigint").alias("alt_bad"),
        ((n_turns >= 2) & (F.col("doc_id") % 11 != 0)).cast("bigint").alias("eligible"),
    )
    return shaped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("too_short").alias("n_too_short"),
        F.sum("alt_bad").alias("n_alternation_bad"),
        F.sum("eligible").alias("n_eligible"),
        F.sum(F.expr("if(eligible = 1, n_turns div 2, cast(0 as bigint))")).alias("n_pairs"),
        F.expr("sum(eligible) * 10000 div count(*)").alias("eligible_bp"),
    )


SFT_LINT_SQL = f"""
WITH shaped AS (
  SELECT source, doc_id,
         least(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
               // {TURN_TOKENS}, {MAX_TURNS})::BIGINT AS n_turns
  FROM documents
), flagged AS (
  SELECT source, doc_id, n_turns,
         CASE WHEN n_turns < 2 THEN 1 ELSE 0 END AS too_short,
         CASE WHEN n_turns >= 2 AND doc_id % 11 = 0 THEN 1 ELSE 0 END AS alt_bad,
         CASE WHEN n_turns >= 2 AND doc_id % 11 <> 0 THEN 1 ELSE 0 END AS eligible
  FROM shaped
)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(too_short) AS BIGINT) AS n_too_short,
       CAST(sum(alt_bad) AS BIGINT) AS n_alternation_bad,
       CAST(sum(eligible) AS BIGINT) AS n_eligible,
       CAST(sum(CASE WHEN eligible = 1 THEN n_turns // 2 ELSE 0 END) AS BIGINT) AS n_pairs,
       CAST(CAST(sum(eligible) AS BIGINT) * 10000 // count(*) AS BIGINT) AS eligible_bp
FROM flagged GROUP BY source
"""

QUERIES["sft_lint_report"] = sft_lint_report
ORACLES["sft_lint_report"] = SFT_LINT_SQL


# --- SFT loss-mask plan -------------------------------------------------------
#
# The data-collator artifact downstream of sft_pairs_build: when a
# document's (prompt, response) pairs pack into one training sequence,
# the loss mask trains only response tokens (the standard SFT
# convention — prompt tokens are context, not targets).  Pair i's
# packed length is i*TURN_TOKENS (prompt grows with history), so the
# sequence offsets are closed-form — sum of even j < i gives
# seq_start = T*(i/2-1)*(i/2) — and every span is exact integer
# arithmetic: masked = prompt span, trained = response span, with the
# per-pair train-share (10000/i bp: later pairs are mostly context,
# the padding-free packing trade).
#
# Plan: the same per-row fan-out as the pair builder — no shuffle, no
# window; offsets are arithmetic, not prefix sums.

def sft_loss_masking_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    n_turns = F.least(F.floor(F.size("toks") / TURN_TOKENS), F.lit(MAX_TURNS)).cast("int")
    base = (
        docs.select("doc_id", toks.alias("toks"))
        .select("doc_id", n_turns.alias("n_turns"))
        .where((F.col("n_turns") >= 2) & (F.col("doc_id") % 11 != 0))
    )
    pairs = base.select(
        "doc_id",
        F.explode(F.expr("filter(sequence(1, n_turns), i -> i % 2 = 0)")).alias("i"),
    )
    t = TURN_TOKENS
    return pairs.select(
        "doc_id",
        F.expr("cast(i div 2 as bigint)").alias("pair_idx"),
        F.expr(f"cast({t} * (i div 2 - 1) * (i div 2) as bigint)").alias("seq_start"),
        F.expr(f"cast({t} * (i div 2 - 1) * (i div 2) + (i - 1) * {t} as bigint)").alias(
            "mask_end_train_start"
        ),
        F.expr(f"cast({t} * (i div 2 - 1) * (i div 2) + i * {t} as bigint)").alias(
            "seq_end"
        ),
        F.expr(f"cast((i - 1) * {t} as bigint)").alias("masked_tokens"),
        F.lit(t).cast("bigint").alias("train_tokens"),
        F.expr("cast(10000 div i as bigint)").alias("train_share_bp"),
    )


SFT_MASK_SQL = f"""
WITH base AS (
  SELECT doc_id,
         least(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
               // {TURN_TOKENS}, {MAX_TURNS}) AS n_turns
  FROM documents
), eligible AS (
  SELECT doc_id, n_turns FROM base WHERE n_turns >= 2 AND doc_id % 11 <> 0
), pairs AS (
  SELECT doc_id, i FROM eligible, (SELECT unnest(generate_series(2, {MAX_TURNS}, 2)) AS i)
  WHERE i <= n_turns
)
SELECT doc_id,
       CAST(i // 2 AS BIGINT) AS pair_idx,
       CAST({TURN_TOKENS} * (i // 2 - 1) * (i // 2) AS BIGINT) AS seq_start,
       CAST({TURN_TOKENS} * (i // 2 - 1) * (i // 2) + (i - 1) * {TURN_TOKENS} AS BIGINT)
         AS mask_end_train_start,
       CAST({TURN_TOKENS} * (i // 2 - 1) * (i // 2) + i * {TURN_TOKENS} AS BIGINT) AS seq_end,
       CAST((i - 1) * {TURN_TOKENS} AS BIGINT) AS masked_tokens,
       CAST({TURN_TOKENS} AS BIGINT) AS train_tokens,
       CAST(10000 // i AS BIGINT) AS train_share_bp
FROM pairs
"""

QUERIES["sft_loss_masking_plan"] = sft_loss_masking_plan
ORACLES["sft_loss_masking_plan"] = SFT_MASK_SQL


# --- DPO preference-pair building ----------------------------------------------
#
# The preference-tuning counterpart of sft_pairs_build: direct
# preference optimization (Rafailov et al. 2023) trains on
# (prompt, chosen, rejected) triples.  Each long-enough document
# yields a prompt (its head) and two candidate responses (the next
# two equal-length windows); the ranker is a deterministic integer
# quality score — lexical diversity first (distinct tokens x1000),
# character mass as the tie-scale — so chosen/rejected assignment and
# the preference margin are exact integers in both engines, graded by
# md5 of the actual texts (content fidelity, not just arithmetic).
# Ties keep response A (index tie-break).
#
# Scale: zero shuffle — plant, score and pair are per-row array
# expressions; one output row per document that clears the length
# gate.

DPO_PROMPT_TOKENS = 24
DPO_RESP_TOKENS = 16


def dpo_pairs_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = F.filter(F.split("text", r"\s+"), lambda t: t != "")
    P, R = DPO_PROMPT_TOKENS, DPO_RESP_TOKENS
    base = docs.select("doc_id", toks.alias("toks")).where(
        F.size("toks") >= P + 2 * R
    )
    scored = base.select(
        "doc_id",
        F.expr(f"slice(toks, 1, {P})").alias("prompt"),
        F.expr(f"slice(toks, {P} + 1, {R})").alias("ra"),
        F.expr(f"slice(toks, {P} + {R} + 1, {R})").alias("rb"),
    ).select(
        "doc_id",
        "prompt",
        "ra",
        "rb",
        F.expr(
            "size(array_distinct(ra)) * 1000 + length(array_join(ra, ' '))"
        ).cast("bigint").alias("sa"),
        F.expr(
            "size(array_distinct(rb)) * 1000 + length(array_join(rb, ' '))"
        ).cast("bigint").alias("sb"),
    )
    return scored.select(
        "doc_id",
        F.md5(F.expr("array_join(prompt, ' ')")).alias("prompt_md5"),
        F.md5(
            F.expr("array_join(CASE WHEN sa >= sb THEN ra ELSE rb END, ' ')")
        ).alias("chosen_md5"),
        F.md5(
            F.expr("array_join(CASE WHEN sa >= sb THEN rb ELSE ra END, ' ')")
        ).alias("rejected_md5"),
        F.expr("CASE WHEN sa >= sb THEN 1 ELSE 2 END").cast("bigint").alias("chosen_idx"),
        F.expr("abs(sa - sb)").cast("bigint").alias("margin"),
    )


DPO_PAIRS_SQL = f"""
WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
),
eligible AS (
  SELECT doc_id, toks FROM base
  WHERE len(toks) >= {DPO_PROMPT_TOKENS} + 2 * {DPO_RESP_TOKENS}
),
scored AS (
  SELECT doc_id,
         toks[1:{DPO_PROMPT_TOKENS}] AS prompt,
         toks[{DPO_PROMPT_TOKENS} + 1:{DPO_PROMPT_TOKENS} + {DPO_RESP_TOKENS}] AS ra,
         toks[{DPO_PROMPT_TOKENS} + {DPO_RESP_TOKENS} + 1:{DPO_PROMPT_TOKENS} + 2 * {DPO_RESP_TOKENS}] AS rb
  FROM eligible
),
ranked AS (
  SELECT doc_id, prompt, ra, rb,
         CAST(len(list_distinct(ra)) * 1000 + length(array_to_string(ra, ' ')) AS BIGINT) AS sa,
         CAST(len(list_distinct(rb)) * 1000 + length(array_to_string(rb, ' ')) AS BIGINT) AS sb
  FROM scored
)
SELECT doc_id,
       md5(array_to_string(prompt, ' ')) AS prompt_md5,
       md5(array_to_string(CASE WHEN sa >= sb THEN ra ELSE rb END, ' ')) AS chosen_md5,
       md5(array_to_string(CASE WHEN sa >= sb THEN rb ELSE ra END, ' ')) AS rejected_md5,
       CAST(CASE WHEN sa >= sb THEN 1 ELSE 2 END AS BIGINT) AS chosen_idx,
       CAST(abs(sa - sb) AS BIGINT) AS margin
FROM ranked
"""

QUERIES["dpo_pairs_build"] = dpo_pairs_build
ORACLES["dpo_pairs_build"] = DPO_PAIRS_SQL


# --- reward-model calibration (ECE bins) ----------------------------------------
#
# The audit that closes the preference loop opened by dpo_pairs_build:
# a reward model's implied win-probability (a logistic of its score
# margin) must match the observed human-preference rate at every
# confidence level — expected-calibration-error bins (Guo et al. 2017)
# over preference pairs, the standard pre-deployment check before a
# reward model is trusted for RLHF or rejection sampling.
#
# Plant: each DPO pair carries an implied confidence
# conf_bp = 5000 + min(margin, 2000) basis points; the "human" label
# is an md5-uniform draw u < conf_bp — calibrated by construction —
# EXCEPT the doc_id % 4 == 0 slice, where the draw is u < conf_bp - 700
# (a planted 7-point overconfident segment the bins must surface).
# Pairs bin by confidence (250 bp wide); per bin the observed
# preference rate, mean confidence and the signed gap are exact
# integer/ratio arithmetic both engines reproduce bit-for-bit.
#
# Scale: rides dpo_pairs_build's zero-shuffle plant; the only exchange
# is the final 9-bin aggregation (map-side partials, bytes per task).

ECE_BIN_BP = 250
ECE_OVERCONF_BP = 700


def reward_margin_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = dpo_pairs_build(spark, sf_dir).select("doc_id", "margin")
    conf = (F.lit(5000) + F.least(F.col("margin"), F.lit(2000))).cast("bigint")
    u = F.pmod(
        F.conv(
            F.substring(F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":u"))), 1, 8),
            16,
            10,
        ).cast("bigint"),
        F.lit(10000),
    )
    thresh = F.when(F.col("doc_id") % 4 == 0, conf - ECE_OVERCONF_BP).otherwise(conf)
    scored = pairs.select(
        ((conf - 5000) / ECE_BIN_BP).cast("bigint").alias("bin_id"),
        conf.alias("conf_bp"),
        (u < thresh).cast("bigint").alias("preferred"),
    )
    return scored.groupBy("bin_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.round(F.avg("conf_bp"), 4).alias("avg_conf_bp"),
        F.round(F.sum("preferred") * 10000.0 / F.count(F.lit(1)), 4).alias("observed_bp"),
        F.round(
            F.avg("conf_bp") - F.sum("preferred") * 10000.0 / F.count(F.lit(1)), 4
        ).alias("gap_bp"),
    )


REWARD_ECE_SQL = f"""
WITH base AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
  FROM documents
),
eligible AS (
  SELECT doc_id, toks FROM base
  WHERE len(toks) >= {DPO_PROMPT_TOKENS} + 2 * {DPO_RESP_TOKENS}
),
ranked AS (
  SELECT doc_id,
         CAST(len(list_distinct(toks[{DPO_PROMPT_TOKENS} + 1:{DPO_PROMPT_TOKENS} + {DPO_RESP_TOKENS}])) * 1000
              + length(array_to_string(toks[{DPO_PROMPT_TOKENS} + 1:{DPO_PROMPT_TOKENS} + {DPO_RESP_TOKENS}], ' ')) AS BIGINT) AS sa,
         CAST(len(list_distinct(toks[{DPO_PROMPT_TOKENS} + {DPO_RESP_TOKENS} + 1:{DPO_PROMPT_TOKENS} + 2 * {DPO_RESP_TOKENS}])) * 1000
              + length(array_to_string(toks[{DPO_PROMPT_TOKENS} + {DPO_RESP_TOKENS} + 1:{DPO_PROMPT_TOKENS} + 2 * {DPO_RESP_TOKENS}], ' ')) AS BIGINT) AS sb
  FROM eligible
),
scored AS (
  SELECT doc_id,
         CAST(5000 + least(abs(sa - sb), 2000) AS BIGINT) AS conf_bp,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':u'), 1, 8) AS BIGINT) % 10000 AS u
  FROM ranked
),
labeled AS (
  SELECT (conf_bp - 5000) // {ECE_BIN_BP} AS bin_id, conf_bp,
         CASE WHEN u < (CASE WHEN doc_id % 4 = 0 THEN conf_bp - {ECE_OVERCONF_BP} ELSE conf_bp END)
              THEN 1 ELSE 0 END AS preferred
  FROM scored
)
SELECT CAST(bin_id AS BIGINT) AS bin_id,
       count(*)::BIGINT AS n_pairs,
       round(avg(conf_bp), 4) AS avg_conf_bp,
       round(CAST(sum(preferred) AS BIGINT) * 10000.0 / count(*), 4) AS observed_bp,
       round(avg(conf_bp) - CAST(sum(preferred) AS BIGINT) * 10000.0 / count(*), 4) AS gap_bp
FROM labeled
GROUP BY bin_id
"""

QUERIES["reward_margin_ece"] = reward_margin_ece
ORACLES["reward_margin_ece"] = REWARD_ECE_SQL
