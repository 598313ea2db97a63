"""Chapter-level operators (stage_01 semantics) + page-boundary ops.

Reference parity: `semantic search/stage_01_chapter_processing.py:845`
``group_pages_by_chapter`` (pages grouped by chapter_number; chapter
name from the first page), `:668` ``get_chapter_summary_robust``
(segmented rolling LLM summary — replaced by a deterministic
extractive keyword summary so the oracle can check it), `:314`
``count_tokens`` (char-estimator rollups), `:860`
``process_chapter_pages`` (per-chapter page counts / rollups).

The synthetic corpus has no pages or chapters, so the same planted
structure used by sectioning applies: each HEAD_EVERY-token block is
one page/section (`S<doc>_<w>` heading), and PAGES_PER_CHAPTER
consecutive blocks form a chapter — the chapter's name is its first
block's section title, mirroring "chapter name from the first page".
The LLM summary is replaced by the top SUMMARY_TERMS chapter tokens
ranked by (in-chapter frequency desc, token asc) — deterministic,
rank-stable, computed identically in the DuckDB oracle.

Scale design: everything is per-row array expressions over the
document's token array (chapter slicing, term ranking over <=
CH_TOKENS tokens) — zero shuffle, zero Python, scan-rate. The O(k^2)
term count is bounded by the chapter token budget, a compile-time
constant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.tables import load_table
from .sectioning import HEAD_EVERY, _est_tokens

PAGES_PER_CHAPTER = 2
CH_TOKENS = HEAD_EVERY * PAGES_PER_CHAPTER
SUMMARY_TERMS = 3


def chapter_summarize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    n_blocks = F.greatest(F.ceil(F.size(toks) / HEAD_EVERY).cast("int"), F.lit(1))
    n_chapters = F.ceil(n_blocks / PAGES_PER_CHAPTER).cast("int")

    def chapter(c: Column) -> Column:
        w0 = (c - 1) * PAGES_PER_CHAPTER  # first block (0-based) of chapter c
        ctoks = F.slice(F.col("toks"), w0 * HEAD_EVERY + 1, CH_TOKENS)
        ranked = F.array_sort(
            F.transform(
                F.array_distinct(ctoks),
                lambda t: F.struct(
                    (-F.size(F.filter(ctoks, lambda x: x == t))).alias("negc"),
                    t.alias("tok"),
                ),
            )
        )
        summary = F.array_join(
            F.transform(F.slice(ranked, 1, SUMMARY_TERMS), lambda s: s["tok"]), " "
        )
        n_secs = F.least(F.lit(PAGES_PER_CHAPTER), F.col("nb") - w0)
        content = F.array_join(ctoks, " ")
        return F.struct(
            c.cast("bigint").alias("chapter_number"),
            F.concat(F.lit("S"), F.col("doc_id").cast("string"), F.lit("_"), w0.cast("string")).alias(
                "chapter_name"
            ),
            summary.alias("summary"),
            (w0 + 1).cast("bigint").alias("start_page"),
            (w0 + n_secs).cast("bigint").alias("end_page"),
            n_secs.cast("bigint").alias("n_sections"),
            F.size(ctoks).cast("bigint").alias("n_tokens"),
            _est_tokens(F.length(content)).alias("est_tokens"),
        )

    base = docs.select("doc_id", toks.alias("toks"), n_blocks.alias("nb"), n_chapters.alias("nc"))
    chapters = F.transform(F.sequence(F.lit(1), F.col("nc")), chapter)
    return base.select("doc_id", F.inline(chapters))


_EST_SQL = "CAST(greatest({c} // 10, least(CAST(floor({c} / 3.5) AS BIGINT), {c} // 2)) AS BIGINT)"

CHAPTER_SQL = f"""
WITH base AS (
  SELECT doc_id, toks,
         greatest(CAST(ceil(len(toks) / {HEAD_EVERY}.0) AS INT), 1) AS nb
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents)
),
per_ch AS (
  SELECT doc_id, toks, nb, c,
         (c - 1) * {PAGES_PER_CHAPTER} AS w0,
         list_slice(toks, ((c - 1) * {PAGES_PER_CHAPTER}) * {HEAD_EVERY} + 1,
                    ((c - 1) * {PAGES_PER_CHAPTER}) * {HEAD_EVERY} + {CH_TOKENS}) AS ctoks
  FROM base, (SELECT unnest(generate_series(1,
       CAST(ceil(nb / {PAGES_PER_CHAPTER}.0) AS INT))) AS c)
)
SELECT doc_id,
       CAST(c AS BIGINT) AS chapter_number,
       'S' || doc_id || '_' || w0 AS chapter_name,
       array_to_string(list_transform(
           list_slice(list_sort(list_transform(list_distinct(ctoks),
               t -> struct_pack(negc := -len(list_filter(ctoks, x -> x = t)), tok := t))),
               1, {SUMMARY_TERMS}),
           s -> s.tok), ' ') AS summary,
       CAST(w0 + 1 AS BIGINT) AS start_page,
       CAST(w0 + least({PAGES_PER_CHAPTER}, nb - w0) AS BIGINT) AS end_page,
       CAST(least({PAGES_PER_CHAPTER}, nb - w0) AS BIGINT) AS n_sections,
       CAST(len(ctoks) AS BIGINT) AS n_tokens,
       {_EST_SQL.format(c="length(array_to_string(ctoks, ' '))")} AS est_tokens
FROM per_ch
"""


QUERIES = {
    "chapter_summarize": chapter_summarize,
}

ORACLES = {
    "chapter_summarize": CHAPTER_SQL,
}


# --- page-tag extraction + boundary inference (stage_02/02b) -----------------
#
# Reference parity: `semantic search/stage_02_section_processing.py:547`
# ``embed_page_tags`` (PageHeader/PageFooter HTML comments with
# PageNumber/PageReference per page), `:607` ``extract_page_metadata``
# (regex over the section content -> min/max/unique-count of page
# numbers), `:646` ``infer_page_boundaries`` (sections without tags
# inherit the last page marker before them; stage_02b corrects
# residual gaps from neighbors; the introduction defaults to page 1).
#
# Tags are planted on only ~2/3 of sections ((w + doc_id) % 3 != 1) so
# the inference path is genuinely exercised. Extraction is per-row
# regexp_extract_all (scan-rate, no shuffle); inference is one window
# over doc_id.


def page_boundaries(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    n_blocks = F.greatest(F.ceil(F.size(toks) / HEAD_EVERY).cast("int"), F.lit(1))

    def block(w: Column) -> Column:
        page = (w + 1).cast("string")
        has = F.pmod(w + F.col("doc_id"), 3) != 1
        header = F.concat(
            F.lit('<!-- PageHeader PageNumber="'), page,
            F.lit('" PageReference="p'), page, F.lit('" -->\n'),
        )
        footer = F.concat(
            F.lit('<!-- PageFooter PageNumber="'), page,
            F.lit('" PageReference="p'), page, F.lit('" -->'),
        )
        body = F.concat(
            F.lit("S"), F.col("doc_id").cast("string"), F.lit("_"), w.cast("string"),
            F.lit("\n"),
            F.array_join(F.slice(F.col("toks"), w * HEAD_EVERY + 1, HEAD_EVERY), " "),
        )
        content = F.concat(
            F.when(has, header).otherwise(F.lit("")),
            body,
            F.when(has, F.concat(F.lit("\n"), footer)).otherwise(F.lit("")),
        )
        return F.struct((w + 1).cast("bigint").alias("section_number"), content.alias("content"))

    base = docs.select("doc_id", toks.alias("toks"), n_blocks.alias("nb"))
    secs = base.select(
        "doc_id", F.inline(F.transform(F.sequence(F.lit(0), F.col("nb") - 1), block))
    )

    pages = F.transform(
        F.regexp_extract_all(F.col("content"), F.lit(r'PageNumber="(\d+)"'), F.lit(1)),
        lambda p: p.cast("int"),
    )
    ext = secs.select(
        "doc_id",
        "section_number",
        F.array_min(pages).alias("ext_start"),
        F.array_max(pages).alias("ext_end"),
        F.size(F.array_distinct(pages)).cast("bigint").alias("tag_page_count"),
    )
    from pyspark.sql import Window

    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("section_number")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_end = F.last("ext_end", ignorenulls=True).over(w_prev)
    intro_default = F.when(F.col("section_number") == 1, F.lit(1))
    start = F.coalesce(F.col("ext_start"), prev_end, intro_default)
    end = F.coalesce(F.col("ext_end"), prev_end, intro_default)
    return ext.select(
        "doc_id",
        "section_number",
        F.col("ext_start").cast("bigint").alias("section_start_page"),
        F.col("ext_end").cast("bigint").alias("section_end_page"),
        "tag_page_count",
        start.cast("bigint").alias("inferred_start_page"),
        end.cast("bigint").alias("inferred_end_page"),
        F.when(start.isNull() | end.isNull(), F.lit(0))
        .otherwise(F.greatest(end - start + 1, F.lit(1)))
        .cast("bigint")
        .alias("section_page_count"),
        (F.col("ext_start").isNull() & start.isNotNull()).cast("int").alias("inference_used"),
    )


PAGE_BOUNDARIES_SQL = f"""
WITH base AS (
  SELECT doc_id, toks,
         greatest(CAST(ceil(len(toks) / {HEAD_EVERY}.0) AS INT), 1) AS nb
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents)
),
secs AS (
  SELECT doc_id, w + 1 AS section_number,
         CASE WHEN (w + doc_id) % 3 <> 1
              THEN '<!-- PageHeader PageNumber="' || (w + 1) || '" PageReference="p' || (w + 1) || '" -->' || chr(10)
              ELSE '' END
         || 'S' || doc_id || '_' || w || chr(10)
         || array_to_string(list_slice(toks, w * {HEAD_EVERY} + 1, (w + 1) * {HEAD_EVERY}), ' ')
         || CASE WHEN (w + doc_id) % 3 <> 1
              THEN chr(10) || '<!-- PageFooter PageNumber="' || (w + 1) || '" PageReference="p' || (w + 1) || '" -->'
              ELSE '' END AS content
  FROM base, (SELECT unnest(generate_series(0, nb - 1)) AS w)
),
ext AS (
  SELECT doc_id, section_number,
         list_min(pg) AS ext_start,
         list_max(pg) AS ext_end,
         CAST(len(list_distinct(pg)) AS BIGINT) AS tag_page_count
  FROM (SELECT doc_id, section_number,
               list_transform(regexp_extract_all(content, 'PageNumber="(\\d+)"', 1),
                              p -> CAST(p AS INT)) AS pg
        FROM secs)
),
inf AS (
  SELECT *,
         last_value(ext_end IGNORE NULLS) OVER (
             PARTITION BY doc_id ORDER BY section_number
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
  FROM ext
)
SELECT doc_id,
       CAST(section_number AS BIGINT) AS section_number,
       CAST(ext_start AS BIGINT) AS section_start_page,
       CAST(ext_end AS BIGINT) AS section_end_page,
       tag_page_count,
       CAST(coalesce(ext_start, prev_end, CASE WHEN section_number = 1 THEN 1 END) AS BIGINT) AS inferred_start_page,
       CAST(coalesce(ext_end, prev_end, CASE WHEN section_number = 1 THEN 1 END) AS BIGINT) AS inferred_end_page,
       CAST(CASE WHEN coalesce(ext_start, prev_end, CASE WHEN section_number = 1 THEN 1 END) IS NULL
                   OR coalesce(ext_end, prev_end, CASE WHEN section_number = 1 THEN 1 END) IS NULL
            THEN 0
            ELSE greatest(coalesce(ext_end, prev_end, CASE WHEN section_number = 1 THEN 1 END)
                          - coalesce(ext_start, prev_end, CASE WHEN section_number = 1 THEN 1 END) + 1, 1)
            END AS BIGINT) AS section_page_count,
       CAST(ext_start IS NULL AND coalesce(prev_end, CASE WHEN section_number = 1 THEN 1 END) IS NOT NULL AS INT) AS inference_used
FROM inf
"""

QUERIES["page_boundaries"] = page_boundaries
ORACLES["page_boundaries"] = PAGE_BOUNDARIES_SQL
