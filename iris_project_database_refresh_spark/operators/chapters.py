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


# --- chapter auto-detect + range validation (ey-prep stage_00) ---------------
#
# Reference parity: `semantic search - ey prep/stage_00_chapter_splitter.py
# :1061` ``auto_detect_chapters`` (pages whose content opens with a
# chapter marker become chapter starts; each chapter ends at the next
# start - 1, the last at total_pages), `:653` ``extract_chapter_name``
# (first markdown heading, '^#+' stripped, 'Chapter N:' prefix and
# leading numbers removed, kept only if > 3 chars else the 'Chapter i'
# fallback), `:1170` ``cleanup_filename`` (invalid chars removed,
# whitespace -> '_', runs collapsed, trimmed), `:54`
# ``ChapterDefinition.validate`` (start>=1, end<=total, start<=end,
# non-empty name) and `:1117` ``validate_chapters`` (pairwise overlap
# errors, sorted-adjacent gap warnings, head/tail coverage warnings).
#
# Planted structure: each HEAD_EVERY-token block is one page; page w
# (0-based) is a chapter start iff (w + doc_id) % 2 == 1, and its
# heading line is '# Chapter <i>: <title>' with title 'Sec <doc> <w>'
# (or the too-short 'X' on doc_id % 7 == 3 docs, exercising the
# fallback path).  Docs with no marker pages emit nothing ("No
# chapters detected").  The validator runs on the same definitions
# with deterministic planted defects (doc_id % 5 selects overlap /
# gap / end-overflow / inverted-range; doc_id % 7 == 0 empties a
# name), so every error and warning branch is exercised.
#
# Scale design: both operators are per-row array expressions over the
# per-doc marker list (bounded by pages-per-doc) — zero shuffle, zero
# Python, scan-rate.  The pairwise overlap check is O(k^2) in the
# per-doc chapter count, the same bounded-fold class as the chapter
# term ranking above.

_NAME_RX1 = r"^#+\s*"
_NAME_RX2 = r"(?i)^chapter\s+\d+[:\s]*"
_NAME_RX3 = r"^\d+\.?\s*"
_FILE_RX = "[\\\\/:?*<>|\"']"


def _marks(doc_id: Column, nb: Column) -> Column:
    return F.filter(
        F.sequence(F.lit(0), nb - 1), lambda w: F.pmod(w + doc_id, 2) == F.lit(1)
    )


def _chapter_name(line: Column, i1: Column) -> Column:
    cleaned = F.regexp_replace(
        F.regexp_replace(F.regexp_replace(line, _NAME_RX1, ""), _NAME_RX2, ""),
        _NAME_RX3,
        "",
    )
    return F.when(F.length(cleaned) > 3, F.substring(cleaned, 1, 100)).otherwise(
        F.concat(F.lit("Chapter "), i1.cast("string"))
    )


def chapter_autodetect(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    n_blocks = F.greatest(F.ceil(F.size(toks) / HEAD_EVERY).cast("int"), F.lit(1))
    base = docs.select("doc_id", n_blocks.alias("nb")).where(
        F.size(_marks(F.col("doc_id"), F.col("nb"))) > 0
    )

    def chap(m: Column, i: Column) -> Column:
        i1 = (i + 1).cast("bigint")
        title = F.when(
            F.pmod(F.col("doc_id"), 7) == 3, F.lit("X")
        ).otherwise(
            F.concat(F.lit("Sec "), F.col("doc_id").cast("string"), F.lit(" "), m.cast("string"))
        )
        line = F.concat(F.lit("# Chapter "), i1.cast("string"), F.lit(": "), title)
        name = _chapter_name(line, i1)
        fname = F.btrim(
            F.regexp_replace(
                F.regexp_replace(F.regexp_replace(name, _FILE_RX, ""), r"\s+", "_"),
                r"_+",
                "_",
            ),
            F.lit("_"),
        )
        start = (m + 1).cast("bigint")
        end = F.coalesce(
            F.get(F.col("marks"), i + 1).cast("bigint"), F.col("nb").cast("bigint")
        )
        return F.struct(
            i1.alias("chapter_number"),
            start.alias("start_page"),
            end.alias("end_page"),
            (end - start + 1).alias("page_count"),
            name.alias("chapter_name"),
            F.substring(fname, 1, 100).alias("file_name"),
        )

    withm = base.select("doc_id", "nb", _marks(F.col("doc_id"), F.col("nb")).alias("marks"))
    return withm.select("doc_id", F.inline(F.transform(F.col("marks"), chap)))


_MARKS_SQL = "list_filter(range(0, nb), w -> (w + doc_id) % 2 = 1)"

_NAME_SQL = """
CASE WHEN length({c}) > 3 THEN substr({c}, 1, 100)
     ELSE 'Chapter ' || i END
""".strip()

_CLEAN_SQL = (
    "regexp_replace(regexp_replace(regexp_replace("
    "'# Chapter ' || i || ': ' || CASE WHEN doc_id % 7 = 3 THEN 'X' "
    "ELSE 'Sec ' || doc_id || ' ' || marks[i] END, "
    "'^#+\\s*', ''), '^chapter\\s+\\d+[:\\s]*', '', 'i'), '^\\d+\\.?\\s*', '')"
)

CHAPTER_AUTODETECT_SQL = f"""
WITH base AS (
  SELECT doc_id,
         greatest(CAST(ceil(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
                  / {HEAD_EVERY}.0) AS INT), 1) AS nb
  FROM documents
),
marked AS (
  SELECT doc_id, nb, {_MARKS_SQL} AS marks FROM base
  WHERE len({_MARKS_SQL}) > 0
),
chapters AS (
  SELECT doc_id, nb, marks,
         unnest(list_transform(range(1, len(marks) + 1), i -> struct_pack(
             i := i,
             start_page := marks[i] + 1,
             end_page := coalesce(marks[i + 1], nb),
             cleaned := {_CLEAN_SQL}
         ))) AS ch
  FROM marked
)
SELECT doc_id,
       CAST(ch.i AS BIGINT) AS chapter_number,
       CAST(ch.start_page AS BIGINT) AS start_page,
       CAST(ch.end_page AS BIGINT) AS end_page,
       CAST(ch.end_page - ch.start_page + 1 AS BIGINT) AS page_count,
       {_NAME_SQL.format(c="ch.cleaned").replace("|| i", "|| ch.i")} AS chapter_name,
       substr(trim(regexp_replace(regexp_replace(regexp_replace(
           {_NAME_SQL.format(c="ch.cleaned").replace("|| i", "|| ch.i")},
           '[\\\\/:?*<>|"'']', '', 'g'), '\\s+', '_', 'g'), '_+', '_', 'g'), '_'),
           1, 100) AS file_name
FROM chapters
"""

QUERIES["chapter_autodetect"] = chapter_autodetect
ORACLES["chapter_autodetect"] = CHAPTER_AUTODETECT_SQL


def chapter_ranges_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = tokens(F.col("text"))
    n_blocks = F.greatest(F.ceil(F.size(toks) / HEAD_EVERY).cast("int"), F.lit(1))
    base = docs.select("doc_id", n_blocks.alias("nb")).where(
        F.size(_marks(F.col("doc_id"), F.col("nb"))) > 0
    )
    withm = base.select(
        "doc_id", "nb", _marks(F.col("doc_id"), F.col("nb")).alias("marks")
    )

    def raw_def(m: Column, i: Column) -> Column:
        start = (m + 1).cast("bigint")
        end = F.coalesce(
            F.get(F.col("marks"), i + 1).cast("bigint"), F.col("nb").cast("bigint")
        )
        name = F.when(
            (F.pmod(F.col("doc_id"), 7) == 0) & (i == 0), F.lit("")
        ).otherwise(F.concat(F.lit("Chapter "), (i + 1).cast("string")))
        return F.struct(
            start.alias("start_page"), end.alias("end_page"), name.alias("name")
        )

    k = F.size(F.col("defs0"))
    mod5 = F.pmod(F.col("doc_id"), 5)

    def defect(d: Column, i: Column) -> Column:
        start = d["start_page"]
        end = d["end_page"]
        start = F.when((mod5 == 1) & (i == 1), start - 1).otherwise(
            F.when((mod5 == 2) & (i == 1), start + 1).otherwise(start)
        )
        end = F.when((mod5 == 3) & (i == k - 1), end + 2).otherwise(
            F.when((mod5 == 4) & (i == 0), start - 1).otherwise(end)
        )
        return F.struct(
            start.alias("start_page"), end.alias("end_page"), d["name"].alias("name")
        )

    staged = withm.select(
        "doc_id",
        "nb",
        F.transform(F.col("marks"), raw_def).alias("defs0"),
    ).select(
        "doc_id", "nb", F.transform(F.col("defs0"), defect).alias("defs")
    )

    defs = F.col("defs")
    total = F.col("nb").cast("bigint")
    range_errs = F.aggregate(
        defs,
        F.lit(0).cast("bigint"),
        lambda acc, d: acc
        + (d["start_page"] < 1).cast("bigint")
        + (d["end_page"] > total).cast("bigint")
        + (d["start_page"] > d["end_page"]).cast("bigint")
        + (F.trim(d["name"]) == "").cast("bigint"),
    )
    ov_per = F.transform(
        defs,
        lambda d, i: F.size(
            F.filter(
                defs,
                lambda e, j: (j > i)
                & (d["end_page"] >= e["start_page"])
                & (d["start_page"] <= e["end_page"]),
            )
        ).cast("bigint"),
    )
    n_overlaps = F.aggregate(ov_per, F.lit(0).cast("bigint"), lambda a, x: a + x)
    srt = F.array_sort(defs)
    gap_flags = F.transform(
        srt,
        lambda d, i: F.coalesce(
            F.get(srt, i + 1)["start_page"] > d["end_page"] + 1, F.lit(False)
        ).cast("bigint"),
    )
    n_gaps = F.aggregate(gap_flags, F.lit(0).cast("bigint"), lambda a, x: a + x)
    head_unc = F.greatest(F.get(srt, 0)["start_page"] - 1, F.lit(0).cast("bigint"))
    tail_unc = F.greatest(
        total - F.get(srt, F.size(srt) - 1)["end_page"], F.lit(0).cast("bigint")
    )
    n_errors = range_errs + n_overlaps
    n_warnings = n_gaps + (head_unc > 0).cast("bigint") + (tail_unc > 0).cast("bigint")
    verdict = (
        F.when(n_errors > 0, F.lit("errors"))
        .when(n_warnings > 0, F.lit("warnings"))
        .otherwise(F.lit("ok"))
    )
    return staged.select(
        "doc_id",
        total.alias("total_pages"),
        F.size(defs).cast("bigint").alias("n_chapters"),
        range_errs.alias("n_range_errors"),
        n_overlaps.alias("n_overlaps"),
        n_gaps.alias("n_gaps"),
        head_unc.alias("head_uncovered"),
        tail_unc.alias("tail_uncovered"),
        n_warnings.alias("n_warnings"),
        verdict.alias("verdict"),
    )


CHAPTER_VALIDATE_SQL = f"""
WITH base AS (
  SELECT doc_id,
         greatest(CAST(ceil(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> ''))
                  / {HEAD_EVERY}.0) AS INT), 1) AS nb
  FROM documents
),
marked AS (
  SELECT doc_id, nb, {_MARKS_SQL} AS marks FROM base
  WHERE len({_MARKS_SQL}) > 0
),
raw AS (
  SELECT doc_id, nb, len(marks) AS k,
         list_transform(range(1, len(marks) + 1), i -> struct_pack(
             start_page := CAST(marks[i] + 1 AS BIGINT),
             end_page := CAST(coalesce(marks[i + 1], nb) AS BIGINT),
             name := CASE WHEN doc_id % 7 = 0 AND i = 1 THEN '' ELSE 'Chapter ' || i END
         )) AS defs0
  FROM marked
),
defected AS (
  SELECT doc_id, nb, k,
         list_transform(range(1, k + 1), i -> struct_pack(
             start_page := CASE WHEN doc_id % 5 = 1 AND i = 2 THEN defs0[i].start_page - 1
                                WHEN doc_id % 5 = 2 AND i = 2 THEN defs0[i].start_page + 1
                                ELSE defs0[i].start_page END,
             end_page := CASE WHEN doc_id % 5 = 3 AND i = k THEN defs0[i].end_page + 2
                              WHEN doc_id % 5 = 4 AND i = 1 THEN defs0[i].start_page - 1
                              ELSE defs0[i].end_page END,
             name := defs0[i].name
         )) AS defs
  FROM raw
),
metrics AS (
  SELECT doc_id, CAST(nb AS BIGINT) AS total_pages, CAST(k AS BIGINT) AS n_chapters,
         CAST(coalesce(list_sum(list_transform(defs, d ->
             CAST(d.start_page < 1 AS BIGINT) + CAST(d.end_page > nb AS BIGINT)
             + CAST(d.start_page > d.end_page AS BIGINT)
             + CAST(trim(d.name) = '' AS BIGINT))), 0) AS BIGINT) AS n_range_errors,
         CAST(coalesce(list_sum(list_transform(range(1, k + 1), i ->
             CAST(len(list_filter(range(1, k + 1), j -> j > i
                  AND defs[i].end_page >= defs[j].start_page
                  AND defs[i].start_page <= defs[j].end_page)) AS BIGINT))), 0) AS BIGINT)
             AS n_overlaps,
         list_sort(defs) AS srt
  FROM defected
),
gapped AS (
  SELECT *,
         CAST(coalesce(list_sum(list_transform(range(1, n_chapters + 1), i ->
             CAST(coalesce(srt[i + 1].start_page > srt[i].end_page + 1, false)
                  AS BIGINT))), 0) AS BIGINT) AS n_gaps,
         greatest(srt[1].start_page - 1, 0) AS head_uncovered,
         greatest(total_pages - srt[len(srt)].end_page, 0) AS tail_uncovered
  FROM metrics
)
SELECT doc_id, total_pages, n_chapters, n_range_errors, n_overlaps, n_gaps,
       CAST(head_uncovered AS BIGINT) AS head_uncovered,
       CAST(tail_uncovered AS BIGINT) AS tail_uncovered,
       CAST(n_gaps + CAST(head_uncovered > 0 AS BIGINT)
            + CAST(tail_uncovered > 0 AS BIGINT) AS BIGINT) AS n_warnings,
       CASE WHEN n_range_errors + n_overlaps > 0 THEN 'errors'
            WHEN n_gaps + CAST(head_uncovered > 0 AS BIGINT)
                 + CAST(tail_uncovered > 0 AS BIGINT) > 0 THEN 'warnings'
            ELSE 'ok' END AS verdict
FROM gapped
"""

QUERIES["chapter_ranges_validate"] = chapter_ranges_validate
ORACLES["chapter_ranges_validate"] = CHAPTER_VALIDATE_SQL


# --- Summary coverage eval (ROUGE-1 against the source) -----------------------
#
# The eval a summarization stage owes its pipeline (public art: Lin
# 2004, ROUGE; here scored against the SOURCE as reference, the
# standard proxy when no human references exist): for each document,
# the union of its chapter summaries (the production chapter_summarize
# output, recomputed in-plan) is scored on vocabulary recall
# (distinct-unigram ROUGE-1) and on TOKEN-MASS coverage (tf-weighted
# recall — what share of the document's token occurrences the summary
# vocabulary explains; frequency-ranked extractive summaries should
# score high here, that's the point of the ranking).
#
# Scale: summaries are per-row array math (chapter_summarize is
# zero-shuffle); the eval is one (doc, token) tf aggregation and a
# doc-grain rollup — the summary-term set rides the same shuffle key.

def chapter_summary_rouge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ch = chapter_summarize(spark, sf_dir).select("doc_id", "summary")
    n_ch = ch.groupBy("doc_id").agg(F.count("*").cast("bigint").alias("n_chapters"))
    sterms = (
        ch.select("doc_id", F.explode(F.split("summary", " ")).alias("tok"))
        .where(F.col("tok") != "")
        .distinct()
        .withColumn("in_summary", F.lit(1))
    )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dstats = (
        docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").cast("bigint").alias("tf"))
    )
    joined = dstats.join(sterms, ["doc_id", "tok"], "left")
    per_doc = joined.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_doc_vocab"),
        F.sum("tf").cast("bigint").alias("n_doc_tokens"),
        F.sum(F.coalesce("in_summary", F.lit(0))).cast("bigint").alias("n_summary_terms"),
        F.sum(F.when(F.col("in_summary").isNotNull(), F.col("tf")).otherwise(0))
        .cast("bigint")
        .alias("covered_mass"),
    )
    return per_doc.join(n_ch, "doc_id").select(
        "doc_id", "n_chapters", "n_summary_terms", "n_doc_vocab",
        F.expr("cast(n_summary_terms * 10000 div n_doc_vocab as bigint)").alias(
            "rouge1_recall_bp"
        ),
        F.expr("cast(covered_mass * 10000 div n_doc_tokens as bigint)").alias(
            "mass_coverage_bp"
        ),
    )


SUMMARY_ROUGE_SQL = f"""
WITH base AS (
  SELECT doc_id, toks,
         greatest(CAST(ceil(len(toks) / {HEAD_EVERY}.0) AS INT), 1) AS nb
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents)
),
per_ch AS (
  SELECT doc_id, toks, nb, c,
         list_slice(toks, ((c - 1) * {PAGES_PER_CHAPTER}) * {HEAD_EVERY} + 1,
                    ((c - 1) * {PAGES_PER_CHAPTER}) * {HEAD_EVERY} + {CH_TOKENS}) AS ctoks
  FROM base, (SELECT unnest(generate_series(1,
       CAST(ceil(nb / {PAGES_PER_CHAPTER}.0) AS INT))) AS c)
),
summaries AS (
  SELECT doc_id,
         array_to_string(list_transform(
             list_slice(list_sort(list_transform(list_distinct(ctoks),
                 t -> struct_pack(negc := -len(list_filter(ctoks, x -> x = t)), tok := t))),
                 1, {SUMMARY_TERMS}),
             s -> s.tok), ' ') AS summary
  FROM per_ch
),
n_ch AS (SELECT doc_id, count(*)::BIGINT AS n_chapters FROM summaries GROUP BY doc_id),
sterms AS (
  SELECT DISTINCT doc_id, tok FROM (
    SELECT doc_id, unnest(string_split(summary, ' ')) AS tok FROM summaries
  ) WHERE tok <> ''
),
dstats AS (
  SELECT doc_id, tok, count(*)::BIGINT AS tf FROM (
    SELECT doc_id, unnest(toks) AS tok FROM base
  ) GROUP BY doc_id, tok
),
per_doc AS (
  SELECT d.doc_id,
         count(*)::BIGINT AS n_doc_vocab,
         CAST(sum(d.tf) AS BIGINT) AS n_doc_tokens,
         CAST(sum(CASE WHEN s.tok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_summary_terms,
         CAST(sum(CASE WHEN s.tok IS NOT NULL THEN d.tf ELSE 0 END) AS BIGINT) AS covered_mass
  FROM dstats d LEFT JOIN sterms s ON d.doc_id = s.doc_id AND d.tok = s.tok
  GROUP BY d.doc_id
)
SELECT p.doc_id, n.n_chapters, p.n_summary_terms, p.n_doc_vocab,
       CAST(p.n_summary_terms * 10000 // p.n_doc_vocab AS BIGINT) AS rouge1_recall_bp,
       CAST(p.covered_mass * 10000 // p.n_doc_tokens AS BIGINT) AS mass_coverage_bp
FROM per_doc p JOIN n_ch n ON p.doc_id = n.doc_id
"""

QUERIES["chapter_summary_rouge"] = chapter_summary_rouge
ORACLES["chapter_summary_rouge"] = SUMMARY_ROUGE_SQL


# --- stage3 summary length/token-budget audit ----------------------------------
#
# Reference parity: `catalog search/stage3_generate_summaries.py` ties a
# per-source `detail_level` (concise/standard/detailed — the
# DOCUMENT_SOURCES config at :54-66) to the GPT summarizer's `usage`
# length (:161 "Adapt the length and detail level based on the provided
# detail_level"), caps generation at max_tokens=2048 (:558), and pins
# the companion `description` to 1-2 sentences REGARDLESS of
# detail_level (:166).  This operator is the audit a refresh gate runs
# over those contracts: per (source, detail_level), how many summaries
# landed inside the level's token budget, how many under/over-ran, and
# how many descriptions broke the 1-2 sentence invariant.
#
# Plant: detail_level = md5(source) % 3 (the per-source config, derived
# not configured so both engines agree); the simulated summarizer
# produces min(doc_tokens, target * (70..130)% ) tokens (md5 jitter per
# doc — real models under- and over-shoot, which is exactly what the
# validation loop exists to catch) and a 1..3-sentence description.
# Budgets: [80%, 120%] of the level target; docs shorter than the lower
# bound are exempt (the source text cannot be padded).
#
# Scale: per-row integer arithmetic on token counts + one bounded
# (source, level) rollup with map-side combine — no window, no Python.

SUMMARY_TARGETS = {0: ("concise", 40), 1: ("standard", 90), 2: ("detailed", 180)}


def summary_budget_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    lvl = F.expr(
        "cast(conv(substring(md5(source), 1, 8), 16, 10) as bigint) % 3"
    ).alias("lvl")
    jit = F.expr(
        "70 + cast(conv(substring(md5(concat(cast(doc_id as string), ':sum')), 1, 8),"
        " 16, 10) as bigint) % 61"
    )
    dsent = F.expr(
        "1 + cast(conv(substring(md5(concat(cast(doc_id as string), ':desc')), 1, 8),"
        " 16, 10) as bigint) % 3"
    )
    level_name = "case lvl when 0 then 'concise' when 1 then 'standard' else 'detailed' end"
    target = "case lvl when 0 then 40 when 1 then 90 else 180 end"
    per_doc = docs.select(
        "source",
        lvl,
        F.size(tokens(F.col("text"))).alias("ntok"),
        jit.alias("jit"),
        dsent.alias("desc_sentences"),
    ).select(
        "source",
        F.expr(level_name).alias("detail_level"),
        F.expr(f"({target}) * 80 div 100").alias("lo"),
        F.expr(f"({target}) * 120 div 100").alias("hi"),
        F.expr(f"least(ntok, ({target}) * jit div 100)").alias("produced"),
        "ntok",
        "desc_sentences",
    )
    return (
        per_doc.groupBy("source", "detail_level")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("ntok") < F.col("lo")).cast("int")).alias("n_exempt"),
            F.sum(
                ((F.col("ntok") >= F.col("lo")) & (F.col("produced") < F.col("lo"))).cast("int")
            ).alias("n_under"),
            F.sum((F.col("produced") > F.col("hi")).cast("int")).alias("n_over"),
            F.sum(F.col("produced")).alias("tok_sum"),
            F.max(F.col("produced")).alias("max_summary_tokens"),
            F.sum((F.col("desc_sentences") > 2).cast("int")).alias("n_desc_violations"),
        )
        .select(
            "source",
            "detail_level",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            F.col("n_exempt").cast("bigint").alias("n_exempt"),
            F.col("n_under").cast("bigint").alias("n_under"),
            F.expr("n_docs - n_exempt - n_under - n_over").cast("bigint").alias("n_within"),
            F.col("n_over").cast("bigint").alias("n_over"),
            F.expr(
                "(n_docs - n_exempt - n_under - n_over) * 10000"
                " div greatest(n_docs - n_exempt, 1)"
            )
            .cast("bigint")
            .alias("within_bp"),
            F.expr("tok_sum div n_docs").cast("bigint").alias("avg_summary_tokens"),
            F.col("max_summary_tokens").cast("bigint").alias("max_summary_tokens"),
            F.col("n_desc_violations").cast("bigint").alias("n_desc_violations"),
        )
    )


SUMMARY_BUDGET_SQL = """
WITH per_doc AS (
  SELECT source,
         CASE lvl WHEN 0 THEN 'concise' WHEN 1 THEN 'standard' ELSE 'detailed' END AS detail_level,
         (CASE lvl WHEN 0 THEN 40 WHEN 1 THEN 90 ELSE 180 END) * 80 // 100 AS lo,
         (CASE lvl WHEN 0 THEN 40 WHEN 1 THEN 90 ELSE 180 END) * 120 // 100 AS hi,
         least(ntok, (CASE lvl WHEN 0 THEN 40 WHEN 1 THEN 90 ELSE 180 END) * jit // 100) AS produced,
         ntok, desc_sentences
  FROM (
    SELECT source,
           CAST('0x' || substr(md5(source), 1, 8) AS BIGINT) % 3 AS lvl,
           len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS ntok,
           70 + CAST('0x' || substr(md5(doc_id::VARCHAR || ':sum'), 1, 8) AS BIGINT) % 61 AS jit,
           1 + CAST('0x' || substr(md5(doc_id::VARCHAR || ':desc'), 1, 8) AS BIGINT) % 3 AS desc_sentences
    FROM documents
  )
)
SELECT source, detail_level,
       count(*)::BIGINT AS n_docs,
       CAST(sum(CASE WHEN ntok < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_exempt,
       CAST(sum(CASE WHEN ntok >= lo AND produced < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_under,
       CAST(count(*) - sum(CASE WHEN ntok < lo THEN 1 ELSE 0 END)
            - sum(CASE WHEN ntok >= lo AND produced < lo THEN 1 ELSE 0 END)
            - sum(CASE WHEN produced > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_within,
       CAST(sum(CASE WHEN produced > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_over,
       CAST((count(*) - sum(CASE WHEN ntok < lo THEN 1 ELSE 0 END)
            - sum(CASE WHEN ntok >= lo AND produced < lo THEN 1 ELSE 0 END)
            - sum(CASE WHEN produced > hi THEN 1 ELSE 0 END)) * 10000
            // greatest(count(*) - sum(CASE WHEN ntok < lo THEN 1 ELSE 0 END), 1) AS BIGINT) AS within_bp,
       CAST(sum(produced) // count(*) AS BIGINT) AS avg_summary_tokens,
       CAST(max(produced) AS BIGINT) AS max_summary_tokens,
       CAST(sum(CASE WHEN desc_sentences > 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_desc_violations
FROM per_doc
GROUP BY source, detail_level
"""

QUERIES["summary_budget_audit"] = summary_budget_audit
ORACLES["summary_budget_audit"] = SUMMARY_BUDGET_SQL
