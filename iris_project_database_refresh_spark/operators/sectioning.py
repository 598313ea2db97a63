"""Heading-aware hierarchical sectioning (stage_02 semantics).

Reference parity: `semantic search/stage_02_section_processing.py:909`
``split_by_heading_level`` (regex ``^#{level}\\s+...`` per line, content
before the first heading becomes an Introduction section), `:1014`
``recursive_split_section`` (descend heading levels), `:1118`
``generate_hierarchy_string`` (breadcrumb from the most recent title at
each shallower level, clearing deeper titles when a shallower heading
appears), and `:1145` ``merge_small_sections`` (sections under
MIN_SECTION_TOKENS merge into their predecessor when their level is >=
the predecessor's — child-into-parent or sibling-into-sibling; token
counts use stage_01's ``count_tokens`` char estimator,
`stage_01_chapter_processing.py:314`).

Simplification vs the reference (documented, mirrored in the oracle):
the greedy MAX_SECTION_TOKENS cap on merge chains is dropped — the
merge decision is purely local (small + level-compatible), which makes
the grouping a prefix-sum over a per-row flag instead of a stateful
scan. The recursive page-threshold descent is subsumed by splitting at
every heading level in one pass (the fixpoint the recursion reaches for
over-threshold sections); page-driven splitting lives with the page
operators.

The synthetic corpus has no markdown, so headings are planted
deterministically in-query (like the dedup corpus pattern): every
HEAD_EVERY tokens starts a block headed by ``#{level} S<doc>_<w>`` with
level 1 for the first block then 1 + (w + doc_id) % 3 — mirrored
bit-for-bit in the DuckDB oracle.

Scale design: markdown build + heading split + per-section slicing are
pure per-row array expressions — zero shuffle, scan-rate. Breadcrumbs
and merge grouping are windows partitioned by doc_id (uniform key) over
section-level rows (~sections-per-doc fan-out, far smaller than the
text itself), then one groupBy (doc_id, grp) for the merge concat.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import tokens
from ..sources.tables import load_table

HEAD_EVERY = 24  # tokens per planted block (scaled-down page analogue)
MAX_LEVEL = 3  # planted heading depth (reference descends H1..H6)
MIN_EST_TOKENS = 30  # merge threshold (reference MIN_SECTION_TOKENS=250, scaled)


def punct_tokens(toks: Column) -> Column:
    """Deterministic sentence/clause punctuation planted on the token
    stream (the synthetic corpus has none): every 7th token ends a
    sentence ('.', next token capitalized), every 5th non-sentence
    token gets a ','. Exercises the reference's sentence/comma break
    and sentence-split paths; mirrored in PUNCT_SQL."""

    def cap(t: Column) -> Column:
        return F.concat(F.upper(F.substring(t, 1, 1)), F.substring(t, 2, 1 << 30))

    return F.transform(
        toks,
        lambda t, i: (
            F.when(i % 7 == 6, F.concat(t, F.lit(".")))
            .when((i % 7 == 0) & (i > 0), cap(t))
            .when(i % 5 == 4, F.concat(t, F.lit(",")))
            .otherwise(t)
        ),
    )


_FILT_TOKS_SQL = "list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"

# DuckDB mirror of punct_tokens; lambda index i is 1-based there (Spark's
# is 0-based), hence the shifted modulus conditions.
PUNCT_SQL = (
    "list_transform({toks}, (t, i) ->"
    " CASE WHEN i % 7 = 0 THEN t || '.'"
    "      WHEN i % 7 = 1 AND i > 1 THEN upper(t[1]) || t[2:]"
    "      WHEN i % 5 = 0 THEN t || ','"
    "      ELSE t END)"
)


def _est_tokens(chars: Column) -> Column:
    """stage_01 count_tokens: clamp(chars/3.5, chars//10, chars//2)."""
    return F.greatest(
        F.floor(chars / 10), F.least(F.floor(chars / 3.5), F.floor(chars / 2))
    ).cast("bigint")


def _planted_markdown(docs: DataFrame) -> DataFrame:
    """(doc_id, md): text rewritten as markdown with deterministic headings."""
    toks = tokens(F.col("text"))
    n_blocks = F.greatest(F.ceil(F.size(toks) / HEAD_EVERY).cast("int"), F.lit(1))

    def block(w: Column) -> Column:
        level = F.when(w == 0, F.lit(1)).otherwise(1 + F.pmod(w + F.col("doc_id"), MAX_LEVEL))
        hashes = F.when(level == 1, "#").when(level == 2, "##").otherwise(F.lit("###"))
        return F.concat(
            hashes,
            F.lit(" S"),
            F.col("doc_id").cast("string"),
            F.lit("_"),
            w.cast("string"),
            F.lit("\n"),
            F.array_join(F.slice(toks, w * HEAD_EVERY + 1, HEAD_EVERY), " "),
        )

    md = F.array_join(F.transform(F.sequence(F.lit(0), n_blocks - 1), block), "\n")
    return docs.select("doc_id", md.alias("md"))


def section_hierarchy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    md = _planted_markdown(docs)

    # --- heading split: pure array expressions, no shuffle -------------------
    lines = F.split(F.col("md"), "\n")
    hidx = F.filter(
        F.sequence(F.lit(1), F.size(lines)),
        lambda i: F.element_at(lines, i).rlike("^#{1,6} "),
    )
    with_idx = md.select("doc_id", lines.alias("lines"), hidx.alias("hidx"))

    start = lambda j: F.element_at(F.col("hidx"), j)  # noqa: E731
    end = lambda j: (  # last line of section j: line before next heading (or EOF)
        F.coalesce(F.try_element_at(F.col("hidx"), j + 1), F.size(F.col("lines")) + 1) - 1
    )
    sec_structs = F.transform(
        F.sequence(F.lit(1), F.size(F.col("hidx"))),
        lambda j: F.struct(
            j.alias("sec_idx"),
            F.array_join(
                F.slice(F.col("lines"), start(j), end(j) - start(j) + 1), "\n"
            ).alias("content"),
            F.regexp_extract(F.element_at(F.col("lines"), start(j)), r"^#+\s+(.*)$", 1).alias(
                "title"
            ),
            F.length(
                F.regexp_extract(F.element_at(F.col("lines"), start(j)), r"^(#+) ", 1)
            ).alias("level"),
        ),
    )
    secs = with_idx.select("doc_id", F.inline(sec_structs)).withColumn(
        "est_tokens", _est_tokens(F.length("content"))
    )

    # --- breadcrumb hierarchy: most recent shallower titles, stale-cleared --
    w_prev = (
        Window.partitionBy("doc_id")
        .orderBy("sec_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t1 = F.last(F.when(F.col("level") == 1, F.col("title")), ignorenulls=True).over(w_prev)
    pos1 = F.max(F.when(F.col("level") == 1, F.col("sec_idx"))).over(w_prev)
    t2 = F.last(F.when(F.col("level") == 2, F.col("title")), ignorenulls=True).over(w_prev)
    pos2 = F.max(F.when(F.col("level") == 2, F.col("sec_idx"))).over(w_prev)
    hierarchy = F.concat_ws(
        " > ",
        F.when(F.col("level") > 1, t1),
        F.when((F.col("level") > 2) & (pos2 > F.coalesce(pos1, F.lit(-1))), t2),
        F.col("title"),
    )
    w_ord = Window.partitionBy("doc_id").orderBy("sec_idx")
    prev_level = F.lag("level").over(w_ord)
    merge_with_prev = (
        (F.col("est_tokens") < MIN_EST_TOKENS)
        & prev_level.isNotNull()
        & (F.col("level") >= prev_level)
    )
    grp = F.sum(F.when(merge_with_prev, 0).otherwise(1)).over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = secs.select(
        "doc_id", "sec_idx", "content", "title", "level", "est_tokens",
        hierarchy.alias("hierarchy"), grp.alias("grp"),
    )

    # --- merge-small: concat each group, keep the head section's identity ---
    merged = flagged.groupBy("doc_id", "grp").agg(
        F.min("sec_idx").alias("first_idx"),
        F.min_by("title", "sec_idx").alias("title"),
        F.min_by("level", "sec_idx").alias("level"),
        F.min_by("hierarchy", "sec_idx").alias("hierarchy"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sec_idx", "content"))),
                lambda x: x["content"],
            ),
            "\n",
        ).alias("section_content"),
        F.sum("est_tokens").alias("est_tokens"),
        F.count(F.lit(1)).alias("n_merged"),
    )
    return merged.select(
        "doc_id",
        F.row_number()
        .over(Window.partitionBy("doc_id").orderBy("first_idx"))
        .cast("bigint")
        .alias("section_number"),
        "title",
        F.col("level").cast("bigint").alias("level"),
        "hierarchy",
        "section_content",
        "est_tokens",
        "n_merged",
    )


_MD_SQL = f"""
md_t AS (
  SELECT doc_id,
         array_to_string(list_transform(generate_series(0,
             greatest(CAST(ceil(len(toks) / {HEAD_EVERY}.0) AS INT), 1) - 1),
           w -> repeat('#', CASE WHEN w = 0 THEN 1 ELSE 1 + CAST((w + doc_id) % {MAX_LEVEL} AS INT) END)
                || ' S' || doc_id || '_' || w || chr(10)
                || array_to_string(list_slice(toks, w * {HEAD_EVERY} + 1, (w + 1) * {HEAD_EVERY}), ' ')
         ), chr(10)) AS md
  FROM (SELECT doc_id, list_filter(string_split_regex(text, '\\s+'), t -> t <> '') AS toks
        FROM documents)
)
"""

_EST_SQL = "CAST(greatest({c} // 10, least(CAST(floor({c} / 3.5) AS BIGINT), {c} // 2)) AS BIGINT)"

SECTION_HIERARCHY_SQL = f"""
WITH {_MD_SQL.strip()},
lines_t AS (
  SELECT doc_id, string_split(md, chr(10)) AS lines,
         list_filter(generate_series(1, len(string_split(md, chr(10)))),
                     i -> regexp_matches(string_split(md, chr(10))[i], '^#{{1,6}} ')) AS hidx
  FROM md_t
),
secs AS (
  SELECT doc_id, j AS sec_idx,
         array_to_string(list_slice(lines, hidx[j],
             coalesce(hidx[j + 1], len(lines) + 1) - 1), chr(10)) AS content,
         regexp_extract(lines[hidx[j]], '^#+\\s+(.*)$', 1) AS title,
         length(regexp_extract(lines[hidx[j]], '^(#+) ', 1)) AS level
  FROM lines_t, (SELECT unnest(generate_series(1, len(hidx))) AS j)
),
est AS (
  SELECT *, {_EST_SQL.format(c="length(content)")} AS est_tokens FROM secs
),
crumbs AS (
  SELECT *,
         last_value(CASE WHEN level = 1 THEN title END IGNORE NULLS) OVER w_prev AS t1,
         max(CASE WHEN level = 1 THEN sec_idx END) OVER w_prev AS pos1,
         last_value(CASE WHEN level = 2 THEN title END IGNORE NULLS) OVER w_prev AS t2,
         max(CASE WHEN level = 2 THEN sec_idx END) OVER w_prev AS pos2,
         lag(level) OVER w_ord AS prev_level
  FROM est
  WINDOW w_prev AS (PARTITION BY doc_id ORDER BY sec_idx
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         w_ord AS (PARTITION BY doc_id ORDER BY sec_idx)
),
flagged AS (
  SELECT doc_id, sec_idx, content, title, level, est_tokens,
         concat_ws(' > ',
                   CASE WHEN level > 1 THEN t1 END,
                   CASE WHEN level > 2 AND pos2 > coalesce(pos1, -1) THEN t2 END,
                   title) AS hierarchy,
         sum(CASE WHEN est_tokens < {MIN_EST_TOKENS} AND prev_level IS NOT NULL
                       AND level >= prev_level THEN 0 ELSE 1 END)
             OVER (PARTITION BY doc_id ORDER BY sec_idx
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
  FROM crumbs
),
merged AS (
  SELECT doc_id, grp,
         min(sec_idx) AS first_idx,
         min_by(title, sec_idx) AS title,
         min_by(level, sec_idx) AS level,
         min_by(hierarchy, sec_idx) AS hierarchy,
         string_agg(content, chr(10) ORDER BY sec_idx) AS section_content,
         CAST(sum(est_tokens) AS BIGINT) AS est_tokens,
         count(*) AS n_merged
  FROM flagged
  GROUP BY doc_id, grp
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY first_idx) AS BIGINT) AS section_number,
       title,
       CAST(level AS BIGINT) AS level,
       hierarchy,
       section_content,
       est_tokens,
       n_merged
FROM merged
"""


QUERIES = {
    "section_hierarchy": section_hierarchy,
}

ORACLES = {
    "section_hierarchy": SECTION_HIERARCHY_SQL,
}


# --- breakpoint-preferring chunker (stage_03 semantics) ----------------------
#
# Reference parity: `semantic search/stage_03_content_chunking.py:379`
# ``chunk_section`` (single chunk when the section fits max_tokens, else
# greedy packing), `:402` ``find_protected_zones`` (page-tag HTML
# comments must never be split), `:425` ``find_break_points``
# (prioritized: heading > sentence > comma; paragraph/list don't
# survive whitespace tokenization and are documented out), `:467`
# ``find_best_break`` (search window [pos+min, pos+hard_max], ideal =
# pos + (min+max)//2, pick by (priority, |b - ideal|)). Constants
# 500/750/800 scale to 12/18/24 tokens for the short synthetic docs.
#
# Spark-first design: the greedy scan is a *bounded fold* —
# ``F.aggregate`` over PACK_ITERS iterations accumulating the boundary
# array — with break candidates precomputed per row as token-indexed
# (priority, position) structs. The whole operator is JVM array
# expressions: zero Python, zero shuffle, scan-rate at 100 TB. The
# "best candidate in window" argmin is encoded numerically
# (p*M^2 + dist*M + b -> array_min -> % M) so Spark and the DuckDB
# oracle (a recursive CTE over the same encoded candidates) agree
# bit-for-bit. PACK_ITERS bounds chunks-per-doc at
# ceil(max_doc_tokens / (MIN_CHUNK-1)); inputs bounded by sectioning
# make it a compile-time constant.

MIN_CHUNK = 12
MAX_CHUNK = 18
HARD_MAX_CHUNK = 24
TARGET_CHUNK = (MIN_CHUNK + MAX_CHUNK) // 2
PACK_ITERS = 32
_ENC = 1 << 20  # numeric argmin encoding base


def _packed_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared greedy-packing core: one row per chunk with its token
    bounds (s, e], carrying toks and the page-tag zone starts (zs).

    The paged-markdown token stream is built directly as a flatten of
    per-block token arrays — identical tokens to splitting the markdown
    string (which is what the oracle does), without the string concat /
    regex split / refilter round-trip (~30% of the operator's cost).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    dtoks = punct_tokens(tokens(F.col("text")))
    n_blocks = F.greatest(F.ceil(F.size(dtoks) / HEAD_EVERY).cast("int"), F.lit(1))

    def block_tokens(w: Column) -> Column:
        level = F.when(w == 0, F.lit(1)).otherwise(1 + F.pmod(w + F.col("doc_id"), MAX_LEVEL))
        hashes = F.when(level == 1, "#").when(level == 2, "##").otherwise(F.lit("###"))
        return F.concat(
            F.array(F.lit("<!--"), F.lit("PageNumber"), (w + 1).cast("string"), F.lit("-->")),
            F.array(
                hashes,
                F.concat(F.lit("S"), F.col("doc_id").cast("string"), F.lit("_"), w.cast("string")),
            ),
            F.slice(F.col("dtoks"), w * HEAD_EVERY + 1, HEAD_EVERY),
        )

    toks = F.flatten(F.transform(F.sequence(F.lit(0), F.col("nb") - 1), block_tokens))
    base = (
        docs.select("doc_id", dtoks.alias("dtoks"), n_blocks.alias("nb"))
        .withColumn("toks", toks)
        .select("doc_id", "toks", F.size("toks").alias("n"))
    )

    tk = lambda i: F.element_at(F.col("toks"), i)  # noqa: E731
    n = F.col("n")

    # protected zones: 4-token page-tag runs starting at '<!--'
    zstarts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1))), lambda i: tk(i) == "<!--"
    )

    def forbidden(b: Column) -> Column:
        return F.exists(F.col("zs"), lambda z: (b >= z) & (b <= z + 2))

    def priority(i: Column) -> Column:
        # last-char/first-char tests instead of regex: same semantics,
        # ~2x cheaper over tens of millions of token evaluations
        last = lambda c: F.substring(c, -1, 1)  # noqa: E731
        return (
            F.when(tk(i + 1).startswith("#"), 1)  # heading starts next token
            .when(
                last(tk(i)).isin(".", "!", "?")
                & F.substring(tk(i + 1), 1, 1).between("A", "Z"),
                3,
            )  # sentence end
            .when(last(tk(i)).isin(",", ";"), 5)  # comma/semicolon
            .when(tk(i + 1) == "<!--", 9)  # zone-boundary fallback
        )

    # break candidates: break after token b (1 <= b < n), zone-filtered.
    # The never-taken coalesce branch double-references `zs` so that on
    # paths where column pruning drops zs from the output (it's only
    # carried forward for chunk_pages), CollapseProject can't inline the
    # zstarts scan into the per-candidate `forbidden` lambda — that
    # rebuild-per-candidate is O(n^2) per doc.
    breaks = F.coalesce(
        F.when(
            F.size(F.col("zs")) < 0, F.array().cast("array<struct<p:int,b:int>>")
        ),
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.greatest(n - 1, F.lit(1))),
                lambda i: F.struct(priority(i).alias("p"), i.alias("b")),
            ),
            lambda x: (x["b"] < n) & x["p"].isNotNull() & ~forbidden(x["b"]),
        ),
    )
    pre = base.withColumn("zs", zstarts).withColumn("breaks", breaks)

    def step(acc: Column, _: Column) -> Column:
        pos = F.element_at(acc, F.size(acc))
        cand_keys = F.transform(
            F.filter(
                F.col("breaks"),
                lambda x: (x["b"] >= pos + MIN_CHUNK) & (x["b"] <= pos + HARD_MAX_CHUNK),
            ),
            lambda x: (
                x["p"].cast("bigint") * _ENC * _ENC
                + F.abs(x["b"] - pos - TARGET_CHUNK).cast("bigint") * _ENC
                + x["b"].cast("bigint")
            ),
        )
        nxt = F.when(n - pos <= MAX_CHUNK, n).otherwise(
            F.coalesce(
                (F.array_min(cand_keys) % _ENC).cast("int"),
                F.least(pos + HARD_MAX_CHUNK, n),
            )
        )
        return F.when(pos >= n, acc).otherwise(F.concat(acc, F.array(nxt)))

    # per-row iteration bound: every non-final chunk consumes >=
    # MIN_CHUNK-1 tokens (and the pos>=n guard makes extra iterations
    # no-ops), so ceil(n/MIN)+1 iterations always finish the doc —
    # short docs fold less instead of paying a fixed worst-case bound
    # (HOFs are interpreted, not codegen'd; iteration count is the
    # dominant cost, and the bound adapts to any doc length)
    iters = (F.ceil(n / MIN_CHUNK) + 1).cast("int")
    # The never-taken coalesce branch is a SECOND reference to `breaks`:
    # with only the in-fold reference, column pruning (which drops
    # breaks from the projection output on paths that don't carry it
    # forward) makes it single-use and CollapseProject inlines the whole
    # breaks construction into the fold lambda — rebuilt every
    # iteration, O(n^2) per doc (measured 2x slower). Costs one size()
    # per row.
    bounds = F.coalesce(
        F.when(F.size(F.col("breaks")) < 0, F.array(F.lit(0))),
        F.aggregate(
            F.sequence(F.lit(1), F.greatest(iters, F.lit(1))), F.array(F.lit(0)), step
        ),
    )
    # materialize the fold ONCE per row before slicing chunk structs out
    # of it: interpreted HOFs re-evaluate an inlined sub-expression at
    # every reference, and `chunks` references the bounds array ~2x per
    # chunk (s and e) plus once for its size. `breaks` must stay in the
    # projection's OUTPUT: referenced only inside the fold it would be
    # single-use, and CollapseProject would inline its construction into
    # the fold lambda — rebuilt at every iteration (measured 2x slower
    # than not materializing bounds at all).
    with_bounds = pre.select(
        "doc_id", "toks", "n", "zs", "breaks", bounds.alias("bounds")
    )
    chunks = F.transform(
        F.sequence(F.lit(1), F.size(F.col("bounds")) - 1),
        lambda i: F.struct(
            i.cast("bigint").alias("chunk_number"),
            F.element_at(F.col("bounds"), i).alias("s"),
            F.element_at(F.col("bounds"), i + 1).alias("e"),
        ),
    )
    return with_bounds.select("doc_id", "toks", "zs", F.inline(chunks))


def chunk_breakpoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    rows = _packed_chunks(spark, sf_dir)
    return rows.select(
        "doc_id",
        "chunk_number",
        F.array_join(
            F.slice(F.col("toks"), F.col("s") + 1, F.col("e") - F.col("s")), " "
        ).alias("chunk_content"),
        (F.col("e") - F.col("s")).cast("bigint").alias("chunk_tokens"),
    )


def chunk_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level page assignment (stage_03b semantics).

    Reference parity: `semantic search/stage_03b_chunk_page_correction.py:261`
    ``extract_page_tags_with_positions`` + `:304` ``build_page_ranges`` +
    `:384` ``determine_pages_for_position_range`` — each chunk gets the
    min/max page whose range overlaps its positions. In token space a
    token's page is the number of page-tag starts at-or-before it, so
    the overlap collapses to two prefix counts over the zone-start
    array — still pure per-row expressions, zero shuffle.
    """
    rows = _packed_chunks(spark, sf_dir)

    def page_of(i: Column) -> Column:
        return F.size(F.filter(F.col("zs"), lambda z: z <= i))

    start_page = page_of(F.col("s") + 1)
    end_page = page_of(F.col("e"))
    return rows.select(
        "doc_id",
        "chunk_number",
        (F.col("e") - F.col("s")).cast("bigint").alias("chunk_tokens"),
        start_page.cast("bigint").alias("chunk_start_page"),
        end_page.cast("bigint").alias("chunk_end_page"),
        (end_page - start_page + 1).cast("bigint").alias("chunk_page_count"),
    )


_MD_PAGED_SQL = f"""
md_t AS (
  SELECT doc_id,
         array_to_string(list_transform(generate_series(0,
             greatest(CAST(ceil(len(dtoks) / {HEAD_EVERY}.0) AS INT), 1) - 1),
           w -> '<!-- PageNumber ' || (w + 1) || ' -->' || chr(10)
                || repeat('#', CASE WHEN w = 0 THEN 1 ELSE 1 + CAST((w + doc_id) % {MAX_LEVEL} AS INT) END)
                || ' S' || doc_id || '_' || w || chr(10)
                || array_to_string(list_slice(dtoks, w * {HEAD_EVERY} + 1, (w + 1) * {HEAD_EVERY}), ' ')
         ), chr(10)) AS md
  FROM (SELECT doc_id, {PUNCT_SQL.format(toks=_FILT_TOKS_SQL)} AS dtoks
        FROM documents)
)
"""

CHUNK_BREAKPOINTS_SQL = f"""
WITH RECURSIVE {_MD_PAGED_SQL.strip()},
pre AS (
  SELECT doc_id, toks, len(toks) AS n,
         list_filter(generate_series(1, greatest(len(toks), 1)),
                     i -> toks[i] = '<!--') AS zs
  FROM (SELECT doc_id, list_filter(string_split_regex(md, '\\s+'), t -> t <> '') AS toks
        FROM md_t)
),
pre2 AS (
  SELECT doc_id, toks, n, zs,
         list_filter(
           list_transform(generate_series(1, greatest(n - 1, 1)),
             i -> struct_pack(
                    p := CASE WHEN toks[i + 1] LIKE '#%%' THEN 1
                              WHEN toks[i][-1] IN ('.', '!', '?')
                                   AND toks[i + 1][1] BETWEEN 'A' AND 'Z' THEN 3
                              WHEN toks[i][-1] IN (',', ';') THEN 5
                              WHEN toks[i + 1] = '<!--' THEN 9
                         END,
                    b := i)),
           x -> x.b < n AND x.p IS NOT NULL
                AND len(list_filter(zs, z -> x.b >= z AND x.b <= z + 2)) = 0
         ) AS breaks
  FROM pre
),
packing AS (
  SELECT doc_id, 0 AS chunk_number, 0 AS s, 0 AS e FROM pre2
  UNION ALL
  SELECT p.doc_id, p.chunk_number + 1, p.e,
         CASE WHEN q.n - p.e <= {MAX_CHUNK} THEN q.n
              ELSE coalesce(
                CAST(list_min(list_transform(
                    list_filter(q.breaks,
                                x -> x.b >= p.e + {MIN_CHUNK} AND x.b <= p.e + {HARD_MAX_CHUNK}),
                    x -> CAST(x.p AS BIGINT) * {_ENC} * {_ENC}
                         + CAST(abs(x.b - p.e - {TARGET_CHUNK}) AS BIGINT) * {_ENC}
                         + CAST(x.b AS BIGINT))) % {_ENC} AS INT),
                least(p.e + {HARD_MAX_CHUNK}, q.n)) END
  FROM packing p JOIN pre2 q ON p.doc_id = q.doc_id
  WHERE p.e < q.n
)
SELECT p.doc_id,
       CAST(p.chunk_number AS BIGINT) AS chunk_number,
       array_to_string(list_slice(q.toks, p.s + 1, p.e), ' ') AS chunk_content,
       CAST(p.e - p.s AS BIGINT) AS chunk_tokens
FROM packing p JOIN pre2 q ON p.doc_id = q.doc_id
WHERE p.chunk_number >= 1
"""

# same packing CTEs, page-assignment final select (stage_03b)
CHUNK_PAGES_SQL = (
    CHUNK_BREAKPOINTS_SQL[: CHUNK_BREAKPOINTS_SQL.rindex("SELECT p.doc_id")]
    + """SELECT p.doc_id,
       CAST(p.chunk_number AS BIGINT) AS chunk_number,
       CAST(p.e - p.s AS BIGINT) AS chunk_tokens,
       CAST(len(list_filter(q.zs, z -> z <= p.s + 1)) AS BIGINT) AS chunk_start_page,
       CAST(len(list_filter(q.zs, z -> z <= p.e)) AS BIGINT) AS chunk_end_page,
       CAST(len(list_filter(q.zs, z -> z <= p.e))
            - len(list_filter(q.zs, z -> z <= p.s + 1)) + 1 AS BIGINT) AS chunk_page_count
FROM packing p JOIN pre2 q ON p.doc_id = q.doc_id
WHERE p.chunk_number >= 1
"""
)

QUERIES["chunk_breakpoints"] = chunk_breakpoints
ORACLES["chunk_breakpoints"] = CHUNK_BREAKPOINTS_SQL
QUERIES["chunk_pages"] = chunk_pages
ORACLES["chunk_pages"] = CHUNK_PAGES_SQL
