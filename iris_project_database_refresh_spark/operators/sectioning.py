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


# --- recursive section deepening (stage_02 recursive_split_section) ----------
#
# Reference parity: `semantic search/stage_02_section_processing.py:1014`
# ``recursive_split_section`` — a section whose span exceeds the
# threshold is re-split at the NEXT heading level, recursively, until
# it fits, no meaningful split exists (fewer than 2 next-level
# headings), or max level is reached; `catalog search/
# stage3_generate_summaries.py:687` ``detect_natural_boundaries``
# supplies the boundary-preference idea (headings outrank everything,
# which is the only ladder rung the planted markdown carries at section
# grain — sentence/comma rungs live in chunk_breakpoints).
#
# Spark-first design: the recursion is depth-bounded (H1..H3 planted,
# reference descends to H6), so it UNROLLS into pure per-doc array
# expressions — a heading is a final cut iff every ancestor section was
# oversized AND had >= 2 children at its level.  Zero shuffle, zero
# Python, scan-rate at 100 TB; one row per final piece via inline().
# The anchor piece of a split section keeps the preamble lines (content
# between the parent heading and its first cut child), so the pieces
# partition the document exactly — no content is dropped.

SPLIT_TH = 20  # est-token split threshold (reference: page_threshold=3 pages)
RS_MAX_LEVEL = 3  # planted heading depth (reference max_level=6)
RS_BLOCK = 6  # tokens per planted block (docs are 10-99 tokens)


def _recsplit_markdown(docs: DataFrame) -> DataFrame:
    """(doc_id, md): markdown with doc-varied heading density — H1 every
    7..10 blocks (a = 7 + doc_id % 4), H2 every b = 3 + doc_id % 2
    blocks, H3 at offsets 1..2 after each H2, a plain continuation
    block at offset 3 (b=4 docs only) — tuned so the sf0.01 corpus
    exercises EVERY recursion branch: short docs fit at H1, long docs
    split H1->H2->H3, the b=4 docs' trailing 2-block H3 spans exceed
    the threshold at max level (max_level arm), truncated tail spans
    hit the no-subheadings arm (branch counts pinned in the unit
    test)."""
    toks = tokens(F.col("text"))
    n_blocks = F.greatest(F.ceil(F.size(toks) / RS_BLOCK).cast("int"), F.lit(1))
    a = (F.lit(7) + F.pmod(F.col("doc_id"), 4)).cast("int")
    b = (F.lit(3) + F.pmod(F.col("doc_id"), 2)).cast("int")

    def block(w: Column) -> Column:
        body = F.array_join(F.slice(toks, w * RS_BLOCK + 1, RS_BLOCK), " ")
        lev = (
            F.when(F.pmod(w, a) == 0, 1)
            .when(F.pmod(w, b) == 0, 2)
            .when(F.pmod(w, b) <= 2, 3)
        )
        head = F.concat(
            F.when(lev == 1, "#").when(lev == 2, "##").otherwise(F.lit("###")),
            F.lit(" S"),
            F.col("doc_id").cast("string"),
            F.lit("_"),
            w.cast("string"),
            F.lit("\n"),
        )
        return F.concat(F.when(lev.isNotNull(), head).otherwise(F.lit("")), body)

    md = F.array_join(F.transform(F.sequence(F.lit(0), n_blocks - 1), block), "\n")
    return docs.select("doc_id", md.alias("md"))


def section_recursive_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    md = _recsplit_markdown(docs)

    # staged selects: every array is materialized BEFORE lambda use
    # (referencing a compound expression inside a lambda re-evaluates it
    # per element — the house no-CSE-in-HOF rule)
    s1 = md.select("doc_id", F.split("md", "\n").alias("lines"))
    s2 = s1.select(
        "doc_id",
        "lines",
        F.filter(
            F.sequence(F.lit(1), F.size("lines")),
            lambda i: F.element_at(F.col("lines"), i).rlike("^#{1,3} "),
        ).alias("hidx"),
    )
    s3 = s2.select(
        "doc_id",
        "lines",
        "hidx",
        F.transform(
            "hidx",
            lambda i: F.length(
                F.regexp_extract(F.element_at(F.col("lines"), i), r"^(#+) ", 1)
            ).cast("int"),
        ).alias("hlev"),
        F.sequence(F.lit(1), F.size("hidx")).alias("hs"),
    )

    def lev(k: Column) -> Column:
        return F.element_at(F.col("hlev"), k)

    # own-level span end per heading j (line index, inclusive) + H1 parent
    def span_end(j: Column) -> Column:
        nj = F.array_min(F.filter(F.col("hs"), lambda k: (k > j) & (lev(k) <= lev(j))))
        return F.when(nj.isNull(), F.size(F.col("lines"))).otherwise(
            F.element_at(F.col("hidx"), nj) - 1
        )

    s4 = s3.select(
        "doc_id", "lines", "hidx", "hlev", "hs",
        F.transform("hs", span_end).alias("send"),
        F.transform(
            "hs",
            lambda j: F.array_max(F.filter(F.col("hs"), lambda k: (k <= j) & (lev(k) == 1))),
        ).alias("p1"),
    )

    def est_span(a_line: Column, b_line: Column) -> Column:
        return _est_tokens(
            F.length(F.array_join(F.slice(F.col("lines"), a_line, b_line - a_line + 1), "\n"))
        )

    s5 = s4.select(
        "doc_id", "lines", "hidx", "hlev", "hs", "send", "p1",
        F.transform(
            "hs", lambda j: est_span(F.element_at(F.col("hidx"), j), F.element_at(F.col("send"), j))
        ).alias("est"),
        F.transform(
            "hs",
            lambda j: F.size(
                F.filter(
                    F.col("hs"),
                    lambda k: (k > j)
                    & (F.element_at(F.col("hidx"), k) <= F.element_at(F.col("send"), j))
                    & (lev(k) == lev(j) + 1),
                )
            ),
        ).alias("nsub"),
        F.transform(
            "hs",
            lambda j: F.array_max(
                F.filter(
                    F.col("hs"),
                    lambda k: (k <= j) & (lev(k) == 2) & (k > F.element_at(F.col("p1"), j)),
                )
            ),
        ).alias("p2"),
    )
    s6 = s5.select(
        "doc_id", "lines", "hidx", "hlev", "hs", "send", "p1", "p2", "est", "nsub",
        F.transform(
            "hs",
            lambda j: (lev(j) < RS_MAX_LEVEL)
            & (F.element_at(F.col("est"), j) > SPLIT_TH)
            & (F.element_at(F.col("nsub"), j) >= 2),
        ).alias("spl"),
    )

    def split_at(k: Column) -> Column:
        return F.element_at(F.col("spl"), k)

    # a heading is a final cut iff every ancestor section split down to it
    cut = (
        lambda j: F.when(lev(j) == 1, F.lit(True))
        .when(lev(j) == 2, split_at(F.element_at(F.col("p1"), j)))
        .otherwise(
            F.element_at(F.col("p2"), j).isNotNull()
            & F.coalesce(split_at(F.element_at(F.col("p2"), j)), F.lit(False))
            & split_at(F.element_at(F.col("p1"), j))
        )
    )
    s7 = s6.select(
        "doc_id", "lines", "hidx", "hlev", "send", "p1", "p2", "est", "spl",
        F.filter("hs", cut).alias("cuts"),
    )

    def title_of(k: Column) -> Column:
        return F.regexp_extract(
            F.element_at(F.col("lines"), F.element_at(F.col("hidx"), k)), r"^#+\s+(.*)$", 1
        )

    def piece(c: Column) -> Column:
        jc = F.element_at(F.col("cuts"), c)
        anchor = F.element_at(F.col("hidx"), jc)
        pend = F.when(
            c < F.size(F.col("cuts")),
            F.element_at(F.col("hidx"), F.element_at(F.col("cuts"), c + 1)) - 1,
        ).otherwise(F.size(F.col("lines")))
        level = lev(jc)
        reason = (
            F.when(split_at(jc), "split_remainder")
            .when(F.element_at(F.col("est"), jc) <= SPLIT_TH, "fits")
            .when(level == RS_MAX_LEVEL, "max_level")
            .otherwise(F.lit("no_subheadings"))
        )
        return F.struct(
            c.cast("bigint").alias("sec_idx"),
            title_of(jc).alias("title"),
            level.cast("bigint").alias("level"),
            F.when(level == 1, F.lit(""))
            .when(level == 2, title_of(F.element_at(F.col("p1"), jc)))
            .otherwise(title_of(F.element_at(F.col("p2"), jc)))
            .alias("parent_title"),
            est_span(anchor, pend).alias("piece_tokens"),
            reason.alias("stop_reason"),
            F.md5(
                F.encode(
                    F.array_join(F.slice(F.col("lines"), anchor, pend - anchor + 1), "\n"),
                    "utf-8",
                )
            ).alias("content_md5"),
        )

    pieces = F.transform(F.sequence(F.lit(1), F.size(F.col("cuts"))), piece)
    return s7.select("doc_id", F.inline(pieces))


_RS_MD_SQL = f"""
md_t AS (
  SELECT doc_id,
         array_to_string(list_transform(generate_series(0,
             greatest(CAST(ceil(len(toks) / {RS_BLOCK}.0) AS INT), 1) - 1),
           w -> coalesce(
                  CASE WHEN w % (7 + doc_id % 4) = 0 THEN '#'
                       WHEN w % (3 + doc_id % 2) = 0 THEN '##'
                       WHEN w % (3 + doc_id % 2) <= 2 THEN '###' END
                  || ' S' || doc_id || '_' || w || chr(10), '')
                || array_to_string(list_slice(toks, w * {RS_BLOCK} + 1, (w + 1) * {RS_BLOCK}), ' ')
         ), chr(10)) AS md
  FROM (SELECT doc_id, {_FILT_TOKS_SQL} AS toks FROM documents)
)
"""

SECTION_RECURSIVE_SPLIT_SQL = f"""
WITH {_RS_MD_SQL.strip()},
l1 AS (SELECT doc_id, string_split(md, chr(10)) AS lines FROM md_t),
l2 AS (
  SELECT doc_id, lines,
         list_filter(generate_series(1, len(lines)),
                     i -> regexp_matches(lines[i], '^#{{1,3}} ')) AS hidx
  FROM l1
),
l3 AS (
  SELECT doc_id, lines, hidx,
         list_transform(hidx, i -> length(regexp_extract(lines[i], '^(#+) ', 1))) AS hlev,
         generate_series(1, len(hidx)) AS hs
  FROM l2
),
l4 AS (
  SELECT doc_id, lines, hidx, hlev, hs,
         list_transform(hs, j -> coalesce(
             hidx[list_min(list_filter(hs, k -> k > j AND hlev[k] <= hlev[j]))] - 1,
             len(lines))) AS send,
         list_transform(hs, j -> list_max(list_filter(hs, k -> k <= j AND hlev[k] = 1))) AS p1
  FROM l3
),
l5 AS (
  SELECT doc_id, lines, hidx, hlev, hs, send, p1,
         list_transform(hs, j -> {_EST_SQL.format(c="length(array_to_string(list_slice(lines, hidx[j], send[j]), chr(10)))")}) AS est,
         list_transform(hs, j -> len(list_filter(hs,
             k -> k > j AND hidx[k] <= send[j] AND hlev[k] = hlev[j] + 1))) AS nsub,
         list_transform(hs, j -> list_max(list_filter(hs,
             k -> k <= j AND hlev[k] = 2 AND k > p1[j]))) AS p2
  FROM l4
),
l6 AS (
  SELECT *, list_transform(hs, j -> hlev[j] < {RS_MAX_LEVEL}
                                     AND est[j] > {SPLIT_TH}
                                     AND nsub[j] >= 2) AS spl
  FROM l5
),
l7 AS (
  SELECT *, list_filter(hs, j -> CASE
              WHEN hlev[j] = 1 THEN true
              WHEN hlev[j] = 2 THEN spl[p1[j]]
              ELSE p2[j] IS NOT NULL AND coalesce(spl[p2[j]], false) AND spl[p1[j]]
            END) AS cuts
  FROM l6
)
SELECT doc_id,
       CAST(c AS BIGINT) AS sec_idx,
       regexp_extract(lines[hidx[cuts[c]]], '^#+\\s+(.*)$', 1) AS title,
       CAST(hlev[cuts[c]] AS BIGINT) AS level,
       CASE WHEN hlev[cuts[c]] = 1 THEN ''
            WHEN hlev[cuts[c]] = 2 THEN regexp_extract(lines[hidx[p1[cuts[c]]]], '^#+\\s+(.*)$', 1)
            ELSE regexp_extract(lines[hidx[p2[cuts[c]]]], '^#+\\s+(.*)$', 1) END AS parent_title,
       {_EST_SQL.format(c="length(array_to_string(list_slice(lines, hidx[cuts[c]], CASE WHEN c < len(cuts) THEN hidx[cuts[c + 1]] - 1 ELSE len(lines) END), chr(10)))")} AS piece_tokens,
       CASE WHEN spl[cuts[c]] THEN 'split_remainder'
            WHEN est[cuts[c]] <= {SPLIT_TH} THEN 'fits'
            WHEN hlev[cuts[c]] = {RS_MAX_LEVEL} THEN 'max_level'
            ELSE 'no_subheadings' END AS stop_reason,
       md5(array_to_string(list_slice(lines, hidx[cuts[c]],
           CASE WHEN c < len(cuts) THEN hidx[cuts[c + 1]] - 1 ELSE len(lines) END), chr(10))) AS content_md5
FROM l7, unnest(generate_series(1, len(cuts))) AS g(c)
"""

QUERIES["section_recursive_split"] = section_recursive_split
ORACLES["section_recursive_split"] = SECTION_RECURSIVE_SPLIT_SQL
