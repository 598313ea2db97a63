"""Deduplication suite: exact, n-gram Jaccard, MinHash+LSH, SimHash.

The reference dedups at file granularity — the catalog refresh keeps one
record per document identity and replaces stale copies
(`catalog search/stage4_update_csv.py:379` delete-then-append;
`semantic search/stage_05_csv_export.py:532` merge_with_master_csv drops
rows matching the incoming document_id). This module generalizes that to
content-level dedup, the core operator set of an LLM-training-data
pipeline.

Test corpus: the synthetic documents are all distinct, so each operator
runs over ``documents`` plus deterministically *planted* duplicates
(exact copies for doc_id % 7 == 0, 90%-prefix near-copies for
doc_id % 5 == 0) — planted identically in the DuckDB oracle, so results
stay hash-checkable while exercising real clusters.

Portability: every hash is md5-derived (``md5_int32``-style), because
Spark and DuckDB both expose md5 — signatures, bands, and candidate
sets are bit-identical across engines, which is what lets even
MinHash+LSH carry a full value-checked SQL oracle.

Scale design (100 TB):
* shingling/signatures: narrow per-row expressions, no shuffle.
* LSH: shuffle on (band_idx, band_key) — bounded fan-out (BANDS per
  doc); candidate pairs deduped before the verify join.
* verify: jaccard computed only on candidate pairs via array
  intersection on the two docs' (bounded) distinct-shingle arrays.
* the O(n²) in-bucket pairing is controlled by band width; skewed
  buckets would be capped/salted in production (documented here, not
  needed at test SF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

# MinHash permutation constants h_i(x) = (a_i*x + b_i) mod P, generated
# once with seed 20260813; a_i < 2^30 keeps a_i*x < 2^62 (no int64
# overflow in either engine).
P = 4294967311  # smallest prime > 2^32
AB = [
    (1064082031, 797605564), (573612697, 1944694864), (145609951, 861958243),
    (703471044, 4077954476), (1071644562, 4226421251), (126328945, 2355650359),
    (848272349, 461793307), (879404501, 2960065950), (263703426, 175932789),
    (986599566, 1910390390), (765224311, 4172901075), (332297311, 1940697599),
    (1002683190, 594088545), (974934944, 3976546005), (153786110, 3587116556),
    (762314473, 3925669064),
]
N_HASHES = len(AB)
BANDS, ROWS_PER_BAND = 4, 4
JACCARD_TAU = 0.6
SHINGLE = 3

SIMHASH_BITS = 60  # 15 hex digits of md5 → fits signed int64 in both engines
SIMHASH_BANDS, SIMHASH_BAND_BITS = 4, 15
HAMMING_TAU = 3  # ≤3 bit flips over 4 bands → ≥1 identical band (pigeonhole)


# --- shared planted corpus ---------------------------------------------------

def _corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    exact = docs.where(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text"
    )
    toks = F.split(F.col("text"), r"\s+")
    near = (
        docs.where(F.col("doc_id") % 5 == 0)
        .select(
            (F.col("doc_id") + 200000).alias("doc_id"),
            F.array_join(
                F.slice(toks, 1, F.ceil(F.size(toks) * 0.9).cast("int")), " "
            ).alias("text"),
        )
    )
    return docs.unionAll(exact).unionAll(near)


CORPUS_SQL = """
corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000, text FROM documents WHERE doc_id % 7 = 0
  UNION ALL
  SELECT doc_id + 200000,
         array_to_string(list_slice(string_split_regex(text, '\\s+'), 1,
             CAST(ceil(0.9 * len(string_split_regex(text, '\\s+'))) AS INT)), ' ')
  FROM documents WHERE doc_id % 5 = 0
)
"""

# Word SHINGLE-grams, distinct, as a Catalyst expression. Spark's
# sequence() descends when start > stop, so short docs need the guard
# (DuckDB's generate_series is already empty there).
_SHINGLES_EXPR = f"""
CASE WHEN size(toks) < {SHINGLE} THEN array(concat_ws(' ', toks))
     ELSE array_distinct(transform(sequence(1, size(toks) - {SHINGLE - 1}),
                                   j -> concat_ws(' ', slice(toks, j, {SHINGLE}))))
END
"""

_SHINGLES_SQL = f"""
CASE WHEN len(toks) < {SHINGLE} THEN [array_to_string(toks, ' ')]
     ELSE list_distinct(list_transform(generate_series(1, len(toks) - {SHINGLE - 1}),
                                       j -> array_to_string(list_slice(toks, j, j + {SHINGLE - 1}), ' ')))
END
"""


def _with_shingles(corpus: DataFrame) -> DataFrame:
    return corpus.withColumn("toks", F.split(F.col("text"), r"\s+")).withColumn(
        "shingles", F.expr(_SHINGLES_EXPR)
    )


# --- exact dedup -------------------------------------------------------------

def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash clusters with keep-min-id survivor (one shuffle on
    the md5 key — uniform by construction)."""
    c = _corpus(spark, sf_dir)
    return (
        c.select("doc_id", F.md5("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("cluster_size"),
            (F.count(F.lit(1)) - 1).alias("n_removed"),
        )
        .where(F.col("cluster_size") > 1)
    )


DEDUP_EXACT_SQL = f"""
WITH {CORPUS_SQL.strip()}
SELECT md5(text) AS fingerprint,
       min(doc_id) AS keep_id,
       count(*) AS cluster_size,
       count(*) - 1 AS n_removed
FROM corpus
GROUP BY md5(text)
HAVING count(*) > 1
"""


# --- exact n-gram Jaccard (ground truth for the approximate methods) ---------

def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All near-dup pairs with Jaccard ≥ τ via inverted-index join.

    explode(shingle) → self-join on shingle → count intersections →
    jaccard. The shuffle key is the shingle string; frequent shingles
    create skew, which AQE's skew-join split handles (and a production
    run would drop ultra-common shingles first, like stopword filtering).
    """
    sh = (
        _with_shingles(_corpus(spark, sf_dir))
        .select("doc_id", F.size("shingles").alias("n_sh"), F.explode("shingles").alias("shingle"))
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    jac = F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter"))
    return inter.where(jac >= JACCARD_TAU).select(
        "id_a", "id_b", F.round(jac, 6).alias("jaccard")
    )


DEDUP_NGRAM_SQL = f"""
WITH {CORPUS_SQL.strip()},
sh AS (
  SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS shingle
  FROM (SELECT doc_id, {_SHINGLES_SQL.strip()} AS shingles
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM corpus))
),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, a.n_sh AS n_a, b.n_sh AS n_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2, 3, 4
)
SELECT id_a, id_b,
       round(n_inter / CAST(n_a + n_b - n_inter AS DOUBLE), 6) AS jaccard
FROM inter
WHERE n_inter / CAST(n_a + n_b - n_inter AS DOUBLE) >= {JACCARD_TAU}
"""


# --- MinHash + banded LSH ----------------------------------------------------

def _perm(a: int, b: int):
    return lambda x: (F.lit(a) * x + F.lit(b)) % F.lit(P)


def _minhash_sigs() -> list:
    """One min-over-shingle-hashes expression per permutation."""
    # shingle → 32-bit md5 int happens once into `hashes`
    return [
        F.array_min(F.transform(F.col("hashes"), _perm(a, b))).alias(f"sig{i}")
        for i, (a, b) in enumerate(AB)
    ]


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures → banded LSH buckets → verified Jaccard pairs.

    Signature/band computation is narrow per-row work; the only
    shuffles are the (band_idx, band_key) bucket join and the final
    verify join on candidate pairs. Every hash is md5-derived so the
    DuckDB oracle reproduces the exact candidate set.
    """
    sh = _with_shingles(_corpus(spark, sf_dir)).withColumn(
        "hashes",
        F.transform(
            F.col("shingles"), lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint")
        ),
    )
    sigs = sh.select("doc_id", "shingles", *_minhash_sigs())
    band_cols = [
        F.concat_ws(
            "_", *[F.col(f"sig{b * ROWS_PER_BAND + r}") for r in range(ROWS_PER_BAND)]
        ).alias(f"band{b}")
        for b in range(BANDS)
    ]
    buckets = sigs.select(
        "doc_id", "shingles", F.posexplode(F.array(*band_cols)).alias("band_idx", "band_key")
    )
    a, b = buckets.alias("a"), buckets.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size("sh_a") + F.size("sh_b") - inter
    jac = inter / union
    return cand.where(jac >= JACCARD_TAU).select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))


def _minhash_sql_sigs() -> str:
    return ",\n         ".join(
        f"list_min(list_transform(hashes, x -> ({a} * x + {b}) % {P})) AS sig{i}"
        for i, (a, b) in enumerate(AB)
    )


def _band_sql(b: int) -> str:
    parts = " || '_' || ".join(
        f"CAST(sig{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)
    )
    return parts


DEDUP_MINHASH_SQL = f"""
WITH {CORPUS_SQL.strip()},
sh AS (
  SELECT doc_id, shingles,
         list_transform(shingles, s -> CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS hashes
  FROM (SELECT doc_id, {_SHINGLES_SQL.strip()} AS shingles
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM corpus))
),
sigs AS (
  SELECT doc_id, shingles,
         {_minhash_sql_sigs()}
  FROM sh
),
buckets AS (
  SELECT doc_id, shingles, band_idx, band_key
  FROM sigs, LATERAL (VALUES {", ".join(f"({b}, {_band_sql(b)})" for b in range(BANDS))}) AS v(band_idx, band_key)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM buckets a JOIN buckets b
    ON a.band_idx = b.band_idx AND a.band_key = b.band_key AND a.doc_id < b.doc_id
),
verified AS (
  SELECT id_a, id_b,
         len(list_intersect(sa.shingles, sb.shingles)) AS n_inter,
         len(sa.shingles) + len(sb.shingles) - len(list_intersect(sa.shingles, sb.shingles)) AS n_union
  FROM cand
  JOIN sh sa ON sa.doc_id = id_a
  JOIN sh sb ON sb.doc_id = id_b
)
SELECT id_a, id_b, round(n_inter / CAST(n_union AS DOUBLE), 6) AS jaccard
FROM verified
WHERE n_inter / CAST(n_union AS DOUBLE) >= {JACCARD_TAU}
"""


# --- SimHash -----------------------------------------------------------------

def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash over shingles + banded Hamming join.

    The per-bit majority vote runs as explode -> one aggregation with 60
    sum(sign) expressions -- a single shuffle on doc_id and a flat agg
    plan (a nested 60-array-filter expression tree would blow up
    codegen). Pairs at Hamming distance <= HAMMING_TAU share at least
    one of the SIMHASH_BANDS 15-bit bands (pigeonhole), so the banded
    join returns exactly the brute-force result -- which is what the
    oracle computes.
    """
    sh = _with_shingles(_corpus(spark, sf_dir)).select(
        "doc_id", F.explode("shingles").alias("shingle")
    )
    h = F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10).cast("bigint")
    exploded = sh.select("doc_id", h.alias("h"))
    votes = exploded.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{j}")
            for j in range(SIMHASH_BITS)
        ]
    )
    bit_terms = [
        F.when(F.col(f"v{j}") > 0, F.lit(1 << j).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        for j in range(SIMHASH_BITS)
    ]
    simmed = votes.select("doc_id", sum(bit_terms[1:], bit_terms[0]).alias("simhash"))
    bands = simmed.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftright("simhash", b * SIMHASH_BAND_BITS).bitwiseAND(
                        F.lit((1 << SIMHASH_BAND_BITS) - 1)
                    )
                    for b in range(SIMHASH_BANDS)
                ]
            )
        ).alias("band_idx", "band_val"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .dropDuplicates(["id_a", "id_b"])
        .where(F.col("hamming") <= HAMMING_TAU)
    )


def _simhash_bits_sql() -> str:
    terms = [
        f"CASE WHEN len(list_filter(hashes, h -> (h & (1::BIGINT << {j})) <> 0)) * 2 > n_toks "
        f"THEN (1::BIGINT << {j}) ELSE 0 END"
        for j in range(SIMHASH_BITS)
    ]
    return " + ".join(terms)


DEDUP_SIMHASH_SQL = f"""
WITH {CORPUS_SQL.strip()},
tok AS (
  SELECT doc_id, shingles AS toks, len(shingles) AS n_toks,
         list_transform(shingles, t -> CAST('0x' || substr(md5(t), 1, 15) AS BIGINT)) AS hashes
  FROM (SELECT doc_id, {_SHINGLES_SQL.strip()} AS shingles
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM corpus))
),
simmed AS (
  SELECT doc_id, {_simhash_bits_sql()} AS simhash FROM tok
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM simmed a JOIN simmed b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {HAMMING_TAU}
"""


QUERIES = {
    "dedup_exact": dedup_exact,
    "dedup_ngram_jaccard": dedup_ngram_jaccard,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
}

ORACLES = {
    "dedup_exact": DEDUP_EXACT_SQL,
    "dedup_ngram_jaccard": DEDUP_NGRAM_SQL,
    "dedup_minhash_lsh": DEDUP_MINHASH_SQL,
    "dedup_simhash": DEDUP_SIMHASH_SQL,
}
