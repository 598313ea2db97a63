"""Iterative clustering: k-means over the embedding table.

The missing piece between the ANN indexes (which *assume* a codebook)
and a real pipeline (which *trains* one): Lloyd's algorithm, expressed
Spark-first — per round, one broadcast of the K centroids, one narrow
assignment pass, one shuffle to re-aggregate centroids. KMEANS_ITERS
rounds are unrolled (production drives until centroid movement < eps;
the per-round plan is identical).

Oracle-reproducibility is the hard part for an iterative float
algorithm, and the same two devices used for PageRank apply:

* vectors are floor-quantized to integers once (q = floor(v*1000+.5),
  identical bits in both engines since the parquet doubles are), so
  distances and centroid sums are EXACT integers — no float summation
  order to disagree on;
* centroid updates use integer floor division (sum div count), so the
  round-k centroids are exactly equal across engines, which makes the
  round-(k+1) assignment exactly equal, inductively.

Initialization is data-derived and deterministic (the quantized
vectors CENTROID_BASE..+K-1 — the IVF codebook convention). Empty
clusters keep their previous centroid (left join + coalesce, mirrored
in the oracle).

Scale: assignment is a broadcast nested pass (K×D integers per
executor); the update shuffles (cluster, dim, partial-sum) triples
with map-side combine — the textbook distributed Lloyd's step. At
100 TB you add mini-batching per round; the plan shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .advanced import CENTROID_BASE

KMEANS_K = 8
KMEANS_ITERS = 2
# semantic_dedup sizes its cell count from the corpus (K = max(KMEANS_K,
# n_vecs // TARGET)) so per-cell membership — and with it the in-cluster
# pair join's Σ sizes² — stays bounded as N grows; at the test SFs
# (N <= 2000) K stays at KMEANS_K, so oracle rows are unchanged there.
SEMDEDUP_CELL_TARGET = 250
DIM = 64
QSCALE = 1000

QUERIES = {}
ORACLES = {}


def _qvecs(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    q = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * QSCALE + F.lit(0.5)).cast("bigint")
    )
    return emb.select("vec_id", q.alias("q"))


_DIST = "aggregate(zip_with(q, c, (a, b) -> (a - b) * (a - b)), cast(0 as bigint), (acc, x) -> acc + x)"


def _assign(vecs: DataFrame, cents: DataFrame) -> DataFrame:
    """(vec_id, q, cid, dist): nearest centroid per vector, integer L2."""
    scored = vecs.join(F.broadcast(cents), how="cross").select(
        "vec_id", "q", "cid", F.expr(_DIST).alias("dist")
    )
    return (
        scored.groupBy("vec_id")
        .agg(F.min(F.struct("dist", "cid", "q")).alias("s"))
        .select("vec_id", F.col("s.q").alias("q"), F.col("s.cid").alias("cid"), F.col("s.dist").alias("dist"))
    )


def _update(assigned: DataFrame, cents_prev: DataFrame) -> DataFrame:
    """New centroids: per-dimension integer mean; empty clusters keep
    their previous centroid."""
    sums = (
        assigned.select("cid", F.posexplode("q").alias("pos", "v"))
        .groupBy("cid", "pos")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
    )
    new = (
        sums.groupBy("cid")
        .agg(F.sort_array(F.collect_list(F.struct("pos", F.expr("s div n").alias("m")))).alias("ms"))
        .select("cid", F.expr("transform(ms, x -> x.m)").alias("c_new"))
    )
    return (
        cents_prev.join(new, "cid", "left")
        .select("cid", F.coalesce(F.col("c_new"), F.col("c")).alias("c"))
        # pin the K-row centroid frame per round: every consumer loop
        # references round r's centroids twice in round r+1 (the assign
        # broadcast + cents_prev), so unpinned lineage doubles per
        # round — 2^ITERS assign subtrees in one physical plan.
        .localCheckpoint(eager=False)
    )


def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _qvecs(spark, sf_dir).localCheckpoint(eager=False)  # reused every round
    cents = (
        vecs.where((F.col("vec_id") >= CENTROID_BASE) & (F.col("vec_id") < CENTROID_BASE + KMEANS_K))
        .select((F.col("vec_id") - CENTROID_BASE).alias("cid"), F.col("q").alias("c"))
    )
    for _ in range(KMEANS_ITERS):
        assigned = _assign(vecs, cents)
        cents = _update(assigned, cents)
    final = _assign(vecs, cents)
    return (
        final.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("cluster_size"),
            F.sum("dist").alias("inertia"),
            F.min("vec_id").alias("min_member"),
        )
        .join(
            cents.select("cid", F.expr("aggregate(c, cast(0 as bigint), (a, x) -> a + x)").alias("centroid_sum")),
            "cid",
        )
    )


def _sql_dist(q: str, c: str) -> str:
    return f"list_sum(list_transform(generate_series(1, {DIM}), i -> ({q}[i] - {c}[i]) * ({q}[i] - {c}[i])))"


def _sql_assign(vecs: str, cents: str, out: str) -> str:
    return f"""
{out} AS (
  SELECT vec_id, q, (min(struct_pack(dist := d, cid := cid))).cid AS cid,
         (min(struct_pack(dist := d, cid := cid))).dist AS dist
  FROM (SELECT v.vec_id, v.q, c.cid, {_sql_dist("v.q", "c.c")} AS d
        FROM {vecs} v CROSS JOIN {cents} c)
  GROUP BY vec_id, q
)"""


def _sql_update(assigned: str, prev: str, out: str) -> str:
    return f"""
{out}_sums AS (
  SELECT cid, pos, sum(q[pos]) AS s, count(*) AS n
  FROM {assigned}, (SELECT unnest(generate_series(1, {DIM})) AS pos)
  GROUP BY cid, pos
),
{out}_new AS (
  SELECT cid, list(s // n ORDER BY pos) AS c_new FROM {out}_sums GROUP BY cid
),
{out} AS (
  SELECT p.cid, coalesce(n.c_new, p.c) AS c
  FROM {prev} p LEFT JOIN {out}_new n USING (cid)
)"""


def _kmeans_sql() -> str:
    parts = [
        f"""vecs AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> floor(x * {QSCALE} + (0.5)::DOUBLE)::BIGINT) AS q
  FROM embeddings
),
c0 AS (
  SELECT vec_id - {CENTROID_BASE} AS cid, q AS c FROM vecs
  WHERE vec_id >= {CENTROID_BASE} AND vec_id < {CENTROID_BASE + KMEANS_K}
)"""
    ]
    prev = "c0"
    for r in range(KMEANS_ITERS):
        parts.append(_sql_assign("vecs", prev, f"a{r}").strip())
        parts.append(_sql_update(f"a{r}", prev, f"c{r + 1}").strip())
        prev = f"c{r + 1}"
    parts.append(_sql_assign("vecs", prev, "afinal").strip())
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT cid, count(*) AS cluster_size, sum(dist)::BIGINT AS inertia,
       min(vec_id) AS min_member, centroid_sum
FROM afinal
JOIN (SELECT cid, list_sum(c)::BIGINT AS centroid_sum FROM {prev} GROUP BY cid, c) USING (cid)
GROUP BY cid, centroid_sum
"""


KMEANS_SQL = _kmeans_sql()

QUERIES["kmeans_embeddings"] = kmeans_embeddings
ORACLES["kmeans_embeddings"] = KMEANS_SQL


# ---------------------------------------------------------------------------
# semantic_dedup — SemDeDup (Abbas et al. 2023, public): k-means the
# embedding space, then look for near-duplicate pairs ONLY within each
# cluster. The cluster restriction is the published scale device: the
# candidate set shrinks from O(n²) to sum of per-cluster sizes squared,
# and clusters are embarrassingly parallel. This composes the repo's
# deterministic integer k-means (exactly engine-equal assignments, see
# module docstring) with the 6dp-rounded cosine threshold device from
# `dedup_embedding_lsh` (operators/embeddings.py:370) — so the oracle
# reproduces the full pipeline, clusters included, not just the verify.
#
# Scale notes: the self-join key is the cluster id; a mega-cluster would
# re-create the quadratic blowup, so production adds a cluster-size cap
# (recluster oversized cells with a larger K — the IVF convention); at
# sf the clusters are ~n/K so the join is bounded. Unit vectors are
# pinned once (localCheckpoint) so norm lambdas don't re-inline into
# the join condition (the CollapseProject hazard documented at
# embeddings.py:370).

SEMDEDUP_TAU = 0.4  # PAIR_TAU: same near-dup bar as the LSH/GEMM family


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    vecs = _qvecs(spark, sf_dir).localCheckpoint(eager=False)
    # Cells scale with the corpus — the SemDeDup contract's load-bearing
    # half: with FIXED K, per-cell membership grows ∝ N and the
    # in-cluster pair join goes quadratic (measured 46x wall at a 16x
    # corpus with K=8; see the BASELINE.md round-7 scale probe). K from
    # one bounded count (the drift_monitor convention); the DuckDB
    # oracle computes the SAME K from the same count, so parity holds
    # at every corpus size — and at the test SFs (N <= 2000 ->
    # K = KMEANS_K = 8) the verified outputs are bit-unchanged.
    n_vecs = vecs.count()
    k = max(KMEANS_K, n_vecs // SEMDEDUP_CELL_TARGET)
    cents = (
        vecs.where((F.col("vec_id") >= CENTROID_BASE) & (F.col("vec_id") < CENTROID_BASE + k))
        .select((F.col("vec_id") - CENTROID_BASE).alias("cid"), F.col("q").alias("c"))
    )
    for _ in range(KMEANS_ITERS):
        cents = _update(_assign(vecs, cents), cents)
    assigned = _assign(vecs, cents).select("vec_id", "cid")

    # In-cluster pair scoring as a per-cluster numpy GEMM (guide §4.2):
    # the previous expression form self-joined the unit vectors on cid
    # and evaluated an interpreted zip_with/aggregate fold per candidate
    # pair — Σ sizes² pairs × 64 dims of per-row lambda work dominated
    # the query (~12 s of its 15 s profile at sf0.1). One applyInPandas
    # per cluster normalizes and scores the whole cell with a single
    # rounded matmul — the same engine-equivalence device the banded
    # backends use (np.round(·, 6) on unit-vector cosines).
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    cell = emb.join(assigned, "vec_id").select("cid", "vec_id", "embedding")

    def pair_scores(pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {"cid": [], "id_keep": [], "id_drop": [], "cosine": []}
        ).astype(
            {"cid": "int64", "id_keep": "int64", "id_drop": "int64", "cosine": "float64"}
        )
        if len(pdf) < 2:
            return empty
        pdf = pdf.sort_values("vec_id")
        u = np.array(list(pdf["embedding"]), dtype=np.float64)
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        sims = np.round(u @ u.T, 6)
        ids = pdf["vec_id"].to_numpy()
        iu, ju = np.triu_indices(len(ids), k=1)
        keep = sims[iu, ju] >= SEMDEDUP_TAU
        if not keep.any():
            return empty
        return pd.DataFrame(
            {
                "cid": np.repeat(pdf["cid"].iloc[0], keep.sum()),
                "id_keep": ids[iu[keep]],
                "id_drop": ids[ju[keep]],
                "cosine": sims[iu, ju][keep],
            }
        ).astype(
            {"cid": "int64", "id_keep": "int64", "id_drop": "int64", "cosine": "float64"}
        )

    return cell.groupBy("cid").applyInPandas(
        pair_scores, "cid long, id_keep long, id_drop long, cosine double"
    )


def _semantic_dedup_sql() -> str:
    parts = [
        f"""vecs AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> floor(x * {QSCALE} + (0.5)::DOUBLE)::BIGINT) AS q
  FROM embeddings
),
kk AS (
  SELECT greatest({KMEANS_K}, count(*) // {SEMDEDUP_CELL_TARGET}) AS k FROM vecs
),
c0 AS (
  SELECT vec_id - {CENTROID_BASE} AS cid, q AS c FROM vecs, kk
  WHERE vec_id >= {CENTROID_BASE} AND vec_id < {CENTROID_BASE} + k
)"""
    ]
    prev = "c0"
    for r in range(KMEANS_ITERS):
        parts.append(_sql_assign("vecs", prev, f"a{r}").strip())
        parts.append(_sql_update(f"a{r}", prev, f"c{r + 1}").strip())
        prev = f"c{r + 1}"
    parts.append(_sql_assign("vecs", prev, "afinal").strip())
    parts.append(
        """unit AS (
  SELECT e.vec_id, a.cid, list_transform(e.embedding::DOUBLE[], x -> x / nrm) AS u
  FROM (SELECT vec_id, embedding,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings) e
  JOIN afinal a USING (vec_id)
)"""
    )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT a.cid AS cid, a.vec_id AS id_keep, b.vec_id AS id_drop,
       round(list_dot_product(a.u, b.u), 6) AS cosine
FROM unit a JOIN unit b ON a.cid = b.cid AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.u, b.u), 6) >= {SEMDEDUP_TAU}
"""


SEMDEDUP_SQL = _semantic_dedup_sql()

QUERIES["semantic_dedup"] = semantic_dedup
ORACLES["semantic_dedup"] = SEMDEDUP_SQL


# ---------------------------------------------------------------------------
# embed_pca_power — dominant principal direction of the embedding cloud
# via the power method (the whitening/compression primitive an embedding
# pipeline runs before PQ/IVF; stage_04 produces the vectors this would
# post-process).
#
# Why it needs the house integer devices: the power method is an
# iterative FLOAT algorithm (y = Gx; x = y/||y||), and float summation
# order differs across engines. Same treatment as PageRank/k-means:
#
# * vectors quantize once to integers (QSCALE, identical bits);
# * the Gram matrix uses the MEAN outer product with floor division
#   (g_ij = sum(q_i q_j) div n) so entries are bounded ~QSCALE^2
#   REGARDLESS of corpus size — no overflow at any scale factor, and
#   the 64x64 result is a broadcast constant;
# * per-round renormalization maps y to +/-[0, 2^10] exactly:
#   x = sign(y) * ((abs(y) * 1024) div max_abs(y)) — abs() keeps the
#   floor division on non-negative integers, where Spark's `div` and
#   DuckDB's `//` agree (they differ on negatives: trunc vs floor).
#
# Scale: the (i, j) partial-sum shuffle is 64^2 cells with map-side
# combine (the same shape as the k-means update); everything after the
# Gram matrix is work on a 4096-row table, independent of corpus size.
# The outer-product fan-out rides a pinned array (the pre-explode
# localCheckpoint device) so quantization runs once per vector.

PCA_ITERS = 3
PCA_NORM = 1024  # renormalization target after each round


def _gram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64x64 integer Gram table g_ij = sum(q_i * q_j) div n.

    The outer-product sum runs as a per-partition numpy matmul
    (guide §4.2): the former double-posexplode form generated
    DIM² rows per vector (~20M interpreted-HOF rows at sf0.1) into a
    hash aggregation; q^T q per Arrow batch is the same exact integer
    sum — int64 matmul is overflow-safe here (|q| <= ~QSCALE, so a
    cell is bounded by n·QSCALE², within int64 up to corpus sizes far
    beyond 100 TB) and integer addition is order-insensitive, so the
    result is bit-identical whatever the partitioning. Each task
    emits one 4096-row partial; the shuffle carries partials, not the
    fan-out."""
    from typing import Iterator

    import numpy as np
    import pyarrow as pa

    vecs = _qvecs(spark, sf_dir).localCheckpoint(eager=False)
    n = vecs.groupBy().agg(F.count(F.lit(1)).alias("n"))

    def partial_gram(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        acc = None
        for batch in batches:
            col = batch.column(0)
            if len(col) == 0:
                continue
            flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.int64, copy=False)
            arr = flat.reshape(len(col), -1)
            g = arr.T @ arr
            acc = g if acc is None else acc + g
        if acc is not None:
            d = acc.shape[0]
            ii, jj = np.meshgrid(
                np.arange(d, dtype=np.int32), np.arange(d, dtype=np.int32), indexing="ij"
            )
            yield pa.record_batch(
                {
                    "i": pa.array(ii.ravel(), pa.int32()),
                    "j": pa.array(jj.ravel(), pa.int32()),
                    "s": pa.array(acc.ravel(), pa.int64()),
                }
            )

    partials = vecs.select("q").mapInArrow(partial_gram, "i int, j int, s long")
    outer = partials.groupBy("i", "j").agg(F.sum("s").alias("s"))
    return outer.crossJoin(F.broadcast(n)).select("i", "j", F.expr("s div n").alias("g"))


def _power_round(gram: DataFrame, x: DataFrame) -> DataFrame:
    """One power-method round on the 64x64 integer Gram table."""
    y = (
        gram.join(x.withColumnRenamed("w", "xj"), gram["j"] == x["pos"])
        .groupBy("i")
        .agg(F.sum(F.col("g") * F.col("xj")).alias("y"))
    )
    m = y.groupBy().agg(F.max(F.abs(F.col("y"))).alias("m"))
    return y.crossJoin(F.broadcast(m)).select(
        F.col("i").alias("pos"),
        F.expr(f"sign(y) * ((abs(y) * {PCA_NORM}) div m)").cast("bigint").alias("w"),
    )


def embed_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    gram = _gram(spark, sf_dir).localCheckpoint(eager=False)  # reused per round
    x = gram.where((F.col("i") == 0)).select("j", F.lit(1).cast("bigint").alias("w")).select(
        F.col("j").alias("pos"), "w"
    )
    for _ in range(PCA_ITERS):
        x = _power_round(gram, x)
    # pinned: referenced 4x below (both Rayleigh joins, x'x, final) —
    # each un-pinned reference re-runs the whole power iteration
    x = x.localCheckpoint(eager=False)
    # Rayleigh quotient as an exact integer pair: lam_num = x'Gx,
    # lam_den = x'x — the dominant-eigenvalue estimate without a
    # cross-engine float division.
    xgx = (
        gram.join(x.select(F.col("pos").alias("i"), F.col("w").alias("xi")), "i")
        .join(x.select(F.col("pos").alias("j"), F.col("w").alias("xj")), "j")
        .groupBy()
        .agg(F.sum(F.col("g") * F.col("xi") * F.col("xj")).alias("lam_num"))
    )
    xx = x.groupBy().agg(F.sum(F.col("w") * F.col("w")).alias("lam_den"))
    return x.crossJoin(F.broadcast(xgx)).crossJoin(F.broadcast(xx))


def _pca_sql() -> str:
    rounds = []
    prev = "x0"
    for r in range(PCA_ITERS):
        rounds.append(
            f"""y{r} AS (
  SELECT g.i, sum(g.g * x.w) AS y FROM gram g JOIN {prev} x ON g.j = x.pos GROUP BY g.i
),
m{r} AS (SELECT max(abs(y)) AS m FROM y{r}),
x{r + 1} AS (
  SELECT i AS pos, CAST(sign(y) * ((abs(y) * {PCA_NORM}) // m) AS BIGINT) AS w
  FROM y{r}, m{r}
)"""
        )
        prev = f"x{r + 1}"
    body = ",\n".join(rounds)
    return f"""
WITH vecs AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> floor(x * {QSCALE} + (0.5)::DOUBLE)::BIGINT) AS q
  FROM embeddings
),
outer_p AS (
  SELECT i.i, j.j, sum(v.q[i.i + 1] * v.q[j.j + 1]) AS s
  FROM vecs v,
       (SELECT unnest(generate_series(0, {DIM - 1})) AS i) i,
       (SELECT unnest(generate_series(0, {DIM - 1})) AS j) j
  GROUP BY i.i, j.j
),
n_t AS (SELECT count(*) AS n FROM vecs),
gram AS (SELECT i, j, s // n AS g FROM outer_p, n_t),
x0 AS (SELECT j AS pos, CAST(1 AS BIGINT) AS w FROM gram WHERE i = 0),
{body},
lam AS (
  SELECT CAST(sum(g.g * xi.w * xj.w) AS BIGINT) AS lam_num
  FROM gram g JOIN {prev} xi ON g.i = xi.pos JOIN {prev} xj ON g.j = xj.pos
),
den AS (SELECT sum(w * w) AS lam_den FROM {prev})
SELECT pos, w, lam_num, CAST(lam_den AS BIGINT) AS lam_den FROM {prev}, lam, den
"""


PCA_SQL = _pca_sql()

QUERIES["embed_pca_power"] = embed_pca_power
ORACLES["embed_pca_power"] = PCA_SQL


# ---------------------------------------------------------------------------
# cluster_topics — what each embedding cluster is ABOUT: the k-means
# partition joined back to the documents it indexes (vec_id == doc_id
# in the test corpus, mirroring apg_catalog ids), with the top terms
# per cluster by in-cluster frequency. The composed
# clustering-to-content readout an exploratory corpus audit runs, and
# the deterministic stand-in for per-cluster LLM labeling.
#
# Scale: assignments are the k-means passes (audited there); the term
# count is one (cid, token) aggregation with map-side combine; the
# top-5 window runs over the bounded count table only. Stopword-free
# via the shared English stopword list so the topics aren't glue words.

TOPIC_TOP_K = 5


def cluster_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.textqc import STOPWORDS
    from ..functions.text import tokens

    vecs = _qvecs(spark, sf_dir).localCheckpoint(eager=False)
    cents = (
        vecs.where((F.col("vec_id") >= CENTROID_BASE) & (F.col("vec_id") < CENTROID_BASE + KMEANS_K))
        .select((F.col("vec_id") - CENTROID_BASE).alias("cid"), F.col("q").alias("c"))
    )
    for _ in range(KMEANS_ITERS):
        cents = _update(_assign(vecs, cents), cents)
    assigned = _assign(vecs, cents).select(F.col("vec_id").alias("doc_id"), "cid")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.join(assigned, "doc_id").select(
        "cid", F.explode(tokens(F.col("text"))).alias("token")
    )
    counts = (
        toks.where(~F.col("token").isin(*STOPWORDS["en"]))
        .groupBy("cid", "token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("cid").orderBy(F.desc("cnt"), F.asc("token"))
    return (
        counts.withColumn("term_rank", F.row_number().over(w))
        .where(F.col("term_rank") <= TOPIC_TOP_K)
        .select("cid", F.col("term_rank").cast("bigint").alias("term_rank"), "token", "cnt")
    )


def _cluster_topics_sql() -> str:
    from ..operators.textqc import STOPWORDS

    stops = ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    parts = [
        f"""vecs AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> floor(x * {QSCALE} + (0.5)::DOUBLE)::BIGINT) AS q
  FROM embeddings
),
c0 AS (
  SELECT vec_id - {CENTROID_BASE} AS cid, q AS c FROM vecs
  WHERE vec_id >= {CENTROID_BASE} AND vec_id < {CENTROID_BASE + KMEANS_K}
)"""
    ]
    prev = "c0"
    for r in range(KMEANS_ITERS):
        parts.append(_sql_assign("vecs", prev, f"a{r}").strip())
        parts.append(_sql_update(f"a{r}", prev, f"c{r + 1}").strip())
        prev = f"c{r + 1}"
    parts.append(_sql_assign("vecs", prev, "afinal").strip())
    parts.append(
        f"""toks AS (
  SELECT a.cid,
         unnest(list_filter(string_split_regex(d.text, '\\s+'), t -> t <> '')) AS token
  FROM documents d JOIN afinal a ON a.vec_id = d.doc_id
),
counts AS (
  SELECT cid, token, count(*) AS cnt FROM toks
  WHERE token NOT IN ({stops})
  GROUP BY cid, token
),
ranked AS (
  SELECT cid, token, cnt,
         row_number() OVER (PARTITION BY cid ORDER BY cnt DESC, token ASC) AS term_rank
  FROM counts
)"""
    )
    body = ",\n".join(parts)
    return f"""
WITH {body}
SELECT cid, CAST(term_rank AS BIGINT) AS term_rank, token, cnt
FROM ranked WHERE term_rank <= {TOPIC_TOP_K}
"""


CLUSTER_TOPICS_SQL = _cluster_topics_sql()

QUERIES["cluster_topics"] = cluster_topics
ORACLES["cluster_topics"] = CLUSTER_TOPICS_SQL


# ---------------------------------------------------------------------------
# embed_project_pc1 — APPLY the trained principal direction: project
# every vector onto embed_pca_power's dominant component. Training and
# inference as separate operators is the kmeans→IVF convention; the
# projection is an exact integer dot product (quantized vector ×
# integer direction), so per-vector coordinates are engine-equal with
# no float summation anywhere. The projection histogram (16 integer
# buckets over the coordinate range) rides along — the 1-D sketch of
# the embedding cloud a drift monitor would track.
#
# Scale: the direction is a 64-int broadcast; projection is one narrow
# zip_with pass; bucket bounds are a 1-row broadcast aggregate.

def embed_project_pc1(spark: SparkSession, sf_dir: str) -> DataFrame:
    gram = _gram(spark, sf_dir).localCheckpoint(eager=False)
    x = gram.where((F.col("i") == 0)).select(F.col("j").alias("pos"), F.lit(1).cast("bigint").alias("w"))
    for _ in range(PCA_ITERS):
        x = _power_round(gram, x)
    direction = x.groupBy().agg(
        F.expr("transform(array_sort(collect_list(struct(pos, w))), s -> s.w)").alias("dvec")
    )
    vecs = _qvecs(spark, sf_dir)
    proj = F.expr(
        "aggregate(zip_with(q, dvec, (a, b) -> a * b), cast(0 as bigint), (acc, v) -> acc + v)"
    )
    # pinned: referenced twice (bounds + final) — un-pinned, each
    # reference re-runs the corpus pass AND the power-iteration chain
    projected = (
        vecs.crossJoin(F.broadcast(direction))
        .select("vec_id", proj.alias("proj"))
        .localCheckpoint(eager=False)
    )
    bounds = projected.groupBy().agg(F.min("proj").alias("lo"), F.max("proj").alias("hi"))
    return projected.crossJoin(F.broadcast(bounds)).select(
        "vec_id",
        "proj",
        F.expr("cast((proj - lo) * 16 div (hi - lo + 1) as bigint)").alias("proj_bucket"),
    )


def _project_sql() -> str:
    base = _pca_sql()
    # reuse the PCA CTE chain up to the final direction x{PCA_ITERS}
    head = base.split("lam AS (")[0].rstrip().rstrip(",")
    return f"""{head},
direction AS (
  SELECT list(w ORDER BY pos) AS dvec FROM x{PCA_ITERS}
),
projected AS (
  SELECT vec_id,
         list_sum(list_transform(generate_series(1, {DIM}), i -> q[i] * dvec[i])) AS proj
  FROM vecs, direction
),
bounds AS (SELECT min(proj) AS lo, max(proj) AS hi FROM projected)
SELECT vec_id, CAST(proj AS BIGINT) AS proj,
       CAST((proj - lo) * 16 // (hi - lo + 1) AS BIGINT) AS proj_bucket
FROM projected, bounds
"""


PROJECT_PC1_SQL = _project_sql()

QUERIES["embed_project_pc1"] = embed_project_pc1
ORACLES["embed_project_pc1"] = PROJECT_PC1_SQL


# --- Whitening plan (per-dimension standardization factors) -------------------
#
# The preprocessing artifact between embed_drift_stats (means) and
# embed_pca_power (principal directions): per-dimension mean/std and
# the 1/std scale factors a whitening (standardization) step applies
# before k-means or PCA — computed as ONE pass of mergeable integer
# moments on the milli-quantized grid (n·Σx² − (Σx)² = n²·var, exact
# and order-independent; the DRIFT_QSCALE device), std recovered via
# one sqrt + floor(x+0.5) identical in both engines.  The condition
# ratio max-std/min-std says whether whitening matters at all.
#
# Scale: one posexplode + one (dim) aggregation — 64 output rows at
# any corpus size; the condition windows run on that bounded grid.
# At billions of rows the squared sums outgrow BIGINT — promote the
# moments to DECIMAL(38) or per-partition double partials.

def embed_whitening_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        F.expr(
            "transform(embedding, x -> cast(floor(cast(x as double) * 1000 + 0.5d)"
            " as bigint))"
        ).alias("q")
    )
    per_dim = (
        emb.select(F.posexplode("q").alias("dim", "v"))
        .groupBy("dim")
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.sum("v").cast("bigint").alias("s"),
            F.expr("cast(sum(v * v) as bigint)").alias("ss"),
        )
    )
    scored = per_dim.select(
        F.col("dim").cast("bigint").alias("dim"),
        "n_vecs",
        F.expr("cast(s div n_vecs as bigint)").alias("mean_milli"),
        F.expr(
            "cast(floor(sqrt(cast(n_vecs * ss - s * s as double)) / n_vecs + 0.5)"
            " as bigint)"
        ).alias("std_milli"),
    ).select(
        "dim", "n_vecs", "mean_milli", "std_milli",
        F.expr(
            "case when std_milli = 0 then -1"
            " else cast(1000000 div std_milli as bigint) end"
        ).alias("scale_micro"),
    )
    w = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return scored.select(
        "dim", "n_vecs", "mean_milli", "std_milli", "scale_micro",
        F.expr(
            "cast(max(std_milli) over (rows between unbounded preceding and"
            " unbounded following) * 1000 div greatest(min(std_milli) over"
            " (rows between unbounded preceding and unbounded following), 1)"
            " as bigint)"
        ).alias("cond_milli"),
    )


WHITENING_SQL = """
WITH q AS (
  SELECT list_transform(embedding::DOUBLE[],
         x -> floor(x * 1000 + (0.5)::DOUBLE)::BIGINT) AS q
  FROM embeddings
),
per_dim AS (
  SELECT d.dim, count(*)::BIGINT AS n_vecs,
         CAST(sum(q.q[d.dim + 1]) AS BIGINT) AS s,
         CAST(sum(q.q[d.dim + 1] * q.q[d.dim + 1]) AS BIGINT) AS ss
  FROM q, (SELECT unnest(generate_series(0, 63)) AS dim) d
  GROUP BY d.dim
),
scored AS (
  SELECT CAST(dim AS BIGINT) AS dim, n_vecs,
         CAST(s // n_vecs AS BIGINT) AS mean_milli,
         CAST(floor(sqrt(CAST(n_vecs * ss - s * s AS DOUBLE)) / n_vecs + 0.5)
              AS BIGINT) AS std_milli
  FROM per_dim
),
final AS (
  SELECT dim, n_vecs, mean_milli, std_milli,
         CASE WHEN std_milli = 0 THEN -1
              ELSE CAST(1000000 // std_milli AS BIGINT) END AS scale_micro
  FROM scored
)
SELECT dim, n_vecs, mean_milli, std_milli, scale_micro,
       CAST(max(std_milli) OVER () * 1000 // greatest(min(std_milli) OVER (), 1)
            AS BIGINT) AS cond_milli
FROM final
"""

QUERIES["embed_whitening_plan"] = embed_whitening_plan
ORACLES["embed_whitening_plan"] = WHITENING_SQL


# --- second principal component via deflation -----------------------------------
#
# embed_pca_power finds the dominant eigenpair; whitening and 2-D
# projection need the SECOND one.  Classic Hotelling deflation: G2 =
# G - lambda1 * x1 x1' / (x1'x1), with lambda1 = (x1'Gx1)/(x1'x1) — the
# rank-1 subtraction runs per (i, j) cell as ONE fixed-order double
# expression over exact integers (g - lam_num*wi*wj/lam_den^2) and
# floors back to an integer Gram, so the subsequent power rounds are
# the same exact-integer machinery as PC1.  The x1'x2 dot ships as an
# audit column: deflation quality is measurable, not assumed.
#
# Plan: the 64x64 Gram pins once; PC1 rounds, one broadcast rank-1
# update, PC2 rounds — all on the bounded Gram table, never the
# corpus.

def embed_pca_deflate(spark: SparkSession, sf_dir: str) -> DataFrame:
    gram = _gram(spark, sf_dir).localCheckpoint(eager=False)
    x = gram.where(F.col("i") == 0).select(F.col("j").alias("pos"), F.lit(1).cast("bigint").alias("w"))
    for _ in range(PCA_ITERS):
        x = _power_round(gram, x)
    x = x.localCheckpoint(eager=False)
    lam = (
        gram.join(F.broadcast(x.select(F.col("pos").alias("i"), F.col("w").alias("xi"))), "i")
        .join(F.broadcast(x.select(F.col("pos").alias("j"), F.col("w").alias("xj"))), "j")
        .groupBy()
        .agg(F.sum(F.col("g") * F.col("xi") * F.col("xj")).alias("lam_num"))
    )
    den = x.groupBy().agg(F.sum(F.col("w") * F.col("w")).alias("lam_den"))
    g2 = (
        gram.join(F.broadcast(x.select(F.col("pos").alias("i"), F.col("w").alias("xi"))), "i")
        .join(F.broadcast(x.select(F.col("pos").alias("j"), F.col("w").alias("xj"))), "j")
        .crossJoin(F.broadcast(lam))
        .crossJoin(F.broadcast(den))
        .select(
            "i",
            "j",
            F.expr(
                "cast(floor(g - cast(lam_num as double) * xi * xj"
                " / (cast(lam_den as double) * cast(lam_den as double))) as bigint)"
            ).alias("g"),
        )
        .localCheckpoint(eager=False)
    )
    y = g2.where(F.col("i") == 0).select(F.col("j").alias("pos"), F.lit(1).cast("bigint").alias("w"))
    for _ in range(PCA_ITERS):
        y = _power_round(g2, y)
    # pinned like x: referenced 4x below (lam2, den2, dot, final) — each
    # un-pinned reference re-runs the whole second power iteration
    y = y.localCheckpoint(eager=False)
    lam2 = (
        g2.join(F.broadcast(y.select(F.col("pos").alias("i"), F.col("w").alias("yi"))), "i")
        .join(F.broadcast(y.select(F.col("pos").alias("j"), F.col("w").alias("yj"))), "j")
        .groupBy()
        .agg(F.sum(F.col("g") * F.col("yi") * F.col("yj")).alias("lam2_num"))
    )
    den2 = y.groupBy().agg(F.sum(F.col("w") * F.col("w")).alias("lam2_den"))
    dot = (
        y.join(x.select(F.col("pos").alias("pos"), F.col("w").alias("w1")), "pos")
        .groupBy()
        .agg(F.sum(F.expr("w * w1")).alias("dot_12"))
    )
    return (
        y.crossJoin(F.broadcast(lam2))
        .crossJoin(F.broadcast(den2))
        .crossJoin(F.broadcast(dot))
        .select(
            "pos",
            "w",
            F.col("lam2_num").cast("bigint").alias("lam2_num"),
            F.col("lam2_den").cast("bigint").alias("lam2_den"),
            F.col("dot_12").cast("bigint").alias("dot_12"),
        )
    )


def _pca2_sql() -> str:
    rounds1, prev = [], "x0"
    for r in range(PCA_ITERS):
        rounds1.append(
            f"""y{r} AS (
  SELECT g.i, sum(g.g * x.w) AS y FROM gram g JOIN {prev} x ON g.j = x.pos GROUP BY g.i
),
m{r} AS (SELECT max(abs(y)) AS m FROM y{r}),
x{r + 1} AS (
  SELECT i AS pos, CAST(sign(y) * ((abs(y) * {PCA_NORM}) // m) AS BIGINT) AS w
  FROM y{r}, m{r}
)"""
        )
        prev = f"x{r + 1}"
    rounds2, prev2 = [], "z0"
    for r in range(PCA_ITERS):
        rounds2.append(
            f"""u{r} AS (
  SELECT g.i, sum(g.g * x.w) AS y FROM gram2 g JOIN {prev2} x ON g.j = x.pos GROUP BY g.i
),
w{r} AS (SELECT max(abs(y)) AS m FROM u{r}),
z{r + 1} AS (
  SELECT i AS pos, CAST(sign(y) * ((abs(y) * {PCA_NORM}) // m) AS BIGINT) AS w
  FROM u{r}, w{r}
)"""
        )
        prev2 = f"z{r + 1}"
    return f"""
WITH vecs AS (
  SELECT vec_id,
         list_transform(embedding::DOUBLE[], x -> floor(x * {QSCALE} + (0.5)::DOUBLE)::BIGINT) AS q
  FROM embeddings
),
outer_p AS (
  SELECT i.i, j.j, sum(v.q[i.i + 1] * v.q[j.j + 1]) AS s
  FROM vecs v,
       (SELECT unnest(generate_series(0, {DIM - 1})) AS i) i,
       (SELECT unnest(generate_series(0, {DIM - 1})) AS j) j
  GROUP BY i.i, j.j
),
n_t AS (SELECT count(*) AS n FROM vecs),
gram AS MATERIALIZED (SELECT i, j, s // n AS g FROM outer_p, n_t),
x0 AS (SELECT j AS pos, CAST(1 AS BIGINT) AS w FROM gram WHERE i = 0),
{",".join(rounds1)},
lam AS (
  SELECT CAST(sum(g.g * xi.w * xj.w) AS BIGINT) AS lam_num
  FROM gram g JOIN {prev} xi ON g.i = xi.pos JOIN {prev} xj ON g.j = xj.pos
),
den AS (SELECT CAST(sum(w * w) AS BIGINT) AS lam_den FROM {prev}),
gram2 AS MATERIALIZED (
  SELECT g.i, g.j,
         CAST(floor(g.g - CAST(lam_num AS DOUBLE) * xi.w * xj.w
              / (CAST(lam_den AS DOUBLE) * CAST(lam_den AS DOUBLE))) AS BIGINT) AS g
  FROM gram g
  JOIN {prev} xi ON g.i = xi.pos
  JOIN {prev} xj ON g.j = xj.pos
  CROSS JOIN lam CROSS JOIN den
),
z0 AS (SELECT j AS pos, CAST(1 AS BIGINT) AS w FROM gram2 WHERE i = 0),
{",".join(rounds2)},
lam2 AS (
  SELECT CAST(sum(g.g * yi.w * yj.w) AS BIGINT) AS lam2_num
  FROM gram2 g JOIN {prev2} yi ON g.i = yi.pos JOIN {prev2} yj ON g.j = yj.pos
),
den2 AS (SELECT CAST(sum(w * w) AS BIGINT) AS lam2_den FROM {prev2}),
dot AS (
  SELECT CAST(sum(a.w * b.w) AS BIGINT) AS dot_12
  FROM {prev2} a JOIN {prev} b ON a.pos = b.pos
)
SELECT pos, w, lam2_num, lam2_den, dot_12 FROM {prev2}, lam2, den2, dot
"""


PCA2_SQL = _pca2_sql()

QUERIES["embed_pca_deflate"] = embed_pca_deflate
ORACLES["embed_pca_deflate"] = PCA2_SQL


# --- exact DBSCAN on the cosine epsilon-graph ---------------------------------
#
# Density-based clustering (Ester/Kriegel/Sander/Xu 1996) — the family
# the k-means/SemDeDup ring doesn't cover: clusters are dense regions
# (core = >= MINPTS neighbors within eps), arbitrary shape, with an
# explicit NOISE verdict — the outlier-aware grouping a curation
# pipeline runs on embeddings where k is unknowable. Exact formulation
# on the cosine epsilon-graph: eps-neighbors = the verified
# similarity_pairs set (cosine >= PAIR_TAU at 6dp — the identical pair
# set both engines already agree on), core = degree >= DBSCAN_MINPTS,
# clusters = connected components of the core-core subgraph (min-label
# propagation, the dedup_components device), border = non-core with a
# core neighbor (assigned the MIN core cluster id — deterministic
# tie-break), everything else noise (cluster -1).
#
# Scale: the pair set is the exact blocked-GEMM backend (the
# documented swap-out at 100 TB is LSH/IVF candidate generation, same
# as similarity_pairs itself); degree/border are single keyed
# aggregations; CC is DBSCAN_CC_ROUNDS bounded joins on edge-sized
# relations with a per-round lineage pin. No driver materialization,
# no single-task stage. Oracle: identical pair CTE + recursive-CTE
# reachability (exact fixpoint — it would catch round-count
# under-coverage as a hash mismatch).

DBSCAN_MINPTS = 3  # sf0.01 max degree at tau is 3 — keep the smallest SF non-degenerate
DBSCAN_CC_ROUNDS = 5  # min-label + pointer-jump: covers radius ~2^5 (r9)


def embed_dbscan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .embeddings import similarity_pairs

    pairs = (
        similarity_pairs(spark, sf_dir)
        .select("id_a", "id_b")
        .localCheckpoint(eager=False)  # both orientations + reused rounds
    )
    edges = pairs.unionAll(
        pairs.select(F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"))
    ).localCheckpoint(eager=False)

    deg = edges.groupBy(F.col("id_a").alias("vec_id")).agg(
        F.count(F.lit(1)).alias("degree")
    )
    core = deg.where(F.col("degree") >= DBSCAN_MINPTS).select("vec_id")
    core_edges = (
        edges.join(core.withColumnRenamed("vec_id", "id_a"), "id_a", "leftsemi")
        .join(core.withColumnRenamed("vec_id", "id_b"), "id_b", "leftsemi")
        .localCheckpoint(eager=False)
    )

    labels = core.withColumn("label", F.col("vec_id"))
    for r in range(DBSCAN_CC_ROUNDS):
        neighbor_min = (
            core_edges.join(labels, core_edges.id_b == labels.vec_id)
            .groupBy(F.col("id_a").alias("vec_id"))
            .agg(F.min("label").alias("nb_label"))
        )
        labels = labels.join(neighbor_min, "vec_id", "left").select(
            "vec_id",
            F.least(
                F.col("label"), F.coalesce(F.col("nb_label"), F.col("label"))
            ).alias("label"),
        )
        # pointer-jump (path halving, r8 ADVICE fix): label <-
        # label(label). Min-label alone covers only diameter <=
        # DBSCAN_CC_ROUNDS hops and epsilon-graphs grow long transitive
        # chains; with the jump each round roughly DOUBLES the covered
        # radius (~2^8 at 8 rounds — the large-star/small-star bound
        # dedup_components documents). label values are always core
        # vec_ids, so the self-join hits; left+coalesce is belt and
        # braces. The recursive-CTE oracle is the exact fixpoint, so
        # any residual under-coverage is a hash mismatch, not a silent
        # fragmentation.
        jump = labels.select(
            F.col("vec_id").alias("jv"), F.col("label").alias("jl")
        )
        labels = labels.join(
            jump, labels.label == jump.jv, "left"
        ).select(
            "vec_id", F.coalesce(F.col("jl"), F.col("label")).alias("label")
        )
        # labels feeds BOTH sides of the next round (neighbor_min and
        # the left join) — un-pinned the plan doubles per round
        # (2^rounds re-evaluations: 34 s vs 4.6 s at sf0.1). Pinning
        # every round pays 8 sequential scheduler barriers; every 2nd
        # round bounds re-evaluation at 2x between pins and measured
        # fastest (3.2 s vs 4.1 s per-round vs 3.7 s every-4th).
        if r % 2 == 1:
            labels = labels.localCheckpoint(eager=False)
    core_label = labels.select("vec_id", F.col("label").alias("cluster_id"))

    border_label = (
        edges.join(
            core_label.withColumnRenamed("vec_id", "id_b"),
            "id_b",
        )
        .join(core.withColumnRenamed("vec_id", "id_a"), "id_a", "left_anti")
        .groupBy(F.col("id_a").alias("vec_id"))
        .agg(F.min("cluster_id").alias("cluster_id"))
    )

    vecs = load_table(spark, sf_dir, "embeddings").select("vec_id")
    return (
        vecs.join(deg, "vec_id", "left")
        .join(core_label.withColumnRenamed("cluster_id", "core_cl"), "vec_id", "left")
        .join(border_label.withColumnRenamed("cluster_id", "border_cl"), "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce(F.col("degree"), F.lit(0)).cast("bigint").alias("degree"),
            F.when(F.col("core_cl").isNotNull(), F.lit("core"))
            .when(F.col("border_cl").isNotNull(), F.lit("border"))
            .otherwise(F.lit("noise"))
            .alias("role"),
            F.coalesce(F.col("core_cl"), F.col("border_cl"), F.lit(-1))
            .cast("bigint")
            .alias("cluster_id"),
        )
    )


def _dbscan_sql() -> str:
    # the pair CTE is the PRODUCTION similarity_pairs oracle, count-
    # gated dispatch included (round 9): above SIM_EXACT_MAX the Spark
    # side's banded pairs and this oracle's banded branch stay in
    # lockstep — re-inlining the exact all-pairs join here would
    # hash-mismatch the moment the dispatch swaps.
    from .embeddings import SIMILARITY_PAIRS_SQL

    return f"""
WITH RECURSIVE
pairs AS (
  SELECT id_a, id_b FROM ({SIMILARITY_PAIRS_SQL})
),
edges AS (
  SELECT id_a, id_b FROM pairs UNION ALL SELECT id_b, id_a FROM pairs
),
deg AS (SELECT id_a AS vec_id, count(*) AS degree FROM edges GROUP BY 1),
core AS (SELECT vec_id FROM deg WHERE degree >= {DBSCAN_MINPTS}),
core_edges AS (
  SELECT e.id_a, e.id_b FROM edges e
  JOIN core c1 ON e.id_a = c1.vec_id JOIN core c2 ON e.id_b = c2.vec_id
),
reach AS (
  SELECT id_a AS vec_id, id_b AS other FROM core_edges
  UNION
  SELECT r.vec_id, e.id_b FROM reach r JOIN core_edges e ON r.other = e.id_a
),
core_label AS (
  SELECT c.vec_id,
         least(c.vec_id, coalesce(min(r.other), c.vec_id)) AS cluster_id
  FROM core c LEFT JOIN reach r ON r.vec_id = c.vec_id
  GROUP BY c.vec_id
),
border_label AS (
  SELECT e.id_a AS vec_id, min(cl.cluster_id) AS cluster_id
  FROM edges e JOIN core_label cl ON e.id_b = cl.vec_id
  WHERE e.id_a NOT IN (SELECT vec_id FROM core)
  GROUP BY e.id_a
)
SELECT v.vec_id,
       CAST(coalesce(deg.degree, 0) AS BIGINT) AS degree,
       CASE WHEN co.cluster_id IS NOT NULL THEN 'core'
            WHEN bo.cluster_id IS NOT NULL THEN 'border'
            ELSE 'noise' END AS role,
       CAST(coalesce(co.cluster_id, bo.cluster_id, -1) AS BIGINT) AS cluster_id
FROM embeddings v
LEFT JOIN deg ON deg.vec_id = v.vec_id
LEFT JOIN core_label co ON co.vec_id = v.vec_id
LEFT JOIN border_label bo ON bo.vec_id = v.vec_id
"""


EMBED_DBSCAN_SQL = _dbscan_sql()

QUERIES["embed_dbscan"] = embed_dbscan
ORACLES["embed_dbscan"] = EMBED_DBSCAN_SQL
