"""K-means (Lloyd) iteration over the embedding table.

`knn_ivf` (operators/advanced.py) probes a deterministic codebook and
documents that production would k-means it. This operator supplies that
missing piece as a distributed Lloyd step — the building block you loop
to convergence:

* **assign**: broadcast the current centroids, score every vector by
  squared L2 (rounded 6dp so the argmin ranking is identical in the
  oracle engine), keep the nearest cell. One narrow pass over the
  corpus, no shuffle — the centroid table is the small side by
  construction.
* **update**: `posexplode` the assigned vectors and average per
  (cell, component). The shuffle key is (cell, idx) — NCELLS × dim
  groups — so the reduce side is codebook-sized, not corpus-sized, and
  partial aggregation combines map-side. This is the standard scalable
  formulation (component-wise mean as a grouped aggregate), not a
  collect-and-average on the driver.
* **audit**: per cell, the assignment count, mean distance, centroid
  shift |new − old| (the convergence criterion a driver loop would
  test) and the new centroid norm.

The squared-distance fold runs in index order on both engines
(`aggregate(zip_with(...))` in Spark, `list_sum(list_transform(range))`
in DuckDB), so the values agree bit-for-bit before rounding — the
expansion ‖a‖²−2a·b+‖b‖² would NOT (different rounding path, and with
~8k scored pairs a 1e-9 discrepancy lands on a 6dp rounding boundary
often enough to flip hashes).

Iterating: a driver loop would re-feed `newc` as the next centroids
(checkpointing each round to truncate lineage). One step is the honest
unit to oracle-check — k rounds is k× the same plan.

Reference parity: the reference pipeline assigns embeddings to
pgvector index cells server-side (database-schema.sql:245 VECTOR
column + ivfflat index, whose build step IS k-means clustering);
this operator is the Spark-side equivalent of that index build.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

NCELLS = 16
CENTROID_BASE = 100  # same deterministic seed codebook as knn_ivf


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _sq_l2(a, b):
    return F.round(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        6,
    )


def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    cents = emb.where(
        (F.col("vec_id") >= CENTROID_BASE) & (F.col("vec_id") < CENTROID_BASE + NCELLS)
    ).select(F.col("vec_id").alias("cell"), F.col("v").alias("cv"))

    scored = emb.join(F.broadcast(cents), how="cross").select(
        "vec_id", "v", "cell", _sq_l2(F.col("v"), F.col("cv")).alias("d2")
    )
    w = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cell"))
    assigned = (
        scored.withColumn("r", F.row_number().over(w))
        .where(F.col("r") == 1)
        .select("vec_id", "v", "cell", "d2")
        .localCheckpoint(eager=False)  # counts + component means both consume it
    )

    counts = assigned.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_assigned"),
        F.round(F.avg(F.sqrt("d2")), 6).alias("mean_dist"),
    )

    comp = assigned.select("cell", F.posexplode("v").alias("idx", "val"))
    newc = comp.groupBy("cell", "idx").agg(F.avg("val").alias("nv"))
    oldc = cents.select("cell", F.posexplode("cv").alias("idx", "ov"))
    shift = (
        newc.join(oldc, ["cell", "idx"])
        .groupBy("cell")
        .agg(
            F.round(
                F.sqrt(F.sum((F.col("nv") - F.col("ov")) * (F.col("nv") - F.col("ov")))), 6
            ).alias("centroid_shift"),
            F.round(F.sqrt(F.sum(F.col("nv") * F.col("nv"))), 6).alias("new_norm"),
        )
    )
    return counts.join(shift, "cell").select(
        "cell", "n_assigned", "mean_dist", "centroid_shift", "new_norm"
    )


# posexplode is 0-based; DuckDB lists are 1-based — range shifted so idx
# values agree (they only meet inside the per-engine joins, but keeping
# them aligned makes the CTEs diffable against the Spark code)
KMEANS_SQL = f"""
WITH d AS (
  SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
), cents AS (
  SELECT vec_id AS cell, v AS cv FROM d
  WHERE vec_id >= {CENTROID_BASE} AND vec_id < {CENTROID_BASE + NCELLS}
), scored AS (
  SELECT vec_id, v, cell,
         round(list_sum(list_transform(range(1, len(v) + 1),
                                       i -> (v[i] - cv[i]) * (v[i] - cv[i]))), 6) AS d2
  FROM d CROSS JOIN cents
), assigned AS (
  SELECT vec_id, v, cell, d2 FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d2 ASC, cell ASC) AS r
    FROM scored
  ) WHERE r = 1
), counts AS (
  SELECT cell, count(*) AS n_assigned, round(avg(sqrt(d2)), 6) AS mean_dist
  FROM assigned GROUP BY cell
), comp AS (
  SELECT cell, unnest(range(1, len(v) + 1)) AS idx, unnest(v) AS val FROM assigned
), newc AS (
  SELECT cell, idx, avg(val) AS nv FROM comp GROUP BY cell, idx
), oldc AS (
  SELECT cell, unnest(range(1, len(cv) + 1)) AS idx, unnest(cv) AS ov FROM cents
), shift AS (
  SELECT cell,
         round(sqrt(sum((nv - ov) * (nv - ov))), 6) AS centroid_shift,
         round(sqrt(sum(nv * nv)), 6) AS new_norm
  FROM newc JOIN oldc USING (cell, idx)
  GROUP BY cell
)
SELECT cell, n_assigned, mean_dist, centroid_shift, new_norm
FROM counts JOIN shift USING (cell)
"""


QUERIES = {"kmeans_lloyd_step": kmeans_lloyd_step}
ORACLES = {"kmeans_lloyd_step": KMEANS_SQL}
