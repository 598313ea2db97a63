"""Persisted IVF vector index: build-once, partition-pruned probes.

The operators in `operators/advanced.py` compute the IVF structure
in-query; a deployment builds it ONCE per refresh and serves many
queries from the artifact (what pgvector's ivfflat index is on disk —
`database-schema.sql:115` "Vector Search" — and stage_04's embeddings
feed). Layout:

    index_dir/
      codebook/            -- NCELLS centroid vectors (tiny parquet)
      cells/cell=<k>/      -- vectors partitioned by nearest-centroid cell
      manifest.json        -- ncells, dims, per-cell row counts

The serving property this buys at 100 TB: a query probes NPROBE cells,
and because `cells/` is hive-partitioned on the cell id, the probe
read PRUNES to those directories at planning time (PartitionFilters —
asserted in tests). IO per query scales with the probed slice, not the
corpus. The probed cell list is a driver-side decision over
NPROBE x queries ids (metadata-scale, like any query planner's
partition selection).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.advanced import CENTROID_BASE, IVF_K, IVF_QUERIES, NCELLS, NPROBE, _as_double, _cos
from ..sources.tables import load_table


def _assigned(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", _as_double("embedding").alias("v")
    )
    cents = emb.where(
        (F.col("vec_id") >= CENTROID_BASE) & (F.col("vec_id") < CENTROID_BASE + NCELLS)
    ).select(F.col("vec_id").alias("cell"), F.col("v").alias("cv"))
    scored = emb.join(F.broadcast(cents), how="cross").select(
        "vec_id", "v", "cell", _cos(F.col("v"), F.col("cv")).alias("ccos")
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("ccos"), F.asc("cell"))
    return scored.withColumn("r", F.row_number().over(w)), cents


def build_ivf_index(spark: SparkSession, sf_dir: str, index_dir: str) -> dict:
    """Assign every vector to its nearest codebook cell and persist the
    partitioned layout + codebook + manifest. Returns the manifest."""
    scored, cents = _assigned(spark, sf_dir)
    assigned = scored.where(F.col("r") == 1).select("vec_id", "v", "cell")
    (
        assigned.repartition("cell")
        .write.partitionBy("cell")
        .mode("overwrite")
        .parquet(os.path.join(index_dir, "cells"))
    )
    cents.write.mode("overwrite").parquet(os.path.join(index_dir, "codebook"))
    counts = {
        str(r["cell"]): r["n"]
        for r in assigned.groupBy("cell").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    manifest = {"ncells": NCELLS, "nprobe": NPROBE, "cell_rows": counts}
    with open(os.path.join(index_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def query_ivf_index(spark: SparkSession, index_dir: str, sf_dir: str) -> DataFrame:
    """Serve the standard IVF query set from the persisted index; the
    cells scan is partition-pruned to the probed cells only."""
    scored, _cents = _assigned(spark, sf_dir)
    probes = (
        scored.where(F.col("vec_id") < IVF_QUERIES)
        .where(F.col("r") <= NPROBE)
        .select(F.col("vec_id").alias("query_id"), F.col("v").alias("q"), "cell")
    )
    probe_rows = probes.select("query_id", "cell").collect()  # metadata-scale
    probed_cells = sorted({r["cell"] for r in probe_rows})
    cells = spark.read.parquet(os.path.join(index_dir, "cells")).where(
        F.col("cell").isin(probed_cells)  # planning-time partition pruning
    )
    cand = (
        cells.join(
            F.broadcast(probes),
            (cells.cell == probes.cell) & (cells.vec_id != probes.query_id),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            _cos(F.col("q"), F.col("v")).alias("cosine"),
        )
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= IVF_K)
        .select("query_id", "neighbor_id", F.col("rank").cast("bigint").alias("rank"), "cosine")
    )
