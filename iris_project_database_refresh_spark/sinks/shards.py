"""Deterministic hash-sharded parquet writer with a shard manifest.

The reference refresh pipeline writes its outputs as monolithic master
CSVs (`catalog search/stage4_update_csv.py`, `semantic
search/stage_05_csv_export.py` — single files appended on one node); a
100 TB training-data pipeline instead needs a sharded layout that
downstream loaders can address individually and reproducibly. This sink
provides:

- **deterministic placement**: shard = md5-hash(key) mod n_shards, so
  the same key lands in the same shard across runs and engines (md5,
  not murmur3, for the same oracle-reproducibility reason as the dedup
  signatures — `functions/text.py:md5_int32`);
- **one task per shard**: ``repartition(n_shards, shard)`` makes each
  output file a single whole shard — no tiny-file explosion, and the
  write parallelism is exactly ``n_shards`` (pick shards ~ desired
  file size, e.g. 100 TB / 1 GB ≈ 100k shards);
- **in-shard ordering**: optional ``sortWithinPartitions`` so loaders
  that stream a shard sequentially see a deterministic order — a
  map-side sort, no extra shuffle beyond the shard exchange;
- **a manifest**: per-shard row counts and key ranges, written next to
  the data — the loader's unit of work assignment and the cheap
  integrity check (count per shard without scanning data files).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import md5_int32

SHARD_COL = "shard"


@dataclass(frozen=True)
class ShardManifest:
    path: str
    n_shards: int
    total_rows: int


def assign_shard(df: DataFrame, key_col: str, n_shards: int) -> DataFrame:
    """Add the deterministic shard id column (md5(key) mod n_shards)."""
    return df.withColumn(
        SHARD_COL, F.pmod(md5_int32(F.col(key_col).cast("string")), F.lit(n_shards)).cast("int")
    )


def write_sharded(
    df: DataFrame,
    path: str,
    key_col: str,
    n_shards: int,
    sort_cols: list[str] | None = None,
) -> ShardManifest:
    """Write ``df`` as ``n_shards`` hash-addressed parquet shards under
    ``path`` plus a ``_manifest`` parquet with per-shard stats.

    One shuffle (the shard exchange); the optional sort is within
    partitions only. The manifest is computed from the same sharded
    frame, so its counts describe exactly what was written.
    """
    sharded = assign_shard(df, key_col, n_shards).repartition(n_shards, F.col(SHARD_COL))
    if sort_cols:
        sharded = sharded.sortWithinPartitions(SHARD_COL, *sort_cols)
    sharded.write.mode("overwrite").partitionBy(SHARD_COL).parquet(path)

    spark = df.sparkSession
    written = spark.read.parquet(path)
    manifest = (
        written.groupBy(SHARD_COL)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min(F.col(key_col).cast("string")).alias("min_key"),
            F.max(F.col(key_col).cast("string")).alias("max_key"),
        )
        .orderBy(SHARD_COL)
    )
    manifest.coalesce(1).write.mode("overwrite").parquet(f"{path}_manifest")
    total = written.count()
    return ShardManifest(path=path, n_shards=n_shards, total_rows=total)


def read_shard(spark, path: str, shard: int) -> DataFrame:
    """Read a single shard by id — partition pruning keeps the scan to
    that shard's directory only (`.explain` shows PartitionFilters)."""
    return spark.read.parquet(path).where(F.col(SHARD_COL) == shard)
