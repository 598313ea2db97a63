from __future__ import annotations

import os

from pyspark.sql import functions as F

from iris_project_database_refresh_spark.functions.text import md5_int32
from iris_project_database_refresh_spark.sinks import shards
from iris_project_database_refresh_spark.sources.tables import load_table

from .conftest import SF_SMOKE

N_SHARDS = 8


def test_write_sharded_roundtrip(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    path = str(tmp_path / "docs_sharded")
    manifest = shards.write_sharded(docs, path, "doc_id", N_SHARDS, sort_cols=["doc_id"])

    assert manifest.total_rows == docs.count()
    # one directory per shard
    dirs = sorted(d for d in os.listdir(path) if d.startswith(f"{shards.SHARD_COL}="))
    assert len(dirs) == N_SHARDS

    # every row is in the shard its key hashes to
    back = spark.read.parquet(path)
    misplaced = back.where(
        F.col(shards.SHARD_COL)
        != F.pmod(md5_int32(F.col("doc_id").cast("string")), F.lit(N_SHARDS)).cast("int")
    ).count()
    assert misplaced == 0

    # manifest counts match the data
    mrows = spark.read.parquet(f"{path}_manifest").collect()
    assert sum(r["n_rows"] for r in mrows) == manifest.total_rows
    by_shard = {r[shards.SHARD_COL]: r["n_rows"] for r in mrows}
    actual = {
        r[shards.SHARD_COL]: r["cnt"]
        for r in back.groupBy(shards.SHARD_COL).agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    assert by_shard == actual


def test_read_shard_prunes_partitions(spark, tmp_path):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "text")
    path = str(tmp_path / "docs_pruned")
    shards.write_sharded(docs, path, "doc_id", N_SHARDS)

    one = shards.read_shard(spark, path, 3)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(shard" in plan or "shard#" in plan
    # the scan reads only the matching shard
    expected = (
        spark.read.parquet(path).where(F.col(shards.SHARD_COL) == 3).count()
    )
    assert one.count() == expected > 0


def test_shard_assignment_is_stable(spark):
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id")
    a = {
        r["doc_id"]: r[shards.SHARD_COL]
        for r in shards.assign_shard(docs, "doc_id", N_SHARDS).collect()
    }
    b = {
        r["doc_id"]: r[shards.SHARD_COL]
        for r in shards.assign_shard(docs, "doc_id", N_SHARDS).collect()
    }
    assert a == b
    assert set(a.values()) <= set(range(N_SHARDS))
