from __future__ import annotations

import pyspark.sql.functions as F

from iris_project_database_refresh_spark.plans.pipeline import run_refresh
from iris_project_database_refresh_spark.sources.formats import (
    read_csv,
    read_jsonl,
    write_csv,
    write_jsonl,
)
from iris_project_database_refresh_spark.sources.tables import load_table

from .conftest import SF_CORRECT


def test_full_refresh_pipeline(spark, tmp_path):
    out = str(tmp_path / "refresh")
    counts = run_refresh(spark, SF_CORRECT, out)
    assert counts["delta"] == 530
    assert counts["master"] == 500
    assert counts["chunks"] > 500
    assert counts["validation"] == 20
    # monitor log: one Success row per stage before the flush
    logs = spark.read.parquet(out + "/monitor_logs")
    rows = logs.collect()
    assert {r.stage_name for r in rows} == {
        "delta_detection",
        "section_processing",
        "content_chunking",
        "embedding_generation",
        "catalog_merge",
        "validation",
    }
    assert all(r.status == "Success" and r.duration_ms >= 0 for r in rows)
    assert len({r.run_uuid for r in rows}) == 1

    # deployment manifest: written next to the outputs, counts/schema
    # match the data it describes, delete statement covers every source
    import glob
    import json

    manifests = glob.glob(out + "/deployment_metadata_*.json")
    assert len(manifests) == 1
    meta = json.load(open(manifests[0]))
    master = spark.read.parquet(out + "/master")
    chunks = spark.read.parquet(out + "/chunks")
    assert meta["file_info"]["catalog_records"] == master.count() == counts["master"]
    assert meta["file_info"]["content_records"] == chunks.count() == counts["chunks"]
    assert meta["schema_info"]["catalog_columns"] == master.columns
    assert meta["schema_info"]["content_columns"] == chunks.columns
    assert meta["file_info"]["stage_outputs"] == counts
    srcs = meta["deployment_info"]["document_sources"]
    for s in srcs:
        assert f"'{s}'" in meta["instructions"]["delete_query"]
    # hash is content-determined: recomputing over the written parquet agrees
    from iris_project_database_refresh_spark.sinks.deployment import (
        dataframe_content_hash,
    )

    assert meta["file_info"]["catalog_hash"] == dataframe_content_hash(master)
    # and order-insensitive: a shuffled frame hashes identically
    assert dataframe_content_hash(master.orderBy(F.rand(7))) == meta["file_info"]["catalog_hash"]


def test_csv_json_roundtrip(spark, tmp_path):
    df = load_table(spark, SF_CORRECT, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    csv_path, json_path = str(tmp_path / "c.csv"), str(tmp_path / "c.jsonl")
    write_csv(df, csv_path)
    write_jsonl(df, json_path)
    back_csv = read_csv(spark, csv_path, df.schema)
    back_json = read_jsonl(spark, json_path, df.schema)
    assert back_csv.schema == df.schema
    assert back_json.schema == df.schema
    assert back_csv.count() == df.count() == back_json.count()
    want = df.agg(F.round(F.sum("c_acctbal"), 2)).first()[0]
    assert back_csv.agg(F.round(F.sum("c_acctbal"), 2)).first()[0] == want
    assert back_json.agg(F.round(F.sum("c_acctbal"), 2)).first()[0] == want


def test_orc_roundtrip_with_pushdown(spark, tmp_path):
    from iris_project_database_refresh_spark.sources.formats import read_orc, write_orc

    df = load_table(spark, SF_CORRECT, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    path = str(tmp_path / "c.orc")
    write_orc(df, path)
    back = read_orc(spark, path)
    assert back.schema == df.schema
    assert back.count() == df.count()
    want = df.agg(F.round(F.sum("c_acctbal"), 2)).first()[0]
    assert back.agg(F.round(F.sum("c_acctbal"), 2)).first()[0] == want
    # predicate pushdown reaches the ORC scan, as with parquet
    plan = (
        back.where(F.col("c_custkey") == 42)._jdf.queryExecution().executedPlan().toString()
    )
    assert "PushedFilters: [" in plan and "c_custkey" in plan.split("PushedFilters")[1][:120]


def test_registry_is_complete():
    """A broken transitive import must not silently shrink the
    correctness surface: every expected query name is registered and
    every oracle belongs to a registered query."""
    from iris_project_database_refresh_spark.plans import ORACLES, QUERIES

    assert len(QUERIES) >= 439, sorted(QUERIES)
    assert set(ORACLES) <= set(QUERIES)
