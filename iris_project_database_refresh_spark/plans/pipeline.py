"""End-to-end refresh pipeline + stage monitoring.

`run_refresh` chains the reference's full cycle in one call —
delta detect → structure (sections/chunks) → embed → merge catalog →
validate → export — writing each stage's output as parquet, with a
process-monitor log in the exact spirit of the reference's
`process_monitor_logs` table (`database-schema.sql:258-280`: run_uuid,
stage_name, start/end, duration_ms, status, decision_details).

Each stage is a lazy DataFrame plan; the only actions are the stage
writes, so Catalyst optimizes within stages and nothing is collected
to the driver. At cluster scale the same code runs unchanged — outputs
become table locations and the monitor log lands in the warehouse.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

from ..operators import catalog, chunking, embeddings
from ..sinks.csv_export import export_chunks_csv  # noqa: F401  (re-export for users)
from ..sinks.deployment import generate_deployment_metadata, write_deployment_metadata


class StageMonitor:
    """Collects per-stage timing rows shaped like process_monitor_logs."""

    def __init__(self, model_name: str = "iris-spark") -> None:
        self.run_uuid = str(uuid.uuid4())
        self.model_name = model_name
        self.rows: list[tuple] = []

    def run(self, stage_name: str, fn, *args, **kwargs):
        start = time.time()
        status, detail = "Success", ""
        try:
            out = fn(*args, **kwargs)
            return out
        except Exception as e:  # noqa: BLE001 — reference logs and re-raises
            status, detail = "Failure", str(e)[:500]
            raise
        finally:
            end = time.time()
            self.rows.append(
                (
                    self.run_uuid,
                    self.model_name,
                    stage_name,
                    int((end - start) * 1000),
                    status,
                    detail,
                )
            )

    def to_df(self, spark: SparkSession) -> DataFrame:
        return spark.createDataFrame(
            self.rows,
            "run_uuid string, model_name string, stage_name string, "
            "duration_ms long, status string, decision_details string",
        )


def run_refresh(spark: SparkSession, sf_dir: str, out_dir: str) -> dict[str, int]:
    """One full refresh cycle; returns row counts per stage output."""
    mon = StageMonitor()
    counts: dict[str, int] = {}

    def write(name: str, df: DataFrame) -> None:
        path = os.path.join(out_dir, name)
        df.write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()

    mon.run("delta_detection", write, "delta", catalog.catalog_delta(spark, sf_dir))
    mon.run("section_processing", write, "sections", chunking.section_split(spark, sf_dir))
    mon.run("content_chunking", write, "chunks", chunking.chunk_documents(spark, sf_dir))
    mon.run("embedding_generation", write, "embeddings", embeddings.embed_feature_hash(spark, sf_dir))
    mon.run("catalog_merge", write, "master", catalog.catalog_merge(spark, sf_dir))
    mon.run("validation", write, "validation", catalog.catalog_validate(spark, sf_dir))
    mon.run("monitor_flush", write, "monitor_logs", mon.to_df(spark))

    # IT-handoff manifest next to the stage outputs
    # (`stage5_output_final_csv.py:431` generate_deployment_metadata).
    meta = generate_deployment_metadata(
        spark.read.parquet(os.path.join(out_dir, "master")),
        spark.read.parquet(os.path.join(out_dir, "chunks")),
        catalog_file="master",
        content_file="chunks",
    )
    meta["file_info"]["stage_outputs"] = counts
    write_deployment_metadata(meta, out_dir)
    return counts
