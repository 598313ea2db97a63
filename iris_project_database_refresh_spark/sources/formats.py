"""CSV / JSON(-lines) interchange for any engine table.

The reference moves everything through CSV master files and JSON stage
artifacts (`catalog search/stage1_extract_csv.py:186` write_json_to_nas,
`:292` write_csv_to_nas). Spark-first equivalents: distributed writes of
the same shapes with schema-pinned reads back (schema inference at
100 TB is both slow and wrong — always re-read with the writer's
schema).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", True).csv(path)


def read_csv(spark: SparkSession, path: str, schema) -> DataFrame:
    """`schema`: StructType (e.g. the writer's ``df.schema``) or DDL str."""
    return spark.read.option("header", True).schema(schema).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").json(path)


def read_jsonl(spark: SparkSession, path: str, schema) -> DataFrame:
    return spark.read.schema(schema).json(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC interchange — the columnar alternative to parquet that ships
    in Spark's builtin catalog (no external package). Same pushdown and
    column-pruning behavior; useful when the downstream warehouse is
    Hive/Trino-flavored."""
    df.write.mode("overwrite").orc(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    # ORC files embed their schema; no pinning needed on re-read.
    return spark.read.orc(path)


def read_csv_quarantine(spark: SparkSession, path: str, schema) -> tuple[DataFrame, DataFrame]:
    """Tolerant CSV ingest with a malformed-row quarantine — the
    operational posture a 100 TB refresh needs (one torn row must not
    kill the job, and must not vanish silently either; the reference's
    stage1/stage5 read whole CSVs with pandas and would throw).

    PERMISSIVE mode parses what it can; rows that do not fit the
    schema land intact in ``_corrupt_record``. Returns
    (clean_rows, quarantined_raw_lines) — the caller ships the
    quarantine to the monitor log like any other stage metric. The
    corrupt column must be materialized via a persisted projection
    before filtering (Spark requires referencing it from a cached or
    re-read plan, not the original lazy scan).
    """
    from pyspark.sql import types as T

    full = T.StructType(list(schema.fields) + [T.StructField("_corrupt_record", T.StringType())])
    raw = (
        spark.read.schema(full)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
        .cache()  # required: corrupt-record queries must not re-derive from the raw scan
    )
    clean = raw.where(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    quarantined = raw.where(F.col("_corrupt_record").isNotNull()).select("_corrupt_record")
    return clean, quarantined
