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
