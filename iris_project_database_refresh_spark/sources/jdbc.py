"""JDBC partitioned source — the read half of the declared
"JDBC source/sink + DataFrame" approach.

Reference parity: the reference reads its working set back from
PostgreSQL before each refresh cycle (`semantic search/
stage_06_database_upload.py` verify/count reads; `catalog search/
stage4_update_csv.py` master-CSV reload stands in for the same
round-trip). Spark-first shape: `spark.read.jdbc` with explicit
partitioning so the scan runs as N parallel range queries instead of
one connection streaming the whole table — the difference between a
single-connection bottleneck and a cluster-wide parallel ingest at
100 TB. Predicates push additional filters into each partition's
WHERE clause server-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    predicates: list[str] | None = None,
    properties: dict | None = None,
) -> DataFrame:
    """Parallel JDBC read.

    Three modes, mirroring what `spark.read.jdbc` supports:
    * range-partitioned: partition_column + bounds → num_partitions
      non-overlapping range predicates, one connection each;
    * predicate-partitioned: explicit ``predicates`` list, one
      partition per predicate (for non-numeric or skewed keys);
    * single-partition fallback (small dimension tables only).
    """
    properties = dict(properties or {})
    reader = spark.read.options(**properties)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("range partitioning needs lower_bound and upper_bound")
        return reader.jdbc(
            url,
            table,
            column=partition_column,
            lowerBound=lower_bound,
            upperBound=upper_bound,
            numPartitions=num_partitions,
            properties=properties,
        )
    if predicates is not None:
        return reader.jdbc(url, table, predicates=predicates, properties=properties)
    return reader.jdbc(url, table)
