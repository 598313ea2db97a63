"""JDBC staged-upsert sink.

Reference parity: `semantic search/stage_06_database_upload.py:161`
upload_csv_with_staging — (1) write batch to a staging table, (2)
DELETE target rows whose key appears in staging, (3) INSERT … SELECT
from staging with type casts, (4) verify counts; and :529
clear_entire_table for full-refresh mode.

Spark-first shape: the batch DataFrame is written with the built-in
JDBC writer (parallel partitioned INSERTs); only the tiny
DELETE/INSERT-SELECT/count statements run through a single driver-side
connection, exactly like the reference's psycopg2 control flow. At
100 TB the heavy lifting (shuffling/serializing rows) stays on
executors.

No database exists in the test container, so the connector is
constructor-gated; semantics are covered by `refresh_upsert` in
operators/catalog.py (same delete-then-insert algebra on DataFrames)
and unit tests exercise SQL generation only.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame


@dataclass
class JdbcUpsertSink:
    url: str
    table: str
    key_columns: tuple[str, ...]
    properties: dict = field(default_factory=dict)
    staging_table: str | None = None

    def __post_init__(self) -> None:
        if not self.key_columns:
            raise ValueError("key_columns must be non-empty")
        if self.staging_table is None:
            self.staging_table = f"{self.table}_staging"

    # --- SQL the control connection runs (unit-testable without a DB) ---

    def delete_sql(self) -> str:
        keys = ", ".join(self.key_columns)
        return (
            f"DELETE FROM {self.table} WHERE ({keys}) IN "
            f"(SELECT {keys} FROM {self.staging_table})"
        )

    def insert_sql(self, columns: list[str]) -> str:
        cols = ", ".join(columns)
        return f"INSERT INTO {self.table} ({cols}) SELECT {cols} FROM {self.staging_table}"

    def verify_sql(self) -> str:
        return f"SELECT count(*) FROM {self.table}"

    def truncate_sql(self) -> str:
        # stage_06 clear_entire_table (full-refresh mode)
        return f"TRUNCATE TABLE {self.table}"

    # --- execution ---

    def write(self, batch: DataFrame, *, mode: str = "upsert", num_partitions: int = 8) -> None:
        """Stage the batch via Spark's JDBC writer, then merge.

        mode='upsert' → delete-matching + insert; mode='full_refresh' →
        truncate + insert (stage_06 --full-refresh).
        """
        (
            batch.repartition(num_partitions)
            .write.mode("overwrite")
            .options(**self.properties)
            .jdbc(self.url, self.staging_table)
        )
        import json

        stmts = [self.truncate_sql()] if mode == "full_refresh" else [self.delete_sql()]
        stmts.append(self.insert_sql(batch.columns))
        # Run the merge statements over one driver connection via the JVM
        # DriverManager (same place Spark's JDBC writer gets connections).
        spark = batch.sparkSession
        jvm = spark._jvm
        props = jvm.java.util.Properties()
        for k, v in self.properties.items():
            props.setProperty(k, v)
        conn = jvm.java.sql.DriverManager.getConnection(self.url, props)
        try:
            st = conn.createStatement()
            for s in stmts:
                st.execute(s)
            rs = st.executeQuery(self.verify_sql())
            rs.next()
            count = rs.getLong(1)
            spark.sparkContext.setLocalProperty(
                "iris.upsert.last_verify", json.dumps({"table": self.table, "rows": count})
            )
        finally:
            conn.close()
