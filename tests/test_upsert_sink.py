from __future__ import annotations

import pyspark.sql.functions as F

from iris_project_database_refresh_spark.streaming import pipeline as sp
from iris_project_database_refresh_spark.streaming.upsert_sink import (
    ParquetUpsertTable,
    start_streaming_upsert,
)
from iris_project_database_refresh_spark.sources.tables import load_table

from .conftest import SF_CORRECT


def test_streaming_upsert_matches_batch_rollup(spark, tmp_path):
    table = ParquetUpsertTable(spark, str(tmp_path / "rollup"), key="user_id")
    q = start_streaming_upsert(
        sp.read_events_stream(spark, SF_CORRECT),
        table,
        checkpoint=str(tmp_path / "ckpt"),
    )
    q.awaitTermination()
    got = {r.user_id: (r.n_events, r.sum_value) for r in table.read().collect()}
    want = {
        r.user_id: (r.n_events, r.sum_value)
        for r in load_table(spark, SF_CORRECT, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .collect()
    }
    assert got == want


def test_merge_replaces_keys(spark, tmp_path):
    table = ParquetUpsertTable(spark, str(tmp_path / "t"), key="k")
    table.merge(spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string"))
    table.merge(spark.createDataFrame([(2, "B"), (3, "c")], "k int, v string"))
    got = {r.k: r.v for r in table.read().collect()}
    assert got == {1: "a", 2: "B", 3: "c"}
