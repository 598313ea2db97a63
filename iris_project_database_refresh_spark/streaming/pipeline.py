"""Structured Streaming ingest of the events stream.

The reference's process-monitor table receives a continuous append
stream of stage logs (`database-schema.sql:258` process_monitor_logs);
here the same rollup runs as a Structured Streaming job: file source →
event-time watermark → tumbling-window aggregate. `run_available_now`
drains whatever is in the directory as micro-batches and stops — tests
assert the result equals the batch query bit-for-bit.

Scale: the aggregation state is bounded by (windows in watermark) ×
(event types); watermark eviction keeps it O(recent), which is what
makes this viable on an unbounded 100 TB/day stream.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WINDOW = "15 minutes"
WATERMARK = "30 minutes"

def _events_raw_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """FileStreamSource requires a user-supplied schema; take it from a
    one-off batch footer read so the stream follows whichever physical
    ts type (long nanos / NTZ µs / µs) this corpus generation uses."""
    return spark.read.parquet(os.path.join(sf_dir, "events.parquet")).schema


def _normalize(df: DataFrame) -> DataFrame:
    from ..sources.tables import _normalize_event_ts

    return _normalize_event_ts(df)


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    # FileStreamSource needs a directory basePath; select just the events
    # file(s) with a glob filter (arriving files would match it too).
    return _normalize(
        spark.readStream.schema(_events_raw_schema(spark, sf_dir))
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )


def windowed_rollup(events: DataFrame) -> DataFrame:
    """Tumbling-window per-type rollup with a watermark for late data."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


def run_available_now(spark: SparkSession, sf_dir: str, *, table: str = "events_rollup") -> DataFrame:
    """Drain the directory with availableNow micro-batches into a memory
    sink; returns the final result DataFrame."""
    q = (
        windowed_rollup(read_events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)


# Batch-equivalent exposed through the driver contract (oracle-checked;
# the streaming path is asserted equal to it in tests).

def events_tumbling_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", WINDOW).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


EVENTS_TUMBLING_SQL = """
SELECT make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900) * 1000000) AS window_start,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
GROUP BY 1, 2
"""

QUERIES = {"events_tumbling_agg": events_tumbling_agg}
ORACLES = {"events_tumbling_agg": EVENTS_TUMBLING_SQL}


def hopping_rollup(events: DataFrame) -> DataFrame:
    """Hopping-window twin of `operators/olap.events_hopping_agg`: the
    2 h / 1 h sliding window streamed with a watermark. State is
    (windows in watermark horizon) x (event types) x 2 overlapping
    windows — bounded on an unbounded stream, same eviction contract
    as the tumbling rollup."""
    return (
        events.withWatermark("ts", WATERMARK)
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)")).alias("total_cents"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_cents")
    )


def run_hopping_available_now(
    spark: SparkSession, sf_dir: str, *, table: str = "events_hopping"
) -> DataFrame:
    q = (
        hopping_rollup(read_events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)
