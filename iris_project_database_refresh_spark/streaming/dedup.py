"""Streaming deduplication — exactly-once ingest semantics.

The reference's refresh cycle must not double-process a document that
reappears across cycles (`catalog search/stage4_update_csv.py`
delete-then-append keyed on identity). On an unbounded stream the same
guarantee is ``dropDuplicatesWithinWatermark``: duplicate records
arriving within the watermark horizon are suppressed, and state is
evicted past it — bounded memory on an unbounded 100 TB/day stream,
unlike a plain ``dropDuplicates`` whose key state grows forever.

Tests run the stream self-unioned (every record duplicated) with
availableNow and assert the result equals the batch distinct
bit-for-bit; the batch equivalent is exposed through the driver
contract with a DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import WATERMARK, read_events_stream


def dedup_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-unioned events stream (planted duplicates) deduplicated by
    event_id within the watermark."""
    doubled = read_events_stream(spark, sf_dir).union(read_events_stream(spark, sf_dir))
    return doubled.withWatermark("ts", WATERMARK).dropDuplicatesWithinWatermark(["event_id"])


def run_dedup_available_now(
    spark: SparkSession, sf_dir: str, *, table: str = "events_deduped"
) -> DataFrame:
    q = (
        dedup_stream(spark, sf_dir)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)


# Batch equivalent for the driver contract (streaming parity asserted in
# tests/test_streaming_multimodal.py).

def events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return ev.unionAll(ev).dropDuplicates(["event_id"])


EVENTS_DEDUP_SQL = """
WITH events_us AS (
  SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events
),
doubled AS (SELECT * FROM events_us UNION ALL SELECT * FROM events_us)
SELECT DISTINCT * FROM doubled
"""

QUERIES = {"events_dedup": events_dedup}
ORACLES = {"events_dedup": EVENTS_DEDUP_SQL}
