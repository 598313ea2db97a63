"""Stream-static enrichment: the events stream joined to a static
dimension before the windowed rollup.

The reference joins monitor rows to catalog metadata at query time
(`database-schema.sql:258` process_monitor_logs against the catalog
tables); in a streaming deployment the dimension is joined INTO the
stream. Structured Streaming supports stream-static joins natively:
the static side is planned as a broadcast against every micro-batch,
so no stream state is kept for the join itself — only the windowed
aggregation holds state, bounded by the watermark. (No countDistinct
in the rollup: distinct aggregations aren't supported on streaming
frames — a per-user distinct would be a separate dropDuplicates
stage.)

Scale notes: the dimension (customer → segment) broadcasts per
micro-batch; at 100 TB/day the rollup state stays O(windows-in-
watermark × segments). A slowly-changing dimension would swap in a
Delta/refreshable snapshot — the join shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import WATERMARK, WINDOW, read_events_stream


def _segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )


def enriched_rollup(events: DataFrame, segments: DataFrame) -> DataFrame:
    """Per-window, per-market-segment event rollup over the enriched
    stream. Works for both the streaming and batch frames."""
    return (
        events.withWatermark("ts", WATERMARK)
        .join(F.broadcast(segments), "user_id")
        .groupBy(F.window("ts", WINDOW).alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "c_mktsegment",
            "n_events",
            "sum_value",
        )
    )


def run_enriched_available_now(
    spark: SparkSession, sf_dir: str, *, table: str = "events_enriched"
) -> DataFrame:
    """Drain the events directory with availableNow micro-batches
    through the stream-static join into a memory sink."""
    q = (
        enriched_rollup(read_events_stream(spark, sf_dir), _segments(spark, sf_dir))
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

def events_enriched_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return (
        ev.join(F.broadcast(_segments(spark, sf_dir)), "user_id")
        .groupBy(F.window("ts", WINDOW).alias("w"), "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "c_mktsegment",
            "n_events",
            "sum_value",
        )
    )


EVENTS_ENRICHED_SQL = """
SELECT make_timestamp(((CAST(floor(epoch(ts)) AS BIGINT) // 900) * 900) * 1000000) AS window_start,
       c_mktsegment,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events
JOIN customer ON user_id = c_custkey
GROUP BY 1, 2
"""

QUERIES = {"events_enriched_agg": events_enriched_agg}
ORACLES = {"events_enriched_agg": EVENTS_ENRICHED_SQL}
