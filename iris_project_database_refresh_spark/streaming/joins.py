"""Stream-stream interval join: purchases matched to the prior views
that led to them, with watermark-bounded join state.

The reference correlates stages of one refresh run across monitor rows
written at different times (`process_monitor_logs` rows per stage,
`database-schema.sql:258`); the streaming generalization is a
stream-stream join — each side buffers rows in state until the
watermark proves no more matches can arrive. This is the one
Structured Streaming join mode the repo's other streaming components
(stream-static enrich, windowed agg, stateful EWMA/sessionize,
watermark dedup) do not cover.

Semantics: every ``purchase`` event joins to each ``view`` by the same
user within the preceding hour (``v.ts <= p.ts <= v.ts + 1h``) — the
attribution-candidate join that `attribution_u_shaped` aggregates.

Scale notes
-----------
* Both sides carry a watermark and the join condition bounds event
  time in both directions, so Spark evicts buffered state past
  ``watermark + 1h`` — state is O(events in the horizon), viable on an
  unbounded stream. Without the time bound the state would grow
  forever; tests pin the bounded shape by asserting the streaming
  result equals the batch join.
* The equi-key is ``user_id``: the shuffle partitions by user, and the
  per-user fan-out is (views in 1h) x (purchases), the same bounded
  window `attribution_u_shaped` reasons about.
* Batch equivalent: one scan of events, split with two filters, then a
  user-key shuffle join with the range residual — no nested loop (the
  equi-key carries the join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .pipeline import WATERMARK, read_events_stream

VIEW_HORIZON = "1 hour"


def _views(events: DataFrame) -> DataFrame:
    return events.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.col("ts").alias("view_ts"),
    )


def _purchases(events: DataFrame) -> DataFrame:
    return events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )


def _joined(views: DataFrame, purchases: DataFrame) -> DataFrame:
    # Both sides can derive from the same batch scan (the streaming path
    # uses two independent readStreams) — alias them so the self-join
    # columns resolve unambiguously.
    v, p = views.alias("v"), purchases.alias("p")
    cond = (
        (F.col("v.user_id") == F.col("p.user_id"))
        & (F.col("p.purchase_ts") >= F.col("v.view_ts"))
        & (F.col("p.purchase_ts") <= F.col("v.view_ts") + F.expr(f"INTERVAL {VIEW_HORIZON}"))
    )
    return v.join(p, cond).select(
        F.col("p.user_id").alias("user_id"),
        "view_id",
        "purchase_id",
        (F.unix_micros("purchase_ts") - F.unix_micros("view_ts")).alias("gap_micros"),
        F.round("purchase_value", 2).alias("purchase_value"),
    )


def run_join_available_now(
    spark: SparkSession, sf_dir: str, *, table: str = "events_vp_join"
) -> DataFrame:
    """Drain the events directory through the stream-stream interval
    join (two watermarked readStream sides) into a memory sink."""
    views = _views(read_events_stream(spark, sf_dir)).withWatermark("view_ts", WATERMARK)
    purchases = _purchases(read_events_stream(spark, sf_dir)).withWatermark(
        "purchase_ts", WATERMARK
    )
    q = (
        _joined(views, purchases)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)


# Batch-equivalent exposed through the driver contract (oracle-checked;
# the streaming path is asserted equal to it in tests).

def events_view_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    return _joined(_views(ev), _purchases(ev))


VIEW_PURCHASE_SQL = """
WITH ev AS (SELECT * REPLACE (date_trunc('microseconds', ts) AS ts) FROM events)
SELECT p.user_id,
       v.event_id AS view_id,
       p.event_id AS purchase_id,
       CAST(epoch_us(p.ts) - epoch_us(v.ts) AS BIGINT) AS gap_micros,
       round(p.value, 2) AS purchase_value
FROM ev v
JOIN ev p
  ON v.user_id = p.user_id
 AND v.event_type = 'view'
 AND p.event_type = 'purchase'
 AND p.ts >= v.ts
 AND p.ts <= v.ts + INTERVAL 1 HOUR
"""

QUERIES = {"events_view_purchase_join": events_view_purchase_join}
ORACLES = {"events_view_purchase_join": VIEW_PURCHASE_SQL}
