"""Streaming LLM-cost accounting: the monitor_llm_costs rollup run as
a Structured Streaming job over the event stream.

The reference writes monitor rows (with their JSONB ``llm_calls``
array) continuously as stages execute; a live cost dashboard is this
aggregation in complete mode — the from_json → explode → per-(stage,
model) sums of `operators/monitor.monitor_llm_costs`, applied to the
stream. No watermark: the grouping key is not event time, and complete
mode re-emits the whole (stages × models) table — which is bounded —
per micro-batch.

Scale: aggregation state is O(stages × models), independent of stream
length; the planted-call transform is the same narrow JVM expression
chain as the batch path, so streaming == batch bit-for-bit (asserted
in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.monitor import llm_cost_rollup
from .pipeline import read_events_stream


def run_llm_costs_available_now(
    spark: SparkSession, sf_dir: str, *, table: str = "llm_costs_stream"
) -> DataFrame:
    q = (
        llm_cost_rollup(read_events_stream(spark, sf_dir))
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)
