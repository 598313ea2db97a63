"""Streaming distribution-drift monitor: the `quantile_drift_psi`
binning run live over the event stream.

Deployment shape: the REFERENCE window's decile edges are frozen
batch-side (the production convention — bins are fixed at baseline
time, exactly what `operators/monitor.quantile_drift_psi` computes for
its reference half), broadcast into the stream as a static dimension,
and the stream maintains the CURRENT window's per-(type, bin) counts —
a complete-mode aggregation whose state is O(types x bins) regardless
of stream length.  A dashboard (or the batch PSI scorer, which shares
the same bin convention) reads the table and scores PSI per refresh
tick.

Scale: stream-static broadcast join (no stream-side shuffle for the
edge lookup), bounded aggregation state, and the same integer-grid bin
assignment as the batch operator so streaming == batch bit-for-bit
(asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.monitor import PSI_BINS
from ..sources.tables import load_table
from .pipeline import read_events_stream


def freeze_baseline(spark: SparkSession, sf_dir: str) -> tuple[int, DataFrame]:
    """(mid_ts_us, per-type decile edges of the reference half) — the
    batch-side baseline freeze, same arithmetic as quantile_drift_psi."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v_c"),
    )
    mid = ev.agg(F.expr("(min(ts_us) + max(ts_us)) div 2").alias("mid")).collect()[0][
        "mid"
    ]
    qs = ", ".join(str(i / PSI_BINS) for i in range(1, PSI_BINS))
    edges = (
        ev.where(F.col("ts_us") <= mid)
        .groupBy("event_type")
        .agg(
            F.expr(
                f"transform(percentile(v_c, array({qs})),"
                " e -> CAST(floor(e * 1000 + 0.5) AS BIGINT))"
            ).alias("edges")
        )
    )
    return int(mid), edges


def drift_bin_counts(events: DataFrame, edges: DataFrame, mid: int) -> DataFrame:
    """Per-(type, bin) counts of the CURRENT window (ts > mid) with the
    frozen edges — works on a streaming or static events frame."""
    cur = events.select(
        "event_type",
        F.unix_micros("ts").alias("ts_us"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("v_c"),
    ).where(F.col("ts_us") > F.lit(mid))
    binned = cur.join(F.broadcast(edges), "event_type").select(
        "event_type",
        F.size(F.filter("edges", lambda e: e < F.col("v_c") * 1000)).alias("bin"),
    )
    return binned.groupBy("event_type", "bin").agg(F.count(F.lit(1)).alias("n"))


def run_drift_monitor_available_now(
    spark: SparkSession, sf_dir: str, *, table: str = "drift_monitor_stream"
) -> DataFrame:
    mid, edges = freeze_baseline(spark, sf_dir)
    q = (
        drift_bin_counts(read_events_stream(spark, sf_dir), edges, mid)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)
