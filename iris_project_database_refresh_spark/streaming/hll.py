"""Stateful streaming HyperLogLog — distinct-user sketch per event type.

The streaming twin of ``operators/sketches.approx_distinct_hll``: the
batch operator's registers are per-bucket maxima of the rho rank, and
max() is both idempotent and order-free, so the SAME sketch accretes
incrementally on a live stream with m = 64 ints of state per key —
the canonical "mergeable sketch as stream state" deployment (register
state is what a 1000-executor topology actually checkpoints; unioning
days/streams is elementwise max).  After an availableNow drain the
registers — and therefore the estimate, computed with the batch
operator's exact integer-denominator arithmetic — equal the batch
result bit-for-bit; the parity test pins that.

Like the other applyInPandasWithState seams, a legitimate Python
stage: per-group register-merge with data-dependent state, Arrow-
batched per group.  The per-row md5 replicates
``functions.text.md5_int32`` so stream and batch hash identically.
"""

from __future__ import annotations

import hashlib
import math
from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.sketches import _HLL_NUM, _HLL_RESTBITS, HLL_M

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("n_regs", T.LongType()),
        T.StructField("hll_est", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("regs", T.ArrayType(T.LongType())),  # m registers, 0 = empty
        T.StructField("n_events", T.LongType()),
    ]
)


def _rho_bucket(user_id: int) -> tuple[int, int]:
    """(bucket, rho) exactly as the batch operator derives them: first
    8 md5 hex digits -> 32-bit h; bucket = h % m; rho over the 26-bit
    rest (27 when the rest is all zeros)."""
    h = int(hashlib.md5(str(user_id).encode()).hexdigest()[:8], 16)
    rest = h // HLL_M
    rho = _HLL_RESTBITS + 1 if rest == 0 else _HLL_RESTBITS + 1 - rest.bit_length()
    return h % HLL_M, rho


def estimate(regs: list[int]) -> float:
    """The batch operator's exact integer-denominator estimator.

    Rounding is HALF_UP via floor(x*100 + 0.5)/100 — Python's round()
    is banker's (HALF_EVEN), while the batch operator's F.round and the
    DuckDB oracle's round() are HALF_UP, so a quotient landing exactly
    on a half-cent boundary would break bit-for-bit parity (r6 ADVICE)."""
    denom = sum(1 << (30 - r) for r in regs if r > 0) + sum(
        1 << 30 for r in regs if r == 0
    )
    return math.floor(_HLL_NUM / denom * 100 + 0.5) / 100


def _hll_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (event_type,) = key
    events = pd.concat(list(pdfs))

    if state.exists:
        regs, n_events = state.get
        regs = list(regs)
    else:
        regs, n_events = [0] * HLL_M, 0

    for u in events["user_id"].to_numpy():
        bucket, rho = _rho_bucket(int(u))
        if rho > regs[bucket]:
            regs[bucket] = rho
        n_events += 1

    state.update(([int(r) for r in regs], int(n_events)))
    yield pd.DataFrame(
        {
            "event_type": [event_type],
            "n_regs": [sum(1 for r in regs if r > 0)],
            "hll_est": [estimate(regs)],
            "n_events": [n_events],
        }
    )


def streaming_hll(events: DataFrame) -> DataFrame:
    """events must carry (event_type, user_id).  Emits the current
    sketch estimate per type each micro-batch (update mode)."""
    return events.groupBy("event_type").applyInPandasWithState(
        _hll_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_hll_available_now(
    spark: SparkSession, sf_dir: str, table: str = "hll_stream_test"
) -> DataFrame:
    """Drain the events directory with availableNow and return the
    FINAL sketch row per event type (the one with the highest
    n_events — update mode re-emits per micro-batch)."""
    from .pipeline import read_events_stream

    stream = read_events_stream(spark, sf_dir).select("event_type", "user_id")
    q = (
        streaming_hll(stream)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = spark.table(table)
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy("event_type").orderBy(F.desc("n_events"))
    return (
        out.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )
