"""Stateful streaming EWMA (applyInPandasWithState).

The streaming form of `operators/timeseries.events_ewma`: the batch
operator folds each user's full history in one array expression; on an
unbounded stream the fold state is exactly one number per user — the
previous smoothed value — carried across micro-batches here. Each
batch folds its (sorted) new events into the state and emits the
user's updated smoothed value; tests assert the availableNow drain
reproduces the batch operator's final EWMA per user bit-for-bit.

Python is justified for the same reason as the sessionizer: a custom
per-group state transition Catalyst can't express across batches;
data crosses the Arrow boundary batched per group, and state is O(1)
per user (vs the sessionizer's open-session struct).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..operators.timeseries import ALPHA

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("last_ts", T.TimestampType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_events", T.LongType()),
        T.StructField("last_us", T.LongType()),
        T.StructField("ewma", T.DoubleType()),
    ]
)


def _ewma_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    ts_us = (events["ts"].astype("int64") // 1000).to_numpy()  # ns -> µs
    vals = events["value"].to_numpy()

    if state.exists:
        n, last_us, e = state.get
    else:
        n, last_us, e = 0, None, None

    for t, v in zip(ts_us, vals):
        # identical op order to the batch fold: e*(1-a) + a*v
        e = float(v) if e is None else e * (1 - ALPHA) + ALPHA * float(v)
        n += 1
        last_us = int(t)

    state.update((int(n), int(last_us), float(e)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "last_ts": [pd.Timestamp(last_us, unit="us")],
            "ewma": [e],
        }
    )


def streaming_ewma(events: DataFrame) -> DataFrame:
    """events must carry (user_id, event_id, ts, value). Emits the
    updated per-user smoothed value once per micro-batch."""
    return events.groupBy("user_id").applyInPandasWithState(
        _ewma_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
