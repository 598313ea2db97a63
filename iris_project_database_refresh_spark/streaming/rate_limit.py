"""Stateful streaming token-bucket rate limiter (applyInPandasWithState).

The streaming twin of ``operators/timeseries.events_rate_limit_sim``
(same constants, same integer arithmetic): per-user bucket state
(last event time, tokens, allowed count) carried across micro-batches,
admission decided per event in event order. This is the deployment
form of the batch replay — the batch operator SIZES the limits from
history; this enforces them on the live stream with bounded per-key
state (four integers per user, regardless of stream length).

Like the sessionizer, this is one of the few legitimate Python seams:
a per-group state transition Catalyst can't express, Arrow-batched per
group. Tests drain the stream with availableNow and assert the final
per-user summaries equal the batch operator bit-for-bit.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.timeseries import TB_CAP, TB_REFILL_US

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("n_allowed", T.LongType()),
        T.StructField("n_rejected", T.LongType()),
        T.StructField("final_tokens", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("prev_t", T.LongType()),
        T.StructField("tok", T.LongType()),
        T.StructField("allowed", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _rate_limit_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this micro-batch's events (event-time order) into the
    bucket; emit the cumulative per-user summary after each batch."""
    (user_id,) = key
    events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    ts_us = (events["ts"].astype("int64") // 1000).to_numpy()  # ns -> µs

    if state.exists:
        prev_t, tok, allowed, n_events = state.get
    else:
        prev_t, tok, allowed, n_events = None, None, 0, 0

    for t in ts_us:
        t = int(t)
        if prev_t is None:
            # first event ever: bucket starts full, always admitted
            prev_t, tok, allowed, n_events = t, TB_CAP - 1, 1, 1
            continue
        avail = min(TB_CAP, tok + (t - prev_t) // TB_REFILL_US)
        ok = 1 if avail >= 1 else 0
        prev_t, tok = t, avail - ok
        allowed += ok
        n_events += 1

    state.update((int(prev_t), int(tok), int(allowed), int(n_events)))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n_events],
            "n_allowed": [allowed],
            "n_rejected": [n_events - allowed],
            "final_tokens": [tok],
        }
    )


def streaming_rate_limit(events: DataFrame) -> DataFrame:
    """events must carry (user_id, event_id, ts). Emits the cumulative
    per-user admission summary each micro-batch (update mode)."""
    return events.groupBy("user_id").applyInPandasWithState(
        _rate_limit_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
