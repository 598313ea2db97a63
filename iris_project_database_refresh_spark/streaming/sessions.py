"""Stateful streaming sessionization (applyInPandasWithState).

The batch `operators/relational.sessionize` computes gap sessions over
history; this is the streaming form the reference's monitor stream
would need: per-user state (open session start/end/count) maintained
across micro-batches, sessions emitted when the 30-min gap closes. Open sessions stay in
state (NoTimeout — a production deployment on a live stream would add
an event-time timeout to flush idle users; with availableNow drains a
processing-time timeout would schedule no-data batches forever).

This is one of the few places Python belongs: per-group custom state
transitions that Catalyst can't express. Data crosses the Arrow
boundary batched per group — not per row.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..operators.relational import SESSION_GAP_MIN

GAP_SECS = SESSION_GAP_MIN * 60

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_id", T.LongType()),
        T.StructField("start_us", T.LongType()),
        T.StructField("end_us", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def _session_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this micro-batch's events into the open session; emit every
    session that closes (gap > GAP_SECS) and keep the last one open."""
    (user_id,) = key
    events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    ts_us = (events["ts"].astype("int64") // 1000).to_numpy()  # ns → µs

    if state.exists:
        sid, s_us, e_us, n = state.get
    else:
        sid, s_us, e_us, n = 0, None, None, 0

    closed = []
    for t in ts_us:
        if s_us is None:
            s_us, e_us, n = int(t), int(t), 1
            continue
        if t - e_us > GAP_SECS * 1_000_000:
            closed.append((sid, s_us, e_us, n))
            sid, s_us, e_us, n = sid + 1, int(t), int(t), 1
        else:
            e_us, n = int(t), n + 1

    state.update((sid, int(s_us), int(e_us), int(n)))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_id": [c[0] for c in closed],
                "session_start": [pd.Timestamp(c[1], unit="us") for c in closed],
                "session_end": [pd.Timestamp(c[2], unit="us") for c in closed],
                "n_events": [c[3] for c in closed],
            }
        )


def streaming_sessionize(events: DataFrame) -> DataFrame:
    """events must carry (user_id, event_id, ts). Emits closed sessions."""
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _session_fn,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
