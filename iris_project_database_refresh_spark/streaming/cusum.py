"""Stateful streaming CUSUM drift alarm (applyInPandasWithState).

The streaming form of `operators/timeseries.events_cusum_alarm`: the
batch operator folds each type's full daily series against its mean;
live, the target is FROZEN from a reference window batch-side and
broadcast-joined onto the stream (the drift_monitor pattern — a
changing target would make old alarms unreproducible), and the CUSUM
recursion s := max(0, s + x_day - target) runs as per-type state.

Day grain on an unbounded stream means a day's total is only known
once a later day's first event arrives — state carries the OPEN day's
partial sum and the cusum through the last CLOSED day, exactly like
the sessionizer's open-session struct; each micro-batch closes any
days its events step past and emits the closed days that alarm.  The
final day stays open until a later event closes it (standard
watermark-style completeness lag; the parity test compares against
the batch operator on all closed days).  A cross-batch straggler —
an event whose day precedes the already-open day — can no longer be
folded into any day's sum once its own day closed: it is dropped and
counted in state (``n_late``), the same accounting a watermark would
apply, so closed-day totals stay batch-identical and disorder beyond
the completeness lag is observable rather than silently folded in.

Python is justified as in the EWMA/sessionizer twins: a cross-batch
per-group state transition Catalyst cannot express; state is O(1) per
event type.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.timeseries import CUSUM_H_DIV

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("day", T.DateType()),
        T.StructField("x", T.LongType()),
        T.StructField("cusum", T.LongType()),
        T.StructField("alarm", T.BooleanType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("s", T.LongType()),
        T.StructField("open_day", T.LongType()),  # days since epoch
        T.StructField("open_sum", T.LongType()),
        # cross-batch stragglers (event day < the already-open day)
        # are DROPPED and counted here, never folded into the wrong
        # day's sum — the closed-day series stays batch-identical on
        # event-time-ordered input, and disorder is observable instead
        # of silently misattributed:
        T.StructField("n_late", T.LongType()),
    ]
)


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // b
    return q if (a >= 0) == (b >= 0) else -q


def _cusum_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    event_type, target = key[0], int(key[1])
    import numpy as np

    events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    days = (events["ts"].astype("int64") // (86_400 * 10**9)).to_numpy()
    # identical rounding to the batch fold: floor(value*100 + 0.5) on doubles
    cents = np.floor(events["value"].to_numpy() * 100 + 0.5).astype("int64")

    if state.exists:
        # NOTE: n_late was added to STATE_SCHEMA after the first
        # release. A restart from a pre-change checkpoint does NOT
        # reach this code — Spark's StateSchemaCompatibilityChecker
        # rejects the query at start-up when the state schema gained a
        # field (and even with stateStore.stateSchemaCheck=false the
        # old UnsafeRow layout is not readable under the widened
        # schema), so schema evolution requires a fresh checkpoint.
        # No legacy-tuple padding here: it would be unreachable.
        s, open_day, open_sum, n_late = state.get
        n_late = n_late if n_late is not None else 0
    else:
        s, open_day, open_sum, n_late = 0, None, 0, 0

    out = []
    thr = _tdiv(target, CUSUM_H_DIV)
    for d, c in zip(days, cents):
        d = int(d)
        if open_day is None:
            open_day, open_sum = d, 0
        elif d < open_day:
            # arrived after its day already closed (or after a later
            # day opened) in an earlier micro-batch: drop + count
            n_late += 1
            continue
        elif d > open_day:
            s = max(0, s + (open_sum - target))
            if s > thr:
                out.append((event_type, open_day, open_sum, s, True))
            open_day, open_sum = d, 0
        open_sum += int(c)

    state.update(
        (
            int(s),
            int(open_day) if open_day is not None else None,
            int(open_sum),
            int(n_late),
        )
    )
    yield pd.DataFrame(
        [
            {
                "event_type": et,
                "day": pd.Timestamp(dd, unit="D").date(),
                "x": x,
                "cusum": cs,
                "alarm": al,
            }
            for et, dd, x, cs, al in out
        ],
        columns=[f.name for f in OUTPUT_SCHEMA.fields],
    )


def streaming_cusum(events: DataFrame, targets: DataFrame) -> DataFrame:
    """events: streaming (event_type, event_id, ts, value); targets: a
    STATIC frozen (event_type, target) frame (cents/day reference mean)
    broadcast-joined per micro-batch.  Emits closed days that alarm."""
    enriched = events.join(F.broadcast(targets), "event_type").select(
        "event_type", "target", "event_id", "ts", "value"
    )
    return enriched.groupBy("event_type", "target").applyInPandasWithState(
        _cusum_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
