"""Stateful streaming Holt-Winters (applyInPandasWithState).

The streaming form of `operators/timeseries.events_holt_winters`: the
batch operator folds each type's daily series with VECTOR state (level,
trend, 7-slot seasonal ring, 7-slot raw ring); live, that exact state
carries across micro-batches — the first streaming twin here with
array-valued state.  Day grain means the open day's partial count
rides the state like the streaming-CUSUM twin; a stepped-past day
closes, runs the integer HW update, and emits the refreshed
level/trend/season row.

Python justified as in the EWMA/CUSUM twins: a cross-batch per-group
transition Catalyst cannot express; state is O(period) per event type.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.timeseries import HW_PERIOD

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("days_closed", T.LongType()),
        T.StructField("level_milli", T.LongType()),
        T.StructField("trend_milli", T.LongType()),
        T.StructField("season_csv", T.StringType()),
        T.StructField("hw_sae_milli", T.LongType()),
        T.StructField("snaive_sae_milli", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("warm", T.ArrayType(T.LongType())),  # first-week buffer
        T.StructField("l", T.LongType()),
        T.StructField("b", T.LongType()),
        T.StructField("s", T.ArrayType(T.LongType())),
        T.StructField("r", T.ArrayType(T.LongType())),
        T.StructField("i", T.LongType()),
        T.StructField("sae", T.LongType()),
        T.StructField("nsae", T.LongType()),
        T.StructField("open_day", T.LongType()),
        T.StructField("open_cnt", T.LongType()),
        # cross-batch stragglers (event day < the already-open day) are
        # dropped + counted, not folded into the wrong day (see
        # streaming/cusum.py for the contract):
        T.StructField("n_late", T.LongType()),
    ]
)


def _tdiv(a: int, b: int) -> int:
    q = abs(a) // b
    return q if (a >= 0) == (b >= 0) else -q


def _hw_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (event_type,) = key
    events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    days = (events["ts"].astype("int64") // (86_400 * 10**9)).to_numpy()

    if state.exists:
        # NOTE: n_late was added to STATE_SCHEMA after the first
        # release. A restart from a pre-change checkpoint does NOT
        # reach this code — Spark's StateSchemaCompatibilityChecker
        # rejects the query at start-up when the state schema gained a
        # field (and stateSchemaCheck=false wouldn't help: the old
        # UnsafeRow layout isn't readable under the widened schema).
        # Schema evolution requires a fresh checkpoint; no unreachable
        # legacy-tuple padding here.
        warm, l, b, s, r, i, sae, nsae, open_day, open_cnt, n_late = state.get
        n_late = n_late if n_late is not None else 0
        warm, s, r = list(warm), list(s), list(r)
    else:
        warm, l, b, s, r = [], 0, 0, [], []
        i, sae, nsae, open_day, open_cnt, n_late = 0, 0, 0, None, 0, 0

    def close_day(x: int):
        nonlocal l, b, s, r, i, sae, nsae, warm
        if i < HW_PERIOD:
            warm.append(x)
            i += 1
            if i == HW_PERIOD:
                l = sum(warm) * 1000 // HW_PERIOD
                b = 0
                s = [warm[j] * 1000 - l for j in range(HW_PERIOD)]
                r = list(warm)
            return
        slot = i % HW_PERIOD
        sae += abs(x * 1000 - (l + b + s[slot]))
        nsae += abs(x - r[slot]) * 1000
        lnew = _tdiv(200 * (x * 1000 - s[slot]) + 800 * (l + b), 1000)
        bnew = _tdiv(100 * (lnew - l) + 900 * b, 1000)
        snew = _tdiv(300 * (x * 1000 - lnew) + 700 * s[slot], 1000)
        l, b = lnew, bnew
        s[slot] = snew
        r[slot] = x
        i += 1

    for d in days:
        d = int(d)
        if open_day is None:
            open_day, open_cnt = d, 0
        elif d < open_day:
            n_late += 1
            continue
        elif d > open_day:
            close_day(open_cnt)
            open_day, open_cnt = d, 0
        open_cnt += 1

    state.update(
        (
            warm,
            int(l),
            int(b),
            s,
            r,
            int(i),
            int(sae),
            int(nsae),
            int(open_day) if open_day is not None else None,
            int(open_cnt),
            int(n_late),
        )
    )
    if i < HW_PERIOD:
        yield pd.DataFrame([], columns=[f.name for f in OUTPUT_SCHEMA.fields])
        return
    yield pd.DataFrame(
        [
            {
                "event_type": event_type,
                "days_closed": i,
                "level_milli": l,
                "trend_milli": b,
                "season_csv": ",".join(str(v) for v in s),
                "hw_sae_milli": sae,
                "snaive_sae_milli": nsae,
            }
        ]
    )


def streaming_holt_winters(events: DataFrame) -> DataFrame:
    """events: streaming (event_type, event_id, ts). Emits the updated
    HW state per type each micro-batch once the first week has closed."""
    return events.groupBy("event_type").applyInPandasWithState(
        _hw_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
