"""Stateful streaming heavy-hitter tracker (Misra-Gries top-K).

The streaming complement of ``operators/sketches.heavy_hitters_cms``:
where the batch operator sketches frequencies over the whole corpus,
this tracks the current top users PER EVENT TYPE on the live stream
with O(K) state per key — the Misra-Gries summary (public art: Misra
& Gries 1982; the "space-saving" family), whose guarantee is that any
user with true count > n/(K+1) is present in the summary.

Per micro-batch the group's events fold into the summary in event
order (ts, event_id — the house determinism rule), and the current
ranked summary is emitted (update mode).  State is two K-bounded
arrays + a counter, regardless of stream length — the property that
lets 1000 executors hold millions of keys.

Like the sessionizer/rate-limiter, a legitimate Python seam: a
per-group state transition with data-dependent branching that
Catalyst can't express, Arrow-batched per group.  The parity test
drains the stream with availableNow and asserts the final summaries
equal a reference Misra-Gries replay of the same ordered events.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

TOPK_K = 8

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_type", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("mg_count", T.LongType()),
        T.StructField("rank", T.LongType()),
        T.StructField("n_seen", T.LongType()),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("users", T.ArrayType(T.LongType())),
        T.StructField("counts", T.ArrayType(T.LongType())),
        T.StructField("n_seen", T.LongType()),
    ]
)


def mg_update(counters: dict[int, int], user: int, k: int) -> None:
    """One Misra-Gries step, in place: increment / insert / decay."""
    if user in counters:
        counters[user] += 1
    elif len(counters) < k:
        counters[user] = 1
    else:
        for u in list(counters):
            counters[u] -= 1
            if counters[u] == 0:
                del counters[u]


def _topk_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    (event_type,) = key
    events = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])

    if state.exists:
        users, counts, n_seen = state.get
        counters = dict(zip(users, counts))
    else:
        counters, n_seen = {}, 0

    for u in events["user_id"].to_numpy():
        mg_update(counters, int(u), TOPK_K)
        n_seen += 1

    items = sorted(counters.items(), key=lambda kv: (-kv[1], kv[0]))
    state.update(
        ([int(u) for u, _ in items], [int(c) for _, c in items], int(n_seen))
    )
    yield pd.DataFrame(
        {
            "event_type": [event_type] * len(items),
            "user_id": [u for u, _ in items],
            "mg_count": [c for _, c in items],
            "rank": list(range(1, len(items) + 1)),
            "n_seen": [n_seen] * len(items),
        }
    )


def streaming_topk(events: DataFrame) -> DataFrame:
    """events must carry (event_type, user_id, event_id, ts).  Emits
    the ranked Misra-Gries summary per type each micro-batch."""
    return events.groupBy("event_type").applyInPandasWithState(
        _topk_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
