"""Session-scoped PLAN-construction registry.

Profiling (round 10) showed several operator families spend most of
their wall in DRIVER time — py4j Column-algebra round-trips and eager
per-op re-analysis — rebuilding DataFrames that are pure functions of
(session, corpus dir): the multimodal payload plants (~4.5 s for the
15-builder sniff union, ~0.15 s execution). A production refresh
builds each stage plan once per cycle, so the engine memoizes those
CONSTRUCTIONS per session.

POLICY (optimization round, r10): only *pure-plan* builders may be
memoized — the memoized subgraph must contain NO ``localCheckpoint``
(or any other materialization). Sharing an analyzed logical plan is
semantically and benchmark-transparent: every action on it re-plans
physically and recomputes from the parquet inputs (fresh RDDs, no
stage/shuffle reuse), so each timed query still pays its full
execution cost. Sharing a *pinned* frame is different in kind — the
first consumer materializes the checkpoint and later consumers read
its blocks, i.e. a module-level memo of RESULTS across independently
timed queries. Builders that pin (dedup's shingle-hash corpus,
components labels, ...) are therefore NOT memoized: each top-level
query constructs its own pinned frame inside its own timed region and
within-query consumers share it through local variables, exactly the
rounds-1–9 convention.

Keyed by (applicationId, function, sf_dir, dir signature, literals);
a fresh process/session always starts empty, so nothing persists
across bench or oracle invocations.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import SparkSession

_CACHE: dict[tuple, object] = {}


def _dir_sig(sf_dir: str) -> tuple:
    """Light staleness guard: (name, mtime_ns, size) of the dir's
    parquet entries — a corpus rewritten in place mid-session (test
    fixtures) gets a fresh cache slot instead of a stale plan. Non-local
    or unreadable paths fall back to the bare dir key."""
    try:
        return tuple(
            sorted(
                (e.name, e.stat().st_mtime_ns, e.stat().st_size)
                for e in os.scandir(sf_dir)
                if e.name.endswith(".parquet")
            )
        )
    except OSError:
        return ()


def plan_memo(fn):
    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str, *args):
        key = (
            fn.__module__,
            fn.__qualname__,
            spark.sparkContext.applicationId,
            sf_dir,
            _dir_sig(sf_dir),
            args,
        )
        if key not in _CACHE:
            _CACHE[key] = fn(spark, sf_dir, *args)
        return _CACHE[key]

    return wrapped
