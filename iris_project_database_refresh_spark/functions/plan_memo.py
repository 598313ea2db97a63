"""Session-scoped plan registry decorators.

Profiling (round 10) showed several operator families spend most of
their wall in DRIVER time — py4j Column-algebra round-trips, eager
per-op re-analysis, and lazy-checkpoint compiles — rebuilding
DataFrames that are pure functions of (session, corpus dir): the
multimodal payload plants (~4.5 s for the 15-builder sniff union,
~0.15 s execution) and the dedup shingle-hash pipeline
(dedup_method_venn: 4.2 s construct / 0.15 s exec). A production
refresh computes these shared frames ONCE per cycle and every
consumer reads them — the reference's own stage pipeline stages its
intermediates — so the engine models them as a session-scoped
registry of analyzed DataFrames:

* ``plan_memo`` — for builders with a ``(spark, sf_dir, *literals)``
  signature; keyed by (applicationId, function, sf_dir, literals).
* ``df_memo`` — for derivation steps taking upstream DataFrames;
  keyed by the upstream frames' object identities (+ literals). The
  cache holds a strong reference to the keyed frames so an id() can
  never be recycled into a false hit. Because the upstream builders
  are themselves memoized, the same logical input yields the same
  object and the derivation is built once per session.

Plans are immutable, so sharing them is semantically transparent;
where a memoized frame carries a lazy localCheckpoint pin, consumers
after the first also share the materialized intermediate — exactly
the staged-table behavior a refresh pipeline has in production.
"""

from __future__ import annotations

import functools
import os

from pyspark.sql import DataFrame, SparkSession

_CACHE: dict[tuple, tuple] = {}


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
            _CACHE[key] = ((), fn(spark, sf_dir, *args))
        return _CACHE[key][1]

    return wrapped


def df_memo(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        key = (
            fn.__module__,
            fn.__qualname__,
            tuple(id(a) if isinstance(a, DataFrame) else a for a in args),
            tuple(sorted((k, id(v) if isinstance(v, DataFrame) else v) for k, v in kwargs.items())),
        )
        if key not in _CACHE:
            # pin the keyed frames: ids stay unique while cached
            pinned = tuple(a for a in args if isinstance(a, DataFrame)) + tuple(
                v for v in kwargs.values() if isinstance(v, DataFrame)
            )
            _CACHE[key] = (pinned, fn(*args, **kwargs))
        return _CACHE[key][1]

    return wrapped
