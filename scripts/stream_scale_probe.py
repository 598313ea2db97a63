"""16x scale probe for the STREAMING twins (round-7 verdict item 6).

scripts/scale_probe.py covers every batch family; this drives the
availableNow streaming modules at sf0.1 and at the same 16x corpus
(/tmp/sf_big16b, built by scale_probe.build_corpus) and reports, per
drain:

* wall seconds at both scales and the ratio (the linear-masked band is
  the same ~4-12x calibration as the batch probe), and
* the STATE footprint from the engine's own progress metrics — max
  ``numRowsTotal`` and ``memoryUsedBytes`` across the drain's
  stateOperators — because state size is the scale risk for the
  stateful twins (sessionizer keys, resume-ledger O(pages/doc) maps,
  Holt-Winters rings): state rows should track the KEY cardinality
  (users / types / docs), never the event volume.

Sinks (snapshot/upsert) write into a throwaway /tmp dir per run; the
media-intake twin is file-grain (scales with file COUNT by the
binaryFile source's own parallelism) and has no events-derived 16x
corpus, so it is out of scope here and noted in BASELINE.md.

Usage: python scripts/stream_scale_probe.py [name ...]   (no args = all)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_probe import COPIES, DST, SRC, build_corpus  # noqa: E402


def _drain(q) -> dict:
    q.awaitTermination()
    rows = mem = 0
    for p in q.recentProgress:
        if not isinstance(p, dict):
            p = json.loads(p.json)
        for op in p.get("stateOperators") or []:
            rows = max(rows, op.get("numRowsTotal", 0))
            mem = max(mem, op.get("memoryUsedBytes", 0))
    return {"state_rows": rows, "state_mb": round(mem / 1e6, 1)}


def _memory_sink(df, name: str, mode: str):
    return (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .trigger(availableNow=True)
        .start()
    )


def _mk(spark, sf_dir, tag):
    """name -> thunk starting the drain and returning its query."""
    from pyspark.sql import functions as F

    from iris_project_database_refresh_spark.sources.tables import load_table
    from iris_project_database_refresh_spark.streaming import (
        dedup,
        drift_monitor,
        enrich,
        joins,
        pipeline as sp,
        snapshot_sink,
        upsert_sink,
    )
    from iris_project_database_refresh_spark.streaming.cusum import streaming_cusum
    from iris_project_database_refresh_spark.streaming.ewma import streaming_ewma
    from iris_project_database_refresh_spark.streaming.hll import streaming_hll
    from iris_project_database_refresh_spark.streaming.holt_winters import (
        streaming_holt_winters,
    )
    from iris_project_database_refresh_spark.streaming.rate_limit import (
        streaming_rate_limit,
    )
    from iris_project_database_refresh_spark.streaming.resume_ledger import (
        page_events,
        streaming_resume_ledger,
    )
    from iris_project_database_refresh_spark.streaming.sessions import (
        streaming_sessionize,
    )
    from iris_project_database_refresh_spark.streaming.topk import streaming_topk

    ev = lambda: sp.read_events_stream(spark, sf_dir)  # noqa: E731
    from iris_project_database_refresh_spark.operators.monitor import (
        llm_cost_rollup as _costs_rollup,
    )

    def cusum_targets():
        daily = (
            load_table(spark, sf_dir, "events")
            .groupBy("event_type", F.date_trunc("day", "ts").cast("date").alias("day"))
            .agg(
                F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")).alias("x")
            )
        )
        return daily.groupBy("event_type").agg(
            F.expr("sum(x) div count(*)").cast("bigint").alias("target")
        )

    tmp = tempfile.mkdtemp(prefix=f"stream_probe_{tag}_")

    def snapshot_thunk():
        table_dir = os.path.join(tmp, "snap")
        snapshot_sink.run_snapshot_ingest_available_now(spark, sf_dir, table_dir)
        return None  # runs to completion internally; no query handle

    def upsert_thunk():
        table = upsert_sink.ParquetUpsertTable(
            spark, os.path.join(tmp, "upsert"), key="user_id"
        )
        return upsert_sink.start_streaming_upsert(
            ev(), table, checkpoint=os.path.join(tmp, "upsert_ckpt")
        )

    return {
        "tumbling_rollup": lambda: _memory_sink(
            sp.windowed_rollup(ev()), f"p_tumb_{tag}", "complete"
        ),
        "hopping_rollup": lambda: _memory_sink(
            sp.hopping_rollup(ev()), f"p_hop_{tag}", "complete"
        ),
        "dedup": lambda: _memory_sink(
            dedup.dedup_stream(spark, sf_dir), f"p_dedup_{tag}", "append"
        ),
        "enrich": lambda: _memory_sink(
            enrich.enriched_rollup(ev(), enrich._segments(spark, sf_dir)),
            f"p_enrich_{tag}",
            "complete",
        ),
        "view_purchase_join": lambda: _memory_sink(
            joins._joined(joins._views(ev()), joins._purchases(ev())),
            f"p_join_{tag}",
            "append",
        ),
        "llm_costs": lambda: _memory_sink(
            _costs_rollup(ev()), f"p_costs_{tag}", "complete"
        ),
        "drift_monitor": lambda: _memory_sink(
            drift_monitor.drift_bin_counts(
                ev(), *reversed(drift_monitor.freeze_baseline(spark, sf_dir))
            ),
            f"p_drift_{tag}",
            "complete",
        ),
        "sessionize": lambda: _memory_sink(
            streaming_sessionize(ev().select("user_id", "event_id", "ts")),
            f"p_sess_{tag}",
            "append",
        ),
        "ewma": lambda: _memory_sink(
            streaming_ewma(ev().select("user_id", "event_id", "ts", "value")),
            f"p_ewma_{tag}",
            "append",
        ),
        "hll": lambda: _memory_sink(
            streaming_hll(ev()), f"p_hll_{tag}", "update"
        ),
        "cusum": lambda: _memory_sink(
            streaming_cusum(
                ev().select("event_type", "event_id", "ts", "value"), cusum_targets()
            ),
            f"p_cusum_{tag}",
            "append",
        ),
        "holt_winters": lambda: _memory_sink(
            streaming_holt_winters(ev().select("event_type", "event_id", "ts")),
            f"p_hw_{tag}",
            "append",
        ),
        "rate_limit": lambda: _memory_sink(
            streaming_rate_limit(ev()), f"p_rate_{tag}", "update"
        ),
        "topk": lambda: _memory_sink(
            streaming_topk(ev()), f"p_topk_{tag}", "update"
        ),
        "resume_ledger": lambda: _memory_sink(
            streaming_resume_ledger(page_events(spark, sf_dir, streaming=True)),
            f"p_ledger_{tag}",
            "append",
        ),
        "snapshot_sink": snapshot_thunk,
        "upsert_sink": upsert_thunk,
    }


def main(names: list[str]) -> int:
    build_corpus()
    from iris_project_database_refresh_spark.session import get_session

    spark = get_session("stream-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    all_names = list(_mk(spark, SRC, "warm"))
    names = names or all_names
    bad = 0
    for name in names:
        if name not in all_names:
            print(f"{name}: UNKNOWN (choose from {all_names})", flush=True)
            bad += 1
            continue
        # untimed warm drain first: session/codegen/python-pool warmup
        # would otherwise land inside the sf0.1 number and mask the ratio
        wq = _mk(spark, SRC, f"{name}_warm_{names.index(name)}")[name]()
        if wq is not None:
            _drain(wq)
        rec = {}
        for scale, d in (("sf0.1", SRC), (f"{COPIES}x", DST)):
            thunk = _mk(spark, d, f"{name}_{scale.replace('.', '_').replace('x', 'x')}")[name]
            t0 = time.perf_counter()
            q = thunk()
            metrics = _drain(q) if q is not None else {"state_rows": 0, "state_mb": 0}
            metrics["wall"] = round(time.perf_counter() - t0, 2)
            rec[scale] = metrics
        a, b = rec["sf0.1"], rec[f"{COPIES}x"]
        ratio = b["wall"] / max(a["wall"], 1e-9)
        srow = (
            f" state_rows {a['state_rows']} -> {b['state_rows']}"
            f" ({b['state_rows'] / a['state_rows']:.1f}x)"
            if a["state_rows"]
            else ""
        )
        print(
            f"{name}: sf0.1 {a['wall']}s -> {COPIES}x {b['wall']}s"
            f" ({ratio:.1f}x wall){srow}"
            + (f" state_mb {a['state_mb']} -> {b['state_mb']}" if b["state_mb"] else ""),
            flush=True,
        )
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
