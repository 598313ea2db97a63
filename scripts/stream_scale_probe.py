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

Sinks (snapshot/upsert) write into a throwaway /tmp dir per run. The
media-intake twin is file-grain (scales with file COUNT by the
binaryFile source's own parallelism), so it gets its own planted-file
probe (``probe_media_intake``, round 9): 64 -> 1024 files, drain ==
batch asserted, wall ratio against the same band.

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


MEDIA_1X = 64  # planted file count at 1x; 16x -> 1024 files


def _plant_media(d: str, n_files: int) -> None:
    """Deterministic media corpus: wav/jpeg/txt round-robin with
    per-index payload sizes (the intake's three sniff classes)."""
    import struct

    if os.path.isdir(d) and len(os.listdir(d)) == n_files:
        return
    os.makedirs(d, exist_ok=True)

    def wav(i: int) -> bytes:
        data = b"ab" * (10 + i % 37)
        return (
            b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, 16000, 64000, 4, 16)
            + b"data" + struct.pack("<I", len(data)) + data
        )

    def jpeg(i: int) -> bytes:
        return (
            b"\xff\xd8"
            + b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
            + b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", 480 + i % 7, 640)
            + b"\x03" + b"\x00" * 9
            + b"\xff\xd9"
        )

    for i in range(n_files):
        kind = i % 3
        if kind == 0:
            payload, ext = wav(i), "wav"
        elif kind == 1:
            payload, ext = jpeg(i), "jpg"
        else:
            payload, ext = (b"plain text %d " % i) * (1 + i % 5), "txt"
        with open(os.path.join(d, f"f{i:05d}.{ext}"), "wb") as f:
            f.write(payload)


def probe_media_intake(spark) -> None:
    """16x FILE-COUNT probe for the media-intake twin (r8 verdict item
    5 — the one twin the events-derived 16x corpus can't drive): plant
    MEDIA_1X and 16x MEDIA_1X files, drain the streaming manifest over
    each, assert drain == batch row-for-count, and report the wall
    ratio against the same linear-masked band as every other probe."""
    from iris_project_database_refresh_spark.sources.binaryfiles import (
        media_intake_manifest,
    )
    from iris_project_database_refresh_spark.streaming.media_intake import (
        stream_binary_dir,
        streaming_media_manifest,
    )

    walls = {}
    for scale, n_files in (("1x", MEDIA_1X), (f"{COPIES}x", MEDIA_1X * COPIES)):
        d = f"/tmp/media_probe_{n_files}"
        _plant_media(d, n_files)
        # untimed warm drain on a throwaway name: session/codegen warmup
        if scale == "1x":
            wq = _memory_sink(
                streaming_media_manifest(stream_binary_dir(spark, d)),
                "p_media_warm",
                "append",
            )
            wq.awaitTermination()
        t0 = time.perf_counter()
        q = _memory_sink(
            streaming_media_manifest(stream_binary_dir(spark, d)),
            f"p_media_{scale}",
            "append",
        )
        q.awaitTermination()
        walls[scale] = round(time.perf_counter() - t0, 2)
        drained = spark.sql(f"SELECT count(*) FROM p_media_{scale}").first()[0]
        batch = media_intake_manifest(spark, d).count()
        assert drained == batch == n_files, (scale, drained, batch, n_files)
    ratio = walls[f"{COPIES}x"] / max(walls["1x"], 1e-9)
    print(
        f"media_intake: {MEDIA_1X} files {walls['1x']}s -> "
        f"{MEDIA_1X * COPIES} files {walls[f'{COPIES}x']}s"
        f" ({ratio:.1f}x wall for {COPIES}x files; drain==batch asserted)",
        flush=True,
    )


def main(names: list[str]) -> int:
    build_corpus()
    from iris_project_database_refresh_spark.session import get_session

    spark = get_session("stream-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    # r8 ADVICE: recentProgress is a ring buffer capped at
    # numRecentProgressUpdates (default 100) entries — a 16x availableNow
    # drain that executes more micro-batches would drop its EARLY
    # progress events and _drain could under-report the peak state
    # footprint this probe exists to measure. Raise the cap far above
    # any drain's batch count for the probe session.
    spark.conf.set("spark.sql.streaming.numRecentProgressUpdates", "10000")
    all_names = list(_mk(spark, SRC, "warm"))
    names = names or all_names + ["media_intake"]
    bad = 0
    for name in names:
        if name == "media_intake":
            probe_media_intake(spark)
            continue
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
