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


def main() -> None:
    spark = get_session("iris-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # warmups: JVM/codegen (q1) and Python worker pool (tiny mapInPandas),
    # so per-query numbers reflect steady state rather than spawn cost
    QUERIES["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).write.format("noop").mode("overwrite").save()

    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    timings: dict[str, float] = {}
    for qi, (name, fn) in enumerate(sorted(QUERIES.items())):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        if qi % 8 == 7:
            # Untimed housekeeping between queries: dropping Python refs +
            # forcing a JVM GC lets the ContextCleaner release the pinned
            # localCheckpoint blocks of already-measured queries, so later
            # queries aren't taxed by a block manager full of dead RDDs.
            import gc

            gc.collect()
            spark.sparkContext._jvm.System.gc()

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_wall_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
