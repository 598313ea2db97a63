"""Plan-audit tooling for PLANS.md.

Two modes:

* ``--dump name [name ...]`` — print each query's ``formatted`` physical
  plan TREE (the header section only, matching the house PLANS.md entry
  style) at sf0.01, ready to paste under a ``## name`` heading.
* ``--check`` — completeness sweep: every query that costs >= 1 s in the
  committed sf0.1 bench (BENCH_LOCAL.json) must have a ``## name`` entry
  in PLANS.md. Exits non-zero listing the gaps. The same sweep backs
  ``tests/test_plan_hygiene.py::test_plans_md_covers_expensive_queries``.
* ``--gate2x`` — the standing-baseline 2x gate: compare the committed
  BENCH_LOCAL.json against the canonical BASELINE_STANDING.json (one
  machine-readable standing value per query — see
  scripts/baseline_standing.py) and print every >= 1 s row above 2x its
  standing value with its documented note. Informational (rc 0): a flag
  needs an idle-host re-measure + a BASELINE.md adjudication, not a
  build break.
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REPO = os.path.join(os.path.dirname(__file__), "..")
SLOW_SECONDS = 1.0


def plan_tree(df) -> str:
    """The indented operator tree from .explain('formatted') — stop at
    the blank line before the per-node detail sections."""
    full = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    lines = []
    for line in full.splitlines():
        if lines and not line.strip():
            break
        lines.append(line)
    return "\n".join(lines)


def missing_entries() -> list[str]:
    """Same rule as bench._plan_gaps: "expensive" = the CURATED standing
    value when one exists (a single reading on a contended host is not a
    plan that got expensive), the fresh reading for brand-new queries."""
    bench = json.load(open(os.path.join(REPO, "BENCH_LOCAL.json")))
    if bench.get("sf") != 0.1:
        raise SystemExit(
            f"BENCH_LOCAL.json is at sf={bench.get('sf')}; the completeness "
            "sweep keys off the committed sf0.1 run — restore it first"
        )
    standing: dict[str, float] = {}
    try:
        with open(os.path.join(REPO, "BASELINE_STANDING.json")) as f:
            standing = {k: v["standing"] for k, v in json.load(f)["queries"].items()}
    except Exception:
        pass
    slow = {
        k
        for k, v in bench["queries"].items()
        if standing.get(k, v) >= SLOW_SECONDS
    }
    plans = set(
        re.findall(r"^## (\S+)", open(os.path.join(REPO, "PLANS.md")).read(), re.M)
    )
    return sorted(slow - plans)


def main() -> int:
    args = sys.argv[1:]
    if args and args[0] == "--check":
        gaps = missing_entries()
        if gaps:
            print("queries >= 1s at sf0.1 with no PLANS.md entry:", ", ".join(gaps))
            return 1
        print("PLANS.md covers every >= 1s query")
        return 0
    if args and args[0] == "--gate2x":
        bench = json.load(open(os.path.join(REPO, "BENCH_LOCAL.json")))
        std = json.load(open(os.path.join(REPO, "BASELINE_STANDING.json")))["queries"]
        if bench.get("sf") != 0.1:
            raise SystemExit("BENCH_LOCAL.json is not the committed sf0.1 run")
        missing = sorted(set(bench["queries"]) - set(std))
        if missing:
            print("no standing row (run bench.py to seed):", ", ".join(missing))
        flagged = 0
        for k, v in sorted(bench["queries"].items(), key=lambda kv: -kv[1]):
            s = std.get(k, {}).get("standing", 0)
            if v >= SLOW_SECONDS and s > 0 and v > 2 * s:
                flagged += 1
                note = std[k].get("note", "")
                print(f"{k}: {v:.3f}s vs standing {s:.3f}s = {v / s:.2f}x"
                      + (f"  [{note}]" if note else ""))
        print(f"{flagged} rows over 2x standing" if flagged else "no rows over 2x standing")
        return 0
    if args and args[0] == "--dump":
        from iris_project_database_refresh_spark.plans.registry import QUERIES
        from iris_project_database_refresh_spark.session import get_session

        spark = get_session()
        for name in args[1:]:
            df = QUERIES[name](spark, "/root/testdata/sf0.01")
            print(f"## {name}\n\n```\n{plan_tree(df)}\n```\n")
        return 0
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
