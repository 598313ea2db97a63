"""Generate BASELINE_STANDING.json — ONE canonical machine-readable
standing-baseline table (round-7 verdict, missing item 3).

BASELINE.md is the narrative ledger: first-measured tables, intentional
resets, re-measure adjudications, and prose notes accumulate per round,
and a mechanical first-match parse reads stale rows (the judge
reproduced ~10 false >2x flags that way). This script derives the
CURRENT standing value per query with explicit, documented rules and
writes them to BASELINE_STANDING.json, which bench.py and
scripts/plan_audit.py --gate2x consume. Superseded values are kept as
per-query history so the reset provenance stays machine-readable.

Rules, in order:

1. Mechanical pass over BASELINE.md in FILE ORDER (chronological):
   * every 2-column ``| query | <seconds> |`` table row is a standing
     (first-measured) value; a later table row supersedes an earlier
     one;
   * the round-7 global-window conversion table
     (``| query | r6 (single-task) | r7 (distributed) |``) resets its
     10 rows to the r7 column ("These r7 values are the family's new
     standing baselines", BASELINE.md);
   * wider tables (re-measure adjudications, 16x probes) are NOT
     standing tables and are skipped mechanically.
2. Explicit overrides for the narrated resets whose standing value
   lives in prose or in a re-measure table the text declares standing.
   Each override carries a literal ANCHOR snippet that must occur in
   BASELINE.md (asserted — a vanished anchor is a curation bug), and an
   override LOSES to any mechanical table row that appears AFTER its
   anchor line (r8 ADVICE fix: the old code applied overrides
   unconditionally, so a later reset row for an overridden query was
   silently ignored).

Regenerate with ``python scripts/baseline_standing.py`` after editing
BASELINE.md; bench.py auto-seeds rows for brand-new queries so the
artifact never lags the registry.
"""

from __future__ import annotations

import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
MD = os.path.join(ROOT, "BASELINE.md")
OUT = os.path.join(ROOT, "BASELINE_STANDING.json")

# Narrated resets: query -> (standing seconds, why, anchor snippet).
# The anchor is a LITERAL substring of the BASELINE.md line (or section)
# the value was declared in; the override applies only while no
# mechanical table row for the query appears after that line.
OVERRIDES: dict[str, tuple[float, str, str]] = {
    # r4 re-measure: "The r4 numbers above are the new standing reference"
    "collocations_pmi": (
        1.302, "r4 re-measure idle best; testdata-regeneration drift",
        "The r4 numbers above are the new standing reference",
    ),
    "q17_small_qty_revenue": (
        0.580, "r4 re-measure idle best; within family noise",
        "The r4 numbers above are the new standing reference",
    ),
    # r5 re-measure: "The steady-state numbers above are the standing
    # reference for these three from round 5 on"
    "approx_distinct_kmv": (
        0.723, "r5 re-measure steady-state best",
        "steady-state numbers above are the standing",
    ),
    "heavy_hitters_cms": (
        0.745, "r5 re-measure steady-state best (in-bench class)",
        "steady-state numbers above are the standing",
    ),
    "events_dedup": (
        0.384, "r5 re-measure steady-state best",
        "steady-state numbers above are the standing",
    ),
    # r6 re-measure: "Standing number for the noise protocol going
    # forward: ~0.5 s class" (second warmed session best-of-3)
    "page_boundaries": (
        0.522, "r6 re-measure; 0.5 s class standing note",
        "Standing number for the noise protocol going",
    ),
    # intentional reset section: real per-page Ogg CRC verification
    "multimodal_ogg_pages": (
        2.412, "intentional reset 0.319 -> 2.412 (Ogg CRC plant)",
        "intentional baseline reset (0.319 -> 2.412)",
    ),
    # r7 second refresh: "New headline rows (effective standing
    # baselines)" — prose-only, superseded the r7 additions table rows
    # (and are themselves superseded by the round-9 fused-descent
    # mechanical table — the anchor rule retires them automatically)
    "hnsw_search_ef": (
        7.664, "r7 second-refresh headline row (post-close addition)",
        "New headline rows (effective standing",
    ),
    "hnsw_recall_eval": (
        7.206, "r7 second-refresh headline row (adaptive depth)",
        "New headline rows (effective standing",
    ),
    "hnsw_search_sim": (
        5.945, "r7 second-refresh headline row (adaptive depth)",
        "New headline rows (effective standing",
    ),
}

# Non-reset standing NOTES the 2x gate should surface next to a flag
# (documented host/noise classes — the flag stands, the note explains).
NOTES: dict[str, str] = {
    "q21_waiting_suppliers": "host class; idle re-measure 1.155 on r7 code, AQE skew shape CI-pinned",
    "hnsw_search_sim": "sequential descent segments (r9: fused top hops + join-free probes cut them to ~l_cut-1); each segment pays host steal, +/-25% run-to-run idle",
    "hnsw_recall_eval": "runs exact brute force + greedy read by definition (r7 additions note)",
    "dedup_substring_stats": "host-drift class; idle best 1.627 (1.5x) on r7 code, plan unchanged since r3",
    "graph_modularity": "contended-host class (r8): idle best 1.93 morning / 4.42 afternoon on identical code — multi-core steal variance, plan unchanged",
    "hnsw_insert_plan": "HNSW pair: sequential pinned segments, +/-25% run-to-run (r7 additions note); r8 idle best 2.55",
}

_ROW = re.compile(r"^\|\s*([a-z0-9_]+)\s*\|([^|]+)\|\s*$")
_ROW3 = re.compile(r"^\|\s*([a-z0-9_]+)\s*\|[^|]+\|([^|]+)\|\s*$")


def parse(md_path: str = MD) -> dict[str, dict]:
    queries: dict[str, dict] = {}
    last_row_line: dict[str, int] = {}  # query -> line of its LAST mechanical row
    heading = ""
    conversion_table = False
    md_lines: list[str] = open(md_path).read().splitlines()

    def record(name: str, value: float, line_no: int, how: str) -> None:
        ref = f"BASELINE.md:{line_no} ({heading.strip('# ').strip()}; {how})"
        ent = queries.setdefault(name, {"history": []})
        if "standing" in ent:
            ent["history"].append({"value": ent["standing"], "ref": ent["ref"]})
        ent["standing"] = value
        ent["ref"] = ref
        last_row_line[name] = line_no

    for i, line in enumerate(md_lines, start=1):
        if line.startswith("#"):
            heading = line.strip()
            conversion_table = False
            continue
        if line.startswith("| query |"):
            cols = [c.strip() for c in line.strip().strip("|").split("|")]
            conversion_table = cols == ["query", "r6 (single-task)", "r7 (distributed)"]
            continue
        if conversion_table:
            m = _ROW3.match(line)
            if m:
                record(m.group(1), float(m.group(2)), i, "r7 conversion reset")
            continue
        m = _ROW.match(line)
        if m:
            try:
                v = float(m.group(2))
            except ValueError:
                continue
            record(m.group(1), v, i, "first-measured table")

    for name, (v, why, anchor) in OVERRIDES.items():
        anchor_line = next(
            (i for i, ln in enumerate(md_lines, start=1) if anchor in ln), None
        )
        assert anchor_line is not None, (
            f"OVERRIDES[{name!r}]: anchor {anchor!r} not found in BASELINE.md — "
            "the narrated reset this override cites was edited away"
        )
        if last_row_line.get(name, -1) > anchor_line:
            # a LATER mechanical table row superseded the narrated reset
            # (r8 ADVICE fix) — the mechanical value stands; keep the
            # override visible in history so the retirement is auditable
            queries[name]["history"].append(
                {"value": v, "ref": f"OVERRIDES retired by later row ({why})"}
            )
            print(
                f"override for {name} retired: mechanical row at line "
                f"{last_row_line[name]} postdates anchor line {anchor_line}",
                file=sys.stderr,
            )
            continue
        ent = queries.setdefault(name, {"history": []})
        if "standing" in ent:
            ent["history"].append({"value": ent["standing"], "ref": ent["ref"]})
        ent["standing"] = v
        ent["ref"] = f"OVERRIDES ({why})"
    for name, note in NOTES.items():
        if name in queries:
            queries[name]["note"] = note
    return queries


def main() -> int:
    queries = parse()
    # keep any auto-seeded rows bench.py added for queries BASELINE.md
    # hasn't narrated yet
    if os.path.exists(OUT):
        try:
            with open(OUT) as f:
                for name, ent in json.load(f)["queries"].items():
                    if name not in queries and ent.get("ref", "").startswith("auto"):
                        queries[name] = ent
        except Exception:
            pass
    out = {
        "generated_by": "scripts/baseline_standing.py",
        "sf": 0.1,
        "unit": "sec",
        "n_queries": len(queries),
        "queries": {k: queries[k] for k in sorted(queries)},
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(f"wrote {OUT}: {len(queries)} standing rows", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
