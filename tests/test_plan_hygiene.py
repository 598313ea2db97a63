from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.plans import QUERIES

from .conftest import SF_CORRECT

# Queries whose semantics genuinely need an all-pairs product: the IVF
# assignment scores every vector against the (tiny, broadcast) codebook.
CROSS_OK = {"knn_ivf", "knn_brute_force"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unintended_cartesian(spark, name):
    """No plan may contain a non-broadcast cartesian product — the
    failure mode that silently works at sf0.01 and melts at 100 TB."""
    plan = QUERIES[name](spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
    if name in CROSS_OK:
        return
    assert "CartesianProduct" not in plan, f"{name} plans a CartesianProduct"


@pytest.mark.parametrize(
    "name", ["q1_pricing_summary", "q6_revenue_change", "monitor_rollup", "token_count"]
)
def test_scan_prunes_columns(spark, name):
    """Scan-heavy queries must not read every column (ReadSchema check)."""
    import re

    plan = QUERIES[name](spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
    # FileScan parquet [col#1,col#2,...] — the projected column list
    scans = re.findall(r"FileScan parquet \[([^\]]*)\]", plan)
    assert scans, f"{name}: no FileScan in plan"
    # lineitem has 11 columns, events 6 — a pruned scan projects fewer
    # fields than the full table for each of these queries
    for s in scans:
        n_fields = len([f for f in s.split(",") if "#" in f])
        assert n_fields <= 7, f"{name}: scan appears unpruned ({n_fields} cols): {s[:160]}"


# Operators designed as pure per-row array expressions: their physical
# plans must contain NO Exchange (shuffle) and no Python workers — the
# whole point of keeping them in Catalyst is scan-rate execution.
NARROW_QUERIES = [
    "chunk_breakpoints",
    "chapter_summarize",
    "strip_page_tags",
    "force_split_sentences",
]


@pytest.mark.parametrize("name", NARROW_QUERIES)
def test_narrow_operators_have_no_shuffle(spark, name):
    plan = QUERIES[name](spark, SF_CORRECT)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"{name} shuffles:\n{plan[:400]}"
    assert "Python" not in plan and "InPandas" not in plan, f"{name} leaves the JVM"
