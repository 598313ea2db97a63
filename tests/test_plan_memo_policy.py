"""Optimization-round policy guard (functions/plan_memo.py): a
session-memoized builder must be a PURE-PLAN builder.

Sharing an analyzed plan across queries is benchmark-transparent
(every action replans and recomputes from parquet), but sharing a
``localCheckpoint``-pinned frame lets the first timed consumer
materialize blocks that later timed consumers read for free — a
module-level memo of results. This test walks every function
decorated with ``plan_memo`` (under any local alias) in the package
source and asserts its body contains no materialization call.
"""

from __future__ import annotations

import ast
import pathlib

PKG = pathlib.Path(__file__).resolve().parents[1] / "iris_project_database_refresh_spark"

MATERIALIZERS = {"localCheckpoint", "checkpoint", "cache", "persist", "collect", "count", "toPandas"}


def _memo_aliases(tree: ast.Module) -> set[str]:
    names = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and node.module.endswith("plan_memo"):
            for alias in node.names:
                if alias.name in ("plan_memo", "df_memo"):
                    names.add(alias.asname or alias.name)
    return names


def test_memoized_builders_are_pure_plan():
    offenders = []
    for path in sorted(PKG.rglob("*.py")):
        tree = ast.parse(path.read_text())
        aliases = _memo_aliases(tree)
        if not aliases:
            continue
        for node in ast.walk(tree):
            if not isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)):
                continue
            decorated = any(
                (isinstance(d, ast.Name) and d.id in aliases)
                or (isinstance(d, ast.Attribute) and d.attr in aliases)
                for d in node.decorator_list
            )
            if not decorated:
                continue
            for inner in ast.walk(node):
                if (
                    isinstance(inner, ast.Call)
                    and isinstance(inner.func, ast.Attribute)
                    and inner.func.attr in MATERIALIZERS
                ):
                    offenders.append(f"{path.name}:{node.name} calls .{inner.func.attr}()")
    assert not offenders, (
        "memoized builders must not materialize (plan-only sharing policy): "
        + "; ".join(offenders)
    )


def test_df_memo_is_gone():
    """df_memo keyed caches held strong refs to pinned frames for the
    whole session (checkpoint blocks never released, results shared
    across timed queries); the optimization round removed it."""
    src = (PKG / "functions" / "plan_memo.py").read_text()
    assert "def df_memo" not in src
