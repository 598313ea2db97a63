"""Named query registry — the single source of truth consumed by
``__spark_entry__.py`` (driver contract), ``bench.py`` and the tests.

Each operator module contributes ``QUERIES`` (name → callable(spark,
sf_dir) → DataFrame) and ``ORACLES`` (name → DuckDB SQL). Names without
an oracle get the weaker rows-only driver check (documented per-row in
SURVEY.md §2).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def _register(module) -> None:
    QUERIES.update(module.QUERIES)
    ORACLES.update(getattr(module, "ORACLES", {}))


def _load() -> None:
    from ..operators import relational

    _register(relational)

    for modname in ("relational_ext", "textqc", "chunking", "dedup", "embeddings", "catalog", "multimodal", "advanced", "tfidf", "analytics"):
        try:
            module = __import__(
                f"iris_project_database_refresh_spark.operators.{modname}",
                fromlist=[modname],
            )
        except ImportError:
            continue
        _register(module)

    from ..streaming import pipeline as streaming_pipeline

    _register(streaming_pipeline)


_load()
