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
    # Unconditional imports: a broken transitive import must fail loudly
    # here, not silently shrink queries()/oracle_sql() and the
    # correctness surface (tests/test_pipeline.py asserts the expected
    # registry size as a second guard).
    from ..operators import (
        advanced,
        analytics,
        catalog,
        chapters,
        chunking,
        clustering,
        dedup,
        embeddings,
        graph,
        journeys,
        multimodal,
        olap,
        packing,
        pq,
        relational,
        relational_ext,
        relational_full,
        scrub,
        search,
        sectioning,
        sketches,
        textmodel,
        textprep,
        textqc,
        tfidf,
        timeseries,
        warehouse,
    )
    from ..streaming import dedup as streaming_dedup
    from ..streaming import enrich as streaming_enrich
    from ..streaming import pipeline as streaming_pipeline

    for module in (
        relational,
        relational_ext,
        relational_full,
        sectioning,
        chapters,
        textprep,
        textqc,
        chunking,
        dedup,
        embeddings,
        catalog,
        multimodal,
        advanced,
        pq,
        clustering,
        packing,
        scrub,
        tfidf,
        analytics,
        textmodel,
        timeseries,
        olap,
        journeys,
        graph,
        warehouse,
        search,
        sketches,
        streaming_pipeline,
        streaming_dedup,
        streaming_enrich,
    ):
        _register(module)


_load()
