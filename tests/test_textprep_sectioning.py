"""Oracle parity for the document-structuring modules that previously
relied on the driver simulation alone: sectioning (heading hierarchy,
breakpoint chunking, page assignment), chapters, textprep (tag strip,
forced splits, normalization) and packing."""

from __future__ import annotations

import pytest

from iris_project_database_refresh_spark.operators import (
    chapters,
    packing,
    sectioning,
    textprep,
)

from .conftest import SF_CORRECT, assert_matches_oracle

ALL = {**sectioning.QUERIES, **chapters.QUERIES, **textprep.QUERIES, **packing.QUERIES}
ORACLES = {**sectioning.ORACLES, **chapters.ORACLES, **textprep.ORACLES, **packing.ORACLES}


@pytest.mark.parametrize("name", sorted(ALL))
def test_matches_oracle(spark, oracle, name):
    assert_matches_oracle(ALL[name](spark, SF_CORRECT), oracle, ORACLES[name])


def test_normalize_restores_original_text(spark):
    """The planted dirt must clean back to the original text for every
    document — the invariant that makes the cleanup trustworthy."""
    rows = textprep.text_normalize(spark, SF_CORRECT).collect()
    assert rows and all(r.restored == 1 for r in rows)
    assert all(r.n_removed > 0 for r in rows)  # the dirt was really planted
