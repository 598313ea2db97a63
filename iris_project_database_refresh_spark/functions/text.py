"""Text column helpers shared by chunking / dedup / quality operators.

Tokenization matches the reference's whitespace-token counting
(`semantic search/stage_01_chapter_processing.py:314` count_tokens falls
back to a whitespace heuristic when tiktoken is unavailable).

``md5_int32`` derives a portable 32-bit integer hash from md5 — md5 is
available both in Spark (`F.md5`) and DuckDB, so oracle SQL can
reproduce signatures bit-for-bit. Spark's native ``F.hash`` (murmur3)
would be faster but is not reproducible in the oracle engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(c: Column) -> Column:
    """Whitespace tokens with empties removed; JVM-side."""
    return F.filter(F.split(c, r"\s+"), lambda t: t != "")


def md5_int32(c: Column) -> Column:
    """First 8 hex digits of md5 as a non-negative bigint (0..2^32-1)."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")
