"""Vector column helpers — pure built-in higher-order functions.

These stay JVM-side (whole-stage codegen), unlike a Python UDF doing the
same dot product; at 100 TB that is the difference between a scan-rate
job and a serialization-bound one. Stands in for the pgvector `<=>`
operator the reference leans on (database-schema.sql:245 `VECTOR(2000)`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Elementwise product then sum, entirely in catalyst expressions."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2norm(a) * l2norm(b))
