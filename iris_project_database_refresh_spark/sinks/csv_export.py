"""CSV export with PostgreSQL vector-literal formatting.

Reference parity: `semantic search/stage_05_csv_export.py:444`
format_embedding_for_postgres ("[" + ",".join(float) + "]", empty
string for NULL) and :456 chunk_to_csv_row (auto-generated columns
emitted empty). The formatting runs as built-in expressions, so a
100 TB export is a single distributed write — no driver round-trip,
unlike the reference's row-at-a-time csv.writer loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def pgvector_literal(embedding: Column) -> Column:
    """array<numeric> → pgvector text literal '[x1,x2,…]'; NULL/empty → ''.

    Floats are rendered via double cast (matches the reference's
    str(float(x)) on finite values).
    """
    joined = F.array_join(F.transform(embedding, lambda x: x.cast("double").cast("string")), ",")
    return F.when(
        embedding.isNull() | (F.size(embedding) == 0), F.lit("")
    ).otherwise(F.concat(F.lit("["), joined, F.lit("]")))


# iris_semantic_search column order (database-schema.sql:210-255) minus
# the SERIAL/system columns the reference leaves empty for COPY.
EXPORT_COLUMNS = (
    "document_id",
    "filename",
    "chapter_number",
    "section_number",
    "chunk_number",
    "chunk_content",
    "embedding_literal",
)


def export_chunks_csv(chunks: DataFrame, path: str, *, single_file: bool = False) -> None:
    """Write a chunk DataFrame as the stage_05-shaped CSV.

    `chunks` must carry the EXPORT_COLUMNS (embedding as array<float>
    under `embedding`). At scale leave single_file=False — coalescing to
    one file serializes the write through one task (the reference's
    master-CSV model is inherently single-writer; a cluster export
    writes a directory of parts + a manifest instead).
    """
    out = chunks.withColumn("embedding_literal", pgvector_literal(F.col("embedding")))
    missing = [c for c in EXPORT_COLUMNS if c not in out.columns]
    if missing:
        raise ValueError(f"chunk DataFrame missing export columns: {missing}")
    out = out.select(*EXPORT_COLUMNS)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", True).csv(path)
