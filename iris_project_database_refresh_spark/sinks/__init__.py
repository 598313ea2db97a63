from .csv_export import export_chunks_csv, pgvector_literal

__all__ = ["export_chunks_csv", "pgvector_literal"]
