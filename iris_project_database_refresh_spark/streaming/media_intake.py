"""Streaming binary-file intake — incremental NAS media discovery.

Reference parity: the refresh loop re-lists the NAS tree every cycle
and processes only files it has not already handled (`catalog
search/stage1_extract_nas_catalog.py` delta + `semantic search - ey
prep/stage_00_pdf_to_markdown.py` skip-processed checks).  Structured
Streaming's file source IS that contract, made durable: the checkpoint
remembers every file already seen, so each ``availableNow`` drain of a
watched directory carries exactly the NEW files — the seen-file ledger
the reference keeps by hand comes for free and survives restarts.

The payload path is the SAME stateless Arrow-batched sniff/verify
manifest as the batch intake (``sources/binaryfiles.manifest_transform``
— one shared code path), so a drain over a directory equals the batch
read of that directory bit-for-bit, and a second drain after new files
land emits only the new files' rows.

Scale: file listing is driver-side metadata (bounded by
``maxFilesPerTrigger`` when backlogs are deep); payload bytes go
straight to executor partitions — identical shape to the batch source.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sources.binaryfiles import manifest_transform

_BINARY_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def stream_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming (path, modificationTime, length, content) over a
    watched directory — new files only, per the checkpoint ledger."""
    reader = spark.readStream.format("binaryFile").schema(_BINARY_SCHEMA)
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.load(path)


def streaming_media_manifest(files: DataFrame) -> DataFrame:
    """The sniffed/verified intake manifest over a streaming file
    source — stateless, so streaming == batch on the same file set."""
    return manifest_transform(files)
