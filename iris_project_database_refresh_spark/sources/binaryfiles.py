"""Binary-file ingestion source — the reference's NAS media intake.

Reference parity: ``semantic search - ey prep/stage_00_pdf_to_markdown.py``
lists actual PDF files on the NAS share and reads their raw bytes
before any parsing, and ``catalog search/stage1_extract_nas_catalog.py``
walks the same tree for the catalog grain.  ``sources/filecatalog.py``
models that CATALOG grain (names/sizes/dates); this module models the
CONTENT intake: Spark's built-in ``binaryFile`` datasource reads each
file as one row ``(path, modificationTime, length, content)``,
parallelized BY FILE across executors — payload bytes land on executor
partitions, never the driver, so the scan shape survives a 100 TB
media tree (file-level splits are governed by
``spark.sql.files.maxPartitionBytes``; ``pathGlobFilter`` /
``recursiveFileLookup`` prune at planning time).

``media_intake_manifest`` then routes every payload through the SAME
stdlib sniff/parse kernels the in-table multimodal operators use
(``operators/multimodal.py``) in one Arrow-batched ``mapInPandas``
pass — the lake-ingest dispatch (``multimodal_sniff_router``) applied
to real files instead of planted table columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_dir(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """One row per file: (path, modificationTime, length, content)."""
    reader = spark.read.format("binaryFile")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    if recursive:
        reader = reader.option("recursiveFileLookup", "true")
    return reader.load(path)


_MANIFEST_SCHEMA = (
    "file_name string, n_bytes long, sniffed string, parsed_ok int,"
    " parse_error string, content_md5 string"
)


def manifest_transform(files: DataFrame) -> DataFrame:
    """(path, length, content) rows -> the sniffed/verified manifest.

    Stateless Arrow-batched mapInPandas — works identically on a batch
    ``binaryFile`` read and on the streaming file source
    (``streaming/media_intake.py``), which is what makes the
    batch == streaming parity bit-exact.
    """
    from ..operators import multimodal as mm

    parsers = {
        "wav": mm.parse_wav_header,
        "y4m": mm.parse_y4m_stream,
        "tiff": mm.parse_tiff_header,
        "png": mm.parse_png,
        "id3": mm.parse_id3,
        "jpeg": mm.parse_jpeg,
        "gif": mm.parse_gif,
        "flac": mm.parse_flac,
        "bmp": mm.parse_bmp,
        "zip": mm.parse_zip,
        "mp4": mm.parse_mp4,
        "tar": mm.parse_tar,
        "pdf": mm.parse_pdf,
        "ogg": mm.parse_ogg,
        "webp": mm.parse_webp_vp8l,
    }
    rows = files.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        "content",
    )

    def fn(batches):
        import hashlib

        import pandas as pd

        for pdf in batches:
            rows = []
            for name, n, content in zip(
                pdf["file_name"], pdf["n_bytes"], pdf["content"]
            ):
                b = bytes(content)
                sniffed = mm.sniff_media(b)
                # The kernels are structural validators over UNTRUSTED
                # bytes: a payload that sniffs (magic matches) but is
                # malformed deeper in (e.g. a WAV fmt chunk declaring
                # bits < 8) may raise instead of returning None.  Either
                # way it is the same quarantine row — one corrupt file
                # must never kill the whole intake batch.
                ok, err = 0, None
                if sniffed in parsers:
                    try:
                        ok = 1 if parsers[sniffed](b) is not None else 0
                    except Exception as exc:  # noqa: BLE001 — quarantine, not crash
                        err = f"{type(exc).__name__}: {exc}"[:200]
                rows.append(
                    {
                        "file_name": name,
                        "n_bytes": int(n),
                        "sniffed": sniffed,
                        "parsed_ok": ok,
                        "parse_error": err,
                        "content_md5": hashlib.md5(b).hexdigest(),
                    }
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "file_name",
                    "n_bytes",
                    "sniffed",
                    "parsed_ok",
                    "parse_error",
                    "content_md5",
                ],
            )

    return rows.mapInPandas(fn, _MANIFEST_SCHEMA)


def media_intake_manifest(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
    recursive: bool = False,
) -> DataFrame:
    """Sniff + structurally verify every file under ``path``.

    Output: (file_name, n_bytes, sniffed, parsed_ok, content_md5) —
    ``sniffed`` from the magic-byte router (``sniff_media``), and
    ``parsed_ok`` = 1 only when the matching container kernel accepts
    the payload structurally (header fields, CRCs where the kernel
    checks them) — the accept/quarantine split a real intake runs
    before anything downstream touches the bytes.
    """
    return manifest_transform(read_binary_dir(spark, path, glob, recursive))
