"""Filesystem snapshot source.

Reference parity: `catalog search/stage1_extract_csv.py:213`
get_nas_files — recursive share walk collecting (file_name, file_path,
file_size, date_created, date_last_modified), skipping hidden/temp
files. Here the listing lands in a DataFrame with the same shape so
`operators/catalog.catalog_delta` can diff it against a master catalog.

The walk itself is driver-side (directory metadata is small even for
huge trees — it's one stat per file, not file contents); the resulting
catalog is a distributed DataFrame. For object stores you would swap
the walker for a parallel manifest/inventory read.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

SNAPSHOT_SCHEMA = T.StructType(
    [
        T.StructField("file_name", T.StringType()),
        T.StructField("file_path", T.StringType()),
        T.StructField("file_size", T.LongType()),
        T.StructField("date_created", T.TimestampType()),
        T.StructField("date_last_modified", T.TimestampType()),
    ]
)

_SKIP_PREFIXES = (".", "~$")  # hidden + office temp files, like the reference


def snapshot_directory(spark: SparkSession, root: str) -> DataFrame:
    rows = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith(_SKIP_PREFIXES)]
        for fn in filenames:
            if fn.startswith(_SKIP_PREFIXES):
                continue
            full = os.path.join(dirpath, fn)
            st = os.stat(full)
            rows.append(
                (
                    fn,
                    full,
                    st.st_size,
                    datetime.fromtimestamp(st.st_ctime, tz=timezone.utc).replace(tzinfo=None),
                    datetime.fromtimestamp(st.st_mtime, tz=timezone.utc).replace(tzinfo=None),
                )
            )
    return spark.createDataFrame(rows, SNAPSHOT_SCHEMA)
