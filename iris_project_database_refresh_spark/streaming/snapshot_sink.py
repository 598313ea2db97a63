"""Streaming ingest into the snapshot-log table format.

Closes the loop between the streaming surface and the lakehouse sink:
each micro-batch commits one snapshot version via ``foreachBatch`` —
the same transactional manifest the batch writers use — so a
continuous event stream lands as an append-only versioned table with
time travel over ingestion history. This is the streaming flavor of
the reference's refresh cycle (stage_06 applies one batch per run;
here batches arrive continuously) and the pattern Delta's streaming
sink implements natively.

Exactly-once note: `foreachBatch` re-delivers a batch after a crash;
a production commit protocol records the batch id in the manifest and
skips already-committed ids (idempotent commits). The batch id is
recorded here (`operation: stream-append@<id>`) so replays are
detectable; the skip itself is exercised in the test via a duplicate
apply.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..sinks.snapshots import _read_manifest, _versions, snapshot_write


def _committed_batch_ids(table_dir: str) -> set[str]:
    out = set()
    for v in _versions(table_dir):
        op = _read_manifest(table_dir, v)["operation"]
        if op.startswith("stream-append@"):
            out.add(op.split("@", 1)[1])
    return out


def apply_stream_batch(batch_df: DataFrame, batch_id: int, table_dir: str) -> bool:
    """foreachBatch body: idempotent append commit. Returns False when
    the batch id was already committed (crash-replay skip)."""
    if str(batch_id) in _committed_batch_ids(table_dir):
        return False
    version = snapshot_write(batch_df, table_dir, mode="append")
    # stamp the batch id into the just-committed manifest (single-writer)
    import json
    import os

    from ..sinks.snapshots import _log_dir

    path = os.path.join(_log_dir(table_dir), f"v{version:06d}.json")
    m = json.load(open(path))
    m["operation"] = f"stream-append@{batch_id}"
    json.dump(m, open(path, "w"), indent=1, sort_keys=True)
    return True


def run_snapshot_ingest_available_now(
    spark: SparkSession, sf_dir: str, table_dir: str
) -> None:
    """Drain the events directory into the snapshot log, one version
    per micro-batch."""
    from .pipeline import read_events_stream

    q = (
        read_events_stream(spark, sf_dir)
        .writeStream.foreachBatch(lambda df, bid: apply_stream_batch(df, bid, table_dir))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
