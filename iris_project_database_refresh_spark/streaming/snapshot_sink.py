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
    the batch id was already committed (crash-replay skip).

    The batch id rides inside the ONE atomic temp-then-rename manifest
    commit (snapshot_write's `operation` kwarg) — a crash anywhere
    leaves either no v{N} (batch replays cleanly) or a complete stamped
    manifest (replay skips); there is no window where the batch is
    committed but unstamped.
    """
    if str(batch_id) in _committed_batch_ids(table_dir):
        return False
    snapshot_write(
        batch_df, table_dir, mode="append", operation=f"stream-append@{batch_id}"
    )
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
