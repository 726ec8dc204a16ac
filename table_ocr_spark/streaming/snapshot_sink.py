"""Streaming sink into the snapshot commit log — exactly-once via
epoch-keyed commits (``foreachBatch`` + sources/snapshots.py).

Structured Streaming's parquet sink is exactly-once only through its own
_spark_metadata log, which plain-parquet readers ignore; committing each
micro-batch as a SNAPSHOT instead gives downstream readers the same
atomic/addressable view the batch jobs produce — one commit per epoch,
metrics in the manifest, time travel across the ingest history.

Exactly-once: after a crash, Structured Streaming REPLAYS the last
possibly-uncommitted micro-batch with the SAME ``batchId`` (its
contract).  The sink records the epoch in each commit's summary and
skips any batch whose id is <= the last committed epoch — the standard
idempotent-foreachBatch pattern, here with the table's own commit log as
the transaction marker (no side ledger to drift out of sync).

Epoch lookup is O(1) amortized, not a history scan: every sink commit
carries ``stream_max_epoch``, and ``last_stream_epoch`` walks back from
the current snapshot only past non-stream commits (compaction, batch
appends) until it finds one.

The reference has no streaming at all (SURVEY.md §2.6); this extends the
engine's streaming surface the same way stream_extract.py does, reusing
the identical extraction operator.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame

from table_ocr_spark.sources.snapshots import SnapshotTable


def _latest_stream_summary(table: SnapshotTable) -> dict:
    """The newest commit summary carrying stream watermark keys ({} if
    none): every sink commit (and every snapshot operation's
    carry-forward) propagates them, so this is O(1) amortized."""
    seq = table.current_seq()
    while seq is not None and seq >= 1:
        try:
            s = table.manifest(seq).get("summary", {})
        except ValueError:  # expired manifest: nothing streamed survives it
            return {}
        if "stream_max_epoch" in s or "stream_epochs" in s:
            return s
        seq -= 1
    return {}


def last_stream_epoch(table: SnapshotTable, stream_id: str | None = None) -> int:
    """Highest micro-batch epoch committed to ``table`` (-1 if none).

    ``stream_id`` scopes the watermark to ONE logical stream (keyed by
    its checkpoint location — Delta's txnAppId pattern): a query
    restarted from a FRESH checkpoint gets a new id and batchIds that
    restart at 0, and without the scoping its first batches would be
    silently skipped as "replays" of a different stream's epochs.
    ``None`` returns the legacy global watermark (back-compat reads)."""
    s = _latest_stream_summary(table)
    if stream_id is not None:
        per = s.get("stream_epochs")
        if isinstance(per, dict):
            return int(per.get(stream_id, -1))
        # legacy table (pre-per-stream manifests): fall back to the
        # global watermark — preserves replay protection for the stream
        # that wrote it; a fresh checkpoint on such a table should pass
        # a new table root or upgrade by one manual commit
        return int(s.get("stream_max_epoch", -1))
    return int(s.get("stream_max_epoch", -1))


def snapshot_batch_writer(
    root: str, extra_summary: Optional[dict] = None, stream_id: str = ""
) -> Callable[[DataFrame, int], None]:
    """The ``foreachBatch`` function: commit the micro-batch as one
    snapshot, or skip it entirely if its epoch already committed BY THIS
    STREAM (``stream_id`` — the checkpoint location; two different
    streams never skip each other's epochs, and a fresh checkpoint never
    mistakes an old stream's watermark for its own)."""

    def _write(batch_df: DataFrame, epoch_id: int) -> None:
        table = SnapshotTable(root)
        if epoch_id <= last_stream_epoch(table, stream_id):
            return  # replayed batch: already durable, exactly-once skip
        prev = _latest_stream_summary(table)
        per = dict(prev.get("stream_epochs") or {})
        per[stream_id] = int(epoch_id)
        table.append(
            batch_df,
            summary={
                **(extra_summary or {}),
                "stream_epoch": int(epoch_id),
                "stream_max_epoch": max(
                    int(epoch_id), int(prev.get("stream_max_epoch", -1))
                ),
                "stream_epochs": per,
            },
        )

    return _write


def start_snapshot_sink_stream(
    stream_df: DataFrame,
    root: str,
    checkpoint_dir: str,
    available_now: bool = True,
    query_name: str = "snapshot_sink",
):
    """Attach the snapshot-commit sink to a streaming DataFrame.

    Returns the StreamingQuery; callers ``.awaitTermination()`` it.  With
    ``available_now`` the stream drains present input and stops (the
    batch-equivalent trigger used across the streaming tests)."""
    writer = (
        stream_df.writeStream.queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(snapshot_batch_writer(root, stream_id=checkpoint_dir))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
