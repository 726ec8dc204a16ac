"""Streaming sink into the snapshot log: one commit per micro-batch,
exactly-once under batch replay (streaming/snapshot_sink.py)."""

from pyspark.sql import functions as F

from table_ocr_spark import synth
from table_ocr_spark.sources.catalog import write_transcripts_parquet
from table_ocr_spark.sources.snapshots import SnapshotTable
from table_ocr_spark.streaming.snapshot_sink import (
    last_stream_epoch,
    snapshot_batch_writer,
    start_snapshot_sink_stream,
)


def test_stream_commits_snapshots_and_resumes_incrementally(spark, tmp_path):
    from table_ocr_spark.streaming.stream_extract import read_transcript_stream

    inp = str(tmp_path / "in")
    write_transcripts_parquet(synth.gen_pandas(6, seed=9, max_long=30), inp)
    root = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")

    src = read_transcript_stream(spark, inp, max_files_per_trigger=3)
    q = start_snapshot_sink_stream(
        src.select("conv_id", "turn_idx", "text"), root, ckpt
    )
    q.awaitTermination(120)

    t = SnapshotTable(root)
    h = t.history()
    assert len(h) >= 1  # >=1 epoch committed (8 input files / 3 per trigger)
    assert all("stream_epoch" in e["summary"] for e in h)
    n_input = spark.read.parquet(inp).count()
    assert t.read(spark).count() == n_input

    # restart from the same checkpoint with NO new data: no new snapshots
    seq_before = t.current_seq()
    q2 = start_snapshot_sink_stream(
        read_transcript_stream(spark, inp, max_files_per_trigger=3)
        .select("conv_id", "turn_idx", "text"),
        root,
        ckpt,
    )
    q2.awaitTermination(120)
    assert t.current_seq() == seq_before

    # new file lands -> exactly the new rows commit as the next epoch
    extra = synth.gen_pandas(2, seed=77, max_long=10)
    write_transcripts_parquet(extra, str(tmp_path / "in2"))
    import shutil, os
    for f in os.listdir(str(tmp_path / "in2")):
        shutil.copy(str(tmp_path / "in2" / f), os.path.join(inp, "new-" + f))
    q3 = start_snapshot_sink_stream(
        read_transcript_stream(spark, inp, max_files_per_trigger=100)
        .select("conv_id", "turn_idx", "text"),
        root,
        ckpt,
    )
    q3.awaitTermination(120)
    assert t.current_seq() > seq_before
    assert t.read(spark).count() == spark.read.parquet(inp).count()


def test_replayed_epoch_is_skipped_exactly_once(spark, tmp_path):
    """The foreachBatch function is idempotent per epoch: a replay of an
    already-committed batchId (Structured Streaming's crash contract)
    commits nothing."""
    root = str(tmp_path / "tbl")
    writer = snapshot_batch_writer(root)
    df = spark.createDataFrame([(1, "x")], "k int, v string")

    writer(df, 0)
    writer(df, 1)
    t = SnapshotTable(root)
    assert t.current_seq() == 2 and last_stream_epoch(t) == 1
    # crash-replay of epoch 1: skipped, nothing committed
    writer(df, 1)
    assert t.current_seq() == 2
    assert t.read(spark).count() == 2
    # and the next real epoch commits normally
    writer(df, 2)
    assert t.current_seq() == 3 and last_stream_epoch(t) == 2


def test_fresh_checkpoint_stream_not_skipped_as_replay(spark, tmp_path):
    """The epoch watermark is scoped per stream (its checkpoint identity,
    Delta's txnAppId pattern): a NEW stream whose batchIds restart at 0
    must not have its first batches silently skipped as 'replays' of an
    old stream's epochs — while each stream's own replays still skip."""
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "x")], "k int, v string")

    a = snapshot_batch_writer(root, stream_id="ckpt-A")
    a(df, 0)
    a(df, 1)
    t = SnapshotTable(root)
    assert t.read(spark).count() == 2

    # stream B: fresh checkpoint, batchIds restart at 0 — MUST commit
    b = snapshot_batch_writer(root, stream_id="ckpt-B")
    b(df, 0)
    assert t.read(spark).count() == 3
    # B's own replay of epoch 0 skips; A's replay of epoch 1 skips;
    # B's next epoch commits
    b(df, 0)
    a(df, 1)
    assert t.read(spark).count() == 3
    b(df, 1)
    assert t.read(spark).count() == 4
    assert last_stream_epoch(t, "ckpt-A") == 1
    assert last_stream_epoch(t, "ckpt-B") == 1


def test_stale_stream_epochs_summary_merges_not_replaces(spark, tmp_path):
    """ADVICE r5 (snapshots.py append): a commit whose summary carries a
    stream_epochs dict computed from a PRE-RACE read must not erase a
    concurrent stream's newer epoch — the table merges per-stream max
    instead of caller-wins.  Without the merge, stream A's watermark
    drops back to absent and a crash-replay of A's batch double-commits."""
    root = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "x")], "k int, v string")

    a = snapshot_batch_writer(root, stream_id="ckpt-A")
    a(df, 5)
    t = SnapshotTable(root)
    assert last_stream_epoch(t, "ckpt-A") == 5

    # stream B appends with a summary built BEFORE A's commit landed:
    # its stream_epochs dict has only B's entry.  The commit must merge
    # A's {ckpt-A: 5} from the base manifest, not replace it.
    t.append(
        df,
        summary={
            "stream_epoch": 3,
            "stream_max_epoch": 3,
            "stream_epochs": {"ckpt-B": 3},
        },
    )
    assert last_stream_epoch(t, "ckpt-A") == 5  # survived B's stale dict
    assert last_stream_epoch(t, "ckpt-B") == 3
    assert last_stream_epoch(t) == 5  # global max merged too

    # A's crash-replay of epoch 5 must still skip (exactly-once held)
    n = t.read(spark).count()
    a(df, 5)
    assert t.read(spark).count() == n

    # and the merge holds through every other commit kind that carries
    # the watermark (overwrite shown; compact/evolve/merge/delete share
    # the same helper)
    t.overwrite(df, summary={"stream_epochs": {"ckpt-C": 1}})
    assert last_stream_epoch(t, "ckpt-A") == 5
    assert last_stream_epoch(t, "ckpt-C") == 1
