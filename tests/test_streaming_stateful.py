"""Custom stateful streaming operator (applyInPandasWithState):
conv-scoped boilerplate strip with per-conversation running state."""

import os
import time

import pandas as pd


def _write_turns(spark, path, rows):
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    df.coalesce(1).write.mode("overwrite").parquet(path)


def _read_stream(spark, path, max_files=16):
    return (
        spark.readStream.schema("conv_id string, turn_idx int, text string")
        .option("maxFilesPerTrigger", max_files)
        .parquet(path)
    )


BANNER = "-- sent from my agent --"


def _conv(conv_id, n, banner_every=1):
    rows = []
    for i in range(n):
        body = f"unique line {conv_id}-{i}"
        text = body + ("\n" + BANNER if i % banner_every == 0 else "")
        rows.append((conv_id, i, text))
    return rows


def test_stateful_single_batch_equals_batch_operator(spark, tmp_path):
    """Whole conversation in ONE micro-batch → output equals the batch
    strip_conv_boilerplate exactly (same cut arithmetic, same kept lines)."""
    from table_ocr_spark.operators.conv_scope import strip_conv_boilerplate
    from table_ocr_spark.streaming.stateful import stream_conv_boilerplate

    rows = _conv("a", 5) + _conv("b", 4, banner_every=4) + _conv("tiny", 2)
    src_dir = str(tmp_path / "in")
    _write_turns(spark, src_dir, rows)

    out = stream_conv_boilerplate(_read_stream(spark, src_dir))
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_strip")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("select * from stateful_strip")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )

    batch_df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    want = (
        strip_conv_boilerplate(batch_df, method="gather")
        .toPandas()
        .sort_values(["conv_id", "turn_idx"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want[got.columns.tolist()])
    # sanity: conv a's banner (5/5 turns) was actually banned
    assert all(BANNER not in t for t in got[got.conv_id == "a"].text_stripped)
    # conv b's banner appears in 1/4 turns -> kept
    assert any(BANNER in t for t in got[got.conv_id == "b"].text_stripped)


def test_stateful_incremental_prefix_semantics(spark, tmp_path):
    """Conversation split across two micro-batches: the first batch (2
    banner turns, below min_turns) strips nothing; by the second batch the
    accumulated state crosses the cut and the NEW turns are stripped —
    state genuinely persists across batches."""
    from table_ocr_spark.streaming.stateful import stream_conv_boilerplate

    src_dir = str(tmp_path / "in2")
    all_rows = _conv("c", 6)
    _write_turns(spark, os.path.join(src_dir, "f1"), all_rows[:2])
    time.sleep(1.1)  # file-source batches follow mtime order
    _write_turns(spark, os.path.join(src_dir, "f2"), all_rows[2:])

    stream = (
        spark.readStream.schema("conv_id string, turn_idx int, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir + "/*")
    )
    out = stream_conv_boilerplate(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("stateful_prefix")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r.turn_idx: r
        for r in spark.sql("select * from stateful_prefix").collect()
    }
    assert len(got) == 6
    # batch 1 (turns 0-1): 2 turns seen < min_turns=3 -> nothing banned
    assert BANNER in got[0].text_stripped and got[0].n_banned_lines == 0
    assert BANNER in got[1].text_stripped
    # batch 2 (turns 2-5): 6 turns seen, banner in all 6 -> banned now
    for i in range(2, 6):
        assert BANNER not in got[i].text_stripped, i
        assert got[i].n_banned_lines == 1


class _FakeState:
    """Minimal GroupState stand-in for handler-level unit tests."""

    def __init__(self, value=None, timed_out=False):
        self._v = value
        self.hasTimedOut = timed_out
        self.removed = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        if self._v is None:
            raise ValueError("state does not exist")
        return self._v

    def update(self, v):
        self._v = v

    def remove(self):
        self._v, self.removed = None, True

    def setTimeoutDuration(self, ms):
        self.timeout_set = ms


def test_handler_timeout_evicts_state_no_spark():
    """The timed-out branch removes state and emits nothing; a resumed
    conversation restarts its counts (degrades, never corrupts)."""
    from table_ocr_spark.streaming.stateful import _strip_with_state

    handler = _strip_with_state(ratio=0.6, min_turns=3, idle_timeout_ms=5000)

    st = _FakeState(value=([1, 2], [3, 3], 3), timed_out=True)
    assert list(handler(("c",), iter([]), st)) == []
    assert st.removed

    # fresh batch after eviction: state restarts from zero and the
    # requested idle timeout is re-armed
    st2 = _FakeState()
    pdf = pd.DataFrame(
        {"turn_idx": [0, 1, 2], "text": [f"{BANNER}\nu{i}" for i in range(3)]}
    )
    (out,) = list(handler(("c",), iter([pdf]), st2))
    assert len(out) == 3 and st2.exists and st2.timeout_set == 5000
    # 3 turns >= min_turns and banner in 3/3 -> banned already
    assert all(BANNER not in t for t in out.text_stripped)
    hashes, counts, n = st2.get
    assert n == 3 and max(counts) == 3


def test_stateful_checkpoint_restart_exactly_once(spark, tmp_path):
    """Checkpoint-restart (the streaming sibling of tests/test_resume.py):
    the stateful strip stream drains batch 1 to a DURABLE parquet sink,
    the query is STOPPED, more source files arrive, and a NEW query object
    restarts from the same checkpoint dir.  Asserts (1) per-conversation
    state survives the restart — turns that arrive after the restart are
    stripped using counts accumulated BEFORE it; (2) the sink holds each
    turn exactly once (no replay of the committed batch); (3) a third
    restart with no new data emits zero rows (idempotent)."""
    from table_ocr_spark.streaming.stateful import stream_conv_boilerplate

    src_dir = str(tmp_path / "src")
    sink_dir = str(tmp_path / "sink")
    ckpt_dir = str(tmp_path / "ckpt")
    all_rows = _conv("c", 6)

    def _run_available(tag):
        stream = (
            spark.readStream.schema("conv_id string, turn_idx int, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src_dir + "/*")
        )
        q = (
            stream_conv_boilerplate(stream)
            .writeStream.format("parquet")
            .option("path", sink_dir)
            .option("checkpointLocation", ckpt_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    # run 1: only the first 2 turns exist -> drains batch 0, terminates
    _write_turns(spark, os.path.join(src_dir, "f1"), all_rows[:2])
    _run_available("run1")
    first = spark.read.parquet(sink_dir).collect()
    assert sorted(r.turn_idx for r in first) == [0, 1]
    # below min_turns=3 at batch time -> nothing banned yet
    assert all(BANNER in r.text_stripped for r in first)

    # run 2: restart from the SAME checkpoint after turns 2-5 arrive
    time.sleep(1.1)  # file-source ordering is mtime-based
    _write_turns(spark, os.path.join(src_dir, "f2"), all_rows[2:])
    _run_available("run2")
    got = {r.turn_idx: r for r in spark.read.parquet(sink_dir).collect()}

    # exactly-once: 6 distinct turns, none duplicated by the restart
    assert len(spark.read.parquet(sink_dir).collect()) == 6
    assert sorted(got) == list(range(6))
    # state recovery: the banner count from pre-restart turns 0-1 was
    # restored, so post-restart turns 2-5 cross the cut and are stripped
    for i in range(2, 6):
        assert BANNER not in got[i].text_stripped, i
        assert got[i].n_banned_lines == 1
    # pre-restart rows remain as committed (not rewritten)
    assert BANNER in got[0].text_stripped and BANNER in got[1].text_stripped

    # run 3: no new data -> no new rows (checkpoint marks everything done)
    _run_available("run3")
    assert len(spark.read.parquet(sink_dir).collect()) == 6
