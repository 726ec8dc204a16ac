"""Snapshot commit-log (Iceberg-analog) semantics: atomic commits,
snapshot-isolated reads, time travel, rollback, optimistic concurrency,
footer-stats file pruning, expiry GC (sources/snapshots.py)."""

import os

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from table_ocr_spark.sources.snapshots import CommitConflict, FileEntry, SnapshotTable


def _batch(spark, lo, hi, tag):
    return spark.createDataFrame(
        [Row(k=i, tag=tag) for i in range(lo, hi)], "k int, tag string"
    )


def _rows(df):
    return sorted((r.k, r.tag) for r in df.collect())


def test_append_time_travel_history(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    assert t.current_seq() is None
    s1 = t.append(_batch(spark, 0, 10, "a"), summary={"run": "r1"})
    s2 = t.append(_batch(spark, 10, 20, "b"))
    s3 = t.append(_batch(spark, 20, 30, "c"))
    assert (s1, s2, s3) == (1, 2, 3)
    # current read sees the union; time travel sees each prefix
    assert _rows(t.read(spark)) == _rows(
        _batch(spark, 0, 10, "a").union(_batch(spark, 10, 20, "b")).union(_batch(spark, 20, 30, "c"))
    )
    assert _rows(t.read(spark, seq=1)) == _rows(_batch(spark, 0, 10, "a"))
    assert _rows(t.read(spark, seq=2)) == _rows(
        _batch(spark, 0, 10, "a").union(_batch(spark, 10, 20, "b"))
    )
    h = t.history()
    assert [e["seq"] for e in h] == [1, 2, 3]
    assert h[0]["summary"] == {"run": "r1"}
    assert h[0]["parent_seq"] is None and h[2]["parent_seq"] == 2
    assert h[2]["rows"] == 30  # appends accumulate files


def test_snapshot_isolation_of_planned_read(spark, tmp_path):
    """A DataFrame planned against snapshot N is unaffected by commits
    that land after planning — the file list is pinned at plan time."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_batch(spark, 0, 5, "a"))
    df = t.read(spark)  # planned now
    t.append(_batch(spark, 5, 10, "b"))  # lands after
    assert _rows(df) == _rows(_batch(spark, 0, 5, "a"))
    assert len(t.read(spark).collect()) == 10  # a fresh read does see both


def test_overwrite_and_rollback(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_batch(spark, 0, 10, "a"))
    t.overwrite(_batch(spark, 100, 105, "z"))
    assert _rows(t.read(spark)) == _rows(_batch(spark, 100, 105, "z"))
    # pre-overwrite snapshot still addressable
    assert _rows(t.read(spark, seq=1)) == _rows(_batch(spark, 0, 10, "a"))
    s = t.rollback(1)
    assert s == 3 and t.manifest()["operation"] == "rollback"
    assert _rows(t.read(spark)) == _rows(_batch(spark, 0, 10, "a"))
    # rollback preserved history: the overwritten state is still seq 2
    assert _rows(t.read(spark, seq=2)) == _rows(_batch(spark, 100, 105, "z"))


def test_commit_conflict_and_append_rebase(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_batch(spark, 0, 5, "a"))
    base = t.current_seq()
    files = [FileEntry.from_json(d) for d in t.manifest()["files"]]
    # a racing writer lands first
    t.append(_batch(spark, 5, 10, "b"))
    # pinned-parent commit must abort (Iceberg validateFromSnapshot)
    with pytest.raises(CommitConflict):
        t.commit(files, "overwrite", expected_parent=base)
    # append() rebases instead of aborting: both writers' rows survive
    t.append(_batch(spark, 10, 15, "c"))
    assert len(t.read(spark).collect()) == 15
    # exclusive publish: a manifest seq can never be silently overwritten
    with pytest.raises(CommitConflict):
        t._publish({"seq": t.current_seq(), "files": []}, t.current_seq())


def test_stats_pruning_skips_files(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    # three disjoint k-ranges -> three snapshots, one file each (coalesce(1))
    for lo in (0, 100, 200):
        t.append(_batch(spark, lo, lo + 50, "x").coalesce(1))
    full = t.read(spark)
    assert len(full.inputFiles()) == 3
    pruned = t.read(spark, prune=("k", 120, 140))
    assert len(pruned.inputFiles()) == 1  # only the middle file survives
    # pruning is file-level: exact filter on top gives the exact answer
    got = sorted(r.k for r in pruned.filter((F.col("k") >= 120) & (F.col("k") <= 140)).collect())
    want = sorted(r.k for r in full.filter((F.col("k") >= 120) & (F.col("k") <= 140)).collect())
    assert got == want and len(got) == 21
    # one-sided range
    assert len(t.read(spark, prune=("k", 150, None)).inputFiles()) == 1
    # string-column pruning works off footer byte-stats (every tag is "x")
    assert len(t.read(spark, prune=("tag", "y", None)).inputFiles()) == 0


def test_expire_gc(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_batch(spark, 0, 5, "a").coalesce(1))
    t.overwrite(_batch(spark, 5, 10, "b").coalesce(1))  # snap-1's file now dead
    t.append(_batch(spark, 10, 15, "c").coalesce(1))
    before = _rows(t.read(spark))
    res = t.expire(keep_last=2)
    assert res["manifests_removed"] == 1
    assert res["files_removed"] == 1  # snap-1's file referenced by no survivor
    assert _rows(t.read(spark)) == before  # live reads untouched
    with pytest.raises(ValueError):
        t.read(spark, seq=1)  # expired snapshot is a clean error
    # remaining data files are exactly the live set
    live = {d["path"] for d in t.manifest(2)["files"]} | {
        d["path"] for d in t.manifest(3)["files"]
    }
    on_disk = {os.path.join("data", f) for f in os.listdir(t.data_dir)}
    assert on_disk == live


def test_empty_snapshot_read_keeps_schema(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_batch(spark, 0, 0, "a"))  # zero rows
    df = t.read(spark)
    assert df.count() == 0
    assert [f.name for f in df.schema.fields] == ["k", "tag"]


def test_compaction_rewrites_small_files_atomically(spark, tmp_path):
    """compact(): many small files -> few target-sized files in ONE
    'compact' commit; rows identical; pre-compaction history readable;
    second compact is a no-op."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    for lo in range(0, 60, 10):  # 6 appends -> 6 single-file snapshots
        t.append(_batch(spark, lo, lo + 10, "x").coalesce(1))
    before = _rows(t.read(spark))
    assert len(t.read(spark).inputFiles()) == 6
    seq = t.compact(spark, target_file_bytes=1 << 30)  # everything fits one
    assert seq == 7 and t.manifest()["operation"] == "compact"
    assert len(t.read(spark).inputFiles()) == 1
    assert _rows(t.read(spark)) == before
    s = t.manifest()["summary"]
    assert s["files_before"] == 6 and s["files_after"] == 1
    # history preserved: the pre-compaction snapshot still reads
    assert len(t.read(spark, seq=3).collect()) == 30
    # already within budget -> no new commit
    assert t.compact(spark, target_file_bytes=1 << 30) is None
    assert t.current_seq() == 7


def test_compaction_carries_stream_epoch_watermark(spark, tmp_path):
    from table_ocr_spark.streaming.snapshot_sink import last_stream_epoch

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_batch(spark, 0, 5, "a").coalesce(1),
             summary={"stream_epoch": 3, "stream_max_epoch": 3})
    t.append(_batch(spark, 5, 9, "b").coalesce(1),
             summary={"stream_epoch": 4, "stream_max_epoch": 4})
    assert last_stream_epoch(t) == 4
    t.compact(spark, target_file_bytes=1 << 30)
    assert t.manifest()["operation"] == "compact"
    # watermark survives compaction + expiry of the original commits
    t.expire(keep_last=1)
    assert last_stream_epoch(t) == 4


def test_clustered_compaction_enables_pruning(spark, tmp_path):
    """cluster_by compaction: hash-mixed small files (stats span all k)
    become range-clustered files with near-disjoint [min,max], so a
    stats-prune that read everything before reads one file after."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    # interleaved appends: every file spans nearly the full k range
    for off in range(4):
        rows = [Row(k=off + 4 * i, tag="x") for i in range(75)]
        t.append(
            spark.createDataFrame(rows, "k int, tag string").coalesce(1)
        )
    assert len(t.read(spark).inputFiles()) == 4
    # stats-prune on a narrow slice cannot skip anything: all files overlap
    assert len(t.read(spark, prune=("k", 10, 20)).inputFiles()) == 4
    # small target forces multiple output files; clustering makes them
    # k-disjoint (range partitioner)
    total = sum(FileEntry.from_json(d).bytes for d in t.manifest()["files"])
    t.compact(spark, target_file_bytes=total // 4 + 1, cluster_by=["k"])
    after = t.read(spark, prune=("k", 10, 20))
    assert 1 <= len(after.inputFiles()) < 4
    got = sorted(r.k for r in after.filter((F.col("k") >= 10) & (F.col("k") <= 20)).collect())
    assert got == list(range(10, 21))
    # full contents unchanged
    assert t.read(spark).count() == 300


def test_incremental_read_changes(spark, tmp_path):
    """read_changes: downstream consumers read only files added after
    their watermark seq; non-append commits in the range raise instead of
    silently double-counting."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_batch(spark, 0, 10, "a"))
    t.append(_batch(spark, 10, 20, "b"))
    t.append(_batch(spark, 20, 30, "c"))
    # after seq1 -> exactly batches b+c
    assert _rows(t.read_changes(spark, after_seq=1)) == _rows(
        _batch(spark, 10, 20, "b").union(_batch(spark, 20, 30, "c"))
    )
    # bounded range
    assert _rows(t.read_changes(spark, after_seq=1, until_seq=2)) == _rows(
        _batch(spark, 10, 20, "b")
    )
    # from the beginning
    assert len(t.read_changes(spark, after_seq=0).collect()) == 30
    # caught-up consumer: empty frame, schema intact
    caught = t.read_changes(spark, after_seq=3)
    assert caught.count() == 0 and [f.name for f in caught.schema.fields] == ["k", "tag"]
    # compaction breaks row-level change tracking -> clean error
    t.compact(spark, target_file_bytes=1 << 30)
    with pytest.raises(ValueError, match="non-append"):
        t.read_changes(spark, after_seq=2)
    # but a fresh watermark past the compact works again
    t.append(_batch(spark, 30, 35, "d"))
    assert _rows(t.read_changes(spark, after_seq=4)) == _rows(_batch(spark, 30, 35, "d"))


def test_delete_range_preserves_null_rows(spark, tmp_path):
    """NULL is never in [lo, hi]: null-bearing files must not be dropped
    metadata-only, and rewritten files must keep their null rows (the
    raw negated filter evaluates to NULL for them)."""
    from table_ocr_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    df = spark.createDataFrame(
        [(1, 10), (2, 20), (3, None), (4, None)], "k long, v long"
    ).coalesce(1)
    t.append(df)
    # delete the whole non-null range: the single file's [min,max] is
    # fully covered, but it carries nulls -> must REWRITE, keeping them
    t.delete_range(spark, "v", 0, 100)
    left = t.read(spark).collect()
    assert sorted(r.k for r in left) == [3, 4]
    assert all(r.v is None for r in left)


def test_expire_guards_and_orphan_grace(spark, tmp_path):
    """keep_last < 1 would expire the current snapshot (total data loss)
    and must raise; an unreferenced data file younger than the grace
    window (a racing writer's staged file) survives expire."""
    import pytest as _pytest

    from table_ocr_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_batch(spark, 0, 5, "a"))
    with _pytest.raises(ValueError, match="keep_last"):
        t.expire(keep_last=0)
    # simulate a concurrent writer's freshly staged (uncommitted) file
    staged = t.data_dir + "/inflight-test.parquet"
    with open(staged, "wb") as f:
        f.write(b"not yet committed")
    t.append(_batch(spark, 5, 10, "b"))
    r = t.expire(keep_last=1)
    import os
    assert os.path.exists(staged), r  # inside the grace window: kept
    assert t.expire(keep_last=1, orphan_grace_seconds=0)["files_removed"] >= 1
    assert not os.path.exists(staged)  # grace elapsed: collected
    assert t.read(spark).count() == 10  # live data untouched throughout


def test_read_changes_empty_table_raises_cleanly(spark, tmp_path):
    import pytest as _pytest

    from table_ocr_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    with _pytest.raises(ValueError, match="no snapshots"):
        t.read_changes(spark, after_seq=0)


def test_append_rebase_adopts_evolved_schema_and_carries_epoch(spark, tmp_path):
    """A concurrent additive evolution landing between an append's staging
    and its commit must not be reverted: the rebase commits the base's
    evolved schema.  A plain append also carries the exactly-once
    streaming watermark forward instead of erasing it."""
    from table_ocr_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_batch(spark, 0, 5, "a"), summary={"stream_max_epoch": 7})

    orig = t._stage_df

    def hooked(df):
        out = orig(df)
        # a concurrent writer evolves the schema mid-flight
        t.add_columns([("extra", "double")])
        return out

    t._stage_df = hooked
    try:
        seq = t.append(_batch(spark, 5, 10, "b"))
    finally:
        t._stage_df = orig
    m = t.manifest(seq)
    import json as _json
    names = [f["name"] for f in _json.loads(m["schema"])["fields"]]
    assert "extra" in names  # evolution NOT silently reverted
    assert m["summary"]["stream_max_epoch"] == 7  # watermark carried
    got = t.read(spark)
    assert "extra" in got.columns and got.count() == 10


def test_merge_handles_percent_encoded_roots(spark, tmp_path):
    """A root with spaces: input_file_name() yields a percent-encoded
    URI; merge must still match files and UPDATE instead of duplicating."""
    from pyspark.sql import functions as F

    from table_ocr_spark.sources.snapshots import SnapshotTable

    t = SnapshotTable(str(tmp_path / "my tables" / "t"))
    t.append(_batch(spark, 0, 5, "a"))
    src = spark.createDataFrame([(2, "UPDATED")], "k int, tag string")
    t.merge(spark, src, ["k"], when_matched="update")
    out = t.read(spark)
    assert out.count() == 5  # no duplicate k=2
    assert out.filter(F.col("k") == 2).first().tag == "UPDATED"
