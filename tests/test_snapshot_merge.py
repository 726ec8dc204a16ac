"""Copy-on-write MERGE + range DELETE on the snapshot log
(sources/snapshots.py merge/delete_range) — the row-level-update half of
the Iceberg-analog table format.

The scale contract under test is file-touch minimality: a merge rewrites
ONLY files containing matched keys (others carry forward by reference —
same path, zero IO), and a range delete drops fully-covered files
metadata-only.  Tests assert on the manifest's file paths and the commit
summary counters, not just row contents.
"""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from table_ocr_spark.sources.snapshots import SnapshotTable


def _batch(spark, lo, hi, tag):
    return spark.createDataFrame(
        [Row(k=i, tag=tag) for i in range(lo, hi)], "k int, tag string"
    )


def _rows(df):
    return sorted((r.k, r.tag) for r in df.collect())


def _paths(t, seq=None):
    return {d["path"] for d in t.manifest(seq)["files"]}


@pytest.fixture()
def table(spark, tmp_path):
    """3 appends -> 3 single-file snapshots with disjoint k ranges
    [0,10) [10,20) [20,30), so the stats cut is observable."""
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_batch(spark, 0, 10, "a").coalesce(1))
    t.append(_batch(spark, 10, 20, "b").coalesce(1))
    t.append(_batch(spark, 20, 30, "c").coalesce(1))
    return t


def test_merge_upsert_rewrites_only_matched_files(spark, table):
    before = _paths(table)
    src = spark.createDataFrame(
        [Row(k=5, tag="UP"), Row(k=7, tag="UP"), Row(k=100, tag="NEW")],
        "k int, tag string",
    )
    seq = table.merge(spark, src, ["k"])
    m = table.manifest(seq)
    assert m["operation"] == "merge"
    s = m["summary"]
    # only the [0,10) file contains k=5/7; [10,20) and [20,30) carry forward
    assert s["files_rewritten"] == 1 and s["files_untouched"] == 2
    assert len(_paths(table) & before) == 2  # untouched = same path, not a copy
    got = dict(_rows(table.read(spark)))
    assert got[5] == "UP" and got[7] == "UP" and got[100] == "NEW"
    assert got[4] == "a" and got[15] == "b" and len(got) == 31
    # pre-merge snapshot still time-travels
    assert dict(_rows(table.read(spark, seq=3)))[5] == "a"


def test_merge_insert_only_touches_nothing(spark, table):
    """Keys outside every file's stats range: zero rewrites, pure append
    of the source (the stats cut alone settles it)."""
    before = _paths(table)
    src = spark.createDataFrame([Row(k=500, tag="NEW")], "k int, tag string")
    seq = table.merge(spark, src, ["k"])
    s = table.manifest(seq)["summary"]
    assert s["files_rewritten"] == 0 and s["files_untouched"] == 3
    assert before <= _paths(table)
    assert table.read(spark).count() == 31


def test_merge_delete_by_key_set(spark, table):
    src = spark.createDataFrame(
        [Row(k=12, tag=None), Row(k=13, tag=None)], "k int, tag string"
    )
    seq = table.merge(spark, src, ["k"], when_matched="delete")
    s = table.manifest(seq)["summary"]
    assert s["files_rewritten"] == 1 and s["inserted_or_updated"] == 0
    ks = {k for k, _ in _rows(table.read(spark))}
    assert 12 not in ks and 13 not in ks and len(ks) == 28


def test_merge_duplicate_source_keys_raise(spark, table):
    src = spark.createDataFrame(
        [Row(k=5, tag="x"), Row(k=5, tag="y")], "k int, tag string"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        table.merge(spark, src, ["k"])
    assert table.current_seq() == 3  # nothing committed


def test_merge_into_empty_table_is_append(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.merge(spark, _batch(spark, 0, 5, "a"), ["k"])
    assert t.manifest()["operation"] == "append"
    assert t.read(spark).count() == 5


def test_merge_composite_key(spark, tmp_path):
    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(
        spark.createDataFrame(
            [Row(k=1, g="x", tag="old"), Row(k=1, g="y", tag="old")],
            "k int, g string, tag string",
        )
    )
    src = spark.createDataFrame([Row(k=1, g="y", tag="new")], "k int, g string, tag string")
    t.merge(spark, src, ["k", "g"])
    got = {(r.k, r.g): r.tag for r in t.read(spark).collect()}
    assert got[(1, "x")] == "old" and got[(1, "y")] == "new"


def test_delete_range_metadata_only_fast_path(spark, table):
    """[10,20) file fully covered -> dropped without a rewrite; [0,10)
    and [20,30) disjoint -> untouched; no straddlers -> zero data IO."""
    before = _paths(table)
    seq = table.delete_range(spark, "k", 10, 19)
    s = table.manifest(seq)["summary"]
    assert s["files_dropped_metadata_only"] == 1
    assert s["files_rewritten"] == 0 and s["files_untouched"] == 2
    assert _paths(table) < before  # pure subset: no file was written
    ks = {k for k, _ in _rows(table.read(spark))}
    assert ks == set(range(0, 10)) | set(range(20, 30))
    # deleted range still visible via time travel
    assert 15 in {k for k, _ in _rows(table.read(spark, seq=3))}


def test_delete_range_straddling_file_rewritten(spark, table):
    seq = table.delete_range(spark, "k", 5, 14)  # straddles files 1 and 2
    s = table.manifest(seq)["summary"]
    assert s["files_rewritten"] == 2 and s["files_untouched"] == 1
    assert s["files_dropped_metadata_only"] == 0
    ks = {k for k, _ in _rows(table.read(spark))}
    assert ks == set(range(0, 5)) | set(range(15, 30))


def test_merge_preserves_stream_epoch_watermark(spark, tmp_path):
    from table_ocr_spark.streaming.snapshot_sink import last_stream_epoch

    t = SnapshotTable(str(tmp_path / "tbl"))
    t.append(_batch(spark, 0, 5, "a"), summary={"stream_max_epoch": 7})
    t.merge(spark, spark.createDataFrame([Row(k=1, tag="u")], "k int, tag string"), ["k"])
    assert last_stream_epoch(t) == 7
    t.delete_range(spark, "k", 0, 0)
    assert last_stream_epoch(t) == 7


def test_merge_incremental_read_contract(spark, table):
    """read_changes refuses to cross a merge (file membership changed
    without row-level tracking) — same contract as compaction."""
    table.merge(
        spark, spark.createDataFrame([Row(k=5, tag="u")], "k int, tag string"), ["k"]
    )
    with pytest.raises(ValueError, match="non-append"):
        table.read_changes(spark, after_seq=2)


# ---------------------------------------------------------------- evolution


def test_add_columns_metadata_only(spark, table):
    """Schema evolution rewrites ZERO files; old rows read as NULL in the
    new column; new appends carry it; time travel shows the old schema."""
    before = _paths(table)
    seq = table.add_columns([("score", "double")])
    m = table.manifest(seq)
    assert m["operation"] == "evolve" and _paths(table) == before  # no rewrite
    df = table.read(spark)
    assert df.columns == ["k", "tag", "score"]
    assert df.filter(F.col("score").isNull()).count() == 30  # old files -> NULL
    # new append carries the column physically
    table.append(
        spark.createDataFrame([Row(k=100, tag="n", score=0.5)],
                              "k int, tag string, score double")
    )
    got = dict((r.k, r.score) for r in table.read(spark).collect())
    assert got[100] == 0.5 and got[5] is None
    # time travel: pre-evolution snapshot keeps the 2-column schema
    assert table.read(spark, seq=3).columns == ["k", "tag"]


def test_append_conforms_to_evolved_schema(spark, table):
    """An append still shaped like the OLD schema after evolution is
    null-filled, not silently schema-regressing; unknown columns and type
    mismatches raise."""
    table.add_columns([("score", "double")])
    table.append(_batch(spark, 100, 103, "z"))  # old 2-col shape: conformed
    assert table.read(spark).columns == ["k", "tag", "score"]
    assert (
        table.read(spark).filter((F.col("k") >= 100) & F.col("score").isNull()).count()
        == 3
    )
    with pytest.raises(ValueError, match="not in table schema"):
        table.append(
            spark.createDataFrame([Row(k=1, tag="a", rogue=1)],
                                  "k int, tag string, rogue int")
        )
    with pytest.raises(ValueError, match="df type"):
        table.append(
            spark.createDataFrame([Row(k=1, tag="a", score="oops")],
                                  "k int, tag string, score string")
        )


def test_add_columns_rejects_duplicates_and_merge_conforms(spark, table):
    with pytest.raises(ValueError, match="already exists"):
        table.add_columns([("tag", "string")])
    table.add_columns([("score", "double")])
    # merge with an old-shape source: conformed, NULL score on the upsert
    table.merge(
        spark, spark.createDataFrame([Row(k=5, tag="up")], "k int, tag string"), ["k"]
    )
    got = {r.k: (r.tag, r.score) for r in table.read(spark).collect()}
    assert got[5] == ("up", None) and len(got) == 30
