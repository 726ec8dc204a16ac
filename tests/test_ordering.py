"""Deterministic shuffle + scalable global sequence index
(operators/ordering.py)."""

import hashlib

from pyspark.sql import functions as F

from table_ocr_spark.operators.ordering import (
    global_shuffle_index,
    shuffle_key_col,
    shuffled,
)


def _df(spark, n=200, parts=8):
    return spark.range(n).repartition(parts).select(
        F.concat(F.lit("doc-"), F.col("id")).alias("doc_id"),
        (F.col("id") % 7).alias("v"),
    )


def _expected_order(n, salt="v1"):
    keys = {
        f"doc-{i}": hashlib.md5(f"doc-{i}\x1fv1".encode()).hexdigest()
        for i in range(n)
    }
    return sorted(keys, key=keys.get)


def test_global_index_matches_exact_rank(spark):
    out = global_shuffle_index(_df(spark), ["doc_id"], salt="v1")
    got = {r.doc_id: r.seq for r in out.collect()}
    for rank, doc in enumerate(_expected_order(200)):
        assert got[doc] == rank
    assert sorted(got.values()) == list(range(200))  # dense, 0-based, no gaps


def test_global_index_is_partitioning_invariant(spark):
    """Same seq regardless of input partitioning — the property RNG- or
    partition-id-based schemes lose."""
    a = global_shuffle_index(_df(spark, parts=3), ["doc_id"]).collect()
    b = global_shuffle_index(_df(spark, parts=13), ["doc_id"]).collect()
    assert {(r.doc_id, r.seq) for r in a} == {(r.doc_id, r.seq) for r in b}


def test_salt_rotates_order(spark):
    a = {r.doc_id: r.seq for r in global_shuffle_index(_df(spark), ["doc_id"], salt="epoch0").collect()}
    b = {r.doc_id: r.seq for r in global_shuffle_index(_df(spark), ["doc_id"], salt="epoch1").collect()}
    assert a != b  # fresh independent order per epoch
    assert sorted(a.values()) == sorted(b.values())  # both dense permutations


def test_ranking_window_is_bucket_partitioned(spark):
    """The scale guard: the window that ranks DATA rows must partition by
    _bucket — a no-partition window over the input would serialize 10^12
    rows through one task.  (The offsets window IS single-partition, over
    the O(4096)-row counts frame only — asserted by value above.)"""
    plan = global_shuffle_index(_df(spark), ["doc_id"])._jdf.queryExecution().executedPlan().toString()
    import re

    windows = re.findall(r"Window \[row_number\(\).*?\]", plan)
    assert windows, plan
    assert all("_bucket" in w for w in windows), windows


def test_shuffled_is_range_ordered_across_partitions(spark):
    from table_ocr_spark.operators.ordering import shuffle_key_col

    out = shuffled(_df(spark), ["doc_id"], salt="v1", num_partitions=6)
    # the internal key is dropped from the output schema — recompute it
    # (a projection preserves the physical row order being asserted)
    assert "_shuffle_key" not in out.columns
    rows = out.select(
        F.spark_partition_id().alias("pid"),
        shuffle_key_col(["doc_id"], "v1").alias("_shuffle_key"),
    ).collect()
    by_pid = {}
    for r in rows:
        by_pid.setdefault(r.pid, []).append(r._shuffle_key)
    # within-partition sorted AND partitions cover disjoint ascending ranges
    bounds = []
    for pid in sorted(by_pid):
        ks = by_pid[pid]
        assert ks == sorted(ks)
        bounds.append((ks[0], ks[-1]))
    for (_, hi), (lo, _) in zip(bounds, bounds[1:]):
        assert hi <= lo
    # concatenating partitions in order yields the exact global order
    flat = [k for pid in sorted(by_pid) for k in by_pid[pid]]
    assert flat == sorted(flat)


def test_shuffle_key_matches_reference_md5(spark):
    got = (
        spark.createDataFrame([("ab",)], "doc_id string")
        .select(shuffle_key_col(["doc_id"], "v1").alias("k"))
        .collect()[0]
        .k
    )
    assert got == hashlib.md5(b"ab\x1fv1").hexdigest()
