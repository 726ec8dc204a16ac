"""Deterministic global shuffle + scalable sequence indexing.

Training runs need the curated corpus in a *fixed pseudo-random order*
(SGD convergence depends on it; resumable jobs and repro depend on it
being the SAME order every run).  The reference's single-process flow
never faces this (its output is one JSON per image); at 10^12 rows the
naive answers are both wrong:

* ``ORDER BY rand()`` — non-reproducible AND a full sort;
* a global ``row_number()`` window — Spark plans an empty
  ``partitionBy`` window as a SINGLE partition: every row funnels
  through one task, the canonical driver-shaped bottleneck.

Here order is *derived from the data*: the shuffle key is
``md5(key_cols ++ salt)`` — uniform, reproducible, salt-rotatable per
epoch, and computable in parallel with no RNG state.  The global
sequence number is assigned with the two-level bucket-offset pattern:

1. bucket = first ``bucket_hex`` hex chars of the key (value-derived,
   so recomputation is deterministic — no ``spark_partition_id()``
   dependence, no persist needed for correctness);
2. one small map-side-combined count per bucket → cumulative offsets
   on the driver (O(buckets), ~4096 rows) → broadcast join back;
3. ``row_number()`` windowed WITHIN each bucket (the shuffle spreads
   over ``buckets`` partitions, ~rows/4096 each) + the bucket's offset.

Two passes over the input, zero single-partition stages.  Writers that
only need *order*, not *numbers*, should skip the index and use
``shuffled()`` — repartitionByRange + sortWithinPartitions gives
globally range-ordered files for one shuffle pass.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: unit separator — cannot appear in parquet string columns' text, so
#: concat_ws cannot collide distinct key tuples
_SEP = "\x1f"


def shuffle_key_col(key_cols: List[str], salt: str = "") -> Column:
    """``md5(key1 \\x1f key2 ... \\x1f salt)`` — the deterministic
    shuffle key.  Rotate ``salt`` to get a fresh independent order per
    training epoch without touching the data."""
    parts = [F.col(c).cast("string") for c in key_cols] + [F.lit(salt)]
    return F.md5(F.concat_ws(_SEP, *parts))


def shuffled(
    df: DataFrame,
    key_cols: List[str],
    salt: str = "",
    num_partitions: Optional[int] = None,
) -> DataFrame:
    """Rows in deterministic pseudo-random order, partition-ranged: file
    i's keys all sort before file i+1's (reading partitions in order
    yields the full global order).  One range shuffle, no global sort
    bottleneck — exactly how a 100-TB training corpus lands on disk."""
    d = df.withColumn("_shuffle_key", shuffle_key_col(key_cols, salt))
    n = num_partitions or d.sparkSession.conf.get("spark.sql.shuffle.partitions")
    # drop the key after the sort (a projection preserves physical order):
    # it is derivable from key_cols at will, and writing 32 hex chars per
    # row into the corpus would be ~32 TB of dead weight at 10^12 rows
    return (
        d.repartitionByRange(int(n), "_shuffle_key")
        .sortWithinPartitions("_shuffle_key")
        .drop("_shuffle_key")
    )


def global_shuffle_index(
    df: DataFrame,
    key_cols: List[str],
    salt: str = "",
    bucket_hex: int = 3,
    seq_col: str = "seq",
) -> DataFrame:
    """Assign a stable 0-based global sequence number in shuffle-key
    order — the distributed ``row_number() OVER (ORDER BY md5(key))``
    without its single-partition window.

    ``bucket_hex`` hex chars → 16^n buckets (default 4096); each bucket
    ranks ~rows/4096 locally, and cross-bucket offsets come from one
    tiny counts aggregation broadcast back.  Requires ``key_cols`` to be
    unique per row (md5 keys then tie-break-free); duplicate keys would
    make the order — and therefore the index — ambiguous, so the
    composite key should include the row's natural primary key.
    """
    key = shuffle_key_col(key_cols, salt)
    d = df.withColumn("_shuffle_key", key).withColumn(
        "_bucket", F.substring("_shuffle_key", 1, bucket_hex)
    )
    counts = d.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_n"))
    w = Window.orderBy("_bucket").rowsBetween(Window.unboundedPreceding, -1)
    # the offsets frame is O(16^bucket_hex) rows: the window's single
    # partition is fine THERE (4096 rows on one task), and the join back
    # is a broadcast
    offsets = counts.withColumn(
        "_offset", F.coalesce(F.sum("_n").over(w), F.lit(0))
    ).drop("_n")
    ranked = d.join(F.broadcast(offsets), "_bucket").withColumn(
        seq_col,
        (
            F.row_number().over(
                Window.partitionBy("_bucket").orderBy("_shuffle_key")
            )
            + F.col("_offset")
            - F.lit(1)
        ).cast("long"),
    )
    return ranked.drop("_bucket", "_offset", "_shuffle_key")
