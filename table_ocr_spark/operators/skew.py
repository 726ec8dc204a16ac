"""Skew-aware repartitioning (axis B — explicit partitioning/shuffle/skew).

At 10^12 turns, conversation lengths are heavy-tailed (FIXTURES.md: 1% of
convs hold 2k-20k turns).  A plain ``repartition(hash(conv_id))`` puts a
whole long conversation in one task — the straggler that caps scaling
efficiency below the 0.8 north-rule bar.  Per-turn extraction is
embarrassingly parallel, so salting long conversations is semantics-free:

    salt = turn_idx % salt_buckets          (long convs only)
    partition key = (conv_id, salt)

AQE skew handling does NOT cover Python-UDF stages (it rebalances joins and
shuffle reads, not the work inside one task), hence the explicit salt
(SURVEY.md §4.1 skew row).

The skew sketch is a cheap ``groupBy(conv_id).count()`` — at scale, a
partial-aggregated two-stage count over just the conv_id column (pruned
scan), then only conv_ids above threshold are collected: that set is tiny
(heavy hitters by definition) and is broadcast back as a join or literal
filter.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from table_ocr_spark.config import DEFAULT_CONFIG, ExtractorConfig


def skewed_conv_ids(df: DataFrame, threshold: int) -> DataFrame:
    """Heavy-hitter sketch: conv_ids with > threshold turns. Output is small
    by construction (heavy hitters), safe to broadcast."""
    return (
        df.groupBy("conv_id")
        .agg(F.count(F.lit(1)).alias("n_turns"))
        .filter(F.col("n_turns") > threshold)
        .select("conv_id")
    )


def salted_repartition(
    df: DataFrame,
    cfg: ExtractorConfig = DEFAULT_CONFIG,
    num_partitions: int | None = None,
) -> DataFrame:
    """Selective skew salting: shuffle ONLY the heavy conversations.

    Rows of normal conversations keep their scan partitioning — zero
    shuffle bytes for the balanced majority.  Rows of heavy conversations
    (the skew sketch's output) are salted by ``turn_idx % salt_buckets``
    and repartitioned so no single task owns a whole long conversation.
    The two branches union; per-turn extraction is order-free so the union
    is semantics-free (any ordering requirement is applied downstream via
    Window/sortWithinPartitions per the north rule).

    Versus salting everything: shuffle volume drops from 100% of the input
    to exactly the skewed tail — at 100 TB that is the difference between
    re-shuffling the corpus and re-shuffling a few hot conversations.
    """
    heavy = skewed_conv_ids(df, cfg.skew_turns_threshold)
    light_rows = df.join(F.broadcast(heavy), "conv_id", "left_anti")
    heavy_rows = (
        df.join(F.broadcast(heavy), "conv_id", "left_semi")
        .withColumn("_salt", F.pmod(F.col("turn_idx"), F.lit(cfg.salt_buckets)))
    )
    n = num_partitions or cfg.target_partitions
    if n:
        heavy_balanced = heavy_rows.repartition(n, "conv_id", "_salt")
    else:
        heavy_balanced = heavy_rows.repartition("conv_id", "_salt")
    return light_rows.unionByName(heavy_balanced.drop("_salt"))
