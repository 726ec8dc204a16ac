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
    """Repartition by (conv_id, salt) where salt spreads only skewed convs.

    Normal convs keep salt=0 → they stay co-located (useful for any
    downstream conversation-scoped stage); long convs spread over
    ``salt_buckets`` tasks.
    """
    heavy = skewed_conv_ids(df, cfg.skew_turns_threshold).withColumn(
        "_is_heavy", F.lit(True)
    )
    salted = (
        df.join(F.broadcast(heavy), "conv_id", "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_is_heavy").isNotNull(),
                F.pmod(F.col("turn_idx"), F.lit(cfg.salt_buckets)),
            ).otherwise(F.lit(0)),
        )
        .drop("_is_heavy")
    )
    n = num_partitions or cfg.target_partitions
    if n:
        out = salted.repartition(n, "conv_id", "_salt")
    else:
        out = salted.repartition("conv_id", "_salt")
    return out.drop("_salt")
