"""The end-to-end extraction job plan (SURVEY.md §3.4 lifecycle):

    read transcripts
      → bucket(N, conv_id)                       [partition spec]
      → salted repartition on (bucket, salt)     [axis B: skew-free balance]
      → sortWithinPartitions(conv_id, turn_idx)  [north rule: stable order]
      → extraction pandas UDF                    [one ArrowEvalPython stage]
      → write partitionBy(bucket), dynamic overwrite  [idempotent commit]
      → lineage rows per bucket                  [checkpoint-resume watermark]

Commit granularity is a *bucket group* (``commit_groups`` groups of
``n_buckets / commit_groups`` buckets each): each group is one Spark job
committed atomically — output partitions via dynamic partition overwrite
(re-running a group rewrites exactly its bucket dirs, never duplicating),
lineage appended after the data lands.  A killed run resumes by reading the
lineage manifest and skipping committed buckets (the anti-join/filter
described in SURVEY.md §4.1 caching row).

This emulates Iceberg snapshot-per-commit semantics over parquet
(SURVEY.md §7 hard-point 3); on a real cluster the write becomes
``df.writeTo("cat.db.extracted").overwritePartitions()`` with the same
bucket spec and the lineage table an ordinary Iceberg append — the plan
shape is identical.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field
from typing import List, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as WindowSpec

from table_ocr_spark.config import DEFAULT_CONFIG, ExtractorConfig
from table_ocr_spark.operators.extract_job import bucket_expr, with_extraction
from table_ocr_spark.operators.skew import skewed_conv_ids
from table_ocr_spark.sources.catalog import ExtractionTable


class SimulatedKill(RuntimeError):
    """Raised by tests to kill the job between group commits."""


@dataclass
class RunResult:
    run_id: str
    config_hash: str
    n_buckets: int
    committed_buckets: List[int] = field(default_factory=list)
    skipped_buckets: List[int] = field(default_factory=list)
    wall_ms: int = 0


def _salted_bucketed(df: DataFrame, cfg: ExtractorConfig, n_buckets: int) -> DataFrame:
    """bucket + salt + repartition + stable in-partition order.

    The salt spreads only heavy conversations (per-turn extraction is
    embarrassingly parallel, so this is semantics-free); normal convs keep
    salt=0 and stay co-located within their bucket.
    """
    heavy = skewed_conv_ids(df, cfg.skew_turns_threshold).withColumn("_is_heavy", F.lit(True))
    out = (
        df.withColumn("bucket", bucket_expr(n_buckets))
        .join(F.broadcast(heavy), "conv_id", "left")
        .withColumn(
            "_salt",
            F.when(
                F.col("_is_heavy").isNotNull(),
                F.pmod(F.col("turn_idx"), F.lit(cfg.salt_buckets)),
            ).otherwise(F.lit(0)),
        )
        .drop("_is_heavy")
    )
    parts = cfg.target_partitions
    if parts:
        out = out.repartition(parts, "bucket", "_salt")
    else:
        out = out.repartition("bucket", "_salt")
    # no sort here: the post-extraction ordering window re-gathers by
    # conv_id and sorts (conv_id, turn_idx) as part of its exchange
    return out.drop("_salt")


def run_extract(
    spark: SparkSession,
    input_path: str,
    output_root: str,
    cfg: ExtractorConfig = DEFAULT_CONFIG,
    n_buckets: int = 16,
    commit_groups: int = 4,
    run_id: Optional[str] = None,
    resume: bool = True,
    fail_after_groups: Optional[int] = None,
) -> RunResult:
    """Run (or resume) the extraction job. Idempotent per bucket."""
    t0 = time.time()
    run_id = run_id or f"run-{uuid.uuid4().hex[:8]}"
    table = ExtractionTable(output_root)
    chash = cfg.config_hash()
    table.write_config(cfg.to_json(), chash)

    committed = table.committed_buckets(spark, chash) if resume else set()
    result = RunResult(run_id=run_id, config_hash=chash, n_buckets=n_buckets)
    result.skipped_buckets = sorted(committed)

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    src = spark.read.parquet(input_path).select("conv_id", "turn_idx", "text")

    groups_done = 0
    for g in range(commit_groups):
        group_buckets = [b for b in range(n_buckets) if b % commit_groups == g]
        todo = [b for b in group_buckets if b not in committed]
        if not todo:
            continue
        gt0 = time.time()
        sub = src.filter(bucket_expr(n_buckets).isin(todo))
        sub = _salted_bucketed(sub, cfg, n_buckets)
        ex = with_extraction(sub.select("conv_id", "turn_idx", "text", "bucket"), cfg)
        # with_extraction projects the fixed output schema; re-attach bucket
        ex = ex.withColumn("bucket", bucket_expr(n_buckets))
        # north rule: stable turn ordering — the explicit
        # Window.partitionBy(conv_id).orderBy(turn_idx) sequence number
        # (also the per-conversation resume watermark for consumers).
        # The window's exchange re-gathers each conversation AFTER the
        # balanced extraction and leaves rows sorted by (conv_id, turn_idx)
        # within tasks — which is exactly the on-disk order we want, so no
        # extra sort or repartition precedes the write.
        w_order = WindowSpec.partitionBy("conv_id").orderBy("turn_idx")
        ex = ex.withColumn("turn_seq", F.row_number().over(w_order))
        (
            ex.write.mode("overwrite")
            .partitionBy("bucket")
            .parquet(table.data_dir)
        )
        # per-bucket metrics: column-pruned scan of just-written output
        # (reads only bucket / boilerplate_ratio / cells lengths)
        written = spark.read.parquet(table.data_dir).filter(F.col("bucket").isin(todo))
        metrics = (
            written.groupBy("bucket")
            .agg(
                F.count(F.lit(1)).alias("turns"),
                F.avg("boilerplate_ratio").alias("bp_avg"),
                F.sum(F.expr("aggregate(transform(cells, r -> size(r)), 0, (a, x) -> a + x)")).alias(
                    "cell_count"
                ),
            )
            .collect()
        )
        wall = int((time.time() - gt0) * 1000)
        rows = [
            (
                run_id,
                chash,
                int(m.bucket),
                "committed",
                int(m.turns),
                float(m.bp_avg) if m.bp_avg is not None else 0.0,
                int(m.cell_count) if m.cell_count is not None else 0,
                wall,
            )
            for m in metrics
        ]
        # empty buckets still commit (else resume would retry them forever)
        seen = {int(m.bucket) for m in metrics}
        rows.extend(
            (run_id, chash, b, "committed", 0, 0.0, 0, wall) for b in todo if b not in seen
        )
        table.append_lineage(spark, rows)
        result.committed_buckets.extend(r[2] for r in rows)
        groups_done += 1
        if fail_after_groups is not None and groups_done >= fail_after_groups:
            raise SimulatedKill(f"killed after {groups_done} group commits")

    result.wall_ms = int((time.time() - t0) * 1000)
    return result
