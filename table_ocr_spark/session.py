"""SparkSession construction with the engine's scale-oriented defaults.

Local-mode knobs mirror what a 1000-executor cluster submit would set via
spark-submit conf (SURVEY.md §3.4): AQE on (runtime re-plan + partition
coalescing + skew handling for the relational fringe), Arrow batches bounded
so multi-MB ``text`` payloads can't blow executor memory
(SURVEY.md §4.1 spill row), sane shuffle parallelism.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def build_session(
    app_name: str = "table_ocr_spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    arrow_max_records: int = 2000,
    extra_conf: dict | None = None,
) -> SparkSession:
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cores)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # bound Arrow batch size against multi-MB text payloads:
        # the per-cell-subprocess analog killer — one Python worker per core,
        # reused across bounded batches (SURVEY.md §3.4)
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_max_records))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
