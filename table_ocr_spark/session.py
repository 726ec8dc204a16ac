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
    # Local-mode core-per-worker sizing: every task slot that runs a pandas
    # UDF also keeps a Python worker hot, so local[N] schedules ~2N busy
    # threads.  On this 32-vCPU box local[16] scales at ~0.95 efficiency
    # while local[32] collapses into kernel-side contention (system CPU
    # 65-95%, ~10× lower per-core Arrow-UDF throughput — measured round 1:
    # flagship 5.39 s at local[16] vs 13.75 s at local[32]).  Reserving two
    # scheduler cores per task (spark.task.cpus=2) once the declared core
    # count saturates the machine is exactly what a real cluster does by
    # sizing executor cores vs Python workers separately; it caps concurrent
    # (JVM task + Python worker) pairs at the physical core count.  Only
    # applied when local[N] oversubscribes the host — small-N scaling runs
    # (local[4]/local[16]) keep one core per task.
    host_cores = os.cpu_count() or cores
    task_cpus = 2 if cores >= max(24, host_cores) else 1
    if shuffle_partitions is None:
        shuffle_partitions = max(8, cores // task_cpus)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.task.cpus", str(task_cpus))
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
