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
        # drop reliable-checkpoint files once their RDDs are GC'd
        # (iterative ops — near_dup_components — checkpoint per round)
        .config("spark.cleaner.referenceTracking.cleanCheckpoints", "true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Reliable checkpoint store for iterative algorithms: on a cluster this
    # is an HDFS/object-store path (spark-submit sets it); locally /tmp.
    # Without one, loops fall back to localCheckpoint — executor-block-
    # manager storage that cannot survive executor loss at cluster scale.
    try:
        has_dir = spark.sparkContext._jsc.sc().getCheckpointDir().isDefined()
    except Exception:  # pragma: no cover - py4j surface change
        has_dir = True
    if not has_dir:
        spark.sparkContext.setCheckpointDir(
            os.environ.get("SPARK_GRAFT_CKPT_DIR", "/tmp/spark_graft_ckpt")
        )
    return spark


def python_worker_budget(spark: SparkSession) -> int | None:
    """Concurrent-Python-worker cap for Arrow-UDF stages, or None for no cap.

    In local mode every task slot that evaluates a pandas UDF keeps BOTH a
    JVM thread and a Python worker hot, so local[N] schedules ~2N busy
    threads.  On this 32-vCPU box local[16] scales at ~0.95 efficiency while
    local[32] collapses into kernel-side contention (system CPU 65-95%, ~10×
    lower per-core Arrow throughput — measured round 1: flagship 5.39 s at
    local[16] vs 13.75 s at local[32]).  Round 2 fixed this with a session-
    wide ``spark.task.cpus=2``, which recovered the flagship but halved task
    slots for pure-JVM stages too (driver bench: minhash 3.83→10.55 s,
    simhash 0.76→2.08 s).  The scoped fix: keep one core per task and bound
    concurrency ONLY where the Python workers exist — the partition count of
    the UDF stage input (partitions bound concurrent Arrow workers; every
    JVM stage keeps all N slots).

    On a real cluster this corresponds to executor-core sizing / stage-level
    resource profiles, where the scheduler — not the partition count — owns
    the worker budget; hence None (no cap) off local mode or when local[N]
    leaves headroom (N < max(24, host cores)).
    """
    master = spark.sparkContext.master
    if not master.startswith("local"):
        return None
    host = os.cpu_count() or 4
    inner = master[len("local") :].strip("[]")
    if inner in ("", "*"):
        slots = host
    else:
        try:
            slots = int(inner.split(",")[0])
        except ValueError:
            return None
    if slots >= max(24, host):
        return max(1, host // 2)
    return None
