"""Scaling probe: is minhash_lsh_pairs' sub-0.8 local[4]->[16] efficiency
at sf0.1 a PLAN problem or a DATA-SIZE floor?

The per-stage profile (tools/profile_minhash.py) shows why sf0.1 can't
scale: the whole pipeline shuffles < 1 MB, so AQE coalesces every
post-shuffle stage to ONE task — only the signature-computation stage
has scalable task counts.  That is an Amdahl floor created by the tiny
input (5.5k docs), not by the plan: at real scale the shuffles are GBs,
AQE keeps them wide, and the serialized fraction vanishes.

This probe evidences that claim without a cluster: replicate the sf0.1
documents table R times (doc_id offset per replica; a per-replica text
salt keeps LSH buckets within-replica, so candidate-pair work grows
linearly, same workload shape), then run the IDENTICAL operator at two
parallelism levels, min-of-N wall each, and print the scaling
efficiency.  Receipt: BENCH/MINHASH_SCALING.md.

Usage: python tools/minhash_scale_probe.py [replicas] [reps] [pairs|star]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPLICAS = int(sys.argv[1]) if len(sys.argv) > 1 else 16
REPS = int(sys.argv[2]) if len(sys.argv) > 2 else 3
FORM = sys.argv[3] if len(sys.argv) > 3 else "pairs"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCALED = "/tmp/spark_graft_bench/minhash_scale/docs_x%d" % REPLICAS


def _build_scaled() -> None:
    """Materialize the replicated table once (parquet, many files so the
    scan parallelizes at both widths)."""
    from pyspark.sql import functions as F

    from table_ocr_spark.session import build_session

    if os.path.exists(os.path.join(SCALED, "_SUCCESS")):
        return
    spark = build_session(app_name="minhash-scale-build", cores=8)
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    reps = spark.range(REPLICAS).select(F.col("id").alias("_rep"))
    scaled = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
            F.concat_ws(" ", "text", F.concat(F.lit("rep"), F.col("_rep"))).alias(
                "text"
            ),
        )
        .repartition(32)
    )
    scaled.write.mode("overwrite").parquet(SCALED)
    spark.stop()


def _time_at(cpus: int) -> tuple[float, int]:
    from pyspark.sql import functions as F

    from table_ocr_spark.operators.dedup import (
        minhash_lsh_pairs,
        minhash_lsh_star_pairs,
    )
    from table_ocr_spark.session import build_session

    spark = build_session(
        app_name="minhash-scale-%d" % cpus, cores=cpus, shuffle_partitions=2 * cpus
    )
    docs = spark.read.parquet(SCALED)
    dups = docs.filter(F.col("doc_id") % 10 == 0).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    src = docs.unionByName(dups)

    def run() -> None:
        fn = minhash_lsh_star_pairs if FORM == "star" else minhash_lsh_pairs
        fn(src, "text", "doc_id", k=8, bands=4, shingle_n=2).write.mode(
            "overwrite"
        ).format("noop").save()

    run()  # warm-up (JIT, page cache) — untimed
    best = float("inf")
    for _ in range(REPS):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    n_rows = src.count()
    spark.stop()
    return best, n_rows


def main() -> int:
    _build_scaled()
    t4, n = _time_at(4)
    t16, _ = _time_at(16)
    eff = (t4 / t16) / 4.0
    print(
        json.dumps(
            {
                "probe": "minhash_lsh_%s_scaled" % FORM,
                "replicas": REPLICAS,
                "docs": n,
                "reps_min_of": REPS,
                "wall_s_local4": round(t4, 3),
                "wall_s_local16": round(t16, 3),
                "speedup_4x_cores": round(t4 / t16, 3),
                "scaling_efficiency": round(eff, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
