"""One-off profiler: per-stage wall/task/shuffle breakdown for a contract
query at a given local[N], from the Spark event log.

Usage: python tools/profile_minhash.py [query] [cpus]
Prints one JSON line per stage: id, name-ish, tasks, wall ms (max task
launch→finish span), executor run ms (sum), shuffle r/w bytes, python ms.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    qname = sys.argv[1] if len(sys.argv) > 1 else "minhash_lsh_pairs"
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("PROF_REPS", "3"))

    import __spark_entry__ as contract
    from table_ocr_spark.session import build_session

    evlog_dir = tempfile.mkdtemp(prefix="prof_evlog_")
    spark = build_session(
        app_name="profile",
        cores=cpus,
        shuffle_partitions=max(cpus, 8),
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": evlog_dir,
            "spark.eventLog.compress": "false",
        },
    )
    q = contract.queries()[qname]
    # warm-up (untimed, untagged)
    q(spark, sf_dir).write.mode("overwrite").format("noop").save()
    spark.sparkContext.setJobGroup("timed", qname)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        q(spark, sf_dir).write.mode("overwrite").format("noop").save()
        best = min(best, time.time() - t0)
    spark.sparkContext.setJobGroup("", "")
    spark.stop()

    timed_stages: set = set()
    stages: dict = {}
    for path in sorted(glob.glob(os.path.join(evlog_dir, "**", "*"), recursive=True)):
        if not os.path.isfile(path):
            continue
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except ValueError:
                    continue
                t = ev.get("Event")
                if t == "SparkListenerJobStart":
                    if (ev.get("Properties") or {}).get("spark.jobGroup.id") == "timed":
                        timed_stages.update(ev.get("Stage IDs", []))
                elif t == "SparkListenerStageCompleted":
                    si = ev.get("Stage Info", {})
                    sid = si.get("Stage ID")
                    if sid not in timed_stages:
                        continue
                    acc = {a.get("Name"): a.get("Value") for a in si.get("Accumulables", [])}
                    stages[sid] = {
                        "stage": sid,
                        "name": (si.get("Name") or "")[:60],
                        "tasks": si.get("Number of Tasks"),
                        "wall_ms": (si.get("Completion Time", 0) - si.get("Submission Time", 0)),
                        "run_ms": int(acc.get("internal.metrics.executorRunTime", 0)),
                        "cpu_ms": int(acc.get("internal.metrics.executorCpuTime", 0)) // 1_000_000,
                        "sh_w": int(acc.get("internal.metrics.shuffle.write.bytesWritten", 0)),
                        "sh_r": int(acc.get("internal.metrics.shuffle.read.localBytesRead", 0))
                        + int(acc.get("internal.metrics.shuffle.read.remoteBytesRead", 0)),
                        "rows_out": int(acc.get("internal.metrics.output.recordsWritten", 0) or 0),
                    }
    print(json.dumps({"query": qname, "cpus": cpus, "best_wall_s": round(best, 3), "reps": reps}))
    for sid in sorted(stages):
        print(json.dumps(stages[sid]))
    return 0


if __name__ == "__main__":
    sys.exit(main())
