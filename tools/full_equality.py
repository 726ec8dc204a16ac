"""Full-corpus per-turn equality receipt — the north rule's core invariant
checked at the largest local corpus, not just test fixtures.

Runs the distributed Arrow-batch extraction (with_extraction) AND the
single-node oracle (oracle.extract_frame — same pure kernels, no Spark)
over the entire bench corpus for a scale step, then compares clean_text
per (conv_id, turn_idx).  Prints ONE JSON line.

Usage: python tools/full_equality.py [sf_dir]   (SPARK_GRAFT_CPUS honored)
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    import bench
    from table_ocr_spark.operators.extract_job import with_extraction
    from table_ocr_spark.oracle import extract_frame
    from table_ocr_spark.session import build_session
    from table_ocr_spark.sources.catalog import load_transcripts

    path = bench.ensure_corpus(sf_dir)
    spark = build_session(app_name="full_equality")
    src = load_transcripts(spark, path).select("conv_id", "turn_idx", "text")

    t0 = time.time()
    dist = with_extraction(src).select("conv_id", "turn_idx", "clean_text").toPandas()
    dist_s = time.time() - t0

    pdf = src.toPandas()
    t1 = time.time()
    oracle = extract_frame(pdf)[["conv_id", "turn_idx", "clean_text"]]
    oracle_s = time.time() - t1
    spark.stop()

    # the gate's own canonicalization (stable mergesort over ALL columns,
    # dtype normalization, whole-frame compare incl. the keys) — one
    # implementation shared with tools/check_contract.py, and
    # DataFrame.equals handles a row-count mismatch without raising
    from tools.check_contract import norm_frame

    d, o = norm_frame(dist), norm_frame(oracle)
    all_equal = d.equals(o)
    n_eq = (
        int((d == o).all(axis=1).sum()) if len(d) == len(o) else 0
    )
    out = {
        "sf_dir": sf_dir,
        "turns": len(d),
        "oracle_turns": len(o),
        "turns_equal": n_eq,
        "all_equal": bool(all_equal),
        "distributed_s": round(dist_s, 1),
        "oracle_single_node_s": round(oracle_s, 1),
    }
    print(json.dumps(out))
    return 0 if out["all_equal"] else 1


if __name__ == "__main__":
    sys.exit(main())
