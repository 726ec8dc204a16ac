"""cProfile the pure-Python extraction kernel over the bench corpus.

No Spark involved: reads the deterministic bench corpus parquet directly
with pyarrow and runs extract_payload over a sample, so the profile shows
kernel hot spots (guide §1.2 step 2: per-task work) without Arrow-boundary
noise.

Run: python tools/profile_extract_kernel.py [n_rows] [--mode-census]
"""

from __future__ import annotations

import cProfile
import glob
import os
import pstats
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def load_texts(n: int) -> list:
    import pyarrow.parquet as pq

    path = "/tmp/spark_graft_bench/v2/sf0.1/transcripts"
    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    if not files:
        raise SystemExit("bench corpus not generated yet — run bench.py once")
    texts = []
    for f in files:
        t = pq.read_table(f, columns=["text"])
        texts.extend(t.column("text").to_pylist())
        if len(texts) >= n:
            break
    return texts[:n]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 30000
    texts = load_texts(n)
    from table_ocr_spark.config import DEFAULT_CONFIG
    from table_ocr_spark.functions.extract import extract_payload, classify_mode
    from table_ocr_spark.functions.normalize import normalize

    if "--mode-census" in sys.argv:
        census: dict = {}
        for t in texts:
            m = classify_mode(normalize(t), DEFAULT_CONFIG)
            census[m] = census.get(m, 0) + 1
        print("mode census:", census)
        return 0

    # steady-state wall time first (profile adds overhead)
    t0 = time.time()
    for t in texts:
        extract_payload(t, DEFAULT_CONFIG)
    wall = time.time() - t0
    print(f"plain: {len(texts)} rows in {wall:.3f}s = {len(texts)/wall:.0f} rows/s")

    pr = cProfile.Profile()
    pr.enable()
    for t in texts:
        extract_payload(t, DEFAULT_CONFIG)
    pr.disable()
    st = pstats.Stats(pr)
    st.sort_stats("cumulative").print_stats(35)
    return 0


if __name__ == "__main__":
    sys.exit(main())
