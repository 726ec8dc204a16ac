"""Snapshot-log scale probe: is the 'driver-trivial at ~200k files'
claim in sources/snapshots.py true?  (100 TB / 512 MB files = ~200k
manifest entries — the design point the docstrings cite.)

Everything the snapshot layer does per commit/read that is O(files) is
DRIVER-side JSON + list work: manifest publish, manifest load, the
stats prune (read planning and MERGE cut #1), history walk, and
read_changes' file-set difference.  None of it needs real data files,
so the probe builds a synthetic manifest of N entries with realistic
stats (tight conv_id slices, ts ranges — the post-compaction layout)
and times each path.  Receipt: BENCH/SNAPSHOT_SCALE.md.

Usage: python tools/snapshot_scale_probe.py [n_files]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from table_ocr_spark.sources.snapshots import FileEntry, SnapshotTable  # noqa: E402

N = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
ROOT = "/tmp/spark_graft_bench/snapshot_scale"


def synth_entries(n: int, start: int = 0) -> list:
    """n file entries with the post-compaction layout: each file a tight
    conv_id slice (cluster_by=['conv_id']) plus ts min/max — the stats
    shape `_footer_stats` harvests from real commits."""
    out = []
    for i in range(start, start + n):
        lo, hi = f"conv-{i:09d}", f"conv-{i:09d}-z"
        out.append(
            FileEntry(
                path=f"data/{i:09d}.parquet",
                rows=500_000,
                bytes=512 * 1024 * 1024,
                stats={
                    "conv_id": [lo, hi, 0],
                    "turn_idx": [0, 4095, 0],
                    "ts": ["2026-01-01T00:00:00", "2026-06-30T23:59:59", 0],
                },
            )
        )
    return out


def main() -> int:
    shutil.rmtree(ROOT, ignore_errors=True)
    t = SnapshotTable(ROOT)
    entries = synth_entries(N)
    res = {"probe": "snapshot_scale", "n_files": N}

    # 1. commit: publish a manifest carrying all N entries
    t0 = time.time()
    t.commit(entries, "append", schema_json='{"type":"struct","fields":[]}')
    res["commit_s"] = round(time.time() - t0, 3)
    res["manifest_mb"] = round(
        os.path.getsize(t._snap_path(1)) / 1024 / 1024, 1
    )

    # 2. a steady-state append on top: re-list parent files + publish
    inc = synth_entries(64, start=N)
    t0 = time.time()
    m = t.manifest()
    parent = [FileEntry.from_json(d) for d in m["files"]]
    t.commit(parent + inc, "append", expected_parent=1)
    res["incremental_commit_s"] = round(time.time() - t0, 3)

    # 3. manifest load (read planning step 1)
    t0 = time.time()
    m = t.manifest()
    res["manifest_load_s"] = round(time.time() - t0, 3)

    # 4. planning: entry hydration + stats prune to a tight key range
    #    (read(prune=...) and MERGE cut #1 both run exactly this)
    t0 = time.time()
    files = [FileEntry.from_json(d) for d in m["files"]]
    lo = f"conv-{N // 2:09d}"
    pruned = t._prune_files(files, ("conv_id", lo, lo + "-a"))
    res["plan_prune_s"] = round(time.time() - t0, 3)
    res["pruned_to_files"] = len(pruned)

    # 5. ts-range prune (every file overlaps -> worst case, no cut)
    t0 = time.time()
    full = t._prune_files(files, ("ts", "2026-02-01", "2026-03-01"))
    res["prune_worstcase_s"] = round(time.time() - t0, 3)
    res["worstcase_files"] = len(full)

    # 6. read_changes planning: file-set difference between two seqs
    t0 = time.time()
    base = {d["path"] for d in t.manifest(1)["files"]}
    new = [d for d in t.manifest(2)["files"] if d["path"] not in base]
    res["changes_diff_s"] = round(time.time() - t0, 3)
    res["changed_files"] = len(new)

    # 7. history walk over the 2-commit log (O(total manifest bytes))
    t0 = time.time()
    h = t.history()
    res["history_s"] = round(time.time() - t0, 3)
    res["history_commits"] = len(h)

    # 8. lazy newest-first walk to the first match — the resume-marker /
    #    index-coverage / concurrent-guard shape (jobs/curate.py,
    #    jobs/forget.py): parses ONE manifest however old the table is
    t0 = time.time()
    next(t.iter_history_newest_first())
    res["resume_walk_s"] = round(time.time() - t0, 3)

    print(json.dumps(res))
    shutil.rmtree(ROOT, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
