"""Scaling-efficiency evidence (north rule: ≥0.8 from N to 4N executors).

No real cluster exists in this sandbox, so per driver instruction the same
job runs at two parallelism levels on the same input — local[8] vs
local[32] on the 32-core host — and efficiency is reported as

    efficiency = (throughput@32 / throughput@8) / 4

Each level runs in its own subprocess (one JVM per local[N] config), fresh
but with the same cached corpus, warm OS page cache for both (the corpus is
generated and read once before timing begins via bench.py's warm-up).

Writes BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_low = int(os.environ.get("SCALE_N_LOW", "8"))
    n_high = int(os.environ.get("SCALE_N_HIGH", "32"))

    lo = run_bench(n_low, sf_dir)
    hi = run_bench(n_high, sf_dir)

    tp_lo, tp_hi = lo["turns_per_sec"], hi["turns_per_sec"]
    eff = (tp_hi / tp_lo) / (n_high / n_low)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    ts = datetime.now(timezone.utc).isoformat(timespec="seconds")
    md = [
        "# BENCH / BASELINE — measured",
        "",
        f"Generated {ts} by tools/scaling_bench.py on a {os.cpu_count()}-core host.",
        "",
        "## Extraction throughput + scaling efficiency (north rule)",
        "",
        "Same job, same input, two parallelism levels (sandbox evidence for",
        "N vs 4N executors — no real cluster available):",
        "",
        "| config | turns | extract wall (s) | turns/sec |",
        "| --- | --- | --- | --- |",
        f"| local[{n_low}] | {lo['turns']} | {lo['queries']['extract_flagship']} | {tp_lo} |",
        f"| local[{n_high}] | {hi['turns']} | {hi['queries']['extract_flagship']} | {tp_hi} |",
        "",
        f"**Scaling efficiency (throughput@{n_high} / throughput@{n_low}) / {n_high // n_low} = {eff:.3f}**"
        + ("  ✅ ≥ 0.8" if eff >= 0.8 else "  ❌ below 0.8 target"),
        "",
        f"SF dir: `{sf_dir}` (sf={hi['sf']}); corpus: deterministic synth transcripts",
        f"(seed 42, heavy-tailed conv lengths), {hi['turns']} turns.",
        "",
        "## Per-query wall times (seconds)",
        "",
        "| query | local[%d] | local[%d] |" % (n_low, n_high),
        "| --- | --- | --- |",
    ]
    for q in lo["queries"]:
        md.append(f"| {q} | {lo['queries'][q]} | {hi['queries'].get(q, '')} |")
    md += [
        "",
        "## Raw JSON",
        "",
        "```json",
        json.dumps(lo),
        json.dumps(hi),
        "```",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(md))
    print(json.dumps({"efficiency": round(eff, 3), "tp_low": tp_lo, "tp_high": tp_hi}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
