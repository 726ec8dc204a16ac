"""Run the full contract-vs-oracle sweep at every SF and write the
committed receipt (BENCH/CONTRACT_SWEEP.md).

The driver's correctness gate records at most 50 rows, so tail entries of
``__spark_entry__.queries()`` have no driver-visible row; this receipt is
the repo's own evidence that EVERY query (head + tail) passes its exact
DuckDB oracle at each scale step.  Each SF leg runs in a fresh
subprocess (one Spark JVM at a time — overlapping JVMs distort nothing
here but starve each other on this box).

Usage: python tools/contract_sweep.py [sf_dir ...]
"""

from __future__ import annotations

import os
import re
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LINE = re.compile(r"(PASS|FAIL|OK\?)\s+(\S+?):\s*(.*)")


def run_leg(sf_dir: str) -> list[tuple[str, str, str]]:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check_contract.py"), sf_dir],
        capture_output=True,
        text=True,
        timeout=7200,
    )
    rows = []
    for chunk in (out.stdout + out.stderr).replace("\r", "\n").splitlines():
        m = LINE.search(chunk)
        if m:
            rows.append((m.group(1), m.group(2), m.group(3)))
    return rows


def main() -> int:
    sf_dirs = sys.argv[1:] or [
        f"/root/testdata/sf{s}" for s in ("0.001", "0.01", "0.1")
    ]
    sys.path.insert(0, REPO)
    import __spark_entry__ as entry

    names = list(entry.queries())
    legs = {}
    for d in sf_dirs:
        legs[os.path.basename(os.path.normpath(d))] = dict(
            (q, (st, detail)) for st, q, detail in run_leg(d)
        )

    ts = datetime.now(timezone.utc).isoformat(timespec="seconds")
    md = [
        "# Contract sweep receipt — every query vs its DuckDB oracle",
        "",
        f"Generated {ts} by tools/contract_sweep.py "
        f"(fresh subprocess per SF; row count + column names + "
        f"order-insensitive value equality per query).",
        "",
        "The driver gate caps at 50 rows; this sweep covers the FULL "
        f"queries() dict ({len(names)} entries — head and tail).",
        "",
        "| # | query | " + " | ".join(legs) + " |",
        "| --- | --- | " + " | ".join("---" for _ in legs) + " |",
    ]
    n_bad = 0
    for i, q in enumerate(names):
        cells = []
        for leg in legs.values():
            st, detail = leg.get(q, ("MISSING", ""))
            if st == "PASS":
                cells.append(f"✅ {detail.replace(' rows', 'r')}")
            else:
                n_bad += 1
                cells.append(f"❌ {st} {detail}"[:60])
        tail = " (tail)" if i >= 50 else ""
        md.append(f"| {i + 1} | `{q}`{tail} | " + " | ".join(cells) + " |")
    md.append("")
    md.append(
        f"**{len(names) * len(legs) - n_bad}/{len(names) * len(legs)} green**"
        + ("" if n_bad == 0 else f" — {n_bad} NOT GREEN, see above")
    )
    md.append("")
    path = os.path.join(REPO, "BENCH", "CONTRACT_SWEEP.md")
    with open(path, "w") as f:
        f.write("\n".join(md))
    print(f"wrote {path}: {len(names)} queries × {len(legs)} SFs, bad={n_bad}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main())
