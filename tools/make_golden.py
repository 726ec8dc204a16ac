"""Regenerate the committed golden extraction fixture.

    python tools/make_golden.py

The fixture (tests/golden/golden_seed123.jsonl.gz) is the oracle's output
over a pinned corpus. Because the Spark UDF and the oracle share kernels,
oracle==UDF holds by construction — which also means a semantics change
would slide through silently. The committed snapshot breaks that loop:
tests fail on ANY semantic drift, and an intentional change requires
re-running this script and committing the diff (reviewable).

This is the role the reference's committed sample/proc/* golden artifacts
play (SURVEY.md §5).
"""

from __future__ import annotations

import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_SEED = 123
GOLDEN_CONVS = 25
GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "golden_seed123.jsonl.gz",
)


def generate() -> list:
    from table_ocr_spark.config import DEFAULT_CONFIG
    from table_ocr_spark.oracle import extract_frame
    from table_ocr_spark.synth import gen_pandas

    corpus = gen_pandas(GOLDEN_CONVS, seed=GOLDEN_SEED, max_long=150)
    golden = extract_frame(corpus, DEFAULT_CONFIG)
    rows = []
    for r in golden.itertuples(index=False):
        rows.append(
            {
                "conv_id": r.conv_id,
                "turn_idx": int(r.turn_idx),
                "clean_text": r.clean_text,
                "cells": r.cells,
                "spans": r.spans,
                "mode": r.mode,
                "boilerplate_ratio": round(float(r.boilerplate_ratio), 12),
            }
        )
    return rows


def main() -> int:
    rows = generate()
    os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
    with gzip.open(GOLDEN_PATH, "wt", encoding="utf-8") as f:
        for row in rows:
            f.write(json.dumps(row, sort_keys=True, ensure_ascii=False) + "\n")
    print(f"{GOLDEN_PATH}: {len(rows)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
