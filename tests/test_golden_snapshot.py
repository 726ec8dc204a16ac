"""Committed-golden regression: current kernel semantics must equal the
snapshot in tests/golden/. The live oracle==UDF equality cannot catch
semantic drift (both sides share kernels); this snapshot can.

Intentional semantics changes: `python tools/make_golden.py` and commit the
fixture diff (reviewable, like the reference's sample/proc/* artifacts)."""

import gzip
import json
import os

from tools.make_golden import GOLDEN_PATH, generate


def test_kernels_match_committed_golden():
    assert os.path.exists(GOLDEN_PATH), "run tools/make_golden.py"
    with gzip.open(GOLDEN_PATH, "rt", encoding="utf-8") as f:
        want = [json.loads(ln) for ln in f]
    got = generate()
    assert len(got) == len(want)
    for i, (g, w) in enumerate(zip(got, want)):
        key = (w["conv_id"], w["turn_idx"])
        assert (g["conv_id"], g["turn_idx"]) == key, f"row {i} key"
        assert g["clean_text"] == w["clean_text"], f"clean_text drift at {key}"
        assert g["cells"] == w["cells"], f"cells drift at {key}"
        assert g["spans"] == w["spans"], f"spans drift at {key}"
        assert g["mode"] == w["mode"], f"mode drift at {key}"
        assert abs(g["boilerplate_ratio"] - w["boilerplate_ratio"]) < 1e-9
