"""Single-node reference extractor — the golden-fixture producer.

The analog of the reference's exploratory notebook harness
(``notebooks/morph.ipynb`` cells 2-8: the readable distillation of the
pipeline, eyeballed against ``sample/proc/*`` golden outputs).  Here the
oracle runs the SAME pure kernels as the Spark pandas UDF
(``table_ocr_spark.functions.extract.extract_payload``), single-threaded
over plain pandas, so Spark-vs-golden equality isolates exactly one
variable: the Arrow transport layer (SURVEY.md §7 hard-point 1).
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd

from table_ocr_spark.config import DEFAULT_CONFIG, ExtractorConfig
from table_ocr_spark.functions.extract import extract_payload


def extract_frame(transcripts: pd.DataFrame, cfg: ExtractorConfig = DEFAULT_CONFIG) -> pd.DataFrame:
    """transcripts(conv_id, turn_idx, text, ...) → golden extraction frame
    (FIXTURES.md §2 schema), ordered by (conv_id, turn_idx)."""
    out = {
        "conv_id": [],
        "turn_idx": [],
        "clean_text": [],
        "cells": [],
        "spans": [],
        "mode": [],
        "boilerplate_ratio": [],
    }
    it: Iterable = transcripts[["conv_id", "turn_idx", "text"]].itertuples(index=False)
    for conv_id, turn_idx, text in it:
        r = extract_payload(text, cfg)
        out["conv_id"].append(conv_id)
        out["turn_idx"].append(turn_idx)
        out["clean_text"].append(r.clean_text)
        out["cells"].append(r.cells)
        out["spans"].append([
            {"row": a, "col": b, "start": s, "end": e, "conf": c}
            for a, b, s, e, c in r.spans
        ])
        out["mode"].append(r.mode)
        out["boilerplate_ratio"].append(r.boilerplate_ratio)
    df = pd.DataFrame(out)
    df["turn_idx"] = df["turn_idx"].astype("int32")
    return df.sort_values(["conv_id", "turn_idx"], kind="mergesort").reset_index(drop=True)
