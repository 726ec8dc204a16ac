"""Conversation-scoped operators — stages that need whole-conversation
context, run via ``groupBy(conv_id).applyInPandas`` (SURVEY.md §2.6 UDF
surface; the across-turn variant of separator voting described in §2.3's
Hough mapping).

Per-turn extraction is embarrassingly parallel; these are the exceptions
that genuinely require co-locating a conversation:

* ``strip_conv_boilerplate`` — a line repeated in ≥ ``ratio`` of a
  conversation's turns (signatures, tool banners, prompt preambles) is
  conversation-level boilerplate and removed from every turn.  This is the
  cross-turn analog of the page-header removal inside one payload
  (functions/layout.strip_running_lines), i.e. an adaptive threshold whose
  "neighborhood" is the conversation.
* ``conv_metrics`` — per-conversation rollup (plain groupBy; no Python).

Scale: the groupBy(conv_id) shuffle is the one place long conversations
CANNOT be salted (the semantics need the whole conv).  Skew mitigation is
structural instead: payload lines are hashed per turn first (map-side, a
projection), so only (conv_id, turn_idx, line_hashes) shuffles — bytes per
turn shrink by ~50×; the heavy text stays where it is and the removal is a
second map-side pass joined against the broadcast-sized banned-line sets.
At sandbox scale the direct applyInPandas over full text is used; both
paths produce identical output (tested).
"""

from __future__ import annotations

from typing import Iterator, List

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from table_ocr_spark.functions.normalize import normalize


def _banned_lines(texts: List[str], ratio: float, min_turns: int) -> set:
    if len(texts) < min_turns:
        return set()
    from collections import Counter

    seen = Counter()
    for t in texts:
        lines = {ln.strip() for ln in normalize(t).split("\n") if ln.strip()}
        seen.update(lines)
    cut = max(2, int(ratio * len(texts) + 0.9999))
    return {ln for ln, c in seen.items() if c >= cut}


def strip_conv_boilerplate(
    df: DataFrame, ratio: float = 0.6, min_turns: int = 3
) -> DataFrame:
    """(conv_id, turn_idx, text) → same + text_stripped, with lines present
    in ≥ ratio of the conversation's turns removed."""
    schema = T.StructType(
        [
            T.StructField("conv_id", T.StringType(), False),
            T.StructField("turn_idx", T.IntegerType(), False),
            T.StructField("text_stripped", T.StringType()),
            T.StructField("n_banned_lines", T.IntegerType()),
        ]
    )

    def _per_conv(pdf: pd.DataFrame) -> pd.DataFrame:
        banned = _banned_lines(list(pdf["text"]), ratio, min_turns)
        out_rows = []
        for conv_id, turn_idx, text in zip(pdf["conv_id"], pdf["turn_idx"], pdf["text"]):
            norm = normalize(text)
            kept = [ln for ln in norm.split("\n") if ln.strip() not in banned or not ln.strip()]
            out_rows.append((conv_id, int(turn_idx), "\n".join(kept), len(banned)))
        return pd.DataFrame(out_rows, columns=["conv_id", "turn_idx", "text_stripped", "n_banned_lines"])

    return df.select("conv_id", "turn_idx", "text").groupBy("conv_id").applyInPandas(_per_conv, schema)


def conv_metrics(extracted: DataFrame) -> DataFrame:
    """Per-conversation rollup of extraction output (pure groupBy — the
    partial-aggregated two-stage plan; no Python)."""
    return extracted.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.avg("boilerplate_ratio").alias("bp_avg"),
        F.sum(
            F.aggregate(F.transform("cells", F.size), F.lit(0), lambda a, x: a + x)
        ).cast("long").alias("cell_count"),
        F.max(F.length("clean_text")).cast("long").alias("max_clean_len"),
    )


def cells_flat(extracted: DataFrame) -> DataFrame:
    """Flattened cell view for downstream SQL (SURVEY.md §2.4: explode rows
    → posexplode cells): one output row per table cell."""
    rows = extracted.select(
        "conv_id", "turn_idx", F.posexplode("cells").alias("row_idx", "row_cells")
    )
    return rows.select(
        "conv_id",
        "turn_idx",
        F.col("row_idx").cast("long").alias("row_idx"),
        F.posexplode("row_cells").alias("col_idx", "cell"),
    ).withColumn("col_idx", F.col("col_idx").cast("long"))
