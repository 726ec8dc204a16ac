"""Per-payload extraction: mode classification + pipeline dispatch.

The analog of the reference's ``_predict`` drivers (main.py:26-183,
api/main.py:96-256, gradio/demo.py:242-384), which select between
ML_FULL_TABLE (explicit rulings → Canny+Hough) and ML_SINGLE_COLUMN_TABLE
(no rulings → blur/threshold/dilate/contours) at main.py:70-73.  Here the
two strategies are ``explicit_markup`` (HTML / markdown pipe tables) and
``heuristic_layout`` (fixed-width PDF-ish text), plus ``passthrough`` for
unstructured prose (the reference has no such payloads — every image is a
table photo — but transcript turns are mostly prose).

``extract_payload`` is THE correctness kernel: the single-node oracle and
the Spark pandas UDF both call it, so Spark output equals golden fixtures
by construction (north rule: per-turn text equality).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Tuple

from table_ocr_spark.config import ExtractorConfig
from table_ocr_spark.functions import layout, markup
from table_ocr_spark.functions.normalize import collapse_ws, normalize

Span = Tuple[int, int, int, int]

MODE_EXPLICIT = "explicit_markup"
MODE_HEURISTIC = "heuristic_layout"
MODE_PASSTHROUGH = "passthrough"


@dataclass(frozen=True)
class ExtractResult:
    clean_text: str
    cells: List[List[str]]
    spans: List[Span]
    mode: str
    boilerplate_ratio: float


def classify_mode(text: str, cfg: ExtractorConfig) -> str:
    """Strategy selector (≈ mode bool → DetectionMode, main.py:70-73).

    Order matters: HTML beats markdown beats fixed-width — a payload with
    explicit markup always takes the explicit branch, mirroring the
    reference preferring Hough on ruled tables.
    """
    if cfg.mode != "auto":
        return cfg.mode
    if markup.looks_like_html(text):
        return MODE_EXPLICIT
    # early-exit count: only "reached sep_min_run?" matters, so stop
    # scanning lines at the threshold (value-identical decision; a
    # non-positive threshold is satisfied by zero candidates, so it must
    # short-circuit before the loop to preserve `count >= run` semantics)
    if cfg.sep_min_run <= 0:
        return MODE_EXPLICIT
    md_candidates = 0
    for ln in text.split("\n"):
        if ln.count("|") >= 2:  # == markup._is_md_candidate, inlined
            md_candidates += 1
            if md_candidates >= cfg.sep_min_run:
                return MODE_EXPLICIT
    if layout.looks_like_layout(text, cfg):
        return MODE_HEURISTIC
    return MODE_PASSTHROUGH


def extract_payload(raw: str | None, cfg: ExtractorConfig) -> ExtractResult:
    """Extract main content + table grid from one raw turn payload."""
    text = normalize(raw, nfc=cfg.normalize_unicode, strip_zero_width=cfg.strip_zero_width)
    if not text.strip():
        return ExtractResult("", [], [], MODE_PASSTHROUGH, 0.0)

    mode = classify_mode(text, cfg)
    if mode == MODE_EXPLICIT:
        if markup.looks_like_html(text):
            body, cells, spans = markup.extract_html(text, cfg)
        else:
            body, cells, spans = markup.extract_markdown(text, cfg)
    elif mode == MODE_HEURISTIC:
        body, cells, spans = layout.extract_layout(text, cfg)
    else:
        body, cells, spans = text, [], []

    clean = collapse_ws(body) if cfg.collapse_whitespace else body
    total = len(text)
    ratio = 0.0 if total == 0 else max(0.0, min(1.0, 1.0 - len(clean) / total))
    return ExtractResult(clean, cells, spans, mode, ratio)
