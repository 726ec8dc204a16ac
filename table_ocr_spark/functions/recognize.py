"""Pluggable per-cell recognizer — the ``TesseractOCR`` analog.

The reference spawns one tesseract subprocess per table cell
(detectors.py:849 inside the rows×cols loop at detectors.py:1064-1082)
with knobs ``l/dpi/psm/oem`` (defaults at detectors.py:773-778).  In the
text domain recognition degenerates to cleanup, but the SEAM is kept
(SURVEY.md §2.4): a recognizer is a pure
``(raw_cell_text) -> (text, confidence)`` callable selected by name via
``ExtractorConfig.recognizer``, so a real model (or a batched-subprocess
bridge) slots in without touching pipeline or schema.

Confidence is the hOCR ``x_wconf`` analog (the reference's committed
golden ``sample/proc/02.hocr`` carries per-word bbox + x_wconf): here it
is the recognizability of the recognized text — the fraction of plain
``[A-Za-z0-9 ]`` characters.  ASCII classes on purpose: engine-neutral,
so DuckDB correctness oracles are EXACT (same convention as the
quality-score operator).  Empty cells score 0.0.
"""

from __future__ import annotations

import html as _html
import re
from typing import Callable, Tuple

Recognized = Tuple[str, float]

_TAG_RE = re.compile(r"<[^>]+>")
_WS_RE = re.compile(r"\s+")
# matches iff _WS_RE.sub(" ", s) would change s: any whitespace char that
# is not a plain space, or a run of 2+ spaces
_WS_FIX_RE = re.compile(r"[^\S ]| {2,}")
_NON_PLAIN_RE = re.compile(r"[^A-Za-z0-9 ]")
# translate table deleting exactly the plain class [A-Za-z0-9 ]: len(text
# minus plain chars) == len(_NON_PLAIN_RE.findall(text)) with no list
# allocation (confidence runs once per CELL — profiled at ~6% of the
# whole extraction kernel as the regex findall)
_PLAIN_DEL = str.maketrans(
    "", "", "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789 "
)


def cleanup_text(fragment: str) -> str:
    """Tags → space, entity-decode, collapse whitespace runs, trim.
    Also the document-level cleaner for the explicit-markup mode.

    Fast paths: without '<' the tag regex is identity and without '&' the
    entity decode is identity, so both passes are skipped for the common
    plain cell; and when every whitespace run is already a single space
    (no non-space whitespace, no double space — one guard scan) the
    ``\\s+`` collapse is the identity too, so the sub's rebuild of the
    string is skipped (exact-equality-preserving; the per-cell call
    volume makes these the kernel's hottest lines)."""
    if "<" in fragment or "&" in fragment:
        out = _TAG_RE.sub(" ", fragment)
        out = _html.unescape(out)
        return _WS_RE.sub(" ", out).strip()
    if _WS_FIX_RE.search(fragment) is None:
        return fragment.strip()
    return _WS_RE.sub(" ", fragment).strip()


def confidence(text: str) -> float:
    """Plain-character fraction of the recognized text; 0.0 for empty."""
    if not text:
        return 0.0
    return 1.0 - len(text.translate(_PLAIN_DEL)) / len(text)


# Memo for the (pure) default recognizer: cell contents are corpus words
# and repeat heavily (Zipf), so a bounded per-process dict turns most
# recognitions into one lookup.  Value-keyed on the raw fragment only —
# never on document/run identity — and cleared at the bound, so memory
# stays fixed and results are identical by purity.
_RECOGNIZE_MEMO: dict = {}
_RECOGNIZE_MEMO_MAX = 100_000


def recognize_cleanup(raw: str) -> Recognized:
    """Default recognizer: markup/entity cleanup + plain-char confidence.
    (``confidence`` inlined — this runs once per cell, and the extra
    call frame was measurable at the kernel's cell volume.)"""
    hit = _RECOGNIZE_MEMO.get(raw)
    if hit is not None:
        return hit
    text = cleanup_text(raw)
    if not text:
        res = (text, 0.0)
    else:
        res = (text, 1.0 - len(text.translate(_PLAIN_DEL)) / len(text))
    if len(_RECOGNIZE_MEMO) >= _RECOGNIZE_MEMO_MAX:
        _RECOGNIZE_MEMO.clear()
    _RECOGNIZE_MEMO[raw] = res
    return res


def recognize_identity(raw: str) -> Recognized:
    """Pass-through recognizer (whitespace-trim only) — proves the seam is
    config-selectable; useful when cells are known-clean and the cleanup
    pass should be skipped."""
    text = raw.strip()
    return text, confidence(text)


RECOGNIZERS: dict[str, Callable[[str], Recognized]] = {
    "cleanup": recognize_cleanup,
    "identity": recognize_identity,
}


def get_recognizer(name: str) -> Callable[[str], Recognized]:
    try:
        return RECOGNIZERS[name]
    except KeyError:
        raise ValueError(
            f"unknown recognizer {name!r}; available: {sorted(RECOGNIZERS)}"
        ) from None
