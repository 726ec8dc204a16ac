"""Payload canonicalization — the text-domain analog of the reference's
pixel-level preprocessing chain:

* ``CV2ImageColorConverter`` (BGR→GRAY canonical form,
  ttocr/data/preprocessors.py:104-149) → unicode NFC + newline
  canonicalization: drop representation variance that carries no content.
* ``GaussianImageSmoother`` (noise suppression before thresholding,
  preprocessors.py:204-253) → zero-width/control-char removal so block
  detection is stable against invisible noise.

All functions are pure and total (empty/None-safe).  ``normalize`` is the
first stage of every extraction mode, so all downstream char offsets (spans)
refer to the NORMALIZED payload — this is the documented span coordinate
system (the analog of hOCR bbox coordinates referring to the preprocessed
image).
"""

from __future__ import annotations

import re
import unicodedata

# Zero-width and BOM characters that destabilize offset arithmetic
# (FIXTURES.md 'noisy' payload kind).
_ZERO_WIDTH_RE = re.compile("[\\u200b\\u200c\\u200d\\u2060\\ufeff]")
_WS_RUN_RE = re.compile(r"[ \t]+")
_BLANK_RUN_RE = re.compile(r"\n{3,}")


def normalize(text: str | None, *, nfc: bool = True, strip_zero_width: bool = True) -> str:
    """Canonicalize a raw payload. Pure; never raises on odd input."""
    if text is None:
        return ""
    if nfc:
        text = unicodedata.normalize("NFC", text)
    # newline canonicalization: \r\n and bare \r → \n
    text = text.replace("\r\n", "\n").replace("\r", "\n")
    if strip_zero_width:
        text = _ZERO_WIDTH_RE.sub("", text)
    return text


def collapse_ws(text: str) -> str:
    """Collapse horizontal whitespace runs to one space and trim each line.

    Used on extracted clean text, never on the payload itself (would destroy
    the fixed-width column offsets the heuristic mode depends on).
    """
    # ``[ \t]+`` only rewrites a line containing a tab or a double space;
    # guarding with two C-speed scans skips the regex rebuild for the
    # common already-collapsed line (value-identical — a single space
    # "collapses" to itself)
    lines = [
        (_WS_RUN_RE.sub(" ", ln) if "\t" in ln or "  " in ln else ln).strip()
        for ln in text.split("\n")
    ]
    out = "\n".join(lines)
    if "\n\n\n" in out:
        out = _BLANK_RUN_RE.sub("\n\n", out)
    return out.strip()
