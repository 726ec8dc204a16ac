"""Global automatic thresholding — the ``OtsuThresholder`` analog
(ttocr/data/preprocessors.py:403-481: ``cv2.threshold(... THRESH_OTSU)``,
used by the notebook variant ``notebooks/morph.ipynb`` cell 2).

In the text domain the pixel-intensity histogram becomes a per-line
content-density histogram: Otsu's criterion picks the cutoff that maximizes
between-class variance, splitting lines into content vs boilerplate with no
hand-tuned constant — the *global* counterpart of the local (windowed)
classification the adaptive-threshold analog performs.

Used by the heuristic extraction mode when ``ExtractorConfig.use_otsu`` is
on (off by default: the default pipeline semantics — and the committed
golden fixture — stay unchanged).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np


def otsu_threshold(values: Sequence[float], bins: int = 64) -> float:
    """Otsu's method over a 1-D sample: returns the cutoff maximizing
    between-class variance. Deterministic; returns 0.0 for degenerate
    (empty/constant) input, meaning "everything is content"."""
    arr = np.asarray(list(values), dtype=np.float64)
    if arr.size == 0:
        return 0.0
    lo, hi = float(arr.min()), float(arr.max())
    if hi <= lo:
        return 0.0
    hist, edges = np.histogram(arr, bins=bins, range=(lo, hi))
    p = hist.astype(np.float64) / arr.size
    omega = np.cumsum(p)                      # class-0 probability
    mids = (edges[:-1] + edges[1:]) / 2.0
    mu = np.cumsum(p * mids)                  # class-0 cumulative mean mass
    mu_t = mu[-1]
    denom = omega * (1.0 - omega)
    with np.errstate(divide="ignore", invalid="ignore"):
        sigma_b = np.where(denom > 0, (mu_t * omega - mu) ** 2 / denom, 0.0)
    k = int(np.argmax(sigma_b))
    return float(mids[k])


def line_density(line: str) -> float:
    """Content density of one line: alphanumeric fraction (symbols, rules
    and decorative padding score low — the 'background' class)."""
    if not line:
        return 0.0
    alnum = sum(1 for c in line if c.isalnum() or c == " ")
    return alnum / len(line)


def otsu_line_filter(lines: List[str]) -> List[bool]:
    """True = content line, False = below the Otsu density cutoff
    (global boilerplate: rules, ascii art, separator junk)."""
    non_empty = [ln for ln in lines if ln.strip()]
    if len(non_empty) < 4:
        return [True] * len(lines)
    dens = [line_density(ln) for ln in non_empty]
    # bimodality guard: when all lines have similar density there is no
    # background class to separate — keep everything (Otsu on a unimodal
    # histogram still returns a cut, which would split noise)
    if max(dens) - min(dens) < 0.3:
        return [True] * len(lines)
    cut = otsu_threshold(dens)
    return [(not ln.strip()) or line_density(ln) >= cut for ln in lines]
