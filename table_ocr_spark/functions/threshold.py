"""Density thresholding: global (Otsu) and local (adaptive) classifiers.

``OtsuThresholder`` analog (ttocr/data/preprocessors.py:403-481:
``cv2.threshold(... THRESH_OTSU)``, used by the notebook variant
``notebooks/morph.ipynb`` cell 2): the pixel-intensity histogram becomes a
per-line content-density histogram; Otsu's criterion picks the cutoff that
maximizes between-class variance — one GLOBAL decision per document.
Heuristic mode applies it when ``ExtractorConfig.use_otsu`` is on.

``GaussianAdaptiveThresholder`` analog (preprocessors.py:313-400:
``cv2.adaptiveThreshold`` at 383-390 — pixel kept when above the
Gaussian-weighted ``block_size`` neighborhood mean minus ``constant``):
per line, a LOCAL decision — a line is content iff its density is at
least the mean density of the centered ``block_size``-line window minus
``density_constant``.  This is the jusText/Boilerpipe-style local
classification of SURVEY.md §2.2; heuristic mode applies it to prose
lines (grid rows are definite content and exempt), so decoration that
looks dense globally but is sparse against its neighborhood (ad blocks,
ascii rules between paragraphs) is dropped even when Otsu's single global
cut would keep it.
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


import string as _string

# deletes exactly [A-Za-z0-9 ]: for ASCII lines, len(line) minus the
# translated remainder == sum(isalnum) + count(' ') at C speed
_DEL_ALNUM_SP = str.maketrans("", "", _string.ascii_letters + _string.digits + " ")


def line_density(line: str) -> float:
    """Content density of one line: alphanumeric fraction (symbols, rules
    and decorative padding score low — the 'background' class)."""
    if not line:
        return 0.0
    if line.isascii():
        # ASCII fast path (the overwhelmingly common case): one translate
        # instead of a per-char isalnum method call — value-identical,
        # because ASCII isalnum is exactly [A-Za-z0-9]
        alnum = len(line) - len(line.translate(_DEL_ALNUM_SP))
    else:
        # == sum(1 for c if c.isalnum() or c == " "): isalnum(' ') is False,
        # so the space count can be added separately (unicode isalnum must
        # stay authoritative off the ASCII path)
        alnum = sum(map(str.isalnum, line)) + line.count(" ")
    return alnum / len(line)


def adaptive_line_filter(
    lines: List[str], block_size: int = 11, density_constant: float = 0.05
) -> List[bool]:
    """True = content, False = below the LOCAL density threshold: density
    < (mean density over the centered ``block_size`` window) − ``constant``.

    Empty lines are structure, never dropped (and still count toward the
    neighborhood mean, like background pixels in the reference's window).
    Documents shorter than ``block_size`` have no meaningful neighborhood —
    keep everything (mirrors the reference requiring an odd block_size > 1,
    preprocessors.py:347-356, where a tiny image degenerates the same way).
    """
    n = len(lines)
    if n < block_size or block_size < 2:
        return [True] * n
    dens = np.array([line_density(ln) for ln in lines], dtype=np.float64)
    half = block_size // 2
    cs = np.concatenate(([0.0], np.cumsum(dens)))
    lo = np.maximum(np.arange(n) - half, 0)
    hi = np.minimum(np.arange(n) + half + 1, n)
    win_mean = (cs[hi] - cs[lo]) / (hi - lo)
    keep = dens >= (win_mean - density_constant)
    # `not ln or ln.isspace()` == `not ln.strip()` with no allocation;
    # tolist() turns the per-element numpy-bool unboxing into one pass
    return [k or not ln or ln.isspace() for k, ln in zip(keep.tolist(), lines)]


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
