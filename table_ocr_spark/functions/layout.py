"""Heuristic-layout extraction — fixed-width / PDF-ish column layouts.

The text-domain analog of the reference's ML_SINGLE_COLUMN_TABLE branch
(main.py:124-181): no explicit rulings exist, so structure is *inferred*
from content geometry.

Pipeline stage mapping:

* running header/footer removal ≈ ``GaussianAdaptiveThresholder`` /
  ``OtsuThresholder`` content-vs-background classification
  (preprocessors.py:313-481): a line repeated across ≥ ``page_repeat_ratio``
  of pages is background (boilerplate), not content.
* token boxes ≈ ``ContourLinesDetector._find_solid_boxes``
  (detectors.py:593-619): non-space runs per line with the
  ``min_token_len <= len <= max_token_len`` size filter
  (the solid-height-limit filter, detectors.py:614-618).
* token fusion ≈ ``Dilate`` (preprocessors.py:515-579): adjacent tokens
  separated by ≤ ``fuse_token_gap`` spaces fuse into one box.
* whitespace-column voting ≈ ``ProbabilisticHoughLinesDetector``
  (detectors.py:374-449): a char column is voted a vertical separator when
  it is whitespace in ≥ ``sep_threshold`` of region lines, accepted only
  when the run is ≥ ``min_gap_width`` wide — the vectorized-numpy version
  of Hough vote accumulation over edge pixels.
* separator dedupe/sentinels ≈ ``_filter_overlapping_lines`` +
  ``_get_border_lines`` (detectors.py:258-329): region edges close the
  outermost cells.
* grid slicing ≈ ``TableCellDetector`` interval pairing + rows×cols slice
  loop (detectors.py:979-1082) with empty-cell skip (detectors.py:1076-1079)
  folded into the min_columns row filter.

All numpy-vectorized per payload; pure functions of (payload, config).
"""

from __future__ import annotations

import re
from typing import List, Tuple

import numpy as np

from table_ocr_spark.config import ExtractorConfig
from table_ocr_spark.functions.recognize import get_recognizer
from table_ocr_spark.functions.threshold import adaptive_line_filter

Span = Tuple[int, int, int, int, float]  # (row, col, start, end, conf)

_TOKEN_RE = re.compile(r"\S+")
_MULTI_GAP_RE = re.compile(r"\S(?:  +)\S")

# fused-box patterns per gap width: one regex match per FUSED box replaces
# the per-token Python fusion loop (``\s{1,g}`` between tokens — lines
# contain no newline, so this is exactly "≤ g whitespace chars between
# adjacent tokens", the Dilate fusion rule)
_FUSED_RE_CACHE: dict = {}


def _fused_re(gap: int):
    pat = _FUSED_RE_CACHE.get(gap)
    if pat is None:
        pat = re.compile(rf"\S+(?:\s{{1,{gap}}}\S+)*" if gap > 0 else r"\S+")
        _FUSED_RE_CACHE[gap] = pat
    return pat


def strip_running_lines(pages: List[List[str]], cfg: ExtractorConfig) -> List[List[str]]:
    """Remove running headers/footers repeated across pages.

    A stripped line that occurs as the first (or last) non-empty line of at
    least ``page_repeat_ratio`` of pages — given ≥ ``page_header_min_pages``
    pages — is boilerplate and removed from every page.
    """
    if len(pages) < cfg.page_header_min_pages:
        return pages
    firsts: dict = {}
    lasts: dict = {}
    for page in pages:
        non_empty = [ln.strip() for ln in page if ln.strip()]
        if not non_empty:
            continue
        firsts[non_empty[0]] = firsts.get(non_empty[0], 0) + 1
        lasts[non_empty[-1]] = lasts.get(non_empty[-1], 0) + 1
    cut = max(2, int(np.ceil(cfg.page_repeat_ratio * len(pages))))
    banned = {ln for ln, c in firsts.items() if c >= cut} | {
        ln for ln, c in lasts.items() if c >= cut
    }
    if not banned:
        return pages
    return [[ln for ln in page if ln.strip() not in banned] for page in pages]


def token_boxes(
    line: str, cfg: ExtractorConfig, _cache: dict | None = None
) -> List[Tuple[int, int]]:
    """Solid boxes of one line: (start_col, end_col) of non-space runs after
    fusion, size-filtered. ``_cache`` (keyed by line content) lets one
    extract_layout call tokenize each line once instead of 3-4× — the
    profiled hot path of the heuristic mode."""
    if _cache is not None:
        hit = _cache.get(line)
        if hit is not None:
            return hit
    lo, hi = cfg.min_token_len, cfg.max_token_len
    spans = [m.span() for m in _fused_re(cfg.fuse_token_gap).finditer(line)]
    out = [(s, e) for s, e in spans if lo <= e - s <= hi]
    if _cache is not None:
        _cache[line] = out
    return out


def is_table_line(line: str, cfg: ExtractorConfig, _cache: dict | None = None) -> bool:
    """A line participates in a fixed-width grid when it has ≥ min_columns
    fused boxes separated by multi-space gaps.  (The multi-gap test runs
    first: it is one C regex scan and rejects most prose lines before the
    tokenize — both tests are pure, so the order is value-free.)"""
    return bool(_MULTI_GAP_RE.search(line)) and len(token_boxes(line, cfg, _cache)) >= cfg.min_columns


def find_layout_regions(
    lines: List[str],
    cfg: ExtractorConfig,
    flags: List[bool] | None = None,
) -> List[Tuple[int, int]]:
    """Maximal runs of table lines (gaps ≤ fuse_line_gap blank/short lines),
    accepted at ≥ sep_min_run table lines."""
    if flags is None:
        flags = [is_table_line(ln, cfg) for ln in lines]
    regions: List[Tuple[int, int]] = []
    i, n = 0, len(lines)
    while i < n:
        if not flags[i]:
            i += 1
            continue
        start = i
        last = i
        gap = 0
        j = i + 1
        while j < n:
            if flags[j]:
                last = j
                gap = 0
            else:
                gap += 1
                if gap > cfg.fuse_line_gap:
                    break
            j += 1
        count = sum(1 for k in range(start, last + 1) if flags[k])
        if count >= cfg.sep_min_run:
            regions.append((start, last + 1))
        i = last + 1
    return regions


def vote_column_intervals(
    region_lines: List[str],
    cfg: ExtractorConfig,
    region_flags: List[bool] | None = None,
) -> List[Tuple[int, int]]:
    """Hough-style voting for vertical separators over a region.

    Builds the whitespace occupancy matrix, votes a char column as separator
    when whitespace in ≥ sep_threshold of lines, keeps separator runs
    ≥ min_gap_width wide, and returns the cell column intervals between
    them (with sentinel borders at 0 and max width).
    """
    if region_flags is None:
        region_flags = [is_table_line(ln, cfg) for ln in region_lines]
    table_lines = [ln for ln, f in zip(region_lines, region_flags) if f]
    if not table_lines:
        return []
    width = max(len(ln) for ln in table_lines)
    n_lines = len(table_lines)
    joined = "".join(ln.ljust(width) for ln in table_lines)
    buf = joined.encode("utf-8", "replace")
    if len(buf) == n_lines * width:
        # all-ASCII fast path (one encode + one reshape for the whole
        # region instead of a numpy round-trip per line)
        occ = np.frombuffer(buf, dtype=np.uint8).reshape(n_lines, width) != 0x20
    else:
        occ = np.zeros((n_lines, width), dtype=bool)  # True = non-space
        for i, ln in enumerate(table_lines):
            lj = ln.ljust(width)
            b = lj.encode("utf-8", "replace")
            # non-ascii multi-byte chars inflate the buffer; fall back
            # per-char (one encode — its length says if the row is ASCII)
            if len(b) == width:
                arr = np.frombuffer(b, dtype=np.uint8)
            else:
                arr = np.fromiter((0x20 if c == " " else 0x41 for c in lj), dtype=np.uint8, count=width)
            occ[i] = arr != 0x20
    # fraction of lines with content at this column: exact integer counts
    # divided once (same float64 value as occ.mean, count_nonzero is faster)
    votes = np.count_nonzero(occ, axis=0) / n_lines
    is_sep = votes <= (1.0 - cfg.sep_threshold)

    # separator runs ≥ min_gap_width → gaps; intervals between gaps =
    # columns.  Run boundaries via one diff pass instead of a Python loop
    # over every char column; a run touching the RIGHT edge is never
    # closed by a non-sep column, so (as in the loop form) it stays part
    # of the final interval.
    intervals: List[Tuple[int, int]] = []
    col_start = 0
    padded = np.empty(width + 2, dtype=np.int8)
    padded[0] = padded[-1] = 0
    np.copyto(padded[1:-1], is_sep, casting="unsafe")
    d = np.diff(padded)
    run_starts = np.flatnonzero(d == 1)
    run_ends = np.flatnonzero(d == -1)
    for rs, re_ in zip(run_starts.tolist(), run_ends.tolist()):
        if re_ >= width:
            break  # trailing run: folded into the final interval below
        if re_ - rs >= cfg.min_gap_width:
            if rs > col_start:
                intervals.append((col_start, rs))
            col_start = re_
    if col_start < width:
        intervals.append((col_start, width))
    return intervals


def split_lines_pages(text: str) -> Tuple[List[str], List[int], List[int]]:
    """Split on both ``\\n`` and ``\\f``, tracking absolute offsets and page
    breaks (a ``\\f`` separator closes the current page — the form-feed page
    model).  Returns (lines, absolute start offsets, page index per line).

    Jumps separator-to-separator with ``str.find`` (C-speed) instead of a
    regex walk over every character; trailing separators still yield a final
    empty line (property-tested against the regex reference form — the test
    drives THIS function, tests/test_properties.py)."""
    all_lines: List[str] = []
    all_offs: List[int] = []
    page_of: List[int] = []
    pos = 0
    page = 0
    n_text = len(text)
    while True:
        i_n = text.find("\n", pos)
        i_f = text.find("\f", pos)
        if i_n == -1:
            i = i_f
        elif i_f == -1:
            i = i_n
        else:
            i = i_n if i_n < i_f else i_f
        if i == -1:
            all_lines.append(text[pos:])
            all_offs.append(pos)
            page_of.append(page)
            break
        all_lines.append(text[pos:i])
        all_offs.append(pos)
        page_of.append(page)
        if text[i] == "\f":
            page += 1
        pos = i + 1
        if pos > n_text:  # pragma: no cover - unreachable guard
            break
    return all_lines, all_offs, page_of


def extract_layout(text: str, cfg: ExtractorConfig) -> Tuple[str, List[List[str]], List[Span]]:
    """Extract fixed-width grids + cleaned prose. Returns
    (clean_text, cells, spans); offsets refer to the normalized payload."""
    all_lines, all_offs, page_of = split_lines_pages(text)
    n_pages = (page_of[-1] + 1) if page_of else 1
    # optional global density threshold (Otsu analog): drop low-density
    # boilerplate lines before structural analysis
    if cfg.use_otsu:
        from table_ocr_spark.functions.threshold import otsu_line_filter

        keep_flags = otsu_line_filter(all_lines)
        all_lines = [ln for ln, k in zip(all_lines, keep_flags) if k]
        all_offs = [o for o, k in zip(all_offs, keep_flags) if k]
        page_of = [p for p, k in zip(page_of, keep_flags) if k]

    page_lines: List[List[str]] = [[] for _ in range(n_pages)]
    for ln, pg in zip(all_lines, page_of):
        page_lines[pg].append(ln)
    kept_pages = strip_running_lines(page_lines, cfg)

    if kept_pages is page_lines:
        # strip_running_lines returned its input unchanged (no running
        # header/footer found — the common case): skip the remap loop
        lines: List[str] = all_lines
        line_offs: List[int] = all_offs
    else:
        # map kept lines back to their global ids (order preserved within a page)
        lines = []
        line_offs = []
        cursors = [0] * n_pages
        kept_iters = [list(p) for p in kept_pages]
        for idx, (ln, pg) in enumerate(zip(all_lines, page_of)):
            ki = kept_iters[pg]
            ci = cursors[pg]
            if ci < len(ki) and ki[ci] == ln:
                lines.append(ln)
                line_offs.append(all_offs[idx])
                cursors[pg] = ci + 1

    box_cache: dict = {}
    flags = [is_table_line(ln, cfg, box_cache) for ln in lines]
    regions = find_layout_regions(lines, cfg, flags=flags)
    in_table = [False] * len(lines)
    region_of = {}
    for ri, (a, b) in enumerate(regions):
        for k in range(a, b):
            in_table[k] = True
            region_of[k] = ri
    use_bins = cfg.column_strategy == "bin" and cfg.cell_threshold > 0
    region_intervals = (
        []
        if use_bins
        else [
            vote_column_intervals(lines[a:b], cfg, region_flags=flags[a:b])
            for a, b in regions
        ]
    )
    # local adaptive threshold (GaussianAdaptiveThresholder analog,
    # preprocessors.py:313-400): prose lines sparser than their block_size
    # neighborhood − density_constant are background; grid rows are exempt
    # (a detected table row is definite content)
    keep_local = adaptive_line_filter(lines, cfg.block_size, cfg.density_constant)
    recognize = get_recognizer(cfg.recognizer)

    cells: List[List[str]] = []
    spans: List[Span] = []
    clean_lines: List[str] = []
    row_idx = 0
    for k, ln in enumerate(lines):
        if not in_table[k] or not flags[k]:
            if keep_local[k]:
                clean_lines.append(ln)
            continue
        boxes = token_boxes(ln, cfg, box_cache)
        by_col: dict = {}
        if use_bins:
            # the reference's integer binning: col_key = x // cell_threshold
            # (detectors.py:646-651), cells emitted in bin order
            for bs, be in boxes:
                by_col.setdefault(bs // cfg.cell_threshold, []).append((bs, be))
        else:
            # Assign fused token boxes to voted column intervals by box START
            # (interval-assignment variant of the binning idiom): a cell owns
            # every box starting inside its interval, so content overflowing
            # a narrow column is never truncated.
            intervals = region_intervals[region_of[k]]
            starts = [a for a, _ in intervals]
            for bs, be in boxes:
                ci = 0
                for ii, a in enumerate(starts):
                    if bs >= a:
                        ci = ii
                    else:
                        break
                by_col.setdefault(ci, []).append((bs, be))
        row_cells: List[str] = []
        row_spans: List[Span] = []
        col_idx = 0
        for ci in sorted(by_col):
            col_boxes = by_col[ci]
            s0, e0 = col_boxes[0][0], col_boxes[-1][1]
            cell_text, conf = recognize(ln[s0:e0])
            if not cell_text:
                continue  # empty-ROI skip (detectors.py:1076-1079)
            s = line_offs[k] + s0
            row_cells.append(cell_text)
            row_spans.append((row_idx, col_idx, s, line_offs[k] + e0, conf))
            col_idx += 1
        if len(row_cells) >= cfg.min_columns:
            cells.append(row_cells)
            spans.extend(row_spans)
            clean_lines.append(" ".join(row_cells))
            row_idx += 1
        elif keep_local[k]:
            clean_lines.append(ln)

    return "\n".join(clean_lines), cells, spans


def looks_like_layout(text: str, cfg: ExtractorConfig) -> bool:
    """Cheap classifier: form feeds or ≥ sep_min_run multi-gap lines."""
    if "\f" in text:
        return True
    hits = 0
    for ln in text.split("\n"):
        if _MULTI_GAP_RE.search(ln):
            hits += 1
            if hits >= cfg.sep_min_run:
                return True
    return False
