"""Explicit-markup extraction — HTML pages and markdown pipe tables.

This is the text-domain analog of the reference's ML_FULL_TABLE branch
(main.py:84-122): explicit table rulings exist in the payload, so structure
detection is boundary *recognition*, not inference.

* Candidate-boundary scan ≈ ``CannyEdgeDetector`` (detectors.py:94-165):
  locate markup boundaries (``<tr>``/``<td>``, ``|``, ``---`` rules).
* Table-region acceptance with ``sep_min_run`` / ``sep_max_gap`` ≈
  ``ProbabilisticHoughLinesDetector``'s minLineLength / maxLineGap
  (detectors.py:374-449): a table is "voted in" only when enough consecutive
  boundary-bearing lines exist, tolerating small gaps.
* Edge pipes / document edges close the outermost cells ≈
  ``LineDetector._get_border_lines`` sentinel borders (detectors.py:300-329).
* Markdown rule lines (``|---|---|``) are horizontal separator lines, not
  content rows — the horizontal Hough lines of this domain.
* ``min_columns`` row filter ≈ detectors.py:653-655.
* ``roi_trim`` cell shrink ≈ ``roi_offset`` (detectors.py:979-1022), with the
  same degenerate-cell relaxation: when trimming would cross the cell over
  itself, fall back to the untrimmed bounds (detectors.py:1009-1015).

All functions are pure; offsets refer to the normalized payload.
"""

from __future__ import annotations

import re
from typing import List, Tuple

from table_ocr_spark.config import ExtractorConfig
from table_ocr_spark.functions.recognize import cleanup_text, get_recognizer

Span = Tuple[int, int, int, int, float]  # (row, col, start, end, conf)

# ---------------------------------------------------------------- HTML ----

_SCRIPT_STYLE_RE = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.I | re.S)
# Boilerplate containers (the adaptive-threshold "background" class):
# nav/header/footer/aside plus cookie/banner/sidebar/ad divs.
_BOILER_TAG_RE = re.compile(r"<(nav|header|footer|aside)\b[^>]*>.*?</\1\s*>", re.I | re.S)
_BOILER_DIV_RE = re.compile(
    r"<div\b[^>]*(?:class|id)\s*=\s*\"[^\"]*(?:cookie|banner|sidebar|advert|promo)[^\"]*\"[^>]*>.*?</div\s*>",
    re.I | re.S,
)
_TABLE_RE = re.compile(r"<table\b[^>]*>(.*?)</table\s*>", re.I | re.S)
_TR_RE = re.compile(r"<tr\b[^>]*>(.*?)</tr\s*>", re.I | re.S)
_CELL_RE = re.compile(r"<t[dh]\b[^>]*>(.*?)</t[dh]\s*>", re.I | re.S)
_TAG_RE = re.compile(r"<[^>]+>")
_HTML_HINT_RE = re.compile(r"<\s*(?:!doctype|html|head|body|div|table|article|p|nav|header|ul|h[1-6])\b", re.I)


def looks_like_html(text: str) -> bool:
    return bool(_HTML_HINT_RE.search(text))


# Document-level cleanup (tags → space, entity decode, collapse) lives in
# functions/recognize.cleanup_text; per-CELL recognition goes through the
# pluggable recognizer seam (cfg.recognizer) so a real model can slot in
# (≈ TesseractOCR per-cell recognition, detectors.py:767-890).
_strip_tags = cleanup_text


def _trim_cell(raw: str, start: int, trim: int) -> Tuple[str, int, int]:
    """roi_trim shrink with degenerate-cell relaxation (detectors.py:1009-15).

    Returns (stripped_text, abs_start, abs_end) where offsets cover the
    stripped content within the normalized payload.
    """
    if trim > 0 and len(raw) > 2 * trim:
        inner = raw[trim : len(raw) - trim]
        inner_off = trim
    else:  # degenerate: trimming would invert the interval — relax to full
        inner = raw
        inner_off = 0
    stripped = inner.strip()
    # CPython returns the SAME object when nothing was stripped; the `is`
    # test then skips the lstrip. Pure fast path — if an implementation
    # copies instead, the slow branch computes the identical value.
    lead = 0 if stripped is inner else len(inner) - len(inner.lstrip())
    abs_start = start + inner_off + lead
    return stripped, abs_start, abs_start + len(stripped)


def extract_html(text: str, cfg: ExtractorConfig) -> Tuple[str, List[List[str]], List[Span]]:
    """Extract main content + table grid from an HTML payload.

    Returns (clean_text, cells, spans). ``cells`` concatenates the rows of
    every table in document order (the reference emits one grid per image,
    detectors.py:1055; multi-table payloads stack row-wise).
    """
    work = _SCRIPT_STYLE_RE.sub(" ", text)
    work = _BOILER_TAG_RE.sub(" ", work)
    work = _BOILER_DIV_RE.sub(" ", work)
    recognize = get_recognizer(cfg.recognizer)

    cells: List[List[str]] = []
    spans: List[Span] = []
    # Spans must reference the ORIGINAL normalized payload, so locate tables
    # on `text` (boilerplate containers never contain tables in this model;
    # tables inside removed containers are boilerplate and skipped).
    removed_ranges = []
    for pat in (_SCRIPT_STYLE_RE, _BOILER_TAG_RE, _BOILER_DIV_RE):
        for m in pat.finditer(text):
            removed_ranges.append((m.start(), m.end()))

    def _in_removed(pos: int) -> bool:
        return any(a <= pos < b for a, b in removed_ranges)

    row_idx = 0
    for tm in _TABLE_RE.finditer(text):
        if _in_removed(tm.start()):
            continue
        body, body_off = tm.group(1), tm.start(1)
        for rm in _TR_RE.finditer(body):
            row_cells: List[str] = []
            col_idx = 0
            for cm in _CELL_RE.finditer(rm.group(1)):
                raw = cm.group(1)
                abs_start = body_off + rm.start(1) + cm.start(1)
                stripped, s, e = _trim_cell(raw, abs_start, cfg.roi_trim)
                cell_text, conf = recognize(stripped)
                row_cells.append(cell_text)
                spans.append((row_idx, col_idx, s, e, conf))
                col_idx += 1
            if len(row_cells) >= cfg.min_columns:
                cells.append(row_cells)
                row_idx += 1
            else:
                # row rejected by min_columns (detectors.py:653-655):
                # drop its spans too
                spans = [sp for sp in spans if sp[0] != row_idx]

    clean = _strip_tags(work)
    return clean, cells, spans


# ------------------------------------------------------------ markdown ----

_MD_RULE_CELL_RE = re.compile(r"^\s*:?-{2,}:?\s*$")
# a rule line consists solely of pipes, dashes, colons and whitespace: any
# other char lands in some kept segment and fails _MD_RULE_CELL_RE
_RULE_CHARSET_RE = re.compile(r"[\s|:-]*\Z")


def _is_md_candidate(line: str) -> bool:
    return line.count("|") >= 2


def _is_md_rule(line: str) -> bool:
    # fast rejects (value-identical): no dash, or any char outside the
    # rule alphabet → cannot be a rule; skips the full pipe-split for the
    # common content row (profiled: _is_md_rule ran _split_pipe_row once
    # per candidate line on top of the row's own split)
    if "-" not in line or _RULE_CHARSET_RE.match(line) is None:
        return False
    segs = _split_pipe_row(line)
    return len(segs) >= 1 and all(_MD_RULE_CELL_RE.match(s or "-") for s, _ in segs)


def _split_pipe_row(line: str, min_sep: int = 1) -> List[Tuple[str, int]]:
    """Split a pipe-delimited row → [(segment, start_col)].

    Leading/trailing edge pipes are border lines (sentinel separators,
    detectors.py:300-329): the segments outside them are empty and dropped.
    Near-duplicate separators closer than ``min_sep`` are deduped — the
    sort+lag overlap filter (``_filter_overlapping_lines``,
    detectors.py:258-298): ``||`` is one ruling drawn twice, not an empty
    cell.
    """
    segs: List[Tuple[str, int]] = []
    start = 0
    prev_sep = None
    # jump pipe-to-pipe with str.find instead of walking every character —
    # identical separator semantics, ~5x less Python-loop work on prose rows
    i = line.find("|")
    while i != -1:
        if prev_sep is not None and i - prev_sep <= min_sep:
            prev_sep = i  # overlapping ruling: slide, don't split
            start = i + 1
        else:
            segs.append((line[start:i], start))
            start = i + 1
            prev_sep = i
        i = line.find("|", i + 1)
    segs.append((line[start:], start))
    # drop empty edge segments created by border pipes
    if segs and segs[0][0].strip() == "":
        segs = segs[1:]
    if segs and segs[-1][0].strip() == "":
        segs = segs[:-1]
    return segs


def find_md_regions(lines: List[str], cfg: ExtractorConfig) -> List[Tuple[int, int]]:
    """Maximal runs of pipe-bearing lines, tolerating ``sep_max_gap``
    non-candidate lines inside a run, accepted at ≥ ``sep_min_run`` candidate
    lines (HoughP threshold/minLineLength/maxLineGap semantics,
    detectors.py:374-449)."""
    regions: List[Tuple[int, int]] = []
    i, n = 0, len(lines)
    while i < n:
        if not _is_md_candidate(lines[i]):
            i += 1
            continue
        start = i
        last_candidate = i
        gap = 0
        j = i + 1
        while j < n:
            if _is_md_candidate(lines[j]):
                last_candidate = j
                gap = 0
            else:
                gap += 1
                if gap > cfg.sep_max_gap:
                    break
            j += 1
        n_candidates = sum(1 for k in range(start, last_candidate + 1) if _is_md_candidate(lines[k]))
        if n_candidates >= cfg.sep_min_run:
            regions.append((start, last_candidate + 1))
        i = last_candidate + 1
    return regions


def extract_markdown(text: str, cfg: ExtractorConfig) -> Tuple[str, List[List[str]], List[Span]]:
    """Extract markdown pipe tables. Returns (clean_text, cells, spans)."""
    lines = text.split("\n")
    regions = find_md_regions(lines, cfg)
    if not regions:
        # no table region: every line is kept verbatim, so the output is
        # the input (split/join roundtrip identity) with no cells/spans —
        # skip the offsets build and the per-line loop
        return text, [], []
    # char offset of each line start in the payload
    offsets: List[int] = []
    pos = 0
    for ln in lines:
        offsets.append(pos)
        pos += len(ln) + 1

    recognize = get_recognizer(cfg.recognizer)
    in_table = [False] * len(lines)
    for a, b in regions:
        for k in range(a, b):
            in_table[k] = True

    cells: List[List[str]] = []
    spans: List[Span] = []
    clean_lines: List[str] = []
    row_idx = 0
    for k, ln in enumerate(lines):
        if not in_table[k] or not _is_md_candidate(ln):
            if not in_table[k]:
                clean_lines.append(ln)
            else:
                clean_lines.append(ln)  # gap line inside a region: keep as prose
            continue
        if _is_md_rule(ln):
            continue  # horizontal separator line, not content
        segs = _split_pipe_row(ln, cfg.sep_min_separation)
        row_cells: List[str] = []
        row_spans: List[Span] = []
        for col_idx, (seg, seg_start) in enumerate(segs):
            stripped, s, e = _trim_cell(seg, offsets[k] + seg_start, cfg.roi_trim)
            cell_text, conf = recognize(stripped)
            row_cells.append(cell_text)
            row_spans.append((row_idx, col_idx, s, e, conf))
        if len(row_cells) >= cfg.min_columns:
            cells.append(row_cells)
            spans.extend(row_spans)
            clean_lines.append(" ".join(c for c in row_cells if c))
            row_idx += 1
        else:
            clean_lines.append(ln)

    return "\n".join(clean_lines), cells, spans
