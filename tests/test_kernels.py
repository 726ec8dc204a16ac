"""Unit tests per kernel stage (SURVEY.md §5 item 1): pure pandas/python
in-out, no Spark — micro-fixtures play the role the reference's
``sample/orig/01-*.png`` → ``sample/proc/01-table.txt`` pairs play."""

import pytest

from table_ocr_spark.config import DEFAULT_CONFIG as C
from table_ocr_spark.config import ExtractorConfig
from table_ocr_spark.functions import layout, markup
from table_ocr_spark.functions.extract import (
    MODE_EXPLICIT,
    MODE_HEURISTIC,
    MODE_PASSTHROUGH,
    classify_mode,
    extract_payload,
)
from table_ocr_spark.functions.normalize import collapse_ws, normalize


# ------------------------------------------------------------ normalize ---
def test_normalize_newlines_and_zero_width():
    assert normalize("a\r\nb\rc") == "a\nb\nc"
    assert normalize("z​e‌r‍o﻿!") == "zero!"
    assert normalize(None) == ""


def test_normalize_nfc():
    # e + combining acute → precomposed é
    assert normalize("é") == "é"


def test_collapse_ws():
    assert collapse_ws("  a   b \t c \n\n\n\n d  ") == "a b c\n\nd"


# ----------------------------------------------------------------- html ---
HTML_DOC = (
    '<html><head><script>var x=1;</script></head><body>'
    "<nav>menu junk</nav>"
    '<div class="cookie-banner">accept cookies</div>'
    "<article><p>real content &amp; more</p>"
    "<table><tr><td> a1 </td><td>b1</td></tr>"
    "<tr><td>a2</td><td>b2</td></tr></table></article>"
    "<footer>copyright</footer></body></html>"
)


def test_html_boilerplate_strip():
    clean, cells, spans = markup.extract_html(HTML_DOC, C)
    assert "menu junk" not in clean
    assert "accept cookies" not in clean
    assert "copyright" not in clean
    assert "var x=1" not in clean
    assert "real content & more" in clean  # entity decoded


def test_html_table_cells_and_spans():
    clean, cells, spans = markup.extract_html(HTML_DOC, C)
    assert cells == [["a1", "b1"], ["a2", "b2"]]
    # spans point at the raw payload content (pre-strip, trimmed)
    for (row, col, s, e, conf) in spans:
        assert HTML_DOC[s:e].strip() == cells[row][col]


def test_html_min_columns_row_filter():
    doc = "<table><tr><td>only</td></tr><tr><td>a</td><td>b</td></tr></table>"
    _, cells, spans = markup.extract_html(doc, C)  # min_columns=2
    assert cells == [["a", "b"]]
    assert [(r, c) for r, c, *_ in spans] == [(0, 0), (0, 1)]


# ------------------------------------------------------------- markdown ---
MD_DOC = "intro prose\n\n| h1 | h2 | h3 |\n| --- | --- | --- |\n| a | b | c |\n| d | e | f |\n\noutro"


def test_markdown_cells():
    clean, cells, spans = markup.extract_markdown(MD_DOC, C)
    assert cells == [["h1", "h2", "h3"], ["a", "b", "c"], ["d", "e", "f"]]
    assert "intro prose" in clean and "outro" in clean
    assert "---" not in clean  # rule line is a separator, not content


def test_markdown_spans_point_at_cells():
    _, cells, spans = markup.extract_markdown(MD_DOC, C)
    for (row, col, s, e, conf) in spans:
        assert MD_DOC[s:e] == cells[row][col]


def test_markdown_min_run_rejects_single_line():
    # one pipe line is below sep_min_run=2 → no table voted in
    doc = "prose | not | a table\nmore prose"
    _, cells, _ = markup.extract_markdown(doc, C)
    assert cells == []


def test_markdown_max_gap_merges_regions():
    cfg = ExtractorConfig(sep_max_gap=1)
    doc = "| a | b |\n| c | d |\ngap line\n| e | f |"
    regions = markup.find_md_regions(doc.split("\n"), cfg)
    assert regions == [(0, 4)]
    # with sep_max_gap=0 the trailing single line is its own run, below
    # sep_min_run=2 → rejected (minLineLength semantics, detectors.py:374-449)
    regions0 = markup.find_md_regions(doc.split("\n"), C)
    assert regions0 == [(0, 2)]


def test_markdown_roi_trim_degenerate_relaxation():
    # roi_trim bigger than the cell → falls back to untrimmed (detectors.py:1009-15)
    cfg = ExtractorConfig(roi_trim=10)
    doc = "| ab | cd |\n| ef | gh |"
    _, cells, _ = markup.extract_markdown(doc, cfg)
    assert cells == [["ab", "cd"], ["ef", "gh"]]


# ---------------------------------------------------------------- layout ---
PDF_DOC = (
    "HEADER TITLE\n\n"
    "name        qty   price\n"
    "apple       3     1.20\n"
    "banana      12    0.50\n"
    "\nprose paragraph here\n"
    "\fHEADER TITLE\n\n"
    "name        qty   price\n"
    "cherry      7     3.10\n"
)


def test_layout_grid_extraction():
    clean, cells, spans = layout.extract_layout(PDF_DOC, C)
    assert ["apple", "3", "1.20"] in cells
    assert ["cherry", "7", "3.10"] in cells
    assert "prose paragraph here" in clean


def test_layout_running_header_removed():
    clean, cells, spans = layout.extract_layout(PDF_DOC, C)
    assert "HEADER TITLE" not in clean


def test_layout_spans_point_at_content():
    _, cells, spans = layout.extract_layout(PDF_DOC, C)
    flat = [cells[r][c] for (r, c, s, e, conf) in spans]
    for (r, c, s, e, conf), cell in zip(spans, flat):
        assert PDF_DOC[s:e].strip().replace("  ", " ") == cell or PDF_DOC[s:e].strip() == cell


def test_layout_token_fusion_and_size_filter():
    cfg = ExtractorConfig(min_token_len=2, max_token_len=5)
    boxes = layout.token_boxes("ab x abcdef  ok", cfg)
    # 'ab x' fuses (gap 1) into 'ab x' len 4 → kept; 'abcdef' len 6 → dropped... but
    # fusion happens before filtering: 'ab x abcdef' gaps: ab-(1)-x-(1)-abcdef fuse all → len 11 dropped
    assert boxes == [(13, 15)]


def test_layout_single_space_stays_in_cell():
    doc = "first col   second col\nalpha beta  gamma delta\nmore words  and words"
    _, cells, _ = layout.extract_layout(doc, C)
    assert cells[1] == ["alpha beta", "gamma delta"]


# ------------------------------------------------------------- dispatch ---
def test_classify_modes():
    assert classify_mode(HTML_DOC, C) == MODE_EXPLICIT
    assert classify_mode(MD_DOC, C) == MODE_EXPLICIT
    assert classify_mode(PDF_DOC, C) == MODE_HEURISTIC
    assert classify_mode("just words here", C) == MODE_PASSTHROUGH


def test_classify_mode_nonpositive_sep_min_run_is_explicit():
    # count >= run with run <= 0 holds for ANY text (zero candidates
    # suffice) — the early-exit loop must preserve that boundary, not
    # only the default run=2 path
    cfg0 = ExtractorConfig(sep_min_run=0)
    assert classify_mode("just words here", cfg0) == MODE_EXPLICIT
    assert classify_mode(PDF_DOC, cfg0) == MODE_EXPLICIT
    cfg_neg = ExtractorConfig(sep_min_run=-1)
    assert classify_mode("just words here", cfg_neg) == MODE_EXPLICIT


def test_extract_empty_and_none():
    r = extract_payload("", C)
    assert r.clean_text == "" and r.cells == [] and r.mode == MODE_PASSTHROUGH
    r = extract_payload(None, C)
    assert r.clean_text == ""


def test_extract_is_pure_and_deterministic():
    a = extract_payload(HTML_DOC, C)
    b = extract_payload(HTML_DOC, C)
    assert a == b


def test_config_hash_distinguishes_configs():
    from table_ocr_spark.config import ALT_CONFIG, DEFAULT_CONFIG

    assert DEFAULT_CONFIG.config_hash() != ALT_CONFIG.config_hash()
    assert DEFAULT_CONFIG.config_hash() == ExtractorConfig().config_hash()


# ------------------------------------------------ adaptive local threshold ---
def test_adaptive_line_filter_drops_local_outlier():
    from table_ocr_spark.functions.threshold import adaptive_line_filter

    lines = ["normal prose line here"] * 6 + ["#### ==== $$$$ ===="] + [
        "normal prose line here"
    ] * 6
    keep = adaptive_line_filter(lines, block_size=11, density_constant=0.05)
    assert keep[6] is False and sum(keep) == 12
    # empty lines are structure — always kept
    lines2 = lines[:6] + [""] + lines[6:]
    assert adaptive_line_filter(lines2, 11, 0.05)[6] is True
    # short docs have no neighborhood — keep all
    assert adaptive_line_filter(lines[:5], 11, 0.05) == [True] * 5


def test_adaptive_threshold_wired_into_heuristic_mode():
    junk = "=== $$$ === $$$ ==="
    doc = PDF_DOC + "\n" + "\n".join(["plain prose padding line"] * 8 + [junk])
    clean_on, _, _ = layout.extract_layout(doc, C)
    assert junk not in clean_on
    # density_constant is live: a huge constant keeps everything
    lax = ExtractorConfig(density_constant=1.0)
    clean_off, _, _ = layout.extract_layout(doc, lax)
    assert junk in clean_off
    # grid rows are exempt even when punctuation-dense
    assert "apple 3 1.20" in clean_on


# ------------------------------------------------- column binning strategy ---
def test_bin_column_strategy_matches_vote_on_aligned_grid():
    # columns start at offsets 0/12/18 — threshold 6 separates the bins
    # (0, 2, 3) and reproduces the voted grid exactly; a coarse threshold
    # (10) MERGES the 12/18 columns into one bin — the reference's
    # `x // cell_threshold` coarsening semantics (detectors.py:646-651)
    vote = layout.extract_layout(PDF_DOC, C)[1]
    binned = layout.extract_layout(
        PDF_DOC, ExtractorConfig(column_strategy="bin", cell_threshold=6)
    )[1]
    assert vote == binned
    coarse = layout.extract_layout(
        PDF_DOC, ExtractorConfig(column_strategy="bin", cell_threshold=10)
    )[1]
    assert ["apple", "3 1.20"] in coarse


def test_bin_cell_threshold_is_live():
    # 3 tokens at offsets 0, 6, 12: threshold 4 → three bins; threshold 10
    # → tokens at 6 and 12 land in bins 0 and 1... while a huge threshold
    # bins everything together (min_columns=2 then rejects the row)
    doc = "aa    bb    cc\ndd    ee    ff"
    cfg4 = ExtractorConfig(column_strategy="bin", cell_threshold=6, min_columns=2)
    cells4 = layout.extract_layout(doc, cfg4)[1]
    assert cells4 == [["aa", "bb", "cc"], ["dd", "ee", "ff"]]
    cfg_big = ExtractorConfig(column_strategy="bin", cell_threshold=100, min_columns=2)
    assert layout.extract_layout(doc, cfg_big)[1] == []


# ----------------------------------------------------- recognizer seam ----
def test_recognizer_seam_and_confidence():
    from table_ocr_spark.functions.recognize import get_recognizer

    with pytest.raises(ValueError):
        get_recognizer("nope")
    doc = "<table><tr><td><b>a&amp;b</b></td><td>plain ok</td></tr></table>"
    cfg_clean = ExtractorConfig(min_columns=2)
    _, cells, spans = markup.extract_html(doc, cfg_clean)
    assert cells == [["a&b", "plain ok"]]
    assert spans[0][4] == pytest.approx(1.0 - 1.0 / 3.0)  # 'a&b': 1 of 3 plain
    assert spans[1][4] == 1.0
    # identity recognizer skips the tag-strip cleanup
    _, cells_id, _ = markup.extract_html(
        doc, ExtractorConfig(min_columns=2, recognizer="identity")
    )
    assert cells_id == [["<b>a&amp;b</b>", "plain ok"]]
