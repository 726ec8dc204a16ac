"""Otsu global-threshold kernel (preprocessors.py:403-481 analog) and the
separator-overlap dedupe (detectors.py:258-298 analog)."""

from table_ocr_spark.config import DEFAULT_CONFIG as C
from table_ocr_spark.config import ExtractorConfig
from table_ocr_spark.functions import markup
from table_ocr_spark.functions.extract import extract_payload
from table_ocr_spark.functions.threshold import line_density, otsu_line_filter, otsu_threshold


def test_otsu_splits_bimodal():
    values = [0.1, 0.12, 0.08, 0.11, 0.9, 0.88, 0.92, 0.91]
    cut = otsu_threshold(values)
    assert 0.12 < cut < 0.88


def test_otsu_degenerate_inputs():
    assert otsu_threshold([]) == 0.0
    assert otsu_threshold([0.5, 0.5, 0.5]) == 0.0


def test_otsu_line_filter_drops_decorative_junk():
    lines = [
        "real content with words here",
        "more sentences of actual text",
        "#####################################",
        "=====================================",
        "another genuine paragraph line",
        "final real words in a line",
    ]
    flags = otsu_line_filter(lines)
    assert flags[0] and flags[1] and flags[4] and flags[5]
    assert not flags[2] and not flags[3]


def test_otsu_keeps_homogeneous_docs():
    lines = ["plain words"] * 6
    assert all(otsu_line_filter(lines))


def test_use_otsu_changes_heuristic_extraction():
    doc = (
        "name        qty   price\n"
        "apple       3     1.20\n"
        "banana      12    0.50\n"
        "*************************************\n"
        "*************************************\n"
        "*************************************\n"
        "*************************************\n"
    )
    off = extract_payload(doc, C)
    on = extract_payload(doc, ExtractorConfig(use_otsu=True))
    assert "****" in off.clean_text
    assert "****" not in on.clean_text
    assert ["apple", "3", "1.20"] in on.cells  # grid survives the filter


def test_pipe_overlap_dedupe():
    # '||' is one ruling drawn twice → 2 cells, not 3 with an empty one
    segs = markup._split_pipe_row("| a || b |", min_sep=1)
    assert [s.strip() for s, _ in segs] == ["a", "b"]
    # far-apart pipes stay distinct
    segs2 = markup._split_pipe_row("| a | | b |", min_sep=1)
    assert [s.strip() for s, _ in segs2] == ["a", "", "b"]


def test_default_md_semantics_unchanged():
    doc = "| h1 | h2 |\n| --- | --- |\n| a | b |\n| c | d |"
    _, cells, _ = markup.extract_markdown(doc, C)
    assert cells == [["h1", "h2"], ["a", "b"], ["c", "d"]]
