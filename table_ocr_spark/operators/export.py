"""Output-format export views over the extraction result.

``spans_hocr`` re-emits the engine's native span structs in the
reference's committed artifact shape — hOCR word spans with bbox +
``x_wconf`` (reference golden ``sample/proc/02.hocr``:
``<span class='ocrx_word' id='word_1_1' title='bbox ... ; x_wconf 88'>``),
and ``cells_html`` renders the recognized grid as an engine-native HTML
``<table>`` view (the reference commits no table-HTML render — its only
``.html`` sample, ``sample/proc/02 - Copy.html``, is tesseract's hOCR
XHTML, which ``spans_hocr`` already covers; this view is the natural
export a spreadsheet/table consumer of the casted grid would want).
The cell/span structs are the better native form (typed, queryable), so
these are VIEWS, not the storage format: pure JVM expressions
(``transform`` over the arrays + ``array_join``), zero Python, zero
shuffle — safe to tack onto any extraction plan at 100 TB.

Geometry mapping: the reference's pixel bbox becomes the engine's logical
grid/offset box — ``bbox <col> <row> <start> <end>`` (grid position +
character interval in the normalized payload), and ``x_wconf`` is the
per-cell recognizer confidence scaled to the reference's 0-100 integer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _xml_escape(c: Column) -> Column:
    c = F.replace(c, F.lit("&"), F.lit("&amp;"))
    c = F.replace(c, F.lit("<"), F.lit("&lt;"))
    return F.replace(c, F.lit(">"), F.lit("&gt;"))


def spans_hocr(extracted: DataFrame) -> DataFrame:
    """extraction output → (conv_id, turn_idx, hocr) — one hOCR page
    fragment per turn, one ``ocrx_word`` span per extracted cell.

    The word TEXT is looked up from the cells grid by the span's own
    (row, col) — robust to empty-cell skipping.  NOTE: the transform
    lambda deliberately takes two parameters; the second is the element
    INDEX (used for the hOCR word id), not a data column.
    """
    cell_txt = lambda s: F.try_element_at(  # noqa: E731
        F.try_element_at(F.col("cells"), (s["row"] + 1).cast("int")),
        (s["col"] + 1).cast("int"),
    )
    word = lambda s, i: F.concat(  # noqa: E731
        F.lit("  <span class='ocrx_word' id='word_"),
        (i + 1).cast("string"),
        F.lit("' title='bbox "),
        s["col"].cast("string"),
        F.lit(" "),
        s["row"].cast("string"),
        F.lit(" "),
        s["start"].cast("string"),
        F.lit(" "),
        s["end"].cast("string"),
        F.lit("; x_wconf "),
        F.round(s["conf"] * 100).cast("int").cast("string"),
        F.lit("'>"),
        _xml_escape(F.coalesce(cell_txt(s), F.lit(""))),
        F.lit("</span>"),
    )
    page_open = F.concat(
        F.lit("<div class='ocr_page' id='page_"),
        F.col("conv_id"),
        F.lit("_"),
        F.col("turn_idx").cast("string"),
        F.lit("' title='bbox 0 0 "),
        # NB: F.size(NULL) is -1 (legacy sizeOfNull), so guard on NULL first
        F.when(F.try_element_at(F.col("cells"), F.lit(1)).isNull(), F.lit(0))
        .otherwise(F.size(F.try_element_at(F.col("cells"), F.lit(1))))
        .cast("string"),
        F.lit(" "),
        F.when(F.col("cells").isNull(), F.lit(0))
        .otherwise(F.size("cells"))
        .cast("string"),
        F.lit("'>"),
    )
    body = F.when(
        F.col("spans").isNull() | (F.size("spans") == 0), F.lit("")
    ).otherwise(F.concat(F.lit("\n"), F.array_join(F.transform("spans", word), "\n")))
    return extracted.select(
        "conv_id",
        "turn_idx",
        F.concat(page_open, body, F.lit("\n</div>")).alias("hocr"),
    )


def cells_html(extracted: DataFrame) -> DataFrame:
    """extraction output → (conv_id, turn_idx, html) — one HTML ``<table>``
    render of the recognized cell grid per turn.  Engine-native export
    view, no reference golden: the reference's only committed ``.html``
    sample (``sample/proc/02 - Copy.html``) is tesseract hOCR XHTML
    (covered by ``spans_hocr``), not a ``<table>`` render.

    Pure JVM expressions (nested ``transform`` + ``array_join``), zero
    Python, zero shuffle.  Cell text is XML-escaped with the same
    ``& < >`` sequence as the hOCR view so both artifacts agree; turns
    with no detected grid render the empty ``<table></table>``.
    """
    cell_td = lambda c: F.concat(  # noqa: E731
        F.lit("<td>"), _xml_escape(F.coalesce(c, F.lit(""))), F.lit("</td>")
    )
    row_tr = lambda r: F.concat(  # noqa: E731
        F.lit("  <tr>"), F.array_join(F.transform(r, cell_td), ""), F.lit("</tr>")
    )
    body = F.when(
        F.col("cells").isNull() | (F.size("cells") == 0), F.lit("")
    ).otherwise(
        F.concat(F.lit("\n"), F.array_join(F.transform("cells", row_tr), "\n"), F.lit("\n"))
    )
    return extracted.select(
        "conv_id",
        "turn_idx",
        F.concat(F.lit("<table>"), body, F.lit("</table>")).alias("html"),
    )
