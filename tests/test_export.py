"""hOCR export view: word bbox + x_wconf shape of the reference's
committed per-sample artifact (sample/proc/02.hocr)."""


def test_spans_hocr_golden_fragment(spark):
    from table_ocr_spark.operators.export import spans_hocr
    from table_ocr_spark.operators.extract_job import with_extraction

    df = spark.createDataFrame(
        [
            ("c1", 0, "| c0 | c1 |\n| --- | --- |\n| al!pha | beta&x |"),
            ("c1", 1, "plain text no table"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    got = {r.turn_idx: r.hocr for r in spans_hocr(with_extraction(df)).collect()}
    assert got[0] == (
        "<div class='ocr_page' id='page_c1_0' title='bbox 0 0 2 2'>\n"
        "  <span class='ocrx_word' id='word_1' title='bbox 0 0 2 4; x_wconf 100'>c0</span>\n"
        "  <span class='ocrx_word' id='word_2' title='bbox 1 0 7 9; x_wconf 100'>c1</span>\n"
        "  <span class='ocrx_word' id='word_3' title='bbox 0 1 28 34; x_wconf 83'>al!pha</span>\n"
        "  <span class='ocrx_word' id='word_4' title='bbox 1 1 37 43; x_wconf 83'>beta&amp;x</span>\n"
        "</div>"
    )
    # span-less turn: empty page, geometry 0 0
    assert got[1] == "<div class='ocr_page' id='page_c1_1' title='bbox 0 0 0 0'>\n</div>"


def test_spans_hocr_is_jvm_only(spark):
    """The export view adds no Python stage of its own: exactly the one
    ArrowEvalPython from extraction appears in the physical plan."""
    from table_ocr_spark.operators.export import spans_hocr
    from table_ocr_spark.operators.extract_job import with_extraction

    df = spark.createDataFrame([("c", 0, "x y")], "conv_id string, turn_idx int, text string")
    plan = spans_hocr(with_extraction(df))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan  # still a pure projection — zero shuffles


def test_cells_html_golden_fragment(spark):
    """HTML-table export view (engine-native <table> render of the cell
    grid; the reference's committed .html is hOCR XHTML), escaping
    included."""
    from table_ocr_spark.operators.export import cells_html
    from table_ocr_spark.operators.extract_job import with_extraction

    df = spark.createDataFrame(
        [
            ("c1", 0, "| c0 | c1 |\n| --- | --- |\n| a<b | x&y |"),
            ("c1", 1, "plain text no table"),
        ],
        "conv_id string, turn_idx int, text string",
    )
    got = {r.turn_idx: r.html for r in cells_html(with_extraction(df)).collect()}
    assert got[0] == (
        "<table>\n"
        "  <tr><td>c0</td><td>c1</td></tr>\n"
        "  <tr><td>a&lt;b</td><td>x&amp;y</td></tr>\n"
        "</table>"
    )
    assert got[1] == "<table></table>"  # grid-less turn → empty table


def test_cells_html_is_jvm_only(spark):
    from table_ocr_spark.operators.export import cells_html
    from table_ocr_spark.operators.extract_job import with_extraction

    df = spark.createDataFrame([("c", 0, "x y")], "conv_id string, turn_idx int, text string")
    plan = cells_html(with_extraction(df))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ArrowEvalPython") == 1
    assert "Exchange" not in plan


def test_pdf_round_trip_and_structure():
    """Searchable-PDF writer: byte-exact xref offsets, /Count 1, and a
    lossless build→parse text-layer round trip for edge-case payloads
    (empty, multi-line, UTF-8, PDF-delimiter characters)."""
    from table_ocr_spark.operators.pdf_export import (
        build_text_pdf,
        count_pages,
        parse_text_layer,
    )

    for t in ["hello world", "", "multi\nline\ntext", "ünïcode 日本語 (p) \\b <hex>"]:
        pdf = build_text_pdf(t)
        assert pdf.startswith(b"%PDF-1.4") and pdf.endswith(b"%%EOF\n")
        assert parse_text_layer(pdf) == t
        assert count_pages(pdf) == 1
        # xref entries must point exactly at each "N 0 obj" header
        xref_at = int(pdf.rsplit(b"startxref\n", 1)[1].split(b"\n")[0])
        assert pdf[xref_at : xref_at + 4] == b"xref"
        for i, ln in enumerate(pdf[xref_at:].split(b"\n")[3:8], start=1):
            off = int(ln.split()[0])
            assert pdf[off:].startswith(b"%d 0 obj" % i)
        # declared stream /Length must match the actual stream bytes
        import re

        m = re.search(rb"/Length (\d+) >>\nstream\n(.*?)\nendstream", pdf, re.DOTALL)
        assert m and int(m.group(1)) == len(m.group(2))
    assert parse_text_layer(b"not a pdf") is None
    assert count_pages(None) is None


def test_pdf_column_kernels(spark):
    """Arrow-batched pdf kernels on a DataFrame: NULL-safe, zero shuffle."""
    from pyspark.sql import functions as F

    from table_ocr_spark.operators.pdf_export import (
        pdf_page_count,
        pdf_text_layer,
        with_text_pdf,
    )

    df = spark.createDataFrame(
        [("a", "some text"), ("b", None)], "doc string, clean_text string"
    )
    out = with_text_pdf(df)
    got = {
        r.doc: (r.back, r.n)
        for r in out.select(
            "doc",
            pdf_text_layer(F.col("pdf")).alias("back"),
            pdf_page_count(F.col("pdf")).alias("n"),
        ).collect()
    }
    assert got == {"a": ("some text", 1), "b": (None, None)}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
