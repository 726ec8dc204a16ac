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
    """HTML-table export view: the reference's committed per-sample .html
    artifact shape (sample/proc/02.html), escaping included."""
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
