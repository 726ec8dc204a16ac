"""Conversation-scoped applyInPandas stages + flat cell view."""

import pytest
from pyspark.sql import functions as F


def test_strip_conv_boilerplate(spark):
    from table_ocr_spark.operators.conv_scope import strip_conv_boilerplate

    rows = []
    # conv A: 4 turns, banner in every turn → banned
    for t in range(4):
        rows.append(("A", t, f"-- FOOTER --\ncontent {t}"))
    # conv B: 2 turns (< min_turns) → nothing banned
    for t in range(2):
        rows.append(("B", t, f"-- FOOTER --\nother {t}"))
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    got = {
        (r.conv_id, r.turn_idx): r
        for r in strip_conv_boilerplate(df, ratio=0.6, min_turns=3).collect()
    }
    assert got[("A", 0)].text_stripped == "content 0"
    assert got[("A", 3)].text_stripped == "content 3"
    assert got[("A", 0)].n_banned_lines == 1
    assert got[("B", 0)].text_stripped == "-- FOOTER --\nother 0"
    assert got[("B", 0)].n_banned_lines == 0


def test_strip_conv_boilerplate_partition_invariant(spark):
    """Same output under different shuffle parallelism (whole-conv gather)."""
    from table_ocr_spark.operators.conv_scope import strip_conv_boilerplate

    rows = [("C", t, f"BANNER\nline {t}") for t in range(6)]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    a = sorted(
        (r.conv_id, r.turn_idx, r.text_stripped)
        for r in strip_conv_boilerplate(df.repartition(1)).collect()
    )
    b = sorted(
        (r.conv_id, r.turn_idx, r.text_stripped)
        for r in strip_conv_boilerplate(df.repartition(7)).collect()
    )
    assert a == b


def test_cells_flat_and_conv_metrics(spark):
    from table_ocr_spark.operators.conv_scope import cells_flat, conv_metrics
    from table_ocr_spark.operators.extract_job import with_extraction

    md = "| a | b |\n| --- | --- |\n| c | d |"
    df = spark.createDataFrame(
        [("X", 0, md), ("X", 1, "plain prose"), ("Y", 0, md)],
        "conv_id string, turn_idx int, text string",
    )
    ex = with_extraction(df)
    flat = cells_flat(ex).collect()
    keyed = {(r.conv_id, r.turn_idx, r.row_idx, r.col_idx): r.cell for r in flat}
    assert keyed[("X", 0, 0, 0)] == "a" and keyed[("X", 0, 1, 1)] == "d"
    assert ("X", 1, 0, 0) not in keyed  # prose turn contributes no cells
    assert len(flat) == 8  # 2 tables × 2 rows × 2 cols

    m = {r.conv_id: r for r in conv_metrics(ex).collect()}
    assert m["X"].n_turns == 2 and m["X"].cell_count == 4
    assert m["Y"].n_turns == 1 and m["Y"].cell_count == 4


def test_linehash_method_equals_gather(spark):
    """The skew-safe line-hash plan and the direct gather plan must be
    byte-identical — on the synth corpus (heavy-tailed conv lengths,
    unicode/noisy payloads) AND on crafted edge cases (None text, empty
    turns, convs below min_turns)."""
    import pandas as pd

    from table_ocr_spark.operators.conv_scope import strip_conv_boilerplate
    from table_ocr_spark.synth import gen_pandas

    pdf = gen_pandas(12, seed=99, max_long=120)[["conv_id", "turn_idx", "text"]]
    edge = pd.DataFrame(
        {
            "conv_id": ["e1", "e1", "e1", "e2", "e2", "e3"],
            "turn_idx": [0, 1, 2, 0, 1, 0],
            "text": ["BANNER\na", "BANNER\nb", "BANNER\n\nc", "x", None, ""],
        }
    )
    df = spark.createDataFrame(pd.concat([pdf, edge], ignore_index=True))

    def frame(method):
        out = strip_conv_boilerplate(df, ratio=0.6, min_turns=3, method=method)
        return (
            out.toPandas()
            .sort_values(["conv_id", "turn_idx"])
            .reset_index(drop=True)
        )

    a, b = frame("gather"), frame("linehash")
    pd.testing.assert_frame_equal(a, b)
    # the banner conv actually stripped something
    e1 = b[b.conv_id == "e1"]
    assert (e1.n_banned_lines == 1).all() and not e1.text_stripped.str.contains("BANNER").any()


def test_linehash_no_broadcast_same_result(spark):
    from table_ocr_spark.operators.conv_scope import strip_conv_boilerplate

    df = spark.createDataFrame(
        [("c", i, f"SIG\nline {i}") for i in range(5)],
        "conv_id string, turn_idx int, text string",
    )
    rows = {
        (r.conv_id, r.turn_idx): (r.text_stripped, r.n_banned_lines)
        for r in strip_conv_boilerplate(
            df, method="linehash", broadcast_banned=False
        ).collect()
    }
    assert rows[("c", 3)] == ("line 3", 1)


def test_conv_text_order_and_partition_invariant(spark):
    """conv_text joins turns strictly by turn_idx regardless of scan or
    partition order, and conv-level fingerprints distinguish 'same turns,
    different order' conversations that turn-level dedup cannot."""
    from pyspark.sql import functions as F

    from table_ocr_spark.operators.conv_scope import conv_text
    from table_ocr_spark.operators.dedup import exact_duplicates

    rows = [
        ("a", 2, "third"), ("a", 0, "first"), ("a", 1, "second"),
        ("b", 0, "first"), ("b", 1, "second"), ("b", 2, "third"),
        ("c", 0, "third"), ("c", 1, "second"), ("c", 2, "first"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {r.conv_id: r.text for r in conv_text(df).collect()}
    assert out["a"] == out["b"] == "first\nsecond\nthird"
    assert out["c"] == "third\nsecond\nfirst"  # order matters at conv level
    # repartition-invariant
    out2 = {r.conv_id: r.text for r in conv_text(df.repartition(7)).collect()}
    assert out2 == out
    # conv-level dedup: a and b collapse; c (same turns, other order) survives
    dups = exact_duplicates(conv_text(df), "text", "conv_id").collect()
    assert len(dups) == 1 and dups[0].n_dups == 2 and dups[0].min_key == "a"


def test_strip_corpus_boilerplate_bans_by_document_frequency(spark):
    """The C4 rule: a line in >= min_df distinct docs is removed from all
    of them; rarer lines survive; blank lines are kept; a fully-banned
    doc strips to ''. Banner-once-per-conversation is the case the conv
    scope cannot see."""
    from table_ocr_spark.operators.conv_scope import strip_corpus_boilerplate

    footer = "SENT FROM MY PLATFORM"
    rows = [
        ("c1", 0, f"{footer}\nunique alpha line"),
        ("c2", 0, f"{footer}\n\nshared beta line"),
        ("c3", 0, f"shared beta line\n{footer}"),
        ("c4", 0, "shared beta line"),      # 3rd doc with the beta line
        ("c5", 0, footer),                   # fully banned -> ''
        ("c6", 0, "rare gamma line\nrare delta line"),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, text string")
    out = {
        (r.conv_id): (r.text_stripped, r.n_banned_lines)
        for r in strip_corpus_boilerplate(df, min_df=3).collect()
    }
    assert out["c1"] == ("unique alpha line", 1)
    assert out["c2"] == ("", 2)          # footer + beta banned; blank line...
    assert out["c3"] == ("", 2)
    assert out["c4"] == ("", 1)
    assert out["c5"] == ("", 1)
    assert out["c6"] == ("rare gamma line\nrare delta line", 0)
