"""Golden end-to-end equality (SURVEY.md §5 item 2) — the north rule:
per-turn text equality under stable (conv_id, turn_idx) ordering, zero
tolerance.  Spark UDF output must byte-equal the single-node oracle.
Also partition/permutation invariance (§5 item 3)."""

import pandas as pd
import pytest

from table_ocr_spark import synth
from table_ocr_spark.config import ALT_CONFIG, DEFAULT_CONFIG
from table_ocr_spark.oracle import extract_frame
from table_ocr_spark.operators.extract_job import with_extraction
from table_ocr_spark.sources.catalog import TRANSCRIPT_SCHEMA


@pytest.fixture(scope="module")
def corpus():
    return synth.gen_pandas(40, seed=42, max_long=300)


@pytest.fixture(scope="module")
def golden(corpus):
    return extract_frame(corpus, DEFAULT_CONFIG)


def _spark_extract(spark, pdf, cfg=DEFAULT_CONFIG, repartition=None):
    sdf = spark.createDataFrame(pdf, schema=TRANSCRIPT_SCHEMA)
    if repartition:
        sdf = sdf.repartition(repartition, "conv_id")
    out = with_extraction(sdf, cfg)
    res = out.orderBy("conv_id", "turn_idx").toPandas()
    res["turn_idx"] = res["turn_idx"].astype("int32")
    return res.reset_index(drop=True)


def _assert_equal(spark_df: pd.DataFrame, golden_df: pd.DataFrame):
    assert len(spark_df) == len(golden_df), "row coverage mismatch"
    assert spark_df["conv_id"].tolist() == golden_df["conv_id"].tolist()
    assert spark_df["turn_idx"].tolist() == golden_df["turn_idx"].tolist()
    # north rule: byte equality per turn
    mism = spark_df["clean_text"].values != golden_df["clean_text"].values
    assert not mism.any(), f"clean_text mismatch on {mism.sum()} rows; first: " + str(
        spark_df.loc[mism.argmax(), ["conv_id", "turn_idx"]].tolist()
    )
    for i, (a, b) in enumerate(zip(spark_df["cells"], golden_df["cells"])):
        a = [list(r) for r in a] if a is not None else []
        assert a == b, f"cells mismatch at row {i}"
    for i, (a, b) in enumerate(zip(spark_df["spans"], golden_df["spans"])):
        a = [
            {
                "row": s["row"],
                "col": s["col"],
                "start": s["start"],
                "end": s["end"],
                "conf": s["conf"],
            }
            for s in (a if a is not None else [])
        ]
        assert a == b, f"spans mismatch at row {i}"
    assert spark_df["mode"].tolist() == golden_df["mode"].tolist()
    pd.testing.assert_series_equal(
        spark_df["boilerplate_ratio"], golden_df["boilerplate_ratio"], atol=1e-12
    )


def test_spark_equals_oracle(spark, corpus, golden):
    res = _spark_extract(spark, corpus)
    _assert_equal(res, golden)


def test_partition_count_invariance(spark, corpus, golden):
    for parts in (1, 3, 17):
        res = _spark_extract(spark, corpus, repartition=parts)
        _assert_equal(res, golden)


def test_input_order_invariance(spark, corpus, golden):
    shuffled = corpus.sample(frac=1.0, random_state=99).reset_index(drop=True)
    res = _spark_extract(spark, shuffled)
    _assert_equal(res, golden)


def test_config_sensitivity(spark, corpus):
    """Alternate config must change output (proves knobs reach the UDF)."""
    a = _spark_extract(spark, corpus, cfg=DEFAULT_CONFIG)
    b = _spark_extract(spark, corpus, cfg=ALT_CONFIG)
    assert (a["clean_text"] != b["clean_text"]).any() or not a["cells"].apply(
        lambda c: [list(r) for r in c]
    ).equals(b["cells"].apply(lambda c: [list(r) for r in c]))
    # and the alternate config still matches ITS oracle
    golden_alt = extract_frame(corpus, ALT_CONFIG)
    _assert_equal(b, golden_alt)
