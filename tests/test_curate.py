"""End-to-end curation job: extract → strip → score → filter → dedup →
split, one declarative DAG (jobs/curate.py)."""

import json

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def curated_out(spark, tmp_path_factory, monkeypatch_module):
    from table_ocr_spark import session as session_mod
    from table_ocr_spark import synth
    from table_ocr_spark.sources.catalog import write_transcripts_parquet

    import jobs.curate as C

    base = tmp_path_factory.mktemp("curate")
    pdf = synth.gen_pandas(12, seed=11, max_long=40)
    # inject an exact duplicate pair: two convs share an identical turn text
    dup = pd.DataFrame(
        [
            {"conv_id": "dup-a", "turn_idx": 0, "role": "user",
             "text": "identical payload body words here", "tool": "", "ts": pdf["ts"].iloc[0]},
            {"conv_id": "dup-b", "turn_idx": 0, "role": "user",
             "text": "identical   payload body words here", "tool": "", "ts": pdf["ts"].iloc[0]},
        ]
    )
    pdf = pd.concat([pdf, dup], ignore_index=True)
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    write_transcripts_parquet(pdf, str(base / "in"))

    monkeypatch_module.setattr(session_mod, "build_session", lambda **kw: spark)
    monkeypatch_module.setattr(spark, "stop", lambda: None)
    rc = C.main(
        [
            "--input", str(base / "in"),
            "--output", str(base / "out"),
            "--min-quality", "0.25",
        ]
    )
    assert rc == 0
    return base / "out"


@pytest.fixture(scope="module")
def monkeypatch_module():
    from _pytest.monkeypatch import MonkeyPatch

    mp = MonkeyPatch()
    yield mp
    mp.undo()


def test_curate_output_invariants(spark, curated_out):
    df = spark.read.parquet(str(curated_out / "data"))
    rows = df.count()
    assert rows > 0
    # dedup: fingerprints unique
    assert df.select("fingerprint").distinct().count() == rows
    # the injected exact-dup pair collapsed to its min representative
    dup = df.filter(F.col("conv_id").isin("dup-a", "dup-b")).collect()
    assert [r.conv_id for r in dup] == ["dup-a"]
    # quality floor + split domain + partition layout
    assert df.filter(F.col("quality") < 0.25).count() == 0
    splits = {r.split for r in df.select("split").distinct().collect()}
    assert splits <= {"train", "val", "test"} and "train" in splits
    assert any((curated_out / "data" / f"split={s}").exists() for s in splits)


def test_curate_summary_matches_data(spark, curated_out):
    df = spark.read.parquet(str(curated_out / "data"))
    summary = json.loads((curated_out / "_curation_summary.json").read_text())
    assert summary["rows_out"] == df.count()
    assert summary["rows_in"] >= summary["rows_out"]
    assert summary["tokens_out"] == df.agg(F.sum("n_tokens")).first()[0]


def test_curate_lang_filter(spark, tmp_path, monkeypatch):
    from table_ocr_spark import session as session_mod
    from table_ocr_spark.sources.catalog import write_transcripts_parquet

    import jobs.curate as C

    pdf = pd.DataFrame(
        [
            {"conv_id": "c1", "turn_idx": 0, "role": "user",
             "text": "the cat is on the mat and it is fine", "tool": "",
             "ts": pd.Timestamp("2025-01-01", tz="UTC")},
            {"conv_id": "c2", "turn_idx": 0, "role": "user",
             "text": "der hund ist nicht das problem und ist gut", "tool": "",
             "ts": pd.Timestamp("2025-01-01", tz="UTC")},
        ]
    )
    pdf["turn_idx"] = pdf["turn_idx"].astype("int32")
    write_transcripts_parquet(pdf, str(tmp_path / "in"))
    monkeypatch.setattr(session_mod, "build_session", lambda **kw: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    rc = C.main(
        [
            "--input", str(tmp_path / "in"),
            "--output", str(tmp_path / "out"),
            "--min-quality", "0.0",
            "--langs", "en",
        ]
    )
    assert rc == 0
    df = spark.read.parquet(str(tmp_path / "out" / "data"))
    assert {r.lang for r in df.select("lang").distinct().collect()} == {"en"}
    assert df.count() == 1


def test_curate_decontaminates_eval_overlap(spark, tmp_path_factory, monkeypatch_module):
    """--decontam-input drops curated rows sharing an 8-token window with
    the eval set; everything else is untouched."""
    from table_ocr_spark import session as session_mod
    from table_ocr_spark import synth
    from table_ocr_spark.sources.catalog import write_transcripts_parquet

    import jobs.curate as C

    base = tmp_path_factory.mktemp("curate_dc")
    pdf = synth.gen_pandas(10, seed=3, max_long=40)
    write_transcripts_parquet(pdf, str(base / "in"))

    monkeypatch_module.setattr(session_mod, "build_session", lambda **kw: spark)
    monkeypatch_module.setattr(spark, "stop", lambda: None)

    # baseline run (no decontamination)
    rc = C.main(["--input", str(base / "in"), "--output", str(base / "out0"),
                 "--min-quality", "0.25"])
    assert rc == 0
    out0 = spark.read.parquet(str(base / "out0" / "data"))
    # eval set = a 10-token window of one curated row's CLEANED text
    victim = out0.orderBy(F.length("text").desc()).first()
    snippet = " ".join(victim.text.split()[:10])
    assert len(snippet.split()) == 10
    spark.createDataFrame([(snippet,)], "text string").write.mode("overwrite").parquet(
        str(base / "eval")
    )

    rc = C.main(["--input", str(base / "in"), "--output", str(base / "out1"),
                 "--min-quality", "0.25", "--decontam-input", str(base / "eval")])
    assert rc == 0
    out1 = spark.read.parquet(str(base / "out1" / "data"))
    keys0 = {(r.conv_id, r.turn_idx) for r in out0.select("conv_id", "turn_idx").collect()}
    keys1 = {(r.conv_id, r.turn_idx) for r in out1.select("conv_id", "turn_idx").collect()}
    dropped = keys0 - keys1
    assert (victim.conv_id, victim.turn_idx) in dropped
    # only rows overlapping the snippet drop
    assert keys1 < keys0 and len(dropped) < len(keys0) / 2
