"""Checkpoint-resume semantics (SURVEY.md §5 item 4 / FIXTURES.md §4):
kill after K of P bucket-group commits, rerun, assert exactly-once output
and lineage completeness."""

import pytest
from pyspark.sql import functions as F

from table_ocr_spark import synth
from table_ocr_spark.config import ALT_CONFIG, DEFAULT_CONFIG
from table_ocr_spark.plans.pipeline import SimulatedKill, run_extract
from table_ocr_spark.sources.catalog import ExtractionTable, write_transcripts_parquet

N_BUCKETS = 8
GROUPS = 4


@pytest.fixture(scope="module")
def input_path(tmp_path_factory):
    p = str(tmp_path_factory.mktemp("transcripts"))
    write_transcripts_parquet(synth.gen_pandas(30, seed=42, max_long=200), p)
    return p


def test_kill_and_resume_exactly_once(spark, input_path, tmp_path):
    out = str(tmp_path / "extracted")
    table = ExtractionTable(out)

    with pytest.raises(SimulatedKill):
        run_extract(
            spark, input_path, out,
            n_buckets=N_BUCKETS, commit_groups=GROUPS,
            run_id="run-a", fail_after_groups=2,
        )
    partial = table.committed_buckets(spark, DEFAULT_CONFIG.config_hash())
    assert 0 < len(partial) < N_BUCKETS, "kill must land mid-run"

    res = run_extract(
        spark, input_path, out,
        n_buckets=N_BUCKETS, commit_groups=GROUPS, run_id="run-b",
    )
    assert sorted(res.skipped_buckets) == sorted(partial)

    # lineage completeness: every bucket committed exactly once per config
    lin = table.read_lineage(spark)
    per_bucket = (
        lin.filter(F.col("config_hash") == DEFAULT_CONFIG.config_hash())
        .groupBy("bucket").count().collect()
    )
    assert len(per_bucket) == N_BUCKETS
    assert all(r["count"] == 1 for r in per_bucket)

    # exactly-once output: no duplicate (conv_id, turn_idx), full coverage
    data = table.read(spark)
    n_in = spark.read.parquet(input_path).count()
    assert data.count() == n_in
    dups = data.groupBy("conv_id", "turn_idx").count().filter("count > 1").count()
    assert dups == 0

    # turns accounted in lineage == rows written
    turns_total = (
        lin.filter(F.col("config_hash") == DEFAULT_CONFIG.config_hash())
        .agg(F.sum("turns")).collect()[0][0]
    )
    assert turns_total == n_in


def test_rerun_is_noop(spark, input_path, tmp_path):
    out = str(tmp_path / "extracted2")
    run_extract(spark, input_path, out, n_buckets=N_BUCKETS, commit_groups=2, run_id="r1")
    res2 = run_extract(spark, input_path, out, n_buckets=N_BUCKETS, commit_groups=2, run_id="r2")
    assert res2.committed_buckets == []
    assert len(res2.skipped_buckets) == N_BUCKETS


def test_new_config_recomputes(spark, input_path, tmp_path):
    out = str(tmp_path / "extracted3")
    run_extract(spark, input_path, out, n_buckets=4, commit_groups=1, run_id="r1")
    # different config hash → nothing is skipped (new snapshot family)
    res = run_extract(spark, input_path, out, cfg=ALT_CONFIG, n_buckets=4, commit_groups=1, run_id="r2")
    assert res.skipped_buckets == []
    assert len(res.committed_buckets) == 4
