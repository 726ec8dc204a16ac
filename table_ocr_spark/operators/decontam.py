"""Train/eval decontamination — drop training documents that share any
word n-gram window with an evaluation set.

The standard LLM-pipeline guard against benchmark leakage (the n-gram
overlap rule popularized by GPT-3's appendix and the Gopher/MassiveText
dedup sections): a training doc is CONTAMINATED iff at least one of its
n-token windows appears verbatim (case/whitespace-normalized) in any
eval doc.

Scale shape (100 TB train, MB-scale eval): the eval side collapses to a
distinct n-gram HASH set — small by construction (|eval tokens| × 1) —
and broadcasts; the train side explodes to (key, window-hash) rows that
are map-side semi-joined against the broadcast, so the only wide work is
one explode-projection over the training text.  Nothing about the train
side shuffles at all: contaminated keys are collected per partition by
the broadcast join, aggregated to a distinct key set (narrow), and
anti-joined back.  Window hashing reuses the dedup operators' 60-bit
engine-neutral md5 (``conv(substr(md5(x),1,15),16,10)``) so the DuckDB
oracle is exact, not statistical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from table_ocr_spark.operators.dedup import _hash60, word_shingles_col


def ngram_hashes(df: DataFrame, text: str = "text", key: str = "doc_id", n: int = 8) -> DataFrame:
    """(key, h) — one row per distinct word n-gram window per doc.
    Windows are lowercased, whitespace-split n-token joins (the dedup
    family's shingles); docs shorter than n tokens emit no rows."""
    return df.select(
        F.col(key).alias("k"), F.explode(word_shingles_col(text, n)).alias("_w")
    ).select("k", _hash60(F.col("_w")).alias("h"))


def contaminated_keys(
    train: DataFrame,
    eval_df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Distinct train keys sharing ≥1 n-gram window with the eval set.

    The eval hash set is deduplicated BEFORE the broadcast (distinct on a
    single long column) — the build side is bounded by eval token count,
    not eval row count × window count.  The eval frame only needs the
    ``text`` column (no key required)."""
    eval_hashes = (
        eval_df.select(F.explode(word_shingles_col(text, n)).alias("_w"))
        .select(_hash60(F.col("_w")).alias("h"))
        .distinct()
    )
    return (
        ngram_hashes(train, text, key, n)
        .join(F.broadcast(eval_hashes), "h", "left_semi")
        .select("k")
        .distinct()
    )


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text: str = "text",
    key: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Training rows with every contaminated doc removed (left_anti on the
    contaminated key set).  Keys whose doc has < n tokens can never be
    contaminated and always survive."""
    bad = contaminated_keys(train, eval_df, text, key, n).withColumnRenamed("k", key)
    return train.join(bad, key, "left_anti")
