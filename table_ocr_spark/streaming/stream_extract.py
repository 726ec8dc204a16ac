"""Streaming extraction — the incremental-ingest surface.

The reference has no streaming (SURVEY.md §2.6: no watermarks, windows, or
state anywhere), and the batch job's checkpoint-resume already gives
incremental-batch semantics.  This module exists for the continuous-ingest
deployment shape: new transcript parquet files land in a directory, each
micro-batch runs the SAME extraction operator (pandas UDF works unchanged
under Structured Streaming because it is a stateless projection), and
progress is tracked by the streaming checkpoint instead of the lineage
manifest.

Determinism note: with Trigger.AvailableNow the stream drains everything
present and stops — equivalent to the batch job, which is how the tests
pin streaming output == batch output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from table_ocr_spark.config import DEFAULT_CONFIG, ExtractorConfig
from table_ocr_spark.operators.extract_job import with_extraction
from table_ocr_spark.sources.catalog import TRANSCRIPT_SCHEMA


def read_transcript_stream(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int = 16
) -> DataFrame:
    """File-source stream over a transcript directory (schema enforced —
    streaming reads never infer)."""
    return (
        spark.readStream.schema(TRANSCRIPT_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def start_extract_stream(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: ExtractorConfig = DEFAULT_CONFIG,
    available_now: bool = True,
):
    """extract(readStream) → writeStream parquet with checkpoint.

    Returns the StreamingQuery; callers .awaitTermination() it.  With
    ``available_now`` the query drains current input and stops (batch-
    equivalent semantics for tests and backfills).
    """
    src = read_transcript_stream(spark, input_dir)
    out = with_extraction(src.select("conv_id", "turn_idx", "text"), cfg)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_exact(
    spark: SparkSession,
    input_dir: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming exact dedup: content-fingerprint ``dropDuplicatesWithin
    Watermark`` over the transcript stream.

    The batch operator (operators/dedup.dedup_exact) keys a window on the
    fingerprint; streams cannot hold unbounded dedup state, so state is
    bounded by the event-time watermark — a duplicate arriving within the
    watermark of its first occurrence is dropped, older state is evicted
    (the standard at-scale trade: exactly-bounded memory for a bounded
    dedup horizon).  Returns the deduplicated stream; pair with any sink.
    """
    from table_ocr_spark.operators.textstats import fingerprint_col

    src = read_transcript_stream(spark, input_dir)
    return (
        src.withColumn("fingerprint", fingerprint_col("text"))
        # ts is nullable in TRANSCRIPT_SCHEMA, and a NULL event time
        # fails the watermark's late-row predicate — once a watermark is
        # established every null-ts row would be silently DISCARDED, not
        # just deduped.  Processing-time fallback keeps them flowing
        # (they dedup against the state horizon of their arrival time,
        # the standard treatment for clock-less records).
        .withColumn("ts", F.coalesce(F.col("ts"), F.current_timestamp()))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(["fingerprint"])
    )


def events_windowed_counts(
    spark: SparkSession,
    events_dir: str,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Late-data-tolerant windowed aggregation over the events stream —
    the standard watermark + window pattern (kept for the relational
    fringe; the extraction path itself is stateless)."""
    ev = (
        spark.readStream.schema(
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
        ).parquet(events_dir)
    )
    return (
        ev.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n", "sum_value")
    )
