"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction over sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 + the
training-data ops: dedup / similarity / text analysis).
``oracle_sql()`` — exact DuckDB-SQL equivalents.  Engine-neutral hashing
(md5-hex→int) makes even MinHash/SimHash oracles EXACT, not statistical.

Extraction operators are oracle-checked by deriving a transcript payload
from the ``documents`` view with the same string construction in both
engines, so DuckDB can compute the expected extraction output in pure SQL.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# shared payload constructions (Spark side) — each mirrored 1:1 in oracle SQL
# ---------------------------------------------------------------------------

_HTML_PRE = (
    '<html><head><script>var x=1;</script></head><body>'
    "<nav>NAV JUNK LINKS</nav>"
    '<div class="cookie-banner">ACCEPT COOKIES</div>'
    "<article><p>"
)
_HTML_POST = "</p></article><footer>FOOTER JUNK</footer></body></html>"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents, rebalanced: the driver's parquet is ONE row group
    (unsplittable → a single task would run every per-row expression
    single-threaded; measured 53 s for the minhash signature at sf0.1).
    One tiny shuffle buys full parallelism for everything downstream —
    the standard narrow-input rebalance before expensive projections."""
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return df.repartition(spark.sparkContext.defaultParallelism)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """embeddings, NOT rebalanced (unlike ``_docs``): measured at sf0.1
    and a ×4 replica, the similarity queries are job-latency-bound (a
    driver qv lookup plus a TakeOrdered main job) and the per-row dot
    products are cheap enough that adding a rebalance exchange cost more
    than the serial compute it parallelized (cosine_topk 0.31 → 0.51 s)."""
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _emb_query_vec(emb: DataFrame) -> list:
    """The vec_id == 0 query vector: a pushed-filter, single-stage
    first() over the caller's ``_emb`` frame — REUSING it avoids a
    second parquet analysis per similarity query (a measured ~0.1 s of
    driver time each; the round-start inline form had this shape too)."""
    row = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return [float(x) for x in row["embedding"]]


def _html_expr():
    return F.concat(F.lit(_HTML_PRE), F.col("text"), F.lit(_HTML_POST))


def _html_wrapped(df: DataFrame) -> DataFrame:
    return df.withColumn("payload", _html_expr())


def _md_expr():
    toks = F.split(F.trim(F.col("text")), r"\s+")
    w = lambda i: F.element_at(toks, i)  # noqa: E731
    return F.concat(
        F.lit("| c0 | c1 |\n| --- | --- |\n| "),
        w(1), F.lit(" | "), w(2), F.lit(" |\n| "),
        w(3), F.lit(" | "), w(4), F.lit(" |"),
    )


def _md_payload(df: DataFrame) -> DataFrame:
    """Markdown pipe table built from the doc's first four words:

        | c0 | c1 |
        | --- | --- |
        | w1 | w2 |
        | w3 | w4 |
    """
    return df.withColumn("payload", _md_expr())


_LAYOUT_HDR = "NAME        VALUE\n"  # col 0 fixed-width 12, ≥2-space gap


def _layout_payload(df: DataFrame) -> DataFrame:
    """Fixed-width two-column layout built from the doc's first four words:

        NAME        VALUE
        w1          w2
        w3          w4

    Column 0 is rpad(substr(w, 1, 10), 12) so the inter-column gap is
    always ≥ 2 spaces — the whitespace-column the heuristic mode's Hough-
    style voting (functions/layout.vote_column_intervals) must find.
    Exercises the reference's default CLI branch analog
    (ML_SINGLE_COLUMN_TABLE, main.py:124-181): token boxes, column voting,
    sentinel borders, min_columns, span slicing."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    w = lambda i: F.element_at(toks, i)  # noqa: E731
    c0 = lambda i: F.rpad(F.substring(w(i), 1, 10), 12, " ")  # noqa: E731
    return df.withColumn(
        "payload",
        F.concat(F.lit(_LAYOUT_HDR), c0(1), w(2), F.lit("\n"), c0(3), w(4)),
    )


def _as_transcripts(df: DataFrame) -> DataFrame:
    """documents → transcript shape expected by the extraction operator."""
    return df.select(
        F.col("doc_id"),
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("payload").alias("text"),
    )


def _extracted(spark, sf_dir, payload_builder, cfg=None) -> DataFrame:
    from table_ocr_spark.config import DEFAULT_CONFIG
    from table_ocr_spark.operators.extract_job import with_extraction

    t = _as_transcripts(payload_builder(_docs(spark, sf_dir)))
    ex = with_extraction(t.select("conv_id", "turn_idx", "text"), cfg or DEFAULT_CONFIG)
    return ex.withColumn("doc_id", F.col("conv_id").cast("long"))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_extract_html_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate strip (≈ adaptive-threshold content/背景 split +
    tag recognizer): nav/cookie/footer/script junk removed, article kept."""
    ex = _extracted(spark, sf_dir, _html_wrapped)
    return ex.select("doc_id", "clean_text")


def q_stream_extract_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-vs-batch equivalence, driver-visible: the html-payload
    transcripts are drained by a Trigger.AvailableNow Structured Streaming
    query (same extraction kernel, file source + streaming checkpoint)
    into a parquet sink, and the returned frame is the SINK read back.
    Oracle = the batch extract_html_clean oracle, so streaming output is
    held to exact batch equality — not just its own tests."""
    import shutil
    import tempfile

    from table_ocr_spark.streaming.stream_extract import start_extract_stream

    t = _as_transcripts(_html_wrapped(_docs(spark, sf_dir)))
    src = t.select(
        "conv_id",
        "turn_idx",
        F.lit("user").alias("role"),
        "text",
        F.lit(None).cast("string").alias("tool"),
        F.lit(None).cast("timestamp").alias("ts"),
    )
    base = tempfile.mkdtemp(prefix="stream_contract_")
    try:
        src.write.mode("overwrite").parquet(f"{base}/in")
        q = start_extract_stream(
            spark, f"{base}/in", f"{base}/out", f"{base}/ckpt", available_now=True
        )
        q.awaitTermination()
        out = spark.read.parquet(f"{base}/out")
        return (
            out.select(F.col("conv_id").cast("long").alias("doc_id"), "clean_text")
            # the sink dir is deleted before returning (the driver collects
            # AFTER this function), so materialize off the temp files here
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_extract_html_mode_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ex = _extracted(spark, sf_dir, _html_wrapped)
    return ex.select(
        "doc_id", "mode", F.round("boilerplate_ratio", 4).alias("bp_ratio")
    )


def q_extract_md_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markdown pipe-table grid extraction (Hough-analog separator voting:
    rule line dropped, edge pipes are borders, cells trimmed)."""
    ex = _extracted(spark, sf_dir, _md_payload)
    return ex.select(
        "doc_id",
        F.size("cells").cast("long").alias("n_rows"),
        F.aggregate(F.transform("cells", F.size), F.lit(0), lambda a, x: a + x)
        .cast("long")
        .alias("n_cells"),
        F.element_at(F.element_at("cells", 1), 1).alias("cell_00"),
        F.element_at(F.element_at("cells", 2), 2).alias("cell_11"),
        F.element_at(F.element_at("cells", 3), 2).alias("cell_21"),
    )


def q_extract_md_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cell span offsets (hOCR-bbox analog): spans of the first data row.
    Header '| c0 | c1 |' is chars 0..11; offsets are arithmetic in SQL."""
    ex = _extracted(spark, sf_dir, _md_payload)
    s = F.element_at("spans", 3)  # first data-row cell (row 1, col 0)
    return ex.select(
        "doc_id",
        s["row"].cast("long").alias("span_row"),
        s["col"].cast("long").alias("span_col"),
        s["start"].cast("long").alias("span_start"),
        s["end"].cast("long").alias("span_end"),
    )


def _md_punct_payload(df: DataFrame) -> DataFrame:
    """Markdown table whose data cells carry punctuation, so the per-cell
    recognizer confidence (hOCR x_wconf analog) is non-trivial:
    row 1 = [ w1!!, (w2) ]."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    w = lambda i: F.element_at(toks, i)  # noqa: E731
    return df.withColumn(
        "payload",
        F.concat(
            F.lit("| a! | b? |\n| --- | --- |\n| "),
            w(1), F.lit("!! | ("), w(2), F.lit(") |"),
        ),
    )


def q_extract_md_conf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell recognizer confidence: plain-char fraction of the
    recognized cell text, carried on every span."""
    ex = _extracted(spark, sf_dir, _md_punct_payload)
    s3 = F.element_at("spans", 3)  # row 1, col 0: 'w1!!'
    s4 = F.element_at("spans", 4)  # row 1, col 1: '(w2)'
    return ex.select(
        "doc_id",
        F.element_at(F.element_at("cells", 2), 1).alias("cell_10"),
        F.round(s3["conf"], 6).alias("conf_10"),
        F.round(s4["conf"], 6).alias("conf_11"),
    )


def q_extract_md_trimmed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """roi_trim config variant (reference roi_offset, detectors.py:918-919):
    each cell region is shrunk by 2 chars per side before recognition,
    UNLESS shrinking would invert the interval — the degenerate-cell
    relaxation (detectors.py:1009-1015) then falls back to the full
    region.  Long tokens lose their first/last char (seg padding is 1
    space, trim is 2); 2-char-or-shorter tokens and the 'c0' header take
    the relaxation branch — both paths land in one green query."""
    import dataclasses

    from table_ocr_spark.config import DEFAULT_CONFIG

    cfg = dataclasses.replace(DEFAULT_CONFIG, roi_trim=2)
    ex = _extracted(spark, sf_dir, _md_payload, cfg)
    s = F.element_at("spans", 3)  # row 1, col 0
    return ex.select(
        "doc_id",
        F.element_at(F.element_at("cells", 1), 1).alias("cell_00"),
        F.element_at(F.element_at("cells", 2), 1).alias("cell_10"),
        s["start"].cast("long").alias("span_start"),
        s["end"].cast("long").alias("span_end"),
    )


def q_spans_hocr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hOCR export view (reference's committed per-sample artifact,
    sample/proc/02.hocr: ocrx_word spans with bbox + x_wconf) over the
    markdown-table extraction — the oracle reconstructs the full page
    fragment, word offsets and confidences included, in SQL."""
    from table_ocr_spark.operators.export import spans_hocr

    ex = _extracted(spark, sf_dir, _md_payload)  # conv_id == doc_id::string
    return spans_hocr(ex).select(F.col("conv_id").cast("long").alias("doc_id"), "hocr")


def q_cells_html(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engine-native HTML-table export view over the markdown-table
    extraction (no reference golden — the reference's committed html is
    hOCR XHTML, which spans_hocr covers) — the oracle reconstructs the
    full ``<table>`` fragment, XML escaping included, in SQL."""
    from table_ocr_spark.operators.export import cells_html

    ex = _extracted(spark, sf_dir, _md_payload)  # conv_id == doc_id::string
    return cells_html(ex).select(F.col("conv_id").cast("long").alias("doc_id"), "html")


def q_clean_text_pdf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Searchable-PDF artifact (the reference's fourth committed per-sample
    format, sample/proc/*.pdf — tesseract's invisible-text-layer PDF) as a
    build→parse ROUND TRIP: the extracted text is rendered into a complete
    deterministic PDF byte stream, then the text layer is parsed back out
    of the bytes, so the oracle (plain extracted text + page count 1)
    fails if either direction corrupts a byte.  Both kernels are
    Arrow-batched pandas_udfs on the zero-shuffle extraction plan."""
    from table_ocr_spark.operators.pdf_export import (
        pdf_page_count,
        pdf_text_layer,
        with_text_pdf,
    )

    ex = with_text_pdf(_extracted(spark, sf_dir, _html_wrapped))
    return ex.select(
        "doc_id",
        pdf_page_count(F.col("pdf")).alias("n_pages"),
        pdf_text_layer(F.col("pdf")).alias("text"),
    )


def q_extract_layout_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's `x // cell_threshold` column binning
    (detectors.py:646-651) as a config-selected strategy: columns at
    offsets 0 and 12 with cell_threshold=10 land in bins 0 and 1 —
    the same grid the voted strategy finds on this payload."""
    from table_ocr_spark.config import ExtractorConfig

    cfg = ExtractorConfig(
        name="binned", mode="heuristic_layout", column_strategy="bin", cell_threshold=10
    )
    ex = _extracted(spark, sf_dir, _layout_payload, cfg=cfg)
    return ex.select(
        "doc_id",
        F.size("cells").cast("long").alias("n_rows"),
        F.element_at(F.element_at("cells", 2), 1).alias("cell_10"),
        F.element_at(F.element_at("cells", 3), 2).alias("cell_21"),
    )


def q_extract_layout_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic-layout grid extraction (contour analog, auto-classified):
    whitespace-column voting over a fixed-width payload."""
    ex = _extracted(spark, sf_dir, _layout_payload)
    return ex.select(
        "doc_id",
        "mode",
        F.size("cells").cast("long").alias("n_rows"),
        F.aggregate(F.transform("cells", F.size), F.lit(0), lambda a, x: a + x)
        .cast("long")
        .alias("n_cells"),
        F.element_at(F.element_at("cells", 1), 1).alias("cell_00"),
        F.element_at(F.element_at("cells", 2), 1).alias("cell_10"),
        F.element_at(F.element_at("cells", 3), 2).alias("cell_21"),
    )


def q_extract_layout_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic-mode cell spans (offsets into the normalized payload):
    row 1's two cells — col 0 at the line start, col 1 at the fixed
    column offset 12."""
    ex = _extracted(spark, sf_dir, _layout_payload)
    s3 = F.element_at("spans", 3)  # row 1, col 0
    s4 = F.element_at("spans", 4)  # row 1, col 1
    return ex.select(
        "doc_id",
        s3["row"].cast("long").alias("r1c0_row"),
        s3["start"].cast("long").alias("r1c0_start"),
        s3["end"].cast("long").alias("r1c0_end"),
        s4["col"].cast("long").alias("r1c1_col"),
        s4["start"].cast("long").alias("r1c1_start"),
        s4["end"].cast("long").alias("r1c1_end"),
    )


def q_extract_layout_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic-mode clean text (grid rows re-emitted single-spaced) +
    boilerplate ratio (padding removed / payload length)."""
    ex = _extracted(spark, sf_dir, _layout_payload)
    return ex.select(
        "doc_id", "clean_text", F.round("boilerplate_ratio", 4).alias("bp_ratio")
    )


def _otsu_payload(df: DataFrame) -> DataFrame:
    """Bimodal line-density payload: 4 word lines (density 1.0) interleaved
    with 4 decoration lines (density ~0.1) — Otsu's between-class cut lands
    between the modes, so exactly the decoration drops."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    w = lambda i: F.element_at(toks, i)  # noqa: E731
    junk = "#### $$$$"
    return df.withColumn(
        "payload",
        F.concat(
            w(1), F.lit(f"\n{junk}\n"), w(2), F.lit(f"\n{junk}\n"),
            w(3), F.lit(f"\n{junk}\n"), w(4), F.lit(f"\n{junk}"),
        ),
    )


def q_extract_otsu(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global Otsu density threshold (OtsuThresholder analog, behind
    use_otsu): decoration lines below the between-class cut vanish from
    the heuristic mode's clean text."""
    from table_ocr_spark.config import ExtractorConfig

    cfg = ExtractorConfig(name="otsu", mode="heuristic_layout", use_otsu=True)
    ex = _extracted(spark, sf_dir, _otsu_payload, cfg=cfg)
    return ex.select("doc_id", "clean_text")


def _adaptive_payload(df: DataFrame) -> DataFrame:
    """12 identical word lines around one zero-density decoration line —
    the local block_size window mean stays high, so only the decoration
    falls below (mean − density_constant)."""
    toks = F.split(F.trim(F.col("text")), r"\s+")
    line = F.concat(F.element_at(toks, 1), F.lit(" "), F.element_at(toks, 2))
    return df.withColumn(
        "payload",
        F.concat_ws("\n", *([line] * 6), F.lit("#####$$$$$"), *([line] * 6)),
    )


def q_extract_adaptive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local adaptive density threshold (GaussianAdaptiveThresholder
    analog): a line sparser than its block_size neighborhood − C is
    background; the surrounding prose survives untouched."""
    from table_ocr_spark.config import ExtractorConfig

    cfg = ExtractorConfig(name="adaptive", mode="heuristic_layout")
    ex = _extracted(spark, sf_dir, _adaptive_payload, cfg=cfg)
    return ex.select("doc_id", "clean_text")


def q_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both tokenizer families in one projection: whitespace token count
    and the BPE-ish regex pre-tokenizer count (letters / digits / other
    runs — the GPT-2 pre-tokenizer shape)."""
    from table_ocr_spark.operators.textstats import bpe_token_count_col, token_count_col

    return _docs(spark, sf_dir).select(
        "doc_id",
        token_count_col("text").alias("n_tokens"),
        bpe_token_count_col("text").alias("n_bpe_tokens"),
    )


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_ocr_spark.operators.textstats import lang_id_col

    return _docs(spark, sf_dir).select("doc_id", lang_id_col("text").alias("lang_id"))


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_ocr_spark.operators.textstats import quality_score_col

    return _docs(spark, sf_dir).select(
        "doc_id", F.round(quality_score_col("text"), 6).alias("quality")
    )


def q_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: duplicate-line fraction +
    top-bigram share, both pure array expressions (no shuffle)."""
    from table_ocr_spark.operators.textstats import (
        dup_line_frac_col,
        top_bigram_share_col,
    )

    return _docs(spark, sf_dir).select(
        "doc_id",
        dup_line_frac_col("text").alias("dup_line_frac"),
        top_bigram_share_col("text").alias("top_bigram_share"),
    )


def q_decontaminate_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval decontamination: eval = 12-token snippets of every
    97th doc; training docs sharing ANY 8-token window with a snippet are
    dropped.  Eval n-gram hashes broadcast; train side never shuffles."""
    from table_ocr_spark.operators.decontam import decontaminate

    d = _docs(spark, sf_dir)
    snippet = F.array_join(
        F.slice(F.split(F.trim(F.col("text")), r"\s+"), 1, 12), " "
    )
    eval_df = d.filter(F.col("doc_id") % 97 == 0).select(
        "doc_id", snippet.alias("text")
    )
    return decontaminate(d, eval_df, n=8).select("doc_id")


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget sequence packing: hash-bucket, then pack docs into
    2048-token training sequences within each bucket (one shuffle on the
    bucket; running-sum window per bucket — never a global order)."""
    from table_ocr_spark.operators.textstats import pack_sequences, token_count_col

    d = _docs(spark, sf_dir).select(
        "doc_id", token_count_col("text").alias("n_tokens")
    )
    return pack_sequences(d, budget=2048, n_buckets=16).select(
        "doc_id", "n_tokens", "pack_bucket", "seq_id", "seq_offset"
    )


def q_rebalance_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixing stage: deterministic subsample of documents so language
    shares hit fixed targets — one narrow count, a few-row broadcast,
    pushed-down hash filter; full rows never shuffle."""
    from table_ocr_spark.operators.mixture import rebalance_mixture
    from table_ocr_spark.operators.textstats import lang_id_col

    d = _docs(spark, sf_dir).select("doc_id", lang_id_col("text").alias("lang"))
    targets = {"en": 0.6, "de": 0.2, "fr": 0.1, "es": 0.1}
    return rebalance_mixture(d, targets, group="lang", key="doc_id").select(
        "doc_id", "lang"
    )


def q_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style quality signal: mean stupid-backoff bigram ln-prob per
    doc under the corpus's own exact-count model — two word-count-shaped
    aggregations + token-key hash joins; model prunable via min_count at
    scale (operators/lm.py)."""
    from table_ocr_spark.operators.lm import ngram_lm_score

    return ngram_lm_score(_docs(spark, sf_dir), text="text", key="doc_id")


def q_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-100 (explode → map-side-combined count →
    TakeOrdered) — the wordcount primitive of tokenizer training."""
    from table_ocr_spark.operators.textstats import vocabulary_topk

    return vocabulary_topk(_docs(spark, sf_dir), "text", k=100).select(
        "token", F.col("freq").cast("long").alias("freq")
    )


def q_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrub over payloads with injected email/URL/long-id tokens —
    the pre-training redaction pass, pure JVM regexp chain."""
    from table_ocr_spark.operators.textstats import redact_pii_col

    d = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    w = lambda i: F.element_at(toks, i)  # noqa: E731
    payload = F.concat(
        w(1),
        F.lit(" reach bob.smith+a@mail-host.example.org or https://ex.io/p/"),
        w(2),
        F.lit("?id=9 ref 123456789 tail "),
        w(3),
    )
    return d.select("doc_id", redact_pii_col(payload).alias("redacted"))


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both fingerprint families in one projection: the normalized-text
    content hash (dedup key) and the rolling word-hash (Karp-Rabin-style
    document fingerprint)."""
    from table_ocr_spark.operators.textstats import (
        fingerprint_col,
        rolling_fingerprint_col,
    )

    return _docs(spark, sf_dir).select(
        "doc_id",
        fingerprint_col("text").alias("fingerprint"),
        rolling_fingerprint_col("text").alias("roll_fp"),
    )


def _with_dups(df: DataFrame) -> DataFrame:
    """Inject deterministic duplicates: every doc_id % 10 == 0 gets a copy
    at doc_id + 1000000 (the corpus itself has no exact dups).

    Single-pass form: one explode generates the duplicate rows inline
    instead of a filter-branch union — the union's two branches each
    carried the scan+rebalance subtree (ReuseExchange shares the exchange
    but both branches still read it and re-run the filter), measured
    ~25% slower across the dedup bench queries at the ×4 replica.  Rows
    and schema are identical to the union form (same keys, same types;
    row order differs, which no consumer observes — every downstream
    query aggregates or is compared order-insensitively)."""
    cols = list(df.columns)
    base = F.struct(*[F.col(c) for c in cols])
    dup = F.struct(
        *[
            (F.col("doc_id") + 1000000).alias("doc_id") if c == "doc_id" else F.col(c)
            for c in cols
        ]
    )
    rows = F.when(
        F.col("doc_id") % 10 == 0, F.array(base, dup)
    ).otherwise(F.array(base))
    return df.select(F.explode(rows).alias("_r")).select("_r.*")


def q_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_ocr_spark.operators.dedup import exact_duplicates

    return exact_duplicates(_with_dups(_docs(spark, sf_dir)), "text", "doc_id").select(
        "fingerprint", F.col("n_dups").cast("long").alias("n_dups"), "min_key"
    )


def q_minhash_signature(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_ocr_spark.operators.dedup import minhash_signature_col

    sig = minhash_signature_col("text", k=8, shingle_n=2)
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(",", F.transform(sig, lambda x: x.cast("string"))).alias("sig"),
    )


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_ocr_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _with_dups(_docs(spark, sf_dir)), "text", "doc_id", k=8, bands=4, shingle_n=2
    )


def q_minhash_lsh_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-form LSH candidates (the 100-TB near-dedup shape): each
    (band, bucket) emits (min-member, member) edges — O(n) per bucket vs
    the self-join's O(n²); measured 33.5M → <1M pairs on the sf0.1
    transcript corpus (operators/dedup.py minhash_lsh_star_pairs)."""
    from table_ocr_spark.operators.dedup import minhash_lsh_star_pairs

    return minhash_lsh_star_pairs(
        _with_dups(_docs(spark, sf_dir)), "text", "doc_id", k=8, bands=4, shingle_n=2
    )


def q_minhash_lsh_pairs_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental LSH: docs with doc_id % 10 == 0 play the NEW increment,
    the rest the already-curated history whose persisted band INDEX
    (``lsh_banded`` — key + band + bucket, a few bytes per doc per band)
    stands in for its text; candidates come from one (band, bucket)
    equi-join of increment bands against the index — the jobs/curate.py
    --incremental --near-dedup pattern as a gateable operator query."""
    from table_ocr_spark.operators.dedup import lsh_banded, lsh_pairs_against

    d = _docs(spark, sf_dir)
    return lsh_pairs_against(
        d.filter(F.col("doc_id") % 10 == 0),
        lsh_banded(d.filter(F.col("doc_id") % 10 != 0)),
        "text",
        "doc_id",
    )


def q_minhash_lsh_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-bucket-capped LSH: 60 injected clones of one boilerplate page
    form a bucket of 60 in every band (the pathological near-identical-
    boilerplate shape); cap 50 drops those buckets — zero clone pairs,
    O(n²) blowup bounded — while ordinary dup pairs all survive."""
    from table_ocr_spark.operators.dedup import minhash_lsh_pairs

    d = _with_dups(_docs(spark, sf_dir)).select("doc_id", "text")
    clones = spark.range(60).select(
        (F.col("id") + 2000000).alias("doc_id"),
        F.lit("the same boilerplate page appears everywhere").alias("text"),
    )
    return minhash_lsh_pairs(d.unionByName(clones), max_bucket_size=50)


def q_near_dup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clustering: connected components (iterative min-label
    propagation) over the LSH candidate pairs → (member, component-min).
    The oracle computes the same components with a recursive CTE."""
    from table_ocr_spark.operators.dedup import minhash_lsh_pairs, near_dup_components

    pairs = minhash_lsh_pairs(_with_dups(_docs(spark, sf_dir)), "text", "doc_id")
    return near_dup_components(pairs)


def q_near_dup_verified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup verify stage: exact word-set Jaccard on the LSH candidate
    pairs only (two narrow key+text hash joins — never all-pairs)."""
    from table_ocr_spark.operators.dedup import minhash_lsh_pairs, verify_pairs_jaccard

    d = _with_dups(_docs(spark, sf_dir)).select("doc_id", "text")
    return verify_pairs_jaccard(minhash_lsh_pairs(d), d, threshold=0.5)


def q_dedup_near_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ACTION end-to-end: LSH pairs → connected components →
    keep one representative (component min) per near-dup family; docs in
    no pair keep themselves."""
    from table_ocr_spark.operators.dedup import (
        dedup_near_representatives,
        minhash_lsh_pairs,
    )

    d = _with_dups(_docs(spark, sf_dir)).select("doc_id", "text")
    pairs = minhash_lsh_pairs(d, "text", "doc_id")
    kept = dedup_near_representatives(d, pairs, key="doc_id")
    return kept.select("doc_id")


def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_ocr_spark.operators.dedup import simhash_col

    return _docs(spark, sf_dir).select("doc_id", simhash_col("text", bits=16).alias("simhash"))


def q_simhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup join: candidates share a 4-bit band
    (pigeonhole: finds every pair up to Hamming 3), verified by exact
    Hamming distance — injected dups surface at hamming 0."""
    from table_ocr_spark.operators.dedup import simhash_near_dup_pairs

    pairs = simhash_near_dup_pairs(
        _with_dups(_docs(spark, sf_dir)).select("doc_id", "text"), max_hamming=1
    )
    return pairs.select("key_a", "key_b", F.col("hamming").cast("long").alias("hamming"))


def q_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-set Jaccard between consecutive doc_ids (deterministic pair
    generator; LSH generates candidates at scale)."""
    from table_ocr_spark.operators.dedup import jaccard_words_col

    d = _docs(spark, sf_dir)
    a = d.select(F.col("doc_id").alias("key_a"), F.col("text").alias("ta"))
    b = d.select((F.col("doc_id") - 1).alias("key_a"), F.col("doc_id").alias("key_b"), F.col("text").alias("tb"))
    return a.join(b, "key_a").select(
        "key_a", "key_b", F.round(jaccard_words_col(F.col("ta"), F.col("tb")), 6).alias("jaccard")
    )


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from table_ocr_spark.operators.similarity import embedding_near_dup_pairs

    # threshold 0.0 keeps ~half the pairs on this corpus — a non-trivial
    # equality check (0.95 would pass vacuously with zero rows)
    pairs = embedding_near_dup_pairs(_emb(spark, sf_dir), threshold=-1.0)
    return pairs.select(
        "key_a", "key_b", F.round("cos_sim", 4).alias("cos_sim")
    ).filter(F.col("cos_sim") >= 0.0)


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k (the exact ANN baseline): deterministic
    total order (-cos, key) so results are stable across partitionings."""
    from table_ocr_spark.operators.similarity import cosine_topk

    e = _emb(spark, sf_dir)
    qv = _emb_query_vec(e)
    top = cosine_topk(e, qv, k=20)
    return top.select("vec_id", F.round("cos_sim", 4).alias("cos_sim"))


def q_cosine_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sign-LSH-pruned top-k (the ANN scale path): only rows whose 8-plane
    sign bucket is within Hamming 1 of the query's bucket are exactly
    re-ranked. The oracle recomputes the identical buckets in SQL."""
    from table_ocr_spark.operators.similarity import cosine_topk_lsh

    e = _emb(spark, sf_dir)
    qv = _emb_query_vec(e)
    top = cosine_topk_lsh(e, qv, k=20, planes=8, max_hamming=1)
    return top.select("vec_id", F.round("cos_sim", 4).alias("cos_sim"))


def q_media_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal contract: REAL stdlib PNG pixel decode (zlib inflate +
    unfilter) through the mapInPandas feature operator, over literal PNG
    blobs (gray / RGB / RGBA).  The DuckDB oracle addresses the same pixel
    bytes with hex arithmetic — the fixtures are written as zlib STORED
    blocks + filter 0, so every pixel byte has a fixed offset (asserted in
    png_contract_fixtures) — and checks header fields AND per-channel
    mean-color features exactly."""
    from table_ocr_spark.multimodal.media import (
        MEDIA_SCHEMA,
        extract_media_features,
        png_contract_fixtures,
    )

    rows = [(mid, kind, p, "image/png") for mid, kind, p, _w, _h, _c in png_contract_fixtures()]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_media_features(df, feature_dim=4)
    return feats.select(
        "media_id",
        "width",
        "height",
        "n_frames",
        *[
            F.round(F.element_at("feature", c + 1).cast("double"), 4).alias(f"mean_c{c}")
            for c in range(4)
        ],
    )


def q_media_wav_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal audio contract: REAL stdlib 16-bit-PCM WAV sample decode
    through the mapInPandas feature operator over literal canonical WAVs
    (mono + stereo).  The DuckDB oracle reads the same samples with hex
    arithmetic at their fixed data-chunk offsets (byte 44 + 2i, asserted
    in wav_contract_fixtures) and checks frame counts AND the
    mean-absolute-amplitude feature exactly."""
    from table_ocr_spark.multimodal.media import (
        MEDIA_SCHEMA,
        extract_media_features,
        wav_contract_fixtures,
    )

    rows = [(mid, kind, p, "audio/wav") for mid, kind, p, _n in wav_contract_fixtures()]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_media_features(df, feature_dim=2)
    return feats.select(
        "media_id",
        "n_frames",
        F.round(F.element_at("feature", 1).cast("double"), 4).alias("mean_amp"),
    )


def q_media_mp4_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal video contract: REAL ISO-BMFF (MP4) parse + sample
    decode through the mapInPandas operator over literal spec-shaped
    MP4s — box walk → moov/trak/tkhd (16.16 fixed-point geometry) +
    stbl/stsz (frame count), then the 1-byte-luma ``mdat`` track decoded
    into a mean-luma feature (the stdlib-real notch; CODEC frame decode
    would need absent libraries and falls back per-row to the labeled
    stub).  The oracle reads the same fields AND averages the same mdat
    sample bytes with byte arithmetic at offsets asserted in
    mp4_contract_fixtures."""
    from table_ocr_spark.multimodal.media import (
        MEDIA_SCHEMA,
        extract_media_features,
        mp4_contract_fixtures,
    )

    rows = [(mid, kind, p, "video/mp4") for mid, kind, p, _w, _h, _n in mp4_contract_fixtures()]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    feats = extract_media_features(df, feature_dim=2)
    return feats.select(
        "media_id",
        "width",
        "height",
        "n_frames",
        F.round(F.element_at("feature", 1).cast("double"), 4).alias("mean_luma"),
    )


def q_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN with a LITERAL deterministic codebook: nearest-centroid
    assignment (rounded-dot argmax, ties to lower list), n_probe nearest
    lists pruned, exact cosine rerank inside the probed lists only.  The
    md5-derived unit centroids are inlined into the oracle SQL, so
    assignment + probe + rerank are all exactly checked (the KMeans-fit
    path, ivf_index, is recall-tested against brute force in pytest).
    Analog of the reference's index-then-search two-stage split
    (detect-then-OCR, detectors.py:713-750 → :1024-1120)."""
    from table_ocr_spark.operators.similarity import (
        deterministic_centroids,
        ivf_assign,
        ivf_topk,
    )

    e = _emb(spark, sf_dir)
    qv = _emb_query_vec(e)
    cents = deterministic_centroids(dim=64, n_lists=8)
    assigned = ivf_assign(e, cents)
    top = ivf_topk(assigned, cents, qv, k=20, n_probe=3)
    return top.select(
        "vec_id",
        F.col("_list").alias("ivf_list"),
        F.round("cos_sim", 4).alias("cos_sim"),
    )


def q_ivf_topk_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search via a PERSISTED assignment index (VERDICT r5 #7):
    history (vec_id % 10 != 0) participates as its pre-computed
    (key, _list) index rows, only the increment (vec_id % 10 == 0) is
    assigned this run, and search filters the combined index to the
    probed lists then fetches member vectors by key — history is never
    re-assigned (plan-asserted with a parquet-persisted index in
    tests/test_ivf_and_ordering.py).  Values are identical to assigning
    everything fresh, which is what the oracle computes; `is_new` marks
    the increment's rows in the result."""
    from table_ocr_spark.operators.similarity import (
        deterministic_centroids,
        ivf_index_rows,
        ivf_topk_indexed,
    )

    e = _emb(spark, sf_dir)
    qv = _emb_query_vec(e)
    cents = deterministic_centroids(dim=64, n_lists=8)
    history = e.filter(F.col("vec_id") % 10 != 0)
    increment = e.filter(F.col("vec_id") % 10 == 0)
    index = ivf_index_rows(history, cents).unionByName(
        ivf_index_rows(increment, cents)
    )
    top = ivf_topk_indexed(index, e, cents, qv, k=20, n_probe=3)
    return top.select(
        "vec_id",
        F.col("_list").alias("ivf_list"),
        F.round("cos_sim", 4).alias("cos_sim"),
        (F.col("vec_id") % 10 == 0).alias("is_new"),
    )


def q_embedding_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-world near-dup pairs: banded sign-LSH candidates (2 bands × 8
    deterministic hyperplanes) + exact cosine verify — no O(n²) cross
    join. The oracle recomputes the identical md5-derived hyperplanes."""
    from table_ocr_spark.operators.similarity import embedding_near_dup_lsh

    return embedding_near_dup_lsh(_emb(spark, sf_dir), dim=64, threshold=0.2)


def q_embedding_near_dup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental embedding near-dup: vec_id % 10 == 0 plays the NEW
    increment, the rest the history whose persisted sign-LSH index
    (`embedding_lsh_index`) stands in for its vectors; candidates from
    one (band, bucket) equi-join, exact-cosine verified against the
    history table fetched candidates-pruned
    (operators/similarity.py embedding_pairs_against)."""
    from table_ocr_spark.operators.similarity import (
        embedding_lsh_index,
        embedding_pairs_against,
    )

    d = _emb(spark, sf_dir)
    old = d.filter(F.col("vec_id") % 10 != 0)
    return embedding_pairs_against(
        d.filter(F.col("vec_id") % 10 == 0),
        embedding_lsh_index(old, dim=64),
        old,
        dim=64,
        threshold=0.2,
    )


def q_cells_flat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flattened cell view (explode rows → posexplode cells) over the
    markdown-table payload — one row per extracted table cell."""
    from table_ocr_spark.operators.conv_scope import cells_flat

    ex = _extracted(spark, sf_dir, _md_payload)
    flat = cells_flat(ex)
    return flat.select(
        F.col("conv_id").cast("long").alias("doc_id"), "row_idx", "col_idx", "cell"
    )


def _banner_conv_turns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-turn convs built from each doc's words, with a constant banner
    line injected into every turn — shared input for the batch, linehash,
    and stateful-streaming boilerplate-strip contract queries."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    return d.select(
        F.col("doc_id"),
        F.col("doc_id").cast("string").alias("conv_id"),
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("turn_idx"),
        toks.alias("_toks"),
    ).select(
        "doc_id",
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.concat(
            F.lit("SENT FROM MY AGENT\n"),
            F.element_at("_toks", F.col("turn_idx") + 1),
            F.lit("-"),
            F.col("turn_idx").cast("string"),
        ).alias("text"),
    )


def q_conv_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONVERSATION-level exact dedup: whole convs re-assembled in turn
    order (`conv_scope.conv_text`) and fingerprinted — catches re-uploads
    of entire conversations that turn-level dedup cannot (identical
    convs survive turn dedup via different (conv, turn) reps).  Clones of
    every doc_id % 10 == 0 conv are injected under `<conv>-dup`; each
    group must collapse to (fingerprint, 2, original)."""
    from table_ocr_spark.operators.conv_scope import conv_text
    from table_ocr_spark.operators.dedup import exact_duplicates

    turns = _banner_conv_turns(spark, sf_dir)
    clones = turns.filter(F.col("doc_id") % 10 == 0).withColumn(
        "conv_id", F.concat(F.col("conv_id"), F.lit("-dup"))
    )
    both = turns.unionByName(clones).select("conv_id", "turn_idx", "text")
    return exact_duplicates(conv_text(both), "text", "conv_id")


def q_conv_near_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-level NEAR-dedup (VERDICT r5 #4): whole convs
    re-assembled in turn order, with lightly-EDITED re-uploads injected
    (every doc_id % 10 == 0 conv cloned under `<conv>-edit`, one word
    appended to its LAST turn) — the common real-world case that
    `conv_exact_dedup` (fingerprints differ) and turn-level near-dedup
    (drops turns, not the conversation) both miss.  MinHash-LSH candidate
    pairs over the conv texts, exact word-set Jaccard verify ≥ 0.6:
    each edited clone must pair with its original; unrelated convs share
    only the banner words (Jaccard ≈ 0.15) and must not."""
    from table_ocr_spark.operators.conv_scope import conv_text
    from table_ocr_spark.operators.dedup import minhash_lsh_pairs, verify_pairs_jaccard

    turns = _banner_conv_turns(spark, sf_dir)
    clones = (
        turns.filter(F.col("doc_id") % 10 == 0)
        .withColumn("conv_id", F.concat(F.col("conv_id"), F.lit("-edit")))
        .withColumn(
            "text",
            F.when(
                F.col("turn_idx") == 4, F.concat(F.col("text"), F.lit(" edited"))
            ).otherwise(F.col("text")),
        )
    )
    both = turns.unionByName(clones).select("conv_id", "turn_idx", "text")
    conv = conv_text(both)
    pairs = minhash_lsh_pairs(conv, "text", "conv_id")
    return verify_pairs_jaccard(pairs, conv, text="text", key="conv_id", threshold=0.6)


def q_corpus_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CORPUS-level boilerplate removal (the C4/Dolma rule; NEW r6): a
    platform footer injected into EVERY doc — once per doc, so the
    conversation-scoped strip can never see it — must vanish from all of
    them, while each doc's own two-word line survives unless that exact
    line happens to occur in ≥ 3 docs (the oracle computes the identical
    document-frequency cut, so shared word lines are exercised too)."""
    from table_ocr_spark.operators.conv_scope import strip_corpus_boilerplate

    d = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    docs = d.select(
        "doc_id",
        F.concat(
            F.lit("SENT FROM MY PLATFORM\n"),
            F.element_at(toks, 1),
            F.lit(" "),
            F.element_at(toks, 2),
        ).alias("text"),
    )
    out = strip_corpus_boilerplate(docs, key_cols=("doc_id",), min_df=3)
    return out.select("doc_id", "text_stripped", "n_banned_lines")


def q_conv_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversation-scoped boilerplate removal (applyInPandas whole-conv
    stage): the banner repeated in 5/5 turns must vanish.

    Oracle: each turn's stripped text == its own word (the banner is
    repeated in 5/5 turns → banned); expressible in SQL."""
    from table_ocr_spark.operators.conv_scope import strip_conv_boilerplate

    turns = _banner_conv_turns(spark, sf_dir)
    # explicit gather: this query exercises the applyInPandas whole-conv
    # path (the module default is the skew-safe linehash plan)
    out = strip_conv_boilerplate(turns, ratio=0.6, min_turns=3, method="gather")
    return out.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.col("turn_idx").cast("long").alias("turn_idx"),
        "text_stripped",
    )


def q_conv_boilerplate_strip_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STATEFUL streaming variant (applyInPandasWithState): the same
    banner convs drained through the per-conversation running-state strip
    in one AvailableNow pass — single-batch prefix == whole conversation,
    so the output is held to the SAME SQL oracle as the batch operator."""
    import shutil
    import tempfile

    from table_ocr_spark.streaming.stateful import stream_conv_boilerplate

    turns = _banner_conv_turns(spark, sf_dir).select("conv_id", "turn_idx", "text")
    base = tempfile.mkdtemp(prefix="stateful_contract_")
    try:
        turns.write.mode("overwrite").parquet(f"{base}/in")
        stream = (
            spark.readStream.schema("conv_id string, turn_idx int, text string")
            .option("maxFilesPerTrigger", 1000)
            .parquet(f"{base}/in")
        )
        out = stream_conv_boilerplate(stream, ratio=0.6, min_turns=3)
        q = (
            out.writeStream.format("parquet")
            .option("path", f"{base}/out")
            .option("checkpointLocation", f"{base}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        res = spark.read.parquet(f"{base}/out")
        return res.select(
            F.col("conv_id").cast("long").alias("doc_id"),
            F.col("turn_idx").cast("long").alias("turn_idx"),
            "text_stripped",
        ).localCheckpoint(eager=True)
    finally:
        shutil.rmtree(base, ignore_errors=True)


def q_conv_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-conversation extraction rollup (the lineage/metrics-style
    aggregate): each doc becomes a 2-turn conversation (html-wrapped +
    markdown-table payload) with fully SQL-predictable metrics."""
    from table_ocr_spark.operators.conv_scope import conv_metrics
    from table_ocr_spark.operators.extract_job import with_extraction

    d = _docs(spark, sf_dir)
    h = _html_wrapped(d).select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(0).cast("int").alias("turn_idx"),
        F.col("payload").alias("text"),
    )
    m = _md_payload(d).select(
        F.col("doc_id").cast("string").alias("conv_id"),
        F.lit(1).cast("int").alias("turn_idx"),
        F.col("payload").alias("text"),
    )
    cm = conv_metrics(with_extraction(h.unionByName(m)))
    return cm.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.col("n_turns").cast("long").alias("n_turns"),
        F.round("bp_avg", 6).alias("bp_avg"),
        "cell_count",
        "max_clean_len",
    )


def q_conv_boilerplate_strip_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe line-hash variant of conv-scoped boilerplate removal:
    only line hashes shuffle, text strips map-side. Same oracle as the
    gather method — the two plans are semantically identical."""
    from table_ocr_spark.operators.conv_scope import strip_conv_boilerplate

    d = _docs(spark, sf_dir)
    toks = F.split(F.trim(F.col("text")), r"\s+")
    turns = d.select(
        F.col("doc_id"),
        F.col("doc_id").cast("string").alias("conv_id"),
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("turn_idx"),
        toks.alias("_toks"),
    ).select(
        "doc_id",
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        F.concat(
            F.lit("SENT FROM MY AGENT\n"),
            F.element_at("_toks", F.col("turn_idx") + 1),
            F.lit("-"),
            F.col("turn_idx").cast("string"),
        ).alias("text"),
    )
    out = strip_conv_boilerplate(turns, ratio=0.6, min_turns=3, method="linehash")
    return out.select(
        F.col("conv_id").cast("long").alias("doc_id"),
        F.col("turn_idx").cast("long").alias("turn_idx"),
        "text_stripped",
    )


def q_events_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bucketed aggregation (the batch shape of the streaming
    watermark+window pattern): events per hour × type."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.groupBy(
            # epoch seconds: timestamp dtypes (ns vs µs) hash-compare unsafely
            F.date_trunc("hour", F.col("ts"))
            .cast("timestamp_ltz")
            .cast("long")
            .alias("w_start"),
            F.col("event_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("sum_value"))
    )


def q_top_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group top-k (window rank, deterministic tie-break)."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("user_id", "event_id", F.col("rn").cast("long").alias("rn"))
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization (window + lag): new session when gap > 30 min."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet ts is TIMESTAMP_NTZ; floor-seconds on both engines
    secs = F.col("ts").cast("timestamp_ltz").cast("long")
    gap = secs - F.lag(secs).over(w)
    new_sess = F.when(gap.isNull() | (gap > 1800), 1).otherwise(0)
    sess = F.sum(new_sess).over(
        Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    )
    return ev.select(
        "event_id", "user_id", sess.cast("long").alias("session_id")
    )


def q_events_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (as-of) join: every non-click event picks up the
    value of the user's latest click at-or-before its timestamp (LEFT
    semantics — users with no prior click keep NULL).  Implemented as the
    union + running-window plan (ONE key shuffle, no range-join blowup —
    operators/asof.py); the oracle is DuckDB's native ASOF LEFT JOIN, so
    the tie (<=) and null semantics are checked against an independent
    engine's implementation of the same operator."""
    from table_ocr_spark.operators.asof import asof_join

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    marks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("mark_value"))
    )
    left = ev.filter(F.col("event_type") != "click").select("event_id", "user_id", "ts")
    out = asof_join(left, marks, key="user_id", right_value="mark_value")
    return out.select(
        "event_id",
        "user_id",
        F.round("asof_mark_value", 6).alias("last_click_value"),
    )


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by CONTENT fingerprint (hash
    buckets, not RNG — reproducible, repartition-stable, and dup-leak-
    resistant: exact duplicates co-assign by construction).  Per-row
    assignment is exact-oracled; the summary column double-checks the
    bucket arithmetic end-to-end."""
    from table_ocr_spark.operators.textstats import dataset_split_col, fingerprint_col

    return _docs(spark, sf_dir).select(
        "doc_id", dataset_split_col(fingerprint_col("text")).alias("split")
    )


def q_global_shuffle_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training-order index (operators/ordering.py):
    seq = rank in md5(doc_id ++ salt) order, assigned by the two-level
    bucket-offset pattern — per-bucket row_number over ~4096 value-derived
    buckets plus broadcast cumulative offsets — NOT the single-partition
    global window Spark would plan for row_number() OVER (ORDER BY ...).
    The oracle IS that single-partition form (fine at oracle scale),
    pinning the distributed plan to exact global-rank semantics."""
    from table_ocr_spark.operators.ordering import global_shuffle_index

    out = global_shuffle_index(_docs(spark, sf_dir), ["doc_id"], salt="v1")
    return out.select("doc_id", "seq")


def q_docs_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota (operators/sampling.py cap_per_key): keep the 5
    longest docs per source, n_chars DESC with doc_id tie-break.  The
    two-phase salted form runs here (prefilter + exact window) so the
    oracle pins the pigeonhole argument, not just the easy one-window
    plan; a hot source never exceeds n x 32 rows in any one window
    partition."""
    from table_ocr_spark.operators.sampling import cap_per_key

    out = cap_per_key(
        _docs(spark, sf_dir),
        "source",
        [F.col("n_chars").desc()],
        id_col="doc_id",
        n=5,
        prefilter_buckets=32,
    )
    return out.select("doc_id", "source", "n_chars")


def q_docs_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~25% corpus sample by doc_id hash (RNG-free,
    repartition-stable, salt-rotatable) — a pure JVM projection filter,
    no shuffle.  Exact-oracled: DuckDB computes the identical md5-bucket
    arithmetic, so the kept SET matches row for row, not just the rate."""
    from table_ocr_spark.operators.sampling import hash_sample

    return hash_sample(_docs(spark, sf_dir), "doc_id", 0.25, salt="s1").select(
        "doc_id", "lang"
    )


def q_events_distinct_users_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible check of the HLL sketch path (approx_count_distinct —
    the distinct-count plan at 10^12 rows, mergeable map-side): the sketch
    runs beside the exact distinct count in one aggregate and the query
    returns a boolean pinning it within 5% (≥1) of exact; the oracle
    expects TRUE — same hard-row pattern as the percentile sketch check."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    agg = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact"),
        F.approx_count_distinct("user_id", rsd=0.02).alias("_n_approx"),
    )
    tol = F.greatest(F.lit(1.0), F.col("n_exact") * 0.05)
    ok = F.abs(F.col("_n_approx") - F.col("n_exact")) <= tol
    return agg.select(
        "event_type",
        F.col("n_exact").cast("long").alias("n_distinct_users"),
        ok.alias("sketch_within_tol"),
    )


def q_extract_mode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end extraction + aggregation: per-mode turn counts + average
    boilerplate ratio over a mixed corpus (html-wrapped evens, md-table
    odds) — the conv_metrics/lineage-style rollup with an exact oracle."""
    from table_ocr_spark.operators.extract_job import with_extraction

    # one scan, one UDF pass: the payload kind is selected per row with a
    # when() instead of a filter-branch union — identical rows (evens get
    # the html wrap, odds the md table), no second exchange read, no
    # second task wave (the union form re-read the shared rebalance
    # exchange and doubled the UDF stage's partition count)
    d = _docs(spark, sf_dir)
    mixed = d.withColumn(
        "payload",
        F.when(F.col("doc_id") % 2 == 0, _html_expr()).otherwise(_md_expr()),
    )
    ex = with_extraction(_as_transcripts(mixed).select("conv_id", "turn_idx", "text"))
    return ex.groupBy("mode").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.sum(F.size("cells")).cast("long").alias("total_rows"),
    )


def q_q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: tight scan-side predicate band + single aggregate
    (the filter-pushdown showcase)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("2000-01-01"))
            & (F.col("l_shipdate") < F.lit("2001-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_rows"),
        )
    )


def q_order_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS semi-join + group count."""
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select("l_orderkey").distinct()
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-way join: customer segment revenue (broadcast the dim side)."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_mktsegment")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select("o_orderkey", "o_custkey")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = li.groupBy("l_orderkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev")
    )
    return (
        o.join(rev, o.o_orderkey == rev.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"), F.count(F.lit(1)).alias("n_orders"))
    )


def q_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: 3-way join with predicates on both fact and dim
    sides, group-by revenue, deterministic top-k."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") > F.lit("1998-01-01")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"))
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("timestamp_ltz").cast("long").alias("o_date"),
            "o_orderpriority",
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


def q_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered semi-join of an aggregate subquery
    against the fact, then join back to the dims."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey", "c_name")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300)
    )
    return (
        o.join(big, o.o_orderkey == big.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp_ltz").cast("long").alias("o_date"),
            F.round("o_totalprice", 2).alias("o_totalprice"),
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(100)
    )


def q_q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: fact joined through a broadcast dim chain
    (supplier → nation → region) with a region predicate that prunes the
    chain before it ever touches the fact."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    s = spark.read.parquet(f"{sf_dir}/supplier.parquet").select("s_suppkey", "s_nationkey")
    n = spark.read.parquet(f"{sf_dir}/nation.parquet")
    r = spark.read.parquet(f"{sf_dir}/region.parquet").filter(F.col("r_name") == "ASIA")
    dims = (
        s.join(n, s.s_nationkey == n.n_nationkey)
        .join(r, n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "n_name")
    )
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part-dimension rollup: revenue by brand (broadcast the part dim,
    prune it to the two join/group columns)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_brand")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relational fringe: TPC-H Q1-style aggregate (bench headliner)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join + agg + deterministic top-k (revenue DESC, key ASC)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rev = (
        li.groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )
    return (
        o.join(rev, o.o_orderkey == rev.l_orderkey)
        .select("o_orderkey", "o_custkey", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("o_orderkey"))
        .limit(20)
    )


def q_q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10 shape — returned-item customer revenue ranking: fact-fact join
    (lineitem×orders, both filtered BEFORE the shuffle so pushdown prunes
    the scans), map-side-combined agg per customer, broadcast customer dim
    joined AFTER the aggregation (build side = 1 row per customer, not per
    lineitem), deterministic top-20."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(F.col("l_returnflag") == "R")
        .select(
            "l_orderkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01"))
            & (F.col("o_orderdate") < F.lit("1997-01-01"))
        )
        .select("o_orderkey", "o_custkey")
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_name", "c_mktsegment"
    )
    per_cust = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.round(F.sum("rev"), 2).alias("revenue"))
    )
    return (
        per_cust.join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .select("c_custkey", "c_name", "c_mktsegment", "revenue")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


def q_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14 shape — promo revenue percentage for one ship month: date-range
    filter pushed to the lineitem scan, part dim pruned to (key, type) and
    broadcast, conditional aggregation in one pass."""
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .filter(
            (F.col("l_shipdate") >= F.lit("1996-09-01"))
            & (F.col("l_shipdate") < F.lit("1996-10-01"))
        )
        .select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
        )
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_type")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", F.col("rev")).otherwise(0.0))
                / F.sum("rev"),
                2,
            ).alias("promo_pct")
        )
    )


def q_event_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped percentiles (interpolated, = DuckDB quantile_cont) —
    the distribution-stats agg shape.  Exact percentile gathers each
    group's values, fine for bounded group counts; at 10^12 rows the scale
    path is approx_percentile (t-digest-style sketch, mergeable map-side),
    which is deliberately NOT the contract query because it is not
    engine-exact."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
    )


def q_returnflag_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation with grouping_id — the full grouping-sets lattice
    (ROLLUP's superset: per-flag, per-status, per-pair, grand total in one
    pass) plus the bitmask that disambiguates a real NULL group member
    from a subtotal row.  Spark expands the sets before the shuffle; the
    aggregate stays map-side combined."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.grouping_id().alias("gid"),
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    ).select(
        "l_returnflag", "l_linestatus", F.col("gid").cast("long").alias("gid"), "n", "sum_qty"
    )


def q_returnflag_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation (subtotals + grand total in one pass — Spark
    expands grouping sets before the shuffle, still map-side combined)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
    )


def q_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — correlated per-group scalar aggregate: lineitems
    whose quantity is below 0.2× their part's average quantity.  Scale
    plan: the correlated subquery is decorrelated by hand into a per-part
    aggregate (map-side combined, one narrow (partkey, avg) frame) that
    joins back to the fact on the grouping key — never a per-row
    subquery execution."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    per_part = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.2).alias("_qty_cut")
    )
    return (
        li.join(per_part, "l_partkey")
        .filter(F.col("l_quantity") < F.col("_qty_cut"))
        .agg(
            F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


def q_q21_multi_supplier_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape — chained SEMI + ANTI self-joins on the same fact:
    per supplier, orders where the supplier shipped a discounted line
    (base), ANOTHER supplier also shipped on that order (EXISTS → semi
    self-join), and NO other supplier shipped a discounted line on it
    (NOT EXISTS → anti self-join).  Scale plan: all three legs are narrow
    (orderkey, suppkey[, discount]) projections of the same scan; the
    semi/anti joins hash on l_orderkey — no correlated re-execution."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_suppkey", "l_discount"
    )
    base = li.filter(F.col("l_discount") > 0.05)
    others = li.select(
        F.col("l_orderkey").alias("o_k"), F.col("l_suppkey").alias("o_s")
    )
    others_disc = base.select(
        F.col("l_orderkey").alias("d_k"), F.col("l_suppkey").alias("d_s")
    )
    qualified = (
        base.join(
            others,
            (base.l_orderkey == others.o_k) & (base.l_suppkey != others.o_s),
            "left_semi",
        )
        .join(
            others_disc,
            (base.l_orderkey == F.col("d_k")) & (base.l_suppkey != F.col("d_s")),
            "left_anti",
        )
    )
    return (
        qualified.groupBy("l_suppkey")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("l_suppkey"))
        .limit(20)
    )


def q_q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape — OR-of-ANDs join predicate (brand × quantity-band
    disjunction): the optimizer behavior exercised is DISJUNCTIVE
    predicate handling — Catalyst extracts the common l_quantity bounds /
    brand IN-list where it can, and the broadcast dim keeps the fact scan
    the only big input."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = spark.read.parquet(f"{sf_dir}/part.parquet").select("p_partkey", "p_brand", "p_size")
    j = li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#1") & F.col("l_quantity").between(1, 11) & (F.col("p_size") <= 5))
        | ((F.col("p_brand") == "Brand#2") & F.col("l_quantity").between(10, 20) & (F.col("p_size") <= 10))
        | ((F.col("p_brand") == "Brand#3") & F.col("l_quantity").between(20, 30) & (F.col("p_size") <= 15))
    )
    return j.filter(cond).agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_events_range_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame window (value-based, not row-based): per-user moving
    average of event values over the trailing hour — the time-series
    frame shape `RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW` that a
    rows-frame cannot express (frame membership is decided by timestamp
    distance, so ties and gaps behave identically in both engines)."""
    from pyspark.sql.window import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    secs = F.col("ts").cast("timestamp_ltz").cast("long")
    w = Window.partitionBy("user_id").orderBy(secs).rangeBetween(-3600, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.avg("value").over(w), 6).alias("hour_avg"),
    )


def q_q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape — the LEFT-OUTER join + count-distribution query
    (customers with zero qualifying orders must survive with c_count=0,
    which no inner join can produce).  Scale plan: orders are aggregated
    per customer FIRST (map-side-combined count over just o_custkey — the
    wide fact never shuffles whole rows), then customer left-outer-joins
    the per-customer counts; the Q13 ON-clause exclusion predicate
    (o_orderpriority ≠ '1-URGENT', the o_comment NOT LIKE analog for this
    schema) prunes the orders scan before the aggregate."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select("c_custkey")
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .select("o_custkey")
    )
    cnt = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    per_cust = c.join(cnt, c.c_custkey == cnt.o_custkey, "left_outer").select(
        F.coalesce(F.col("n_orders"), F.lit(0)).cast("long").alias("c_count")
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


def q_q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape — the ANTI-join query: customers with above-average
    positive balance and NO urgent order (NOT EXISTS over a predicate-
    filtered orders subset — every customer in this corpus has SOME order,
    so the unqualified Q22 form would be vacuously empty), grouped by
    nation (the phone-prefix country code analog for this schema).  Scale
    plan: the scalar average is a 1-row broadcast (crossJoin with a
    broadcast 1-row aggregate, not a collected literal, so the plan is one
    job); the NOT EXISTS is a left_anti hash join whose build side is the
    priority-filtered orders scan pruned to o_custkey only."""
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(F.round(F.avg("c_acctbal"), 4).alias("_avg_bal"))
    )
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    rich = c.crossJoin(F.broadcast(avg_bal)).filter(
        F.col("c_acctbal") > F.col("_avg_bal")
    )
    idle = rich.join(o, rich.c_custkey == o.o_custkey, "left_anti")
    return idle.groupBy(F.col("c_nationkey").cast("long").alias("c_nationkey")).agg(
        F.count(F.lit(1)).alias("numcust"),
        F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
    )


def _setop_sides(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """The two key sets the INTERSECT/EXCEPT contract queries operate on:
    positive-balance customer keys vs urgent-order customer keys.  Both
    sides prune to the single key column at the scan (ReadSchema is one
    long each) so the set op shuffles nothing but keys."""
    c = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_acctbal") > 0.0)
        .select(F.col("c_custkey").cast("long").alias("c_custkey"))
    )
    o = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").cast("long").alias("c_custkey"))
    )
    return c, o


def q_customer_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI INTERSECT (distinct set semantics): positive-balance customers
    who also placed an urgent order.  SURVEY §2.6 set-operation shape —
    the reference has no set ops (only the trivial border-list ``extend``,
    detectors.py:361-362), so this is relational-fringe coverage.  Scale
    plan: Catalyst rewrites INTERSECT to an aggregate + left-semi hash
    join on the key — ONE key shuffle per side, map-side combined, no
    row payload; survives 10^12 rows the same way the q22 anti-join
    does."""
    c, o = _setop_sides(spark, sf_dir)
    return c.intersect(o)


def q_customer_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI EXCEPT (distinct set semantics) — the set-op form of q22's
    NOT EXISTS: positive-balance customers with NO urgent order.  Same
    key-only scan pruning; Catalyst rewrites EXCEPT to distinct +
    left-anti hash join — one key shuffle per side."""
    c, o = _setop_sides(spark, sf_dir)
    return c.subtract(o)


def q_event_value_percentiles_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-visible check of the SKETCH percentile path (the 10^12-row
    plan the exact `percentile()` query documents): approx_percentile
    (mergeable map-side digest, accuracy 10000) runs in the SAME aggregate
    as the exact percentile, and the query returns the exact values plus a
    boolean asserting the sketch landed within 5% of the group's value
    range.  The oracle expects that boolean to be TRUE — so a sketch
    regression (or an accuracy misconfiguration) flips a hard correctness
    row, not just a tolerance footnote."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    agg = e.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("percentile(value, 0.5)").alias("_ex50"),
        F.expr("percentile(value, 0.9)").alias("_ex90"),
        F.expr("approx_percentile(value, 0.5, 10000)").alias("_ap50"),
        F.expr("approx_percentile(value, 0.9, 10000)").alias("_ap90"),
        (F.max("value") - F.min("value")).alias("_rng"),
    )
    tol = F.col("_rng") * 0.05
    ok = (F.abs(F.col("_ap50") - F.col("_ex50")) <= tol) & (
        F.abs(F.col("_ap90") - F.col("_ex90")) <= tol
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.round("_ex50", 6).alias("p50"),
        F.round("_ex90", 6).alias("p90"),
        ok.alias("sketch_within_tol"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full extraction over transcripts derived from sf0.001
    documents (HTML-wrapped + markdown-table payload mix)."""
    sf_dir = "/root/testdata/sf0.001"
    d = _docs(spark, sf_dir)
    html = _html_wrapped(d.filter(F.col("doc_id") % 2 == 0))
    md = _md_payload(d.filter(F.col("doc_id") % 2 == 1))
    t = _as_transcripts(html.unionByName(md))
    from table_ocr_spark.operators.extract_job import with_extraction

    return with_extraction(t.select("conv_id", "turn_idx", "text"))


def _gate_history() -> dict[str, int]:
    """query name -> the LAST round it appeared in a driver correctness
    gate, recovered from the committed ``CORRECTNESS_r*.json`` files
    themselves (each file's keys ARE that round's gated head window).
    Queries never gated map to -1.  Unreadable/absent files are skipped —
    worst case the rotation degrades to canonical order, never errors."""
    import glob
    import json
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    last: dict[str, int] = {}
    for p in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", p)
        if not m:
            continue
        rnd = int(m.group(1))
        try:
            with open(p) as f:
                data = json.load(f)
        except (OSError, ValueError):
            continue
        if not isinstance(data, dict):
            continue
        for k in data:
            last[k] = max(rnd, last.get(k, -1))
    return last


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Contract queries with STRUCTURAL gate rotation (VERDICT r5 #1).

    The driver's correctness gate records at most 50 rows in dict
    insertion order; rounds 4-5 rotated the head window by hand, which
    re-opens the same hole every round someone forgets to swap.  The
    order is now DERIVED: queries are sorted stalest-first by the last
    round each appeared in a committed ``CORRECTNESS_r*.json`` (never
    gated → first; ties break on canonical declaration order), so every
    query earns a hard driver row at least every other round by
    construction — new queries gate immediately, and the freshly-gated
    head self-demotes next round.  Every displaced tail entry stays
    fully oracle-backed (``tools/check_contract.py``) and is re-swept
    each round by ``tools/contract_sweep.py`` → BENCH/CONTRACT_SWEEP.md."""
    canonical = _canonical_queries()
    last = _gate_history()
    idx = {name: i for i, name in enumerate(canonical)}
    order = sorted(canonical, key=lambda q: (last.get(q, -1), idx[q]))
    return {q: canonical[q] for q in order}


def _canonical_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """The full contract-query registry in canonical (thematic) order —
    the rotation tie-break.  Insertion order here does NOT decide what
    gets gated; ``queries()`` reorders stalest-first."""
    return {
        # ---- relational fringe (16): never/once-gated joins, set ops,
        # grouping sets, percentiles exact + sketch ----
        "q17_small_quantity_revenue": q_q17_small_quantity_revenue,  # decorrelated per-group scalar avg
        "q19_disjunctive_revenue": q_q19_disjunctive_revenue,        # OR-of-ANDs join predicate
        "q21_multi_supplier_orders": q_q21_multi_supplier_orders,    # chained semi+anti self-joins
        "customer_intersect": q_customer_intersect,                  # NEW r5: ANSI INTERSECT
        "customer_except": q_customer_except,                        # NEW r5: ANSI EXCEPT
        "returnflag_cube": q_returnflag_cube,                        # CUBE + grouping_id
        "event_value_percentiles_approx": q_event_value_percentiles_approx,  # t-digest hard gate
        # ---- extraction kernels + export artifacts (12) ----
        "extract_html_mode_ratio": q_extract_html_mode_ratio,
        "extract_md_spans": q_extract_md_spans,
        "extract_md_conf": q_extract_md_conf,
        "extract_md_trimmed": q_extract_md_trimmed,
        "extract_layout_spans": q_extract_layout_spans,
        "extract_layout_clean": q_extract_layout_clean,
        "cells_flat": q_cells_flat,
        "cells_html": q_cells_html,
        "clean_text_pdf": q_clean_text_pdf,                          # NEW r5: searchable-PDF round trip
        "spans_hocr": q_spans_hocr,
        "stream_extract_clean": q_stream_extract_clean,              # streaming == batch equality
        "conv_metrics": q_conv_metrics,
        # ---- text analysis / curation (9) — the 6 stat kernels are 3-4x green, tail ----
        "dataset_split": q_dataset_split,                            # deterministic hash split
        "global_shuffle_index": q_global_shuffle_index,              # NEW r5: bucket-offset global order
        "docs_source_cap": q_docs_source_cap,                        # NEW r5: skew-safe per-domain quota
        "docs_hash_sample": q_docs_hash_sample,                      # NEW r5: deterministic hash sampling
        "repetition_stats": q_repetition_stats,                      # NEW r5: Gopher-style repetition signals
        "decontaminate_eval": q_decontaminate_eval,                  # NEW r5: train/eval n-gram decontamination
        "pack_sequences": q_pack_sequences,                          # NEW r5: token-budget sequence packing
        "rebalance_mixture": q_rebalance_mixture,                    # NEW r5: deterministic mixture rebalancing
        "ngram_lm_score": q_ngram_lm_score,                          # NEW r5: corpus bigram-LM quality score
        # ---- dedup pipeline stages (7) ----
        "minhash_signature": q_minhash_signature,
        "simhash": q_simhash,
        "ngram_jaccard": q_ngram_jaccard,
        "dedup_near_keep": q_dedup_near_keep,
        "near_dup_components": q_near_dup_components,                # iterative CC — keep gated
        "minhash_lsh_capped": q_minhash_lsh_capped,                  # hot-bucket cap — keep gated
        "minhash_lsh_pairs_incremental": q_minhash_lsh_pairs_incremental,  # NEW r5: banded-index join
        "minhash_lsh_star": q_minhash_lsh_star,                      # NEW r5: O(n)-per-bucket star form
        "conv_exact_dedup": q_conv_exact_dedup,                      # NEW r5: whole-conversation dedup
        "conv_near_dedup": q_conv_near_dedup,                        # NEW r6: edited re-upload catch
        "near_dup_verified": q_near_dup_verified,
        # ---- similarity / ANN (3) ----
        "embedding_near_dup": q_embedding_near_dup,
        "embedding_near_dup_incremental": q_embedding_near_dup_incremental,  # NEW r5: sign-LSH index join
        "ivf_topk": q_ivf_topk,
        "ivf_topk_incremental": q_ivf_topk_incremental,  # NEW r6: persisted-index search
        # ---- multimodal (3) ----
        "media_png_stats": q_media_png_stats,
        "media_wav_stats": q_media_wav_stats,
        "media_mp4_stats": q_media_mp4_stats,
        # ---- conversation scope (2) ----
        "conv_boilerplate_strip": q_conv_boilerplate_strip,
        "corpus_boilerplate_strip": q_corpus_boilerplate_strip,  # NEW r6: C4-style corpus-wide line ban
        "conv_boilerplate_strip_stateful": q_conv_boilerplate_strip_stateful,
        # ---- events / windows / as-of (4) ----
        "events_windowed": q_events_windowed,
        "events_range_moving_avg": q_events_range_moving_avg,        # RANGE frame
        "events_distinct_users_approx": q_events_distinct_users_approx,  # HLL hard gate
        "events_asof_join": q_events_asof_join,
        # ---- relational core (gating now decided by _gate_history(),
        # not position — this grouping is only the tie-break) ----
        "q3_shipping_priority": q_q3_shipping_priority,
        "q5_region_revenue": q_q5_region_revenue,
        "q18_large_orders": q_q18_large_orders,
        "q6_revenue_delta": q_q6_revenue_delta,
        "order_priority_counts": q_order_priority_counts,
        "segment_revenue": q_segment_revenue,
        "extract_html_clean": q_extract_html_clean,
        "extract_md_cells": q_extract_md_cells,
        "extract_otsu": q_extract_otsu,
        "extract_adaptive": q_extract_adaptive,
        "extract_layout_cells": q_extract_layout_cells,
        "extract_layout_binned": q_extract_layout_binned,
        "extract_mode_stats": q_extract_mode_stats,
        "token_count": q_token_count,
        "lang_id": q_lang_id,
        "quality_score": q_quality_score,
        "fingerprint": q_fingerprint,
        "redact_pii": q_redact_pii,
        "vocab_topk": q_vocab_topk,
        "exact_dedup": q_exact_dedup,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_near_dup": q_simhash_near_dup,
        "cosine_topk": q_cosine_topk,
        "cosine_topk_lsh": q_cosine_topk_lsh,
        "embedding_near_dup_lsh": q_embedding_near_dup_lsh,
        "conv_boilerplate_strip_hashed": q_conv_boilerplate_strip_hashed,
        "top_events_per_user": q_top_events_per_user,
        "events_sessionize": q_events_sessionize,
        "q22_idle_customers": q_q22_idle_customers,
        "event_value_percentiles": q_event_value_percentiles,
        "q13_customer_distribution": q_q13_customer_distribution,
        "q1_pricing_summary": q_q1_pricing_summary,
        "q10_returned_revenue": q_q10_returned_revenue,
        "promo_revenue_share": q_promo_revenue_share,
        "brand_revenue": q_brand_revenue,
        "top_revenue_orders": q_top_revenue_orders,
        "returnflag_rollup": q_returnflag_rollup,
    }


# ---------------------------------------------------------------------------
# DuckDB oracles
# ---------------------------------------------------------------------------

_SQL_HTML_PAYLOAD = (
    "'<html><head><script>var x=1;</script></head><body>"
    "<nav>NAV JUNK LINKS</nav>"
    '<div class="cookie-banner">ACCEPT COOKIES</div>'
    "<article><p>' || text || '</p></article>"
    "<footer>FOOTER JUNK</footer></body></html>'"
)

# normalized doc text (single-spaced, trimmed) — what extraction returns
_SQL_NORM_TEXT = "regexp_replace(trim(text), '\\s+', ' ', 'g')"

_SQL_TOKS = "string_split_regex(trim(text), '\\s+')"

_SQL_HASH60 = "(('0x' || substr(md5({x}), 1, 15))::BIGINT)"


def _sql_xml_escape(x: str) -> str:
    """Same &/</> escape sequence as operators/export._xml_escape."""
    return (
        "replace(replace(replace(" + x + ", '&', '&amp;'), '<', '&lt;'), '>', '&gt;')"
    )


def _sql_marker_count(markers) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_filter({_SQL_TOKS}, t -> lower(t) IN ({lst})))"


def _sql_distinct_marker_count(markers) -> str:
    lst = ", ".join(f"'{m}'" for m in markers)
    return f"len(list_intersect(list_distinct({_SQL_TOKS_L}), [{lst}]))"


def _sql_lang_id() -> str:
    from table_ocr_spark.operators.textstats import LANG_MARKERS

    c = {lang: _sql_distinct_marker_count(m) for lang, m in LANG_MARKERS.items()}
    zh = "length(regexp_replace(text, '[^一-鿿]', '', 'g'))"
    return (
        f"CASE WHEN {zh} > 0 THEN 'zh' "
        f"WHEN {c['en']} = 0 AND {c['de']} = 0 AND {c['fr']} = 0 AND {c['es']} = 0 THEN 'unk' "
        f"WHEN {c['en']} >= {c['de']} AND {c['en']} >= {c['fr']} AND {c['en']} >= {c['es']} THEN 'en' "
        f"WHEN {c['de']} >= {c['fr']} AND {c['de']} >= {c['es']} THEN 'de' "
        f"WHEN {c['fr']} >= {c['es']} THEN 'fr' ELSE 'es' END"
    )


def _sql_minhash_sig_list() -> str:
    """list_value(sig_0, …, sig_7): 8-permutation MinHash over word
    2-gram shingle hashes — ONE 32-bit md5 base hash per TOKEN, each
    2-gram combined polynomially (th[i]·B + th[i+1]) mod p with no
    shingle string built, then the same affine permutations
    (a_j·h + b_j) mod p as dedup.minhash_signature_col / shingle_hashes_col
    (constants imported, never re-derived)."""
    from table_ocr_spark.operators.dedup import MH_PRIME, SHINGLE_B, mh_params

    tok_hashes = (
        f"list_transform({_SQL_TOKS_L}, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)"
    )
    shingle_hashes = (
        "list_transform(range(1, greatest(len(th) - 1, 0) + 1), "
        f"i -> (th[i] * {SHINGLE_B} + th[i+1]) % {MH_PRIME})"
    )
    mins = ", ".join(
        f"list_min(list_transform(hs, h -> (h * {a} + {b}) % {MH_PRIME}))"
        for a, b in mh_params(8)
    )
    return (
        f"(SELECT list_value({mins}) FROM (SELECT {shingle_hashes} AS hs "
        f"FROM (SELECT {tok_hashes} AS th) _th) _s)"
    )


def _sql_minhash_sig() -> str:
    """The signature as a comma-joined string (matches concat_ws on the
    Spark side of the minhash_signature contract query)."""
    # array_to_string skips NULL elements, same as Spark's concat_ws —
    # a shingle-less doc yields '' in both engines (verified in tests)
    return (
        f"(SELECT array_to_string(list_transform(sig, v -> v::VARCHAR), ',') "
        f"FROM (SELECT {_sql_minhash_sig_list()} AS sig) _cs)"
    )


_SQL_TOKS_L = "string_split_regex(trim(lower(text)), '\\s+')"


def _sql_simhash(bits: int = 16) -> str:
    toks = f"list_distinct({_SQL_TOKS_L})"
    h = "list_transform(" + toks + ", t -> " + _SQL_HASH60.format(x="t") + ")"
    terms = []
    for b in range(bits):
        terms.append(
            f"CASE WHEN 2 * len(list_filter(hs, v -> (v >> {b}) & 1 = 1)) > len(hs) THEN {2**b} ELSE 0 END"
        )
    return f"(SELECT ({' + '.join(terms)})::BIGINT FROM (SELECT {h} AS hs) _t)"


def _sql_sign_bucket(band: int, planes_per_band: int = 8, dim: int = 64) -> str:
    """Sign-bucket expression with the hyperplanes inlined as literals —
    the exact same md5-derived ±1 planes the Spark operator uses."""
    from table_ocr_spark.operators.similarity import hyperplane

    terms = []
    for i in range(planes_per_band):
        hp = hyperplane(dim, band * planes_per_band + i)
        lit = "[" + ", ".join(f"{x:.1f}" for x in hp) + "]"
        terms.append(
            f"CASE WHEN list_dot_product(embedding::DOUBLE[], {lit}::DOUBLE[]) > 0 "
            f"THEN {2 ** i} ELSE 0 END"
        )
    return "(" + " + ".join(terms) + ")"


def _sql_ivf_topk(n_lists: int = 8, dim: int = 64, n_probe: int = 3, k: int = 20) -> str:
    """IVF oracle with the SAME md5-derived unit codebook inlined as SQL
    literals: rounded-dot argmax assignment (ties → lower list), rounded-dot
    probe ranking, exact cosine rerank — mirrors similarity.ivf_assign /
    ivf_probes / ivf_topk decision-for-decision."""
    from table_ocr_spark.operators.similarity import deterministic_centroids

    cents = deterministic_centroids(dim=dim, n_lists=n_lists)
    values = ", ".join(
        "(" + str(i) + ", [" + ", ".join(repr(x) for x in c) + "]::DOUBLE[])"
        for i, c in enumerate(cents)
    )
    cos_eq = (
        "list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])))"
    )
    return (
        f"WITH cents(list_id, cv) AS (VALUES {values}), "
        "q AS (SELECT embedding FROM embeddings WHERE vec_id = 0), "
        "probes AS (SELECT list_id FROM cents, q "
        "ORDER BY round(list_dot_product(cv, q.embedding::DOUBLE[]), 6) DESC, list_id "
        f"LIMIT {n_probe}), "
        "assigned AS (SELECT vec_id, embedding, list_id AS ivf_list FROM ("
        "SELECT e.vec_id, e.embedding, c.list_id, "
        "row_number() OVER (PARTITION BY e.vec_id "
        "ORDER BY round(list_dot_product(e.embedding::DOUBLE[], c.cv), 6) DESC, c.list_id) AS rn "
        "FROM embeddings e CROSS JOIN cents c) t WHERE rn = 1) "
        f"SELECT e.vec_id, e.ivf_list, round({cos_eq}, 4) AS cos_sim "
        "FROM assigned e, q "
        "WHERE e.ivf_list IN (SELECT list_id FROM probes) "
        f"ORDER BY {cos_eq} DESC, e.vec_id LIMIT {k}"
    )


def _sql_media_png_stats() -> str:
    """PNG oracle: the SAME literal blobs as hex, header fields read with
    big-endian byte arithmetic (width/height at offsets 16/20), channel
    means averaged over raw pixel bytes at their fixed stored-block
    offsets (48 + r*(1+stride) + 1 + x) — an independent read of the
    image the Spark side decodes via real inflate+unfilter."""
    from table_ocr_spark.multimodal.media import png_contract_fixtures

    # byte(b, i): 0-based byte of blob b as integer, via hex pairs
    def byte(expr: str, off: str) -> str:
        return f"cast(concat('0x', substr(hex({expr}), 2*({off})+1, 2)) AS INTEGER)"

    rows = []
    for mid, _kind, p, w, h, ch in png_contract_fixtures():
        rows.append(f"({mid}, from_hex('{p.hex()}'), {w}, {h}, {ch})")
    be32_16 = " + ".join(
        f"{byte('b', str(16 + i))} * {256 ** (3 - i)}" for i in range(4)
    )
    be32_20 = " + ".join(
        f"{byte('b', str(20 + i))} * {256 ** (3 - i)}" for i in range(4)
    )
    mean_cols = []
    for c in range(4):
        px_byte = byte("b", f"48 + r*(1 + w*ch) + 1 + x*ch + {c}")
        mean_cols.append(
            f"CASE WHEN ch > {c} THEN round(("
            f"SELECT avg({px_byte}) FROM (SELECT unnest(range(h)) AS r) _r, "
            f"(SELECT unnest(range(w)) AS x) _x) / 255.0, 4) "
            f"ELSE 0.0 END AS mean_c{c}"
        )
    return (
        "SELECT media_id::BIGINT AS media_id, "
        f"({be32_16})::INT AS width, ({be32_20})::INT AS height, 1 AS n_frames, "
        + ", ".join(mean_cols)
        + f" FROM (VALUES {', '.join(rows)}) pngs(media_id, b, w, h, ch)"
    )


def _sql_media_wav_stats() -> str:
    """WAV oracle: same literal blobs as hex; sample i = signed LE 16-bit
    at byte 44+2i; mean(|s|)/32768 — an independent read of the samples
    the Spark side decodes via array('h')."""
    from table_ocr_spark.multimodal.media import wav_contract_fixtures

    def byte(off: str) -> str:
        return f"cast(concat('0x', substr(hex(b), 2*({off})+1, 2)) AS INTEGER)"

    rows = []
    for mid, _kind, p, n in wav_contract_fixtures():
        ch = p[22]  # n_channels at byte 22 (LE u16; < 256 in the fixtures)
        rows.append(f"({mid}, from_hex('{p.hex()}'), {n}, {ch})")
    raw = f"({byte('44 + 2*i')} + 256 * {byte('45 + 2*i')})"
    signed = f"(CASE WHEN {raw} >= 32768 THEN {raw} - 65536 ELSE {raw} END)"
    return (
        "SELECT media_id::BIGINT AS media_id, (n_samples / ch)::INT AS n_frames, "
        f"round((SELECT avg(abs({signed})) FROM (SELECT unnest(range(n_samples)) AS i) _i) "
        "/ 32768.0, 4) AS mean_amp "
        f"FROM (VALUES {', '.join(rows)}) wavs(media_id, b, n_samples, ch)"
    )


def _sql_media_mp4_stats() -> str:
    """MP4 oracle: big-endian 32-bit reads at the asserted fixed offsets —
    tkhd width/height (16.16 → integer // 65536), stsz sample count, and
    the mean of the n mdat luma sample bytes at absolute offset 180 + i
    (an independent re-read of the samples Spark decodes via the box
    walk)."""
    from table_ocr_spark.multimodal.media import mp4_contract_fixtures

    def be32(off: int) -> str:
        return (
            "("
            + " + ".join(
                f"cast(concat('0x', substr(hex(b), 2*{off + k} + 1, 2)) AS BIGINT) * {256 ** (3 - k)}"
                for k in range(4)
            )
            + ")"
        )

    rows = ", ".join(
        f"({mid}, from_hex('{p.hex()}'), {n})"
        for mid, _k, p, _w, _h, n in mp4_contract_fixtures()
    )
    luma_byte = "cast(concat('0x', substr(hex(b), 2*(180 + i) + 1, 2)) AS INTEGER)"
    return (
        "SELECT media_id::BIGINT AS media_id, "
        f"({be32(120)} // 65536)::INT AS width, "
        f"({be32(124)} // 65536)::INT AS height, "
        f"{be32(168)}::INT AS n_frames, "
        f"round((SELECT avg({luma_byte}) "
        "FROM (SELECT unnest(range(n)) AS i) _i) / 255.0, 4) AS mean_luma "
        f"FROM (VALUES {rows}) mp4s(media_id, b, n)"
    )


def oracle_sql() -> dict[str, str]:
    from table_ocr_spark.operators.textstats import EN_STOPWORDS

    n_tok = f"len({_SQL_TOKS})::BIGINT"
    stop_hits = _sql_marker_count(EN_STOPWORDS)
    special = "length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))"
    quality = (
        f"(0.5 * least(1.0, ({n_tok})::DOUBLE / 50.0) "
        f"+ 0.3 * (CASE WHEN {n_tok} = 0 THEN 0.0 ELSE ({stop_hits})::DOUBLE / ({n_tok})::DOUBLE END) "
        f"+ 0.2 * (1.0 - (CASE WHEN length(text) = 0 THEN 0.0 ELSE ({special})::DOUBLE / length(text)::DOUBLE END)))"
    )
    fingerprint = f"md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))"
    dup_union = (
        "SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + 1000000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0"
    )
    w = lambda i: f"{_SQL_TOKS}[{i}]"  # noqa: E731
    md_payload = (
        f"'| c0 | c1 |' || chr(10) || '| --- | --- |' || chr(10) || "
        f"'| ' || {w(1)} || ' | ' || {w(2)} || ' |' || chr(10) || "
        f"'| ' || {w(3)} || ' | ' || {w(4)} || ' |'"
    )
    cos = (
        "list_dot_product(e.embedding::DOUBLE[], q.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(q.embedding::DOUBLE[], q.embedding::DOUBLE[])))"
    )
    cos_ab = (
        "list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) / "
        "(sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) * "
        "sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[])))"
    )
    sig_expr = _sql_minhash_sig()
    # sig[1] IS NULL ⇔ the doc has no shingles (short doc) — filtered out
    # before banding, mirroring _lsh_banded's NULL-signature filter
    band_bucket = (
        "SELECT doc_id, band, "
        "sig[band * 2 + 1]::VARCHAR || ':' || sig[band * 2 + 2]::VARCHAR AS bucket "
        "FROM sigs, (SELECT unnest(range(4)) AS band) _b WHERE sig[1] IS NOT NULL"
    )

    lsh_pairs_sql = (
        f"WITH docs2 AS ({dup_union}), "
        f"sigs AS (SELECT doc_id, {_sql_minhash_sig_list()} AS sig FROM docs2), "
        f"banded AS ({band_bucket}) "
        f"SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b "
        f"FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket AND a.doc_id < b.doc_id"
    )

    sql = {
        "extract_html_clean": (
            f"SELECT doc_id, {_SQL_NORM_TEXT} AS clean_text FROM documents"
        ),
        "extract_html_mode_ratio": (
            f"SELECT doc_id, 'explicit_markup' AS mode, "
            f"round(1.0 - length({_SQL_NORM_TEXT})::DOUBLE / length({_SQL_HTML_PAYLOAD})::DOUBLE, 4) AS bp_ratio "
            f"FROM documents"
        ),
        "extract_md_cells": (
            f"SELECT doc_id, 3::BIGINT AS n_rows, 6::BIGINT AS n_cells, "
            f"'c0' AS cell_00, {w(2)} AS cell_11, {w(4)} AS cell_21 FROM documents"
        ),
        "extract_md_spans": (
            # payload: '| c0 | c1 |\n| --- | --- |\n| w1 | w2 |\n| w3 | w4 |'
            # line 3 starts at offset 12+14=26; first cell starts at 26+2
            f"SELECT doc_id, 1::BIGINT AS span_row, 0::BIGINT AS span_col, "
            f"28::BIGINT AS span_start, (28 + length({w(1)}))::BIGINT AS span_end FROM documents"
        ),
        "spans_hocr": (
            # page = 3x2 md grid; word offsets are the md-span arithmetic
            # (line 3 starts at 26, line 4 at 34+L1+L2); x_wconf = rounded
            # plain-char percentage (recognize.confidence)
            "SELECT doc_id, "
            "'<div class=''ocr_page'' id=''page_' || doc_id || '_0'' title=''bbox 0 0 2 3''>' || chr(10) || "
            "'  <span class=''ocrx_word'' id=''word_1'' title=''bbox 0 0 2 4; x_wconf 100''>c0</span>' || chr(10) || "
            "'  <span class=''ocrx_word'' id=''word_2'' title=''bbox 1 0 7 9; x_wconf 100''>c1</span>' || chr(10) || "
            + " || chr(10) || ".join(
                f"'  <span class=''ocrx_word'' id=''word_{3 + j}'' title=''bbox {j % 2} {1 + j // 2} ' || "
                f"({start}) || ' ' || ({start} + length({w(1 + j)})) || "
                f"'; x_wconf ' || round(100.0 * length(regexp_replace({w(1 + j)}, '[^A-Za-z0-9 ]', '', 'g')) / length({w(1 + j)}))::INT || "
                f"'''>' || {w(1 + j)} || '</span>'"
                for j, start in enumerate(
                    [
                        "28",
                        f"31 + length({w(1)})",
                        f"36 + length({w(1)}) + length({w(2)})",
                        f"39 + length({w(1)}) + length({w(2)}) + length({w(3)})",
                    ]
                )
            )
            + " || chr(10) || '</div>' AS hocr FROM documents"
        ),
        "cells_html": (
            # md grid [[c0,c1],[w1,w2],[w3,w4]] → <table> render with the
            # same &/</> escape sequence as the Spark view
            "SELECT doc_id, '<table>' || chr(10) || "
            "'  <tr><td>c0</td><td>c1</td></tr>' || chr(10) || "
            + " || chr(10) || ".join(
                "'  <tr><td>' || "
                + _sql_xml_escape(w(1 + 2 * r))
                + " || '</td><td>' || "
                + _sql_xml_escape(w(2 + 2 * r))
                + " || '</td></tr>'"
                for r in range(2)
            )
            + " || chr(10) || '</table>' AS html FROM documents"
        ),
        "extract_md_trimmed": (
            # roi_trim=2 over seg ' w ': len(w)>2 → w[1:-1], start +1, end -1
            # (trim eats 1 char of the token each side); else degenerate
            # relaxation keeps the full cell (trim0 offsets 28..28+len)
            f"SELECT doc_id, 'c0' AS cell_00, "
            f"CASE WHEN length({w(1)}) > 2 THEN substr({w(1)}, 2, length({w(1)}) - 2) "
            f"ELSE {w(1)} END AS cell_10, "
            f"(CASE WHEN length({w(1)}) > 2 THEN 29 ELSE 28 END)::BIGINT AS span_start, "
            f"(CASE WHEN length({w(1)}) > 2 THEN 27 + length({w(1)}) "
            f"ELSE 28 + length({w(1)}) END)::BIGINT AS span_end FROM documents"
        ),
        "extract_otsu": (
            f"SELECT doc_id, {w(1)} || chr(10) || {w(2)} || chr(10) || {w(3)} || chr(10) || {w(4)} "
            f"AS clean_text FROM documents"
        ),
        "extract_adaptive": (
            f"SELECT doc_id, repeat({w(1)} || ' ' || {w(2)} || chr(10), 11) "
            f"|| {w(1)} || ' ' || {w(2)} AS clean_text FROM documents"
        ),
        "extract_md_conf": (
            # conf = plain-char fraction: 'w1!!' → len/(len+2); '(w2)' → len/(len+2)
            f"SELECT doc_id, {w(1)} || '!!' AS cell_10, "
            f"round(length({w(1)})::DOUBLE / (length({w(1)}) + 2), 6) AS conf_10, "
            f"round(length({w(2)})::DOUBLE / (length({w(2)}) + 2), 6) AS conf_11 "
            f"FROM documents"
        ),
        "extract_layout_binned": (
            f"SELECT doc_id, 3::BIGINT AS n_rows, "
            f"substr({w(1)}, 1, 10) AS cell_10, {w(4)} AS cell_21 FROM documents"
        ),
        "extract_layout_cells": (
            f"SELECT doc_id, 'heuristic_layout' AS mode, 3::BIGINT AS n_rows, "
            f"6::BIGINT AS n_cells, 'NAME' AS cell_00, "
            f"substr({w(1)}, 1, 10) AS cell_10, {w(4)} AS cell_21 FROM documents"
        ),
        "extract_layout_spans": (
            # payload: 'NAME        VALUE\n' (line 1 starts at 18) with col 1
            # at fixed offset 12 within each 'rpad(c0,12) || c1' line
            f"SELECT doc_id, 1::BIGINT AS r1c0_row, 18::BIGINT AS r1c0_start, "
            f"(18 + length(substr({w(1)}, 1, 10)))::BIGINT AS r1c0_end, "
            f"1::BIGINT AS r1c1_col, 30::BIGINT AS r1c1_start, "
            f"(30 + length({w(2)}))::BIGINT AS r1c1_end FROM documents"
        ),
        "extract_layout_clean": (
            "SELECT doc_id, clean AS clean_text, "
            "round(1.0 - length(clean)::DOUBLE / length(payload)::DOUBLE, 4) AS bp_ratio "
            "FROM (SELECT doc_id, "
            f"'NAME VALUE' || chr(10) || substr({w(1)}, 1, 10) || ' ' || {w(2)} || chr(10) "
            f"|| substr({w(3)}, 1, 10) || ' ' || {w(4)} AS clean, "
            f"'NAME        VALUE' || chr(10) || rpad(substr({w(1)}, 1, 10), 12, ' ') || {w(2)} "
            f"|| chr(10) || rpad(substr({w(3)}, 1, 10), 12, ' ') || {w(4)} AS payload "
            "FROM documents)"
        ),
        "token_count": (
            f"SELECT doc_id, {n_tok} AS n_tokens, "
            r"len(regexp_extract_all(text, '[\p{L}]+|[\p{N}]+|[^\p{L}\p{N}\s]'))::BIGINT"
            " AS n_bpe_tokens FROM documents"
        ),
        "lang_id": f"SELECT doc_id, {_sql_lang_id()} AS lang_id FROM documents",
        "quality_score": f"SELECT doc_id, round({quality}, 6) AS quality FROM documents",
        "fingerprint": (
            f"SELECT doc_id, {fingerprint} AS fingerprint, "
            f"list_reduce(list_prepend(0::BIGINT, "
            f"list_transform({_SQL_TOKS_L}, t -> {_SQL_HASH60.format(x='t')} % 2147483647)), "
            f"(acc, w) -> (acc * 131 + w) % 2147483647) AS roll_fp FROM documents"
        ),
        "vocab_topk": (
            "SELECT token, count(*)::BIGINT AS freq FROM ("
            f"SELECT unnest({_SQL_TOKS_L}) AS token FROM documents) "
            "WHERE token <> '' GROUP BY token ORDER BY freq DESC, token LIMIT 100"
        ),
        "redact_pii": (
            "SELECT doc_id, regexp_replace(regexp_replace(regexp_replace("
            f"{w(1)} || ' reach bob.smith+a@mail-host.example.org or https://ex.io/p/' "
            f"|| {w(2)} || '?id=9 ref 123456789 tail ' || {w(3)}, "
            "'[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'), "
            "'https?://[^\\s]+', '<URL>', 'g'), "
            "'\\d{7,}', '<NUM>', 'g') AS redacted FROM documents"
        ),
        "exact_dedup": (
            f"SELECT {fingerprint} AS fingerprint, count(*)::BIGINT AS n_dups, min(doc_id) AS min_key "
            f"FROM ({dup_union}) GROUP BY 1 HAVING count(*) > 1"
        ),
        "minhash_signature": f"SELECT doc_id, {sig_expr} AS sig FROM documents",
        "minhash_lsh_pairs": lsh_pairs_sql,
        "minhash_lsh_star": (
            # pivot = per-(band,bucket) min key; one edge per non-pivot member
            f"WITH docs2 AS ({dup_union}), "
            f"sigs AS (SELECT doc_id, {_sql_minhash_sig_list()} AS sig FROM docs2), "
            f"banded AS ({band_bucket}) "
            "SELECT DISTINCT p.pivot AS key_a, b.doc_id AS key_b "
            "FROM banded b JOIN (SELECT band, bucket, min(doc_id) AS pivot "
            "FROM banded GROUP BY 1, 2) p "
            "ON b.band = p.band AND b.bucket = p.bucket "
            "WHERE b.doc_id != p.pivot"
        ),
        "minhash_lsh_pairs_incremental": (
            # NEW increment = doc_id % 10 == 0, history = the rest; same
            # signature/banding arithmetic, asymmetric join (new × old)
            f"WITH sigs AS (SELECT doc_id, {_sql_minhash_sig_list()} AS sig FROM documents), "
            f"banded AS ({band_bucket}) "
            "SELECT DISTINCT a.doc_id AS key_new, b.doc_id AS key_old "
            "FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket "
            "WHERE a.doc_id % 10 = 0 AND b.doc_id % 10 != 0"
        ),
        "near_dup_components": (
            f"WITH RECURSIVE pairs AS ({lsh_pairs_sql}), "
            "edges AS (SELECT key_a AS src, key_b AS dst FROM pairs "
            "UNION SELECT key_b AS src, key_a AS dst FROM pairs), "
            "reach AS (SELECT src, dst FROM edges "
            "UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src) "
            "SELECT src AS member, least(src, min(dst)) AS component FROM reach GROUP BY src"
        ),
        "minhash_lsh_capped": (
            f"WITH docs2 AS ({dup_union} "
            "UNION ALL SELECT 2000000 + k AS doc_id, "
            "'the same boilerplate page appears everywhere' AS text "
            "FROM (SELECT unnest(range(60)) AS k)), "
            f"sigs AS (SELECT doc_id, {_sql_minhash_sig_list()} AS sig FROM docs2), "
            f"banded AS ({band_bucket}), "
            "sized AS (SELECT *, count(*) OVER (PARTITION BY band, bucket) AS bsz FROM banded) "
            "SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b "
            "FROM sized a JOIN sized b ON a.band = b.band AND a.bucket = b.bucket "
            "AND a.doc_id < b.doc_id WHERE a.bsz <= 50"
        ),
        "near_dup_verified": (
            f"WITH pairs AS ({lsh_pairs_sql}), d2 AS ({dup_union}) "
            "SELECT p.key_a, p.key_b, round(jac, 6) AS jaccard FROM ("
            "SELECT p.key_a, p.key_b, "
            "CASE WHEN len(list_distinct(list_concat(sa, sb))) = 0 THEN 0.0 "
            "ELSE len(list_intersect(sa, sb))::DOUBLE / len(list_distinct(list_concat(sa, sb)))::DOUBLE END AS jac "
            "FROM pairs p "
            "JOIN (SELECT doc_id, list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS sa FROM d2) a "
            "ON a.doc_id = p.key_a "
            "JOIN (SELECT doc_id, list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS sb FROM d2) b "
            "ON b.doc_id = p.key_b) p WHERE round(jac, 6) >= 0.5"
        ),
        "dedup_near_keep": (
            f"WITH RECURSIVE pairs AS ({lsh_pairs_sql}), "
            "edges AS (SELECT key_a AS src, key_b AS dst FROM pairs "
            "UNION SELECT key_b AS src, key_a AS dst FROM pairs), "
            "reach AS (SELECT src, dst FROM edges "
            "UNION SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src), "
            "drop_set AS (SELECT src AS doc_id FROM reach GROUP BY src "
            "HAVING least(src, min(dst)) <> src) "
            f"SELECT doc_id FROM ({dup_union}) d "
            "WHERE doc_id NOT IN (SELECT doc_id FROM drop_set)"
        ),
        "simhash": f"SELECT doc_id, {_sql_simhash(16)} AS simhash FROM documents",
        "simhash_near_dup": (
            f"WITH docs2 AS ({dup_union}), "
            f"sims AS (SELECT doc_id, {_sql_simhash(16)} AS sh FROM docs2), "
            "banded AS (SELECT doc_id, sh, band, (sh >> (band * 4)) & 15 AS bucket "
            "FROM sims, (SELECT unnest(range(4)) AS band) _b) "
            "SELECT DISTINCT a.doc_id AS key_a, b.doc_id AS key_b, "
            "bit_count(xor(a.sh, b.sh))::BIGINT AS hamming "
            "FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket "
            "AND a.doc_id < b.doc_id WHERE bit_count(xor(a.sh, b.sh)) <= 1"
        ),
        "ngram_jaccard": (
            "SELECT a.doc_id AS key_a, b.doc_id AS key_b, "
            "round(CASE WHEN len(list_distinct(list_concat(sa, sb))) = 0 THEN 0.0 "
            "ELSE len(list_intersect(sa, sb))::DOUBLE / len(list_distinct(list_concat(sa, sb)))::DOUBLE END, 6) AS jaccard "
            "FROM (SELECT doc_id, list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS sa FROM documents) a "
            "JOIN (SELECT doc_id, list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS sb FROM documents) b "
            "ON b.doc_id = a.doc_id + 1"
        ),
        "cosine_topk": (
            f"SELECT e.vec_id, round({cos}, 4) AS cos_sim "
            f"FROM embeddings e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q "
            f"ORDER BY {cos} DESC, e.vec_id LIMIT 20"
        ),
        "cosine_topk_lsh": (
            f"WITH qb AS (SELECT {_sql_sign_bucket(0)} AS b FROM embeddings WHERE vec_id = 0), "
            f"bk AS (SELECT vec_id, embedding, {_sql_sign_bucket(0)} AS b FROM embeddings) "
            f"SELECT e.vec_id, round({cos}, 4) AS cos_sim "
            f"FROM bk e, (SELECT embedding FROM embeddings WHERE vec_id = 0) q, qb "
            f"WHERE bit_count(xor(e.b, qb.b)) <= 1 "
            f"ORDER BY {cos} DESC, e.vec_id LIMIT 20"
        ),
        "ivf_topk": _sql_ivf_topk(n_lists=8, dim=64, n_probe=3, k=20),
        "ivf_topk_incremental": (
            # index-reuse is a PLAN property; values equal fresh
            # assignment of everything, plus the increment flag
            "SELECT vec_id, ivf_list, cos_sim, (vec_id % 10 = 0) AS is_new "
            f"FROM ({_sql_ivf_topk(n_lists=8, dim=64, n_probe=3, k=20)}) _t"
        ),
        "media_png_stats": _sql_media_png_stats(),
        "media_wav_stats": _sql_media_wav_stats(),
        "media_mp4_stats": _sql_media_mp4_stats(),
        "embedding_near_dup": (
            f"SELECT a.vec_id AS key_a, b.vec_id AS key_b, round({cos_ab}, 4) AS cos_sim "
            f"FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1 "
            f"WHERE round({cos_ab}, 4) >= 0.0"
        ),
        "embedding_near_dup_lsh": (
            f"WITH bk AS (SELECT vec_id, embedding, {_sql_sign_bucket(0)} AS bkt0, "
            f"{_sql_sign_bucket(1)} AS bkt1 FROM embeddings), "
            "banded AS (SELECT vec_id, embedding, 0 AS band, bkt0 AS bucket FROM bk "
            "UNION ALL SELECT vec_id, embedding, 1 AS band, bkt1 AS bucket FROM bk) "
            f"SELECT DISTINCT a.vec_id AS key_a, b.vec_id AS key_b, round({cos_ab}, 4) AS cos_sim "
            "FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket "
            f"AND a.vec_id < b.vec_id WHERE round({cos_ab}, 4) >= 0.2"
        ),
        "embedding_near_dup_incremental": (
            # NEW = vec_id % 10 == 0, history = the rest; same hyperplane
            # buckets, asymmetric (new × old) join, exact cosine verify
            f"WITH bk AS (SELECT vec_id, embedding, {_sql_sign_bucket(0)} AS bkt0, "
            f"{_sql_sign_bucket(1)} AS bkt1 FROM embeddings), "
            "banded AS (SELECT vec_id, embedding, 0 AS band, bkt0 AS bucket FROM bk "
            "UNION ALL SELECT vec_id, embedding, 1 AS band, bkt1 AS bucket FROM bk) "
            f"SELECT DISTINCT a.vec_id AS key_new, b.vec_id AS key_old, round({cos_ab}, 4) AS cos_sim "
            "FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket "
            f"WHERE a.vec_id % 10 = 0 AND b.vec_id % 10 != 0 AND round({cos_ab}, 4) >= 0.2"
        ),
        "cells_flat": (
            f"SELECT doc_id, r.row_idx::BIGINT AS row_idx, r.col_idx::BIGINT AS col_idx, "
            f"CASE WHEN r.row_idx = 0 THEN (CASE r.col_idx WHEN 0 THEN 'c0' ELSE 'c1' END) "
            f"WHEN r.row_idx = 1 THEN (CASE r.col_idx WHEN 0 THEN {w(1)} ELSE {w(2)} END) "
            f"ELSE (CASE r.col_idx WHEN 0 THEN {w(3)} ELSE {w(4)} END) END AS cell "
            f"FROM documents, (VALUES (0, 0), (0, 1), (1, 0), (1, 1), (2, 0), (2, 1)) r(row_idx, col_idx)"
        ),
        "conv_exact_dedup": (
            # conv text re-assembled turn-by-turn in order (same banner +
            # word-<t> construction as the strip oracles), then the
            # standard normalized-md5 fingerprint grouping
            "WITH convs AS (SELECT doc_id::VARCHAR AS conv_id, "
            + (
                " || chr(10) || ".join(
                    f"'SENT FROM MY AGENT' || chr(10) || {_SQL_TOKS}[{t}+1] || '-{t}'"
                    for t in range(5)
                )
            )
            + " AS ctext FROM documents UNION ALL "
            "SELECT doc_id::VARCHAR || '-dup', "
            + (
                " || chr(10) || ".join(
                    f"'SENT FROM MY AGENT' || chr(10) || {_SQL_TOKS}[{t}+1] || '-{t}'"
                    for t in range(5)
                )
            )
            + " FROM documents WHERE doc_id % 10 = 0) "
            "SELECT md5(lower(trim(regexp_replace(ctext, '\\s+', ' ', 'g')))) AS fingerprint, "
            "count(*)::BIGINT AS n_dups, min(conv_id) AS min_key "
            "FROM convs GROUP BY 1 HAVING count(*) > 1"
        ),
        "conv_near_dedup": (
            # conv texts (same construction) + '-edit' clones with one
            # word appended to the LAST turn; then the standard MinHash
            # banding over the conv text and word-set Jaccard ≥ 0.6 on
            # the candidate pairs — identical arithmetic to the Spark
            # operators (shingle hashes, band buckets, 6dp rounding)
            "WITH convs AS (SELECT doc_id::VARCHAR AS conv_id, "
            + (
                " || chr(10) || ".join(
                    f"'SENT FROM MY AGENT' || chr(10) || {_SQL_TOKS}[{t}+1] || '-{t}'"
                    for t in range(5)
                )
            )
            + " AS text FROM documents UNION ALL "
            "SELECT doc_id::VARCHAR || '-edit', "
            + (
                " || chr(10) || ".join(
                    f"'SENT FROM MY AGENT' || chr(10) || {_SQL_TOKS}[{t}+1] || '-{t}'"
                    for t in range(4)
                )
            )
            + f" || chr(10) || 'SENT FROM MY AGENT' || chr(10) || {_SQL_TOKS}[5] || '-4' || ' edited'"
            " FROM documents WHERE doc_id % 10 = 0), "
            f"sigs AS (SELECT conv_id, {_sql_minhash_sig_list()} AS sig FROM convs), "
            "banded AS (SELECT conv_id, band, "
            "sig[band * 2 + 1]::VARCHAR || ':' || sig[band * 2 + 2]::VARCHAR AS bucket "
            "FROM sigs, (SELECT unnest(range(4)) AS band) _b WHERE sig[1] IS NOT NULL), "
            "pairs AS (SELECT DISTINCT a.conv_id AS key_a, b.conv_id AS key_b "
            "FROM banded a JOIN banded b ON a.band = b.band AND a.bucket = b.bucket "
            "AND a.conv_id < b.conv_id) "
            "SELECT key_a, key_b, round(jac, 6) AS jaccard FROM ("
            "SELECT p.key_a, p.key_b, "
            "CASE WHEN len(list_distinct(list_concat(sa, sb))) = 0 THEN 0.0 "
            "ELSE len(list_intersect(sa, sb))::DOUBLE / len(list_distinct(list_concat(sa, sb)))::DOUBLE END AS jac "
            "FROM pairs p "
            "JOIN (SELECT conv_id, list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS sa FROM convs) a "
            "ON a.conv_id = p.key_a "
            "JOIN (SELECT conv_id, list_distinct(string_split_regex(trim(lower(text)), '\\s+')) AS sb FROM convs) b "
            "ON b.conv_id = p.key_b) _v WHERE round(jac, 6) >= 0.6"
        ),
        "corpus_boilerplate_strip": (
            # the identical document-frequency cut: per-doc DISTINCT
            # trimmed lines, banned at df >= 3, blank lines always kept
            "WITH docs2 AS (SELECT doc_id, 'SENT FROM MY PLATFORM' || chr(10) || "
            f"{_SQL_TOKS}[1] || ' ' || {_SQL_TOKS}[2] AS text FROM documents), "
            "dl AS (SELECT DISTINCT doc_id, trim(l) AS ln FROM docs2, "
            "unnest(string_split(text, chr(10))) AS _u(l) WHERE trim(l) != ''), "
            "banned AS (SELECT ln FROM (SELECT ln, count(*) AS c FROM dl GROUP BY ln) _c WHERE c >= 3), "
            "b AS (SELECT coalesce(list(ln), []::VARCHAR[]) AS bl FROM banned), "
            "nb AS (SELECT doc_id, count(*) AS n FROM dl JOIN banned USING (ln) GROUP BY doc_id) "
            "SELECT d.doc_id, "
            "coalesce(array_to_string(list_filter(string_split(d.text, chr(10)), "
            "l -> trim(l) = '' OR NOT list_contains(b.bl, trim(l))), chr(10)), '') AS text_stripped, "
            "coalesce(nb.n, 0)::INT AS n_banned_lines "
            "FROM docs2 d CROSS JOIN b LEFT JOIN nb ON nb.doc_id = d.doc_id"
        ),
        "conv_boilerplate_strip": (
            # the banner repeats in 5/5 turns → banned; each word-<t> line is
            # unique within its conversation → kept verbatim
            f"SELECT doc_id, t AS turn_idx, {_SQL_TOKS}[t::INT + 1] || '-' || t::VARCHAR AS text_stripped "
            f"FROM documents, (SELECT unnest(range(5)) AS t) _r"
        ),
        "conv_metrics": (
            "SELECT doc_id, 2::BIGINT AS n_turns, "
            f"round(((1.0 - length({_SQL_NORM_TEXT})::DOUBLE / length({_SQL_HTML_PAYLOAD})::DOUBLE) "
            f"+ (1.0 - length(md_clean)::DOUBLE / length(md_payload)::DOUBLE)) / 2, 6) AS bp_avg, "
            "6::BIGINT AS cell_count, "
            f"greatest(length({_SQL_NORM_TEXT}), length(md_clean))::BIGINT AS max_clean_len "
            "FROM (SELECT *, "
            f"'c0 c1' || chr(10) || {w(1)} || ' ' || {w(2)} || chr(10) || {w(3)} || ' ' || {w(4)} AS md_clean, "
            f"{md_payload} AS md_payload FROM documents)"
        ),
        "conv_boilerplate_strip_hashed": (
            f"SELECT doc_id, t AS turn_idx, {_SQL_TOKS}[t::INT + 1] || '-' || t::VARCHAR AS text_stripped "
            f"FROM documents, (SELECT unnest(range(5)) AS t) _r"
        ),
        "dataset_split": (
            # same md5 → 60-bit → bucket arithmetic over the same content
            # fingerprint string
            f"SELECT doc_id, CASE WHEN {_SQL_HASH60.format(x=fingerprint)} % 1000 < 900 "
            "THEN 'train' WHEN "
            f"{_SQL_HASH60.format(x=fingerprint)} % 1000 < 950 THEN 'val' "
            "ELSE 'test' END AS split FROM documents"
        ),
        "global_shuffle_index": (
            # the naive single-partition form: exact global rank in
            # md5(doc_id \x1f salt) order — md5 hex is identical across
            # engines, doc_id is unique, so ranks are unambiguous
            "SELECT doc_id, CAST(row_number() OVER "
            "(ORDER BY md5(doc_id || chr(31) || 'v1')) - 1 AS BIGINT) AS seq "
            "FROM documents"
        ),
        "docs_source_cap": (
            # naive one-window form; the Spark side runs the two-phase
            # salted plan — same kept set by pigeonhole
            "SELECT doc_id, source, n_chars FROM ("
            "SELECT doc_id, source, n_chars, row_number() OVER ("
            "PARTITION BY source ORDER BY n_chars DESC, doc_id) AS rn "
            "FROM documents) WHERE rn <= 5"
        ),
        "docs_hash_sample": (
            # identical md5 -> 60-bit -> bucket arithmetic (chr(31) = the
            # concat_ws separator), so the kept SET matches exactly
            "SELECT doc_id, lang FROM documents WHERE "
            "(('0x' || substr(md5(doc_id || chr(31) || 's1'), 1, 15))::BIGINT) "
            "% 1000000 < 250000"
        ),
        "repetition_stats": (
            # lines: trimmed, non-empty; bigrams: range(1, len) is
            # stop-EXCLUSIVE in DuckDB, so len<2 yields no windows — the
            # same guard Spark's sequence() needs a CASE for
            "WITH ls AS (SELECT doc_id, list_filter(list_transform("
            "string_split(text, chr(10)), l -> trim(l)), l -> l <> '') AS lines "
            "FROM documents), "
            f"bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), "
            f"i -> toks[i] || ' ' || toks[i+1])) AS b FROM "
            f"(SELECT doc_id, {_SQL_TOKS_L} AS toks FROM documents) _t), "
            "tops AS (SELECT doc_id, max(c) AS top, sum(c) AS tot FROM "
            "(SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2) GROUP BY doc_id) "
            "SELECT d.doc_id, "
            "CASE WHEN len(l.lines) <= 0 THEN 0.0 ELSE "
            "round(1.0 - len(list_distinct(l.lines))::DOUBLE / len(l.lines), 6) END "
            "AS dup_line_frac, "
            "coalesce(round(t.top::DOUBLE / t.tot, 6), 0.0) AS top_bigram_share "
            "FROM documents d JOIN ls l USING (doc_id) LEFT JOIN tops t USING (doc_id)"
        ),
        "decontaminate_eval": (
            # 8-gram windows: i in [1, len-7] ⇔ range(1, len-6) (exclusive)
            "WITH ev AS (SELECT array_to_string(list_slice("
            "string_split_regex(trim(text), '\\s+'), 1, 12), ' ') AS text "
            "FROM documents WHERE doc_id % 97 = 0), "
            f"evh AS (SELECT DISTINCT {_SQL_HASH60.format(x='w')} AS h FROM "
            f"(SELECT unnest(list_transform(range(1, len(toks) - 6), i -> "
            + " || ' ' || ".join(f"toks[i+{j}]" if j else "toks[i]" for j in range(8))
            + f")) AS w FROM (SELECT {_SQL_TOKS_L} AS toks FROM ev) _e) _w), "
            f"trw AS (SELECT doc_id, {_SQL_HASH60.format(x='w')} AS h FROM "
            f"(SELECT doc_id, unnest(list_transform(range(1, len(toks) - 6), i -> "
            + " || ' ' || ".join(f"toks[i+{j}]" if j else "toks[i]" for j in range(8))
            + f")) AS w FROM (SELECT doc_id, {_SQL_TOKS_L} AS toks FROM documents) _t) _x), "
            "bad AS (SELECT DISTINCT trw.doc_id FROM trw JOIN evh USING (h)) "
            "SELECT doc_id FROM documents d WHERE NOT EXISTS "
            "(SELECT 1 FROM bad WHERE bad.doc_id = d.doc_id)"
        ),
        "ngram_lm_score": (
            # exact-count stupid-backoff bigram LM trained on the corpus
            # itself; ln() only at scoring time; alpha forced ::DOUBLE so
            # DuckDB never does the math in DECIMAL
            f"WITH tk AS (SELECT doc_id, {_SQL_TOKS_L} AS toks FROM documents), "
            "uni AS (SELECT w, count(*) AS cu FROM "
            "(SELECT unnest(toks) AS w FROM tk) GROUP BY w), "
            "tot AS (SELECT sum(cu) AS t FROM uni), "
            "bg AS (SELECT doc_id, unnest(list_transform(range(1, len(toks)), "
            "i -> {'wp': toks[i], 'w': toks[i+1]}), recursive := true) FROM tk), "
            "bc AS (SELECT wp, w, count(*) AS cb FROM bg GROUP BY wp, w), "
            "sc AS (SELECT bg.doc_id, CASE WHEN bc.cb IS NOT NULL "
            "THEN ln(bc.cb::DOUBLE / up.cu) "
            "ELSE ln(0.4::DOUBLE * uc.cu / tot.t) END AS lp "
            "FROM bg LEFT JOIN bc USING (wp, w) "
            "JOIN uni up ON up.w = bg.wp JOIN uni uc ON uc.w = bg.w "
            "CROSS JOIN tot), "
            "pd AS (SELECT doc_id, count(*) AS n_bigrams, "
            "round(avg(lp), 6) AS lm_logprob FROM sc GROUP BY doc_id) "
            "SELECT d.doc_id, coalesce(pd.n_bigrams, 0) AS n_bigrams, "
            "coalesce(pd.lm_logprob, 0.0) AS lm_logprob "
            "FROM documents d LEFT JOIN pd USING (doc_id)"
        ),
        "rebalance_mixture": (
            # integer-exact mixture math: n_out = min(count*PPM//share),
            # thr = n_out*share//count, keep iff md5-60bit(doc_id) % PPM < thr
            f"WITH d AS (SELECT doc_id, {_sql_lang_id()} AS lang FROM documents), "
            "tgt (lang, share_ppm) AS (VALUES ('en', 600000), ('de', 200000), "
            "('fr', 100000), ('es', 100000)), "
            "c AS (SELECT lang, count(*) AS gc FROM d GROUP BY lang), "
            "j AS (SELECT c.lang, gc, share_ppm FROM c JOIN tgt USING (lang)), "
            "n AS (SELECT min(gc * 1000000 // share_ppm) AS n_out FROM j), "
            "thr AS (SELECT lang, (n_out * share_ppm // gc) AS thr_ppm FROM j, n) "
            "SELECT d.doc_id, d.lang FROM d JOIN thr USING (lang) "
            f"WHERE ({_SQL_HASH60.format(x='doc_id::VARCHAR')}) % 1000000 < thr_ppm"
        ),
        "pack_sequences": (
            # same md5→60-bit bucket + per-bucket running sum window
            f"WITH t AS (SELECT doc_id, {n_tok} AS n_tokens, "
            f"({_SQL_HASH60.format(x='doc_id::VARCHAR')}) % 16 AS pack_bucket "
            "FROM documents) "
            "SELECT doc_id, n_tokens, pack_bucket, "
            "((cum - n_tokens) // 2048)::BIGINT AS seq_id, "
            "((cum - n_tokens) % 2048)::BIGINT AS seq_offset FROM "
            "(SELECT *, sum(n_tokens) OVER (PARTITION BY pack_bucket "
            "ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS cum FROM t)"
        ),
        "events_distinct_users_approx": (
            "SELECT event_type, count(DISTINCT user_id)::BIGINT AS n_distinct_users, "
            "TRUE AS sketch_within_tol FROM events GROUP BY event_type"
        ),
        "events_asof_join": (
            "WITH marks AS (SELECT user_id, ts, max(value) AS mark_value "
            "FROM events WHERE event_type = 'click' GROUP BY user_id, ts), "
            "l AS (SELECT event_id, user_id, ts FROM events "
            "WHERE event_type <> 'click') "
            "SELECT l.event_id, l.user_id, round(m.mark_value, 6) AS last_click_value "
            "FROM l ASOF LEFT JOIN marks m "
            "ON l.user_id = m.user_id AND m.ts <= l.ts"
        ),
        "events_windowed": (
            "SELECT floor(epoch(date_trunc('hour', ts)))::BIGINT AS w_start, event_type, "
            "count(*)::BIGINT AS n, round(sum(value), 2) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "top_events_per_user": (
            "SELECT user_id, event_id, rn FROM ("
            "SELECT user_id, event_id, row_number() OVER "
            "(PARTITION BY user_id ORDER BY value DESC, event_id) AS rn FROM events) "
            "WHERE rn <= 2"
        ),
        "events_sessionize": (
            "SELECT event_id, user_id, "
            "sum(CASE WHEN gap IS NULL OR gap > 1800 THEN 1 ELSE 0 END) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)::BIGINT AS session_id "
            "FROM (SELECT event_id, user_id, ts, "
            "floor(epoch(ts))::BIGINT - lag(floor(epoch(ts))::BIGINT) "
            "OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap FROM events)"
        ),
        "extract_mode_stats": (
            # html-wrapped evens → explicit_markup, 0 table rows (no <table>);
            # md-table odds → explicit_markup with 3 rows each. All rows land
            # in one mode → single-row result.
            "SELECT 'explicit_markup' AS mode, count(*)::BIGINT AS n_turns, "
            "(3 * sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END))::BIGINT AS total_rows "
            "FROM documents"
        ),
        "q5_region_revenue": (
            "SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
            "count(*)::BIGINT AS n_items FROM lineitem "
            "JOIN supplier ON l_suppkey = s_suppkey "
            "JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey "
            "WHERE r_name = 'ASIA' GROUP BY n_name"
        ),
        "brand_revenue": (
            "SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
            "count(*)::BIGINT AS n_items FROM lineitem "
            "JOIN part ON l_partkey = p_partkey GROUP BY p_brand"
        ),
        "q3_shipping_priority": (
            "SELECT l_orderkey, floor(epoch(o_orderdate))::BIGINT AS o_date, o_orderpriority, "
            "round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM customer JOIN orders ON c_custkey = o_custkey "
            "JOIN lineitem ON l_orderkey = o_orderkey "
            "WHERE c_mktsegment = 'BUILDING' AND o_orderdate < DATE '1998-01-01' "
            "AND l_shipdate > DATE '1998-01-01' "
            "GROUP BY l_orderkey, o_date, o_orderpriority "
            "ORDER BY revenue DESC, l_orderkey LIMIT 10"
        ),
        "q18_large_orders": (
            "SELECT c_name, c_custkey, o_orderkey, floor(epoch(o_orderdate))::BIGINT AS o_date, "
            "round(o_totalprice, 2) AS o_totalprice, round(total_qty, 2) AS total_qty "
            "FROM orders JOIN (SELECT l_orderkey, sum(l_quantity) AS total_qty "
            "FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 300) big "
            "ON o_orderkey = big.l_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "ORDER BY o_totalprice DESC, o_orderkey LIMIT 100"
        ),
        "q6_revenue_delta": (
            "SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue, "
            "count(*)::BIGINT AS n_rows FROM lineitem "
            "WHERE l_shipdate >= DATE '2000-01-01' AND l_shipdate < DATE '2001-01-01' "
            "AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"
        ),
        "order_priority_counts": (
            "SELECT o_orderpriority, count(*)::BIGINT AS order_count FROM orders "
            "WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey) "
            "GROUP BY o_orderpriority"
        ),
        "segment_revenue": (
            "SELECT c_mktsegment, round(sum(rev), 2) AS revenue, count(*)::BIGINT AS n_orders "
            "FROM orders JOIN (SELECT l_orderkey, sum(l_extendedprice * (1 - l_discount)) AS rev "
            "FROM lineitem GROUP BY l_orderkey) r ON o_orderkey = l_orderkey "
            "JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment"
        ),
        "q1_pricing_summary": (
            "SELECT l_returnflag, l_linestatus, round(sum(l_quantity), 2) AS sum_qty, "
            "round(sum(l_extendedprice), 2) AS sum_base_price, "
            "round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price, "
            "count(*)::BIGINT AS count_order "
            "FROM lineitem WHERE l_shipdate <= DATE '1998-09-02' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "top_revenue_orders": (
            "SELECT o_orderkey, o_custkey, revenue FROM orders "
            "JOIN (SELECT l_orderkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM lineitem GROUP BY l_orderkey) r ON o_orderkey = l_orderkey "
            "ORDER BY revenue DESC, o_orderkey LIMIT 20"
        ),
        "q10_returned_revenue": (
            "SELECT c_custkey, c_name, c_mktsegment, revenue FROM customer "
            "JOIN (SELECT o_custkey, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "WHERE l_returnflag = 'R' AND o_orderdate >= '1996-01-01' "
            "AND o_orderdate < '1997-01-01' GROUP BY o_custkey) r "
            "ON c_custkey = o_custkey "
            "ORDER BY revenue DESC, c_custkey LIMIT 20"
        ),
        "promo_revenue_share": (
            "SELECT round(100.0 * sum(CASE WHEN p_type = 'PROMO' "
            "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) "
            "/ sum(l_extendedprice * (1 - l_discount)), 2) AS promo_pct "
            "FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE l_shipdate >= '1996-09-01' AND l_shipdate < '1996-10-01'"
        ),
        "event_value_percentiles": (
            "SELECT event_type, count(*)::BIGINT AS n, "
            "round(quantile_cont(value, 0.5), 6) AS p50, "
            "round(quantile_cont(value, 0.9), 6) AS p90 "
            "FROM events GROUP BY event_type"
        ),
        "returnflag_rollup": (
            "SELECT l_returnflag, l_linestatus, count(*)::BIGINT AS n, "
            "round(sum(l_quantity), 2) AS sum_qty "
            "FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)"
        ),
        # avg(l_quantity) is exact in both engines (integer-valued doubles:
        # exact sum / exact count), so the 0.2×avg cut is bit-identical
        "q17_small_quantity_revenue": (
            "SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly, "
            "count(*)::BIGINT AS n_small FROM lineitem "
            "JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_cut "
            "FROM lineitem GROUP BY l_partkey) p USING (l_partkey) "
            "WHERE l_quantity < qty_cut"
        ),
        "q21_multi_supplier_orders": (
            "WITH li AS (SELECT l_orderkey, l_suppkey, l_discount FROM lineitem), "
            "base AS (SELECT * FROM li WHERE l_discount > 0.05) "
            "SELECT l_suppkey, count(*)::BIGINT AS numwait FROM base b "
            "WHERE EXISTS (SELECT 1 FROM li o WHERE o.l_orderkey = b.l_orderkey "
            "AND o.l_suppkey <> b.l_suppkey) "
            "AND NOT EXISTS (SELECT 1 FROM base d WHERE d.l_orderkey = b.l_orderkey "
            "AND d.l_suppkey <> b.l_suppkey) "
            "GROUP BY l_suppkey ORDER BY numwait DESC, l_suppkey LIMIT 20"
        ),
        "q19_disjunctive_revenue": (
            "SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue, "
            "count(*)::BIGINT AS n_rows FROM lineitem JOIN part ON l_partkey = p_partkey "
            "WHERE (p_brand = 'Brand#1' AND l_quantity BETWEEN 1 AND 11 AND p_size <= 5) "
            "OR (p_brand = 'Brand#2' AND l_quantity BETWEEN 10 AND 20 AND p_size <= 10) "
            "OR (p_brand = 'Brand#3' AND l_quantity BETWEEN 20 AND 30 AND p_size <= 15)"
        ),
        "events_range_moving_avg": (
            "SELECT event_id, user_id, round(avg(value) OVER ("
            "PARTITION BY user_id ORDER BY floor(epoch(ts))::BIGINT "
            "RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW), 6) AS hour_avg "
            "FROM events"
        ),
        "returnflag_cube": (
            "SELECT l_returnflag, l_linestatus, "
            "GROUPING(l_returnflag, l_linestatus)::BIGINT AS gid, "
            "count(*)::BIGINT AS n, round(sum(l_quantity), 2) AS sum_qty "
            "FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)"
        ),
        "q13_customer_distribution": (
            "SELECT c_count, count(*)::BIGINT AS custdist FROM ("
            "SELECT c_custkey, count(o_custkey)::BIGINT AS c_count "
            "FROM customer LEFT OUTER JOIN orders "
            "ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT' "
            "GROUP BY c_custkey) c_orders GROUP BY c_count"
        ),
        "q22_idle_customers": (
            "SELECT c_nationkey::BIGINT AS c_nationkey, count(*)::BIGINT AS numcust, "
            "round(sum(c_acctbal), 2) AS totacctbal FROM customer "
            "WHERE c_acctbal > (SELECT round(avg(c_acctbal), 4) FROM customer "
            "WHERE c_acctbal > 0.0) "
            "AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey "
            "AND o_orderpriority = '1-URGENT') "
            "GROUP BY c_nationkey"
        ),
        "clean_text_pdf": (
            # round trip must reproduce the extracted text exactly, one page
            f"SELECT doc_id, 1::INT AS n_pages, {_SQL_NORM_TEXT} AS text "
            "FROM documents"
        ),
        "customer_intersect": (
            "SELECT c_custkey::BIGINT AS c_custkey FROM customer WHERE c_acctbal > 0.0 "
            "INTERSECT "
            "SELECT o_custkey::BIGINT FROM orders WHERE o_orderpriority = '1-URGENT'"
        ),
        "customer_except": (
            "SELECT c_custkey::BIGINT AS c_custkey FROM customer WHERE c_acctbal > 0.0 "
            "EXCEPT "
            "SELECT o_custkey::BIGINT FROM orders WHERE o_orderpriority = '1-URGENT'"
        ),
        # the sketch query returns EXACT percentiles plus a boolean the
        # sketch must satisfy; the oracle pins that boolean to TRUE
        "event_value_percentiles_approx": (
            "SELECT event_type, count(*)::BIGINT AS n, "
            "round(quantile_cont(value, 0.5), 6) AS p50, "
            "round(quantile_cont(value, 0.9), 6) AS p90, "
            "TRUE AS sketch_within_tol "
            "FROM events GROUP BY event_type"
        ),
    }
    # Structured Streaming equivalence: the stream runs the SAME extraction
    # kernel under Trigger.AvailableNow, so its sink must equal the batch
    # result — the oracle IS the batch oracle.
    sql["stream_extract_clean"] = sql["extract_html_clean"]
    # Stateful streaming strip drains the whole conversation in one
    # AvailableNow batch, so its prefix == the conversation and the batch
    # operator's oracle applies verbatim.
    sql["conv_boilerplate_strip_stateful"] = sql["conv_boilerplate_strip"]
    return sql
