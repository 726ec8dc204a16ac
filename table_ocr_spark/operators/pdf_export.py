"""Searchable-PDF export — the last of the reference's four committed
per-sample artifact formats (``sample/proc/*.pdf``: tesseract's
"searchable PDF", an invisible text layer rendered over the page image;
the ``.txt``/``.hocr``/``.html`` siblings are covered by ``clean_text``,
``spans_hocr`` and ``cells_html``).

``text_layer_pdf`` emits, per turn, a complete self-contained PDF 1.4
byte stream whose single page carries the extracted text as an
INVISIBLE text layer (text rendering mode 3 — the same device tesseract
uses so selection/search work over the scanned image).  The writer is
pure stdlib and fully deterministic: fixed object layout, byte-exact
xref offsets, text encoded as PDF hex strings (no escaping ambiguity,
any UTF-8 payload round-trips byte-faithfully).

``pdf_text_layer`` parses the text layer back out of any PDF this
writer produced (content-stream ``<hex> Tj`` operators) — giving the
contract query a build→parse round trip whose output the DuckDB oracle
can check against the plain extracted text.

Scale shape: both directions are Arrow-batched ``pandas_udf`` string
kernels — per-turn, embarrassingly parallel, no shuffle; the same
zero-exchange plan as the extraction kernel itself.  A binary format
sink is the one export that genuinely cannot be a JVM expression tree
(byte offsets inside the artifact depend on encoded lengths), which is
why this view alone drops to Python.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, IntegerType, StringType

# page geometry: US-Letter, 1-inch margin, 11pt Helvetica, 13pt leading
_PAGE_W, _PAGE_H, _MARGIN, _FONT_PT, _LEADING = 612, 792, 36, 11, 13


def _content_stream(text: str) -> bytes:
    """One invisible-text-layer content stream: `3 Tr` = render mode 3
    (neither fill nor stroke — tesseract's searchable-PDF device), one
    ``Tj`` per input line, ``T*`` advancing by the leading."""
    lines = text.split("\n") if text else [""]
    ops = [
        b"BT",
        b"3 Tr",
        b"/F1 %d Tf" % _FONT_PT,
        b"%d TL" % _LEADING,
        b"1 0 0 1 %d %d Tm" % (_MARGIN, _PAGE_H - _MARGIN - _FONT_PT),
    ]
    for ln in lines:
        ops.append(b"<" + ln.encode("utf-8").hex().encode("ascii") + b"> Tj T*")
    ops.append(b"ET")
    return b"\n".join(ops)


def build_text_pdf(text: str) -> bytes:
    """text → complete single-page PDF 1.4 bytes (deterministic)."""
    stream = _content_stream(text)
    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 %d %d] "
        b"/Resources << /Font << /F1 4 0 R >> >> /Contents 5 0 R >>"
        % (_PAGE_W, _PAGE_H),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Length %d >>\nstream\n" % len(stream) + stream + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n" % (len(objs) + 1)
    out += b"0000000000 65535 f \n"
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)


_TJ_RE = re.compile(rb"<([0-9a-fA-F]*)> Tj")
_STREAM_RE = re.compile(rb"stream\n(.*?)\nendstream", re.DOTALL)


def parse_text_layer(pdf: bytes) -> str | None:
    """PDF bytes → text layer (lines re-joined with ``\\n``); None when
    the bytes are not a PDF produced by this writer's object layout."""
    if pdf is None or not pdf.startswith(b"%PDF-"):
        return None
    parts = []
    for stream in _STREAM_RE.findall(pdf):
        for hx in _TJ_RE.findall(stream):
            parts.append(bytes.fromhex(hx.decode("ascii")).decode("utf-8"))
    return "\n".join(parts)


def count_pages(pdf: bytes) -> int | None:
    """PDF bytes → page count from the /Pages node (parse-side check)."""
    if pdf is None or not pdf.startswith(b"%PDF-"):
        return None
    m = re.search(rb"/Type /Pages [^>]*?/Count (\d+)", pdf)
    return int(m.group(1)) if m else None


@F.pandas_udf(BinaryType())
def text_layer_pdf(text: pd.Series) -> pd.Series:
    """Column kernel: text → searchable-PDF bytes (NULL text → NULL)."""
    return text.map(lambda t: None if t is None else build_text_pdf(t))


@F.pandas_udf(StringType())
def pdf_text_layer(pdf: pd.Series) -> pd.Series:
    """Column kernel: PDF bytes → extracted text layer."""
    return pdf.map(parse_text_layer)


@F.pandas_udf(IntegerType())
def pdf_page_count(pdf: pd.Series) -> pd.Series:
    """Column kernel: PDF bytes → page count."""
    return pdf.map(count_pages).astype("Int32")


def with_text_pdf(df, text_col: str = "clean_text", out_col: str = "pdf") -> "object":
    """Attach the searchable-PDF artifact column to an extraction frame."""
    return df.withColumn(out_col, text_layer_pdf(F.col(text_col)))


__all__ = [
    "build_text_pdf",
    "parse_text_layer",
    "count_pages",
    "text_layer_pdf",
    "pdf_text_layer",
    "pdf_page_count",
    "with_text_pdf",
]
