"""Multimodal payload plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batch ``mapInPandas`` UDFs.

Container-header DECODE is real and stdlib-only (``parse_media_header``):
PNG IHDR, JPEG SOFn frame headers, and WAV RIFF/fmt chunks are parsed with
``struct`` — genuine files yield genuine width/height/frame counts (tested
against a real committed PNG/WAV fixture).  Pixel/sample decode and
feature extraction need codec libraries that are NOT in this container, so
the FEATURE step is a clearly-marked deterministic stub; swapping in a
real embedder means replacing one pure function — schema, batch iteration,
partitioning, and output shape don't change.

This mirrors how the reference treats OCR: recognition is a pluggable leaf
(``TesseractOCR.__call__``, detectors.py:767-890) under a fixed pipeline;
README remark 1 even scopes real OCR quality out (README.md:25).  Here the
"image" rows of a transcript (tool='browser' screenshots etc.) ride the
same table as opaque bytes.
"""

from __future__ import annotations

import struct
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),        # image | audio | video
        T.StructField("payload", T.BinaryType()),     # opaque encoded bytes
        T.StructField("mime", T.StringType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)

_MAGIC = b"FAKE"


def encode_fake_media(media_id: int, kind: str, width: int, height: int, n_frames: int = 1) -> bytes:
    """Deterministic synthetic payload: 4-byte magic + packed header +
    media_id-seeded body. Stands in for real PNG/WAV/MP4 bytes."""
    body = bytes((media_id * 31 + i) % 256 for i in range(64))
    return _MAGIC + struct.pack("<IIIq", width, height, n_frames, media_id) + body


_SOF_MARKERS = frozenset(
    [0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF]
)


def parse_media_header(payload: bytes) -> dict | None:
    """Real container-header parse, stdlib ``struct`` only.

    * PNG: signature + IHDR (always the first chunk per the spec) →
      big-endian width/height at bytes 16..24.
    * JPEG: walk the marker stream from SOI to the first SOFn frame header
      (height, width big-endian at segment offset +5).
    * WAV: RIFF/WAVE chunk walk — ``fmt `` gives block align, ``data``
      gives payload size; n_frames = data size // block align (sample
      frames), width/height stay 0 for audio.

    Returns None when the container is not recognized (caller decides
    whether to fall back or raise).
    """
    if payload is None or len(payload) < 12:
        return None
    if payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
        w, h = struct.unpack(">II", payload[16:24])
        return {"container": "png", "width": w, "height": h, "n_frames": 1}
    if payload[:2] == b"\xff\xd8":
        i = 2
        while i + 9 <= len(payload) and payload[i] == 0xFF:
            marker = payload[i + 1]
            if marker in _SOF_MARKERS:
                h, w = struct.unpack(">HH", payload[i + 5 : i + 9])
                return {"container": "jpeg", "width": w, "height": h, "n_frames": 1}
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            (seg_len,) = struct.unpack(">H", payload[i + 2 : i + 4])
            i += 2 + seg_len
        return None
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        i = 12
        block_align = None
        data_size = None
        while i + 8 <= len(payload):
            cid = payload[i : i + 4]
            (csize,) = struct.unpack("<I", payload[i + 4 : i + 8])
            if cid == b"fmt " and i + 22 <= len(payload):
                (block_align,) = struct.unpack("<H", payload[i + 20 : i + 22])
            elif cid == b"data":
                data_size = csize
            i += 8 + csize + (csize & 1)  # chunks are word-aligned
        if block_align and data_size is not None:
            return {
                "container": "wav",
                "width": 0,
                "height": 0,
                "n_frames": data_size // block_align,
            }
        return None
    return None


def decode_media(payload: bytes) -> dict:
    """Header metadata for one payload: real containers first, then the
    synthesized fake; raises on foreign bytes the way a real decoder
    raises on corrupt files."""
    meta = parse_media_header(payload)
    if meta is not None:
        return meta
    if payload is not None and payload[:4] == _MAGIC:
        width, height, n_frames, media_id = struct.unpack("<IIIq", payload[4:24])
        return {
            "container": "fake",
            "width": width,
            "height": height,
            "n_frames": n_frames,
        }
    raise NotImplementedError(
        "unrecognized media container (PNG/JPEG/WAV headers supported; "
        "full codec decode needs libraries not present in this environment)"
    )


def extract_media_features(df: DataFrame, feature_dim: int = 8) -> DataFrame:
    """media table → per-item metadata + a deterministic feature vector.

    ``mapInPandas``: one Arrow batch in, one out — the decode loop runs
    per-batch in Python (unavoidable for binary decoding), never per-row
    over the wire.  Frame-sampling analog: videos contribute n_frames to
    the feature scale.
    """

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "kind": [], "width": [], "height": [], "n_frames": [], "feature": []}
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                meta = decode_media(bytes(payload))
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["width"].append(meta["width"])
                rows["height"].append(meta["height"])
                rows["n_frames"].append(meta["n_frames"])
                # STUB feature: deterministic, seeded by media_id (a real
                # embedder would decode pixels/samples here — codec libs
                # are not in this container)
                rows["feature"].append(
                    [float((int(mid) * (i + 1)) % 101) / 101.0 for i in range(feature_dim)]
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(_batches, schema=FEATURE_SCHEMA)
