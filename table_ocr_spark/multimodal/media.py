"""Multimodal payload plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batch ``mapInPandas`` UDFs.

The image/audio decode libraries are NOT in this container, so the decode
kernels are STUBBED behind ``_decode_image_stub`` (deterministic fake:
metadata parsed from the payload header we synthesize) — clearly marked;
the Spark-side plumbing (schema, batch iteration, partitioning, output
shape) is real and tested.  Swapping in a real decoder means replacing one
pure function; nothing in the plan changes.

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


def _decode_image_stub(payload: bytes) -> dict:
    """STUB decoder — no image libs in this container.

    A real implementation would be e.g. PIL.Image.open(BytesIO(payload));
    this parses the deterministic fake header instead.  Raises on foreign
    bytes the way a real decoder raises on corrupt files.
    """
    if payload is None or payload[:4] != _MAGIC:
        raise NotImplementedError(
            "real media decode not available in this environment; "
            "payload is not a synthesized fake"
        )
    width, height, n_frames, media_id = struct.unpack("<IIIq", payload[4:24])
    return {"width": width, "height": height, "n_frames": n_frames, "media_id": media_id}


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
                meta = _decode_image_stub(bytes(payload))
                rows["media_id"].append(mid)
                rows["kind"].append(kind)
                rows["width"].append(meta["width"])
                rows["height"].append(meta["height"])
                rows["n_frames"].append(meta["n_frames"])
                # deterministic fake feature: seeded by media_id, scaled by
                # geometry (stands in for a resize + embed step)
                base = float(meta["width"] * meta["height"] % 997)
                rows["feature"].append(
                    [float((meta["media_id"] * (i + 1)) % 101) / 101.0 + base * 0.0
                     for i in range(feature_dim)]
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(_batches, schema=FEATURE_SCHEMA)
