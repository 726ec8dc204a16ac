"""Streaming extraction == batch extraction (AvailableNow drain), and
multimodal mapInPandas plumbing."""

import pytest
from pyspark.sql import functions as F

from table_ocr_spark import synth
from table_ocr_spark.sources.catalog import write_transcripts_parquet


def test_stream_extract_equals_batch(spark, tmp_path):
    from table_ocr_spark.operators.extract_job import with_extraction
    from table_ocr_spark.sources.catalog import load_transcripts
    from table_ocr_spark.streaming.stream_extract import start_extract_stream

    inp = str(tmp_path / "in")
    write_transcripts_parquet(synth.gen_pandas(8, seed=42, max_long=50), inp)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = start_extract_stream(spark, inp, out, ckpt, available_now=True)
    q.awaitTermination(120)

    got = spark.read.parquet(out).orderBy("conv_id", "turn_idx").toPandas()
    want = (
        with_extraction(load_transcripts(spark, inp).select("conv_id", "turn_idx", "text"))
        .orderBy("conv_id", "turn_idx")
        .toPandas()
    )
    assert len(got) == len(want) > 0
    assert got["clean_text"].tolist() == want["clean_text"].tolist()
    assert got["mode"].tolist() == want["mode"].tolist()


def test_stream_resume_processes_only_new_files(spark, tmp_path):
    """Streaming checkpoint = incremental ingest: a second AvailableNow run
    over the same dir plus one new file emits only the new rows."""
    from table_ocr_spark.streaming.stream_extract import start_extract_stream

    inp = str(tmp_path / "in")
    write_transcripts_parquet(synth.gen_pandas(4, seed=1, max_long=30), inp, n_files=1)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")

    q = start_extract_stream(spark, inp, out, ckpt, available_now=True)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()

    # new file lands
    import pandas as pd

    extra = synth.gen_pandas(2, seed=2, max_long=10)
    write_transcripts_parquet(extra, inp + "/more_tmp", n_files=1)
    import os, shutil

    src = [f for f in os.listdir(inp + "/more_tmp") if f.endswith(".parquet")][0]
    shutil.move(os.path.join(inp + "/more_tmp", src), os.path.join(inp, "part-new.parquet"))

    q2 = start_extract_stream(spark, inp, out, ckpt, available_now=True)
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1 + len(extra)
    # no duplicates
    dups = (
        spark.read.parquet(out)
        .groupBy("conv_id", "turn_idx")
        .count()
        .filter("count > 1")
        .count()
    )
    assert dups == 0


def test_multimodal_feature_extraction(spark):
    from table_ocr_spark.multimodal.media import (
        MEDIA_SCHEMA,
        encode_fake_media,
        extract_media_features,
    )

    rows = [
        (1, "image", encode_fake_media(1, "image", 640, 480), "image/png"),
        (2, "video", encode_fake_media(2, "video", 1920, 1080, n_frames=30), "video/mp4"),
        (3, "audio", encode_fake_media(3, "audio", 0, 0, n_frames=16000), "audio/wav"),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {r.media_id: r for r in extract_media_features(df, feature_dim=4).collect()}
    assert got[1].width == 640 and got[1].height == 480 and got[1].n_frames == 1
    assert got[2].n_frames == 30
    assert len(got[3].feature) == 4
    # deterministic across runs
    again = {r.media_id: r for r in extract_media_features(df, feature_dim=4).collect()}
    assert got[1].feature == again[1].feature


def test_multimodal_foreign_bytes_modes(spark):
    """Unrecognized payloads: default mode keeps the row (NULL geometry +
    stub feature — one corrupt blob must not kill the stage); strict mode
    restores the fail-fast raise."""
    from table_ocr_spark.multimodal.media import MEDIA_SCHEMA, extract_media_features

    df = spark.createDataFrame([(9, "image", b"\x89PNG not really", "image/png")], MEDIA_SCHEMA)
    r = extract_media_features(df, feature_dim=2).first()
    assert (r.width, r.height, r.n_frames) == (None, None, None)
    assert len(r.feature) == 2  # deterministic stub keeps the row usable
    with pytest.raises(Exception):  # NotImplementedError surfaces as Py4J task failure
        extract_media_features(df, on_error="raise").collect()


def test_real_container_headers_parse():
    """Genuine container bytes (committed fixtures, validated independently
    by stdlib wave/zlib) parse to the right geometry — no codec libs."""
    import os
    import struct

    from table_ocr_spark.multimodal.media import parse_media_header

    fx = os.path.join(os.path.dirname(__file__), "fixtures")
    png = open(os.path.join(fx, "tiny_13x7.png"), "rb").read()
    assert parse_media_header(png) == {
        "container": "png", "width": 13, "height": 7, "n_frames": 1,
    }
    wav = open(os.path.join(fx, "tone_8k.wav"), "rb").read()
    assert parse_media_header(wav) == {
        "container": "wav", "width": 0, "height": 0, "n_frames": 200,
    }
    # minimal JPEG marker stream: SOI, APP0(JFIF), SOF0 with 44x29 frame
    jfif = b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00"
    sof0 = struct.pack(">BHH", 8, 29, 44) + b"\x03" + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    jpeg = (
        b"\xff\xd8"
        + b"\xff\xe0" + struct.pack(">H", 2 + len(jfif)) + jfif
        + b"\xff\xc0" + struct.pack(">H", 2 + len(sof0)) + sof0
    )
    assert parse_media_header(jpeg) == {
        "container": "jpeg", "width": 44, "height": 29, "n_frames": 1,
    }
    assert parse_media_header(b"GIF89a??????") is None


def test_real_png_through_spark_feature_path(spark):
    """A real PNG payload rides the same mapInPandas plan as the fakes."""
    import os

    from table_ocr_spark.multimodal.media import (
        MEDIA_SCHEMA,
        encode_fake_media,
        extract_media_features,
    )

    fx = os.path.join(os.path.dirname(__file__), "fixtures")
    png = open(os.path.join(fx, "tiny_13x7.png"), "rb").read()
    wav = open(os.path.join(fx, "tone_8k.wav"), "rb").read()
    rows = [
        (10, "image", png, "image/png"),
        (11, "audio", wav, "audio/wav"),
        (12, "image", encode_fake_media(12, "image", 640, 480), "image/png"),
    ]
    got = {
        r.media_id: r
        for r in extract_media_features(
            spark.createDataFrame(rows, MEDIA_SCHEMA), feature_dim=3
        ).collect()
    }
    assert (got[10].width, got[10].height) == (13, 7)
    assert got[11].n_frames == 200
    assert got[12].width == 640
    assert all(len(got[k].feature) == 3 for k in got)


def test_png_pixel_decode_all_filters():
    """decode_png_pixels inverts every PNG filter type (Sub/Up/Average/
    Paeth, spec section 9): the test applies the FORWARD filters to known
    pixels, wraps them in a valid PNG, and expects the original back."""
    import struct
    import zlib

    from table_ocr_spark.multimodal.media import decode_png_pixels

    w, h, ch = 5, 5, 3
    stride = w * ch
    px = bytes((i * 7 + 13) % 256 for i in range(w * h * ch))

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else b if pb <= pc else c

    raw = bytearray()
    for r in range(5):  # one scanline per filter type 0..4
        line = px[r * stride : (r + 1) * stride]
        prev = px[(r - 1) * stride : r * stride] if r else bytes(stride)
        raw.append(r)
        for x in range(stride):
            a = line[x - ch] if x >= ch else 0
            b = prev[x]
            c = prev[x - ch] if x >= ch else 0
            if r == 0:
                raw.append(line[x])
            elif r == 1:
                raw.append((line[x] - a) & 0xFF)
            elif r == 2:
                raw.append((line[x] - b) & 0xFF)
            elif r == 3:
                raw.append((line[x] - (a + b) // 2) & 0xFF)
            else:
                raw.append((line[x] - paeth(a, b, c)) & 0xFF)

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )
    d = decode_png_pixels(png)
    assert d["pixels"] == px and d["channels"] == 3


def test_png_feature_is_real_mean_color(spark):
    """PNG rows get a REAL mean-color feature (not the id-seeded stub):
    a solid-color image's feature equals that color / 255."""
    from table_ocr_spark.multimodal.media import (
        MEDIA_SCHEMA,
        encode_png,
        extract_media_features,
    )

    solid = encode_png(3, 2, bytes([200, 100, 50] * 6), channels=3, compress_level=6)
    df = spark.createDataFrame([(7, "image", solid, "image/png")], MEDIA_SCHEMA)
    feat = extract_media_features(df, feature_dim=4).first().feature
    assert [round(x, 5) for x in feat] == [
        round(200 / 255, 5), round(100 / 255, 5), round(50 / 255, 5), 0.0,
    ]


def test_png_decode_edges_no_spark():
    """Multi-IDAT concatenation; unsupported envelopes raise (palette,
    16-bit, interlaced) rather than silently mis-decoding."""
    import struct
    import zlib

    import pytest as _pytest

    from table_ocr_spark.multimodal.media import decode_png_pixels, encode_png

    def chunk(t, d):
        return struct.pack(">I", len(d)) + t + d + struct.pack(">I", zlib.crc32(t + d))

    w, h, ch = 3, 2, 3
    px = bytes(range(w * h * ch))
    whole = encode_png(w, h, px, channels=ch, compress_level=6)
    # split the single IDAT payload into two consecutive IDAT chunks
    (ilen,) = struct.unpack(">I", whole[33:37])
    idat = whole[41 : 41 + ilen]
    rebuilt = (
        whole[:33]
        + chunk(b"IDAT", idat[:5])
        + chunk(b"IDAT", idat[5:])
        + chunk(b"IEND", b"")
    )
    assert decode_png_pixels(rebuilt)["pixels"] == px

    def ihdr(depth, color, interlace=0):
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, depth, color, 0, 0, interlace))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 10))
            + chunk(b"IEND", b"")
        )

    for depth, color, inter in ((16, 2, 0), (8, 3, 0), (8, 2, 1)):
        with _pytest.raises(NotImplementedError):
            decode_png_pixels(ihdr(depth, color, inter))


def test_wav_sample_decode_no_spark():
    """decode_wav_samples: exact roundtrip through encode_wav (mono and
    stereo), real committed fixture, unsupported envelopes raise."""
    import struct

    import pytest as _pytest

    from table_ocr_spark.multimodal.media import decode_wav_samples, encode_wav

    samples = [0, 100, -100, 32767, -32768, 12345, -1]
    d = decode_wav_samples(encode_wav(samples, n_channels=1))
    assert d["n_channels"] == 1 and d["n_frames"] == len(samples)
    assert abs(d["mean_abs"] - sum(map(abs, samples)) / len(samples) / 32768.0) < 1e-12

    st = decode_wav_samples(encode_wav(samples[:6], n_channels=2))
    assert st["n_channels"] == 2 and st["n_frames"] == 3

    import os
    fx = os.path.join(os.path.dirname(__file__), "fixtures", "tone_8k.wav")
    real = decode_wav_samples(open(fx, "rb").read())
    assert real["n_frames"] == 200 and 0.0 < real["mean_abs"] < 1.0

    # 8-bit PCM (bits=8) must raise, not mis-decode
    bad = bytearray(encode_wav(samples))
    bad[34:36] = struct.pack("<H", 8)
    with _pytest.raises(NotImplementedError):
        decode_wav_samples(bytes(bad))


def test_wav_feature_is_real_mean_amplitude(spark):
    """WAV rows get a REAL mean-|amplitude| feature (not the stub)."""
    from table_ocr_spark.multimodal.media import (
        MEDIA_SCHEMA,
        encode_wav,
        extract_media_features,
    )

    p = encode_wav([16384, -16384] * 8)  # mean |s| = 16384 -> 0.5
    df = spark.createDataFrame([(21, "audio", p, "audio/wav")], MEDIA_SCHEMA)
    r = extract_media_features(df, feature_dim=3).first()
    assert r.n_frames == 16
    assert [round(x, 6) for x in r.feature] == [0.5, 0.0, 0.0]


def test_mp4_header_parse_no_spark():
    """ISO-BMFF parse: geometry + frame count from tkhd/stsz; v1 tkhd
    (64-bit times) also handled; truncated/garbage boxes rejected."""
    import struct

    import pytest as _pytest

    from table_ocr_spark.multimodal.media import (
        decode_media,
        encode_mp4,
        parse_media_header,
        parse_mp4_header,
    )

    p = encode_mp4(1920, 1080, 300)
    assert parse_media_header(p) == {
        "container": "mp4", "width": 1920, "height": 1080, "n_frames": 300,
    }
    assert decode_media(p)["width"] == 1920

    # version-1 tkhd: widen times/duration to 64-bit (prefix 36 vs 24)
    def box(cc, payload):
        return struct.pack(">I", 8 + len(payload)) + cc + payload

    # prefix: 4 ver/flags + 32 times/id/rsvd/dur, then 52 rsvd/layer/matrix
    tkhd_v1 = b"\x01" + bytes(3) + bytes(32) + bytes(52) + struct.pack(">II", 320 << 16, 240 << 16)
    trak = box(b"trak", box(b"tkhd", tkhd_v1))
    p1 = box(b"ftyp", b"isom\x00\x00\x02\x00isom") + box(b"moov", trak)
    got = parse_mp4_header(p1)
    assert (got["width"], got["height"]) == (320, 240)

    assert parse_mp4_header(b"\x00\x00\x00\x08free????") is None  # no ftyp
    # malformed box size → None, per the 'not recognized → None' contract
    # (NOT an exception: one bad row must not kill a mapInPandas stage)
    assert parse_mp4_header(box(b"ftyp", b"isom") + b"\x00\x00\x00\x02moov") is None

    # size==1 (64-bit largesize, the big-mdat encoding) and size==0
    # (to-end-of-file) are LEGAL ISO-BMFF and must parse, not raise
    p2 = encode_mp4(320, 240, 4, frame_lumas=bytes([10, 20, 30, 40]))
    moov_end = 172
    large_mdat = (
        struct.pack(">I", 1) + b"mdat" + struct.pack(">Q", 16 + 4) + bytes([10, 20, 30, 40])
    )
    p_large = p2[:moov_end] + large_mdat
    assert parse_mp4_header(p_large)["n_frames"] == 4
    p_toend = p2[:moov_end] + struct.pack(">I", 0) + b"mdat" + bytes([10, 20, 30, 40])
    assert parse_mp4_header(p_toend)["n_frames"] == 4
    from table_ocr_spark.multimodal.media import decode_mp4_luma

    for pp in (p2, p_large, p_toend):
        d = decode_mp4_luma(pp)
        assert d["n_frames"] == 4
        assert abs(d["mean_luma"] - 25 / 255.0) < 1e-12
    with _pytest.raises(NotImplementedError):
        decode_mp4_luma(p2[:moov_end])  # no mdat → outside the luma envelope


def test_mp4_through_spark_feature_path(spark):
    """MP4 rows ride the same mapInPandas plan; geometry is real and the
    1-byte-luma mdat track yields a REAL mean-luma feature (codec-
    compressed tracks would fall back to the labeled stub)."""
    from table_ocr_spark.multimodal.media import (
        MEDIA_SCHEMA,
        encode_mp4,
        extract_media_features,
    )

    df = spark.createDataFrame(
        [(41, "video", encode_mp4(640, 360, 120, frame_lumas=bytes([51] * 120)), "video/mp4")],
        MEDIA_SCHEMA,
    )
    r = extract_media_features(df, feature_dim=2).first()
    assert (r.width, r.height, r.n_frames) == (640, 360, 120)
    assert abs(r.feature[0] - 51 / 255.0) < 1e-6


def test_decode_envelope_fallback_keeps_header(spark):
    """A RECOGNIZED container outside the real-decode envelope (here: a
    16-bit PNG) keeps its genuinely-parsed header metadata and falls back
    to the deterministic stub feature — the whole stage must not fail on
    one such row (ADVICE r3)."""
    import struct as _struct
    import zlib

    from table_ocr_spark.multimodal.media import (
        MEDIA_SCHEMA,
        extract_media_features,
    )

    def chunk(ctype, data):
        return (
            _struct.pack(">I", len(data)) + ctype + data
            + _struct.pack(">I", zlib.crc32(ctype + data))
        )

    # 2x1 grayscale PNG at bit depth 16 — valid container, unsupported depth
    ihdr = _struct.pack(">IIBBBBB", 2, 1, 16, 0, 0, 0, 0)
    raw = b"\x00" + bytes(2 * 2)
    p16 = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )
    df = spark.createDataFrame([(77, "image", p16, "image/png")], MEDIA_SCHEMA)
    r = extract_media_features(df, feature_dim=3).first()
    assert (r.width, r.height) == (2, 1)  # header survived
    want = [float((77 * (i + 1)) % 101) / 101.0 for i in range(3)]
    assert all(abs(a - b) < 1e-6 for a, b in zip(r.feature, want))  # float32 schema
