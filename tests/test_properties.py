"""Property-based kernel tests (hypothesis): the invariants that protect
per-turn byte equality across arbitrary payloads (SURVEY.md §7 hard-points
1-2), checked on generated — not hand-picked — inputs. Pure Python, no
Spark session needed."""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from table_ocr_spark.config import DEFAULT_CONFIG as C
from table_ocr_spark.functions.extract import extract_payload
from table_ocr_spark.functions.normalize import collapse_ws, normalize

# text strategy: printable + newlines + the noisy chars the corpus uses
_noisy_text = st.text(
    alphabet=st.sampled_from(
        string.ascii_letters + string.digits + " \t\n|<>/-&#;.\r" + "​﻿\f" + "é中ا"
    ),
    max_size=400,
)


@given(_noisy_text)
@settings(max_examples=200, deadline=None)
def test_normalize_idempotent(s):
    once = normalize(s)
    assert normalize(once) == once


@given(_noisy_text)
@settings(max_examples=200, deadline=None)
def test_normalize_kills_cr_and_zero_width(s):
    out = normalize(s)
    assert "\r" not in out
    assert "​" not in out and "﻿" not in out


@given(_noisy_text)
@settings(max_examples=100, deadline=None)
def test_collapse_ws_idempotent(s):
    once = collapse_ws(s)
    assert collapse_ws(once) == once


@given(_noisy_text)
@settings(max_examples=150, deadline=None)
def test_extract_total_and_deterministic(s):
    """extract_payload never raises, and is a pure function (two calls,
    equal results) — the determinism-under-parallelism invariant."""
    a = extract_payload(s, C)
    b = extract_payload(s, C)
    assert a == b
    assert isinstance(a.clean_text, str)
    assert 0.0 <= a.boilerplate_ratio <= 1.0


@given(_noisy_text)
@settings(max_examples=150, deadline=None)
def test_spans_point_inside_normalized_payload(s):
    r = extract_payload(s, C)
    norm = normalize(s)
    for (row, col, start, end, conf) in r.spans:
        assert 0 <= start <= end <= len(norm)
        # the span's text, stripped, is contained in the recorded cell
        # (explicit-markup cells may be entity-decoded/tag-stripped further)
        assert row >= 0 and col >= 0


@given(st.lists(st.text(alphabet="ab |", max_size=30), max_size=10))
@settings(max_examples=100, deadline=None)
def test_md_region_bounds(lines):
    from table_ocr_spark.functions.markup import find_md_regions

    regions = find_md_regions(lines, C)
    for a, b in regions:
        assert 0 <= a < b <= len(lines)
    # regions are disjoint and ordered
    for (a1, b1), (a2, b2) in zip(regions, regions[1:]):
        assert b1 <= a2


@given(st.text(alphabet="xy ." , max_size=120), st.text(alphabet="xy .", max_size=120))
@settings(max_examples=100, deadline=None)
def test_oracle_frame_matches_kernel(a, b):
    """oracle.extract_frame rows == direct kernel calls (the two harnesses
    stay glued)."""
    import pandas as pd

    from table_ocr_spark.oracle import extract_frame

    df = pd.DataFrame(
        {"conv_id": ["c", "c"], "turn_idx": [0, 1], "text": [a, b]}
    )
    g = extract_frame(df)
    for i, txt in enumerate([a, b]):
        r = extract_payload(txt, C)
        assert g.loc[i, "clean_text"] == r.clean_text


# ---- fast-path equivalence guards (the optimized kernels must equal the
# ---- straightforward reference forms on arbitrary input) ----------------

_any_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=200
)


@given(_any_text)
@settings(max_examples=300, deadline=None)
def test_cleanup_text_fast_path_equivalence(s):
    import html as _html
    import re

    from table_ocr_spark.functions.recognize import cleanup_text

    tag_re = re.compile(r"<[^>]+>")
    ws_re = re.compile(r"\s+")
    reference = ws_re.sub(" ", _html.unescape(tag_re.sub(" ", s))).strip()
    assert cleanup_text(s) == reference


@given(_any_text)
@settings(max_examples=300, deadline=None)
def test_line_density_equivalence(s):
    from table_ocr_spark.functions.threshold import line_density

    want = (
        sum(1 for c in s if c.isalnum() or c == " ") / len(s) if s else 0.0
    )
    assert line_density(s) == want


@given(st.text(alphabet="|ab |c-", max_size=60), st.integers(0, 3))
@settings(max_examples=300, deadline=None)
def test_split_pipe_row_equivalence(line, min_sep):
    from table_ocr_spark.functions.markup import _split_pipe_row

    # straightforward per-character reference implementation
    segs, start, prev = [], 0, None
    for i, ch in enumerate(line):
        if ch == "|":
            if prev is not None and i - prev <= min_sep:
                prev, start = i, i + 1
                continue
            segs.append((line[start:i], start))
            start, prev = i + 1, i
    segs.append((line[start:], start))
    if segs and segs[0][0].strip() == "":
        segs = segs[1:]
    if segs and segs[-1][0].strip() == "":
        segs = segs[:-1]
    assert _split_pipe_row(line, min_sep) == segs


@given(
    st.integers(1, 6),
    st.integers(1, 6),
    st.sampled_from([1, 2, 3, 4]),
    st.integers(0, 9),
    st.integers(0, 6),
)
@settings(max_examples=120, deadline=None)
def test_png_roundtrip_property(w, h, ch, seed, level):
    from table_ocr_spark.multimodal.media import decode_png_pixels, encode_png

    px = bytes((seed * 131 + i * 17) % 256 for i in range(w * h * ch))
    d = decode_png_pixels(encode_png(w, h, px, channels=ch, compress_level=level))
    assert d["pixels"] == px and (d["width"], d["height"], d["channels"]) == (w, h, ch)


@given(st.lists(st.integers(-32768, 32767), min_size=2, max_size=64), st.sampled_from([1, 2]))
@settings(max_examples=150, deadline=None)
def test_wav_roundtrip_property(samples, ch):
    from table_ocr_spark.multimodal.media import decode_wav_samples, encode_wav

    if len(samples) % ch:
        samples = samples[: len(samples) - 1]
    if not samples:
        samples = [0, 0]
    d = decode_wav_samples(encode_wav(samples, n_channels=ch))
    assert d["n_frames"] == len(samples) // ch
    assert abs(d["mean_abs"] - sum(map(abs, samples)) / len(samples) / 32768.0) < 1e-12


@given(st.text(alphabet="ab |\n\f-", max_size=120))
@settings(max_examples=400, deadline=None)
def test_layout_line_split_equivalence(s):
    """layout.split_lines_pages (the PRODUCTION find-based splitter used by
    extract_layout) must equal the regex reference (incl. empty lines from
    consecutive separators and the trailing-separator final empty line)."""
    import re

    from table_ocr_spark.functions.layout import split_lines_pages

    # regex reference (the pre-optimization form)
    ref_lines, ref_offs, ref_pages = [], [], []
    pos = page = 0
    for m in re.finditer(r"[^\n\f]*", s):
        if m.start() != pos:
            continue
        ref_lines.append(m.group(0)); ref_offs.append(m.start()); ref_pages.append(page)
        pos = m.end()
        if pos < len(s):
            if s[pos] == "\f":
                page += 1
            pos += 1
        else:
            break

    got_lines, got_offs, got_pages = split_lines_pages(s)

    assert (got_lines, got_offs, got_pages) == (ref_lines, ref_offs, ref_pages)
