"""Synthetic corpus invariants (FIXTURES.md §1): determinism, schema,
key density, skew shape."""

from table_ocr_spark import synth


def test_deterministic_same_seed():
    a = synth.gen_pandas(20, seed=42)
    b = synth.gen_pandas(20, seed=42)
    assert a.equals(b)


def test_different_seed_differs():
    a = synth.gen_pandas(20, seed=42)
    b = synth.gen_pandas(20, seed=7)
    assert not a["text"].equals(b["text"])


def test_payload_is_pure_function_of_key():
    k1, t1 = synth.payload_for("conv-0042-00000003", 5)
    k2, t2 = synth.payload_for("conv-0042-00000003", 5)
    assert (k1, t1) == (k2, t2)


def test_schema_and_key_density():
    df = synth.gen_pandas(25, seed=42)
    assert list(df.columns) == ["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    assert str(df["turn_idx"].dtype) == "int32"
    # dense 0..n-1 turn_idx per conv, no dups
    for conv_id, g in df.groupby("conv_id"):
        idx = sorted(g["turn_idx"].tolist())
        assert idx == list(range(len(idx)))
    assert not df.duplicated(["conv_id", "turn_idx"]).any()


def test_skew_heavy_tail():
    lengths = synth.conv_lengths(1000, seed=42)
    short = sum(1 for n in lengths if n <= 20)
    long = sum(1 for n in lengths if n >= 2000)
    assert short > 800
    assert long >= 1  # at least one skewed conversation — salting is tested


def test_all_payload_kinds_present():
    df = synth.gen_pandas(60, seed=42)
    kinds = {synth.payload_for(c, t)[0] for c, t in zip(df["conv_id"], df["turn_idx"])}
    assert kinds == {"plain", "html_page", "md_table", "pdf_layout", "noisy", "outlier"}


def test_megabyte_outlier_present_once():
    df = synth.gen_pandas(30, seed=42)
    big = df[df["text"].str.len() > 500_000]
    assert len(big) == 1  # FIXTURES.md: one ~1 MB outlier per SF step
    assert big.iloc[0]["turn_idx"] == 0 and big.iloc[0]["conv_id"].endswith("-00000000")
