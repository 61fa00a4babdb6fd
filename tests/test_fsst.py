"""FSST-style codec (E7) — roundtrips, escape-byte edge cases, and the
compression bar on source-code-like text (must beat PLAIN meaningfully)."""

import numpy as np
import pytest

from cpp_parquet_spark.codecs import fsst, plain


def synth_code_text(n: int, seed: int = 7) -> list[str]:
    """Deterministic source-code-like strings (keyword-heavy, repetitive)."""
    rng = np.random.default_rng(seed)
    kw = ["def ", "return ", "self.", "import ", "    ", "value", "result",
          "for i in range(", "):\n", " = ", "if ", "is None", "np.", "data"]
    out = []
    for _ in range(n):
        k = int(rng.integers(5, 60))
        idx = rng.integers(0, len(kw), size=k)
        out.append("".join(kw[i] for i in idx))
    return out


def test_roundtrip_code_text():
    vals = synth_code_text(500)
    data, p = fsst.encode(vals)
    got = fsst.decode(data, p, len(vals))
    assert got.to_pylist() == vals


def test_compression_beats_plain_on_code():
    vals = synth_code_text(2000)
    enc, _ = fsst.encode(vals)
    pl, _ = plain.encode(vals, "str")
    ratio = len(pl) / len(enc)
    assert ratio > 1.8, f"fsst ratio only {ratio:.2f}"


def test_roundtrip_with_escapes():
    """Train on ASCII, encode values containing out-of-vocab bytes."""
    table = fsst.train(synth_code_text(200))
    assert table is not None
    vals = ["def unicode_≠_bytes(): pass", "ÿÿÿ", "\xff\xfe", "plain ascii def "]
    stream, lens = fsst._encode_with_table(vals, table)
    # rebuild a full page by hand through the public api
    data, p = fsst.encode(vals, table)
    got = fsst.decode(data, p, len(vals))
    assert got.to_pylist() == vals


def test_roundtrip_empty_and_tiny():
    table = fsst.train(synth_code_text(50))
    vals = ["", "a", "", "def ", ""]
    data, p = fsst.encode(vals, table)
    got = fsst.decode(data, p, len(vals))
    assert got.to_pylist() == vals


def test_escape_255_runs():
    """Raw 0xFF bytes stress the escape-chain parity logic."""
    table = fsst.train(["hello world " * 50])
    assert table is not None
    vals = ["\xff", "\xff\xff", "\xff\xffx", "x\xff", "hello \xff\xff\xff world"]
    data, p = fsst.encode(vals, table)
    got = fsst.decode(data, p, len(vals))
    assert got.to_pylist() == vals


def test_train_rejects_binaryish():
    rng = np.random.default_rng(3)
    blobs = [bytes(rng.integers(0, 256, 300, dtype=np.uint8)) for _ in range(60)]
    assert fsst.train(blobs) is None


def test_deterministic():
    vals = synth_code_text(300)
    a, _ = fsst.encode(vals)
    b, _ = fsst.encode(vals)
    assert a == b


def test_long_strings_and_boundaries():
    vals = ["x = 1\n" * 5000, "y" * 100000, "def f():\n    return 42\n" * 1000]
    data, p = fsst.encode(vals)
    got = fsst.decode(data, p, len(vals))
    assert got.to_pylist() == vals
    pl, _ = plain.encode(vals, "str")
    assert len(data) < len(pl)
