"""Hypothesis property tests for the codec kernels (SURVEY.md §5.2 item 2).

Pure numpy/Arrow — no Spark session, so the whole file runs in seconds
and explores the input space far beyond the hand-written cases: extreme
int64s, unicode/empty/huge strings, null patterns, every legal
(tag, codec) combination.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings, strategies as st

from cpp_parquet_spark.codecs import pagecodec
from cpp_parquet_spark.select import choose_codec_arrow

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
SMALL = st.integers(min_value=-1000, max_value=1000)

texty = st.text(max_size=200)
bin_ = st.binary(max_size=200)


def _roundtrip(arr: pa.Array, tag: str, codec: str):
    row = pagecodec.encode_page(arr, tag, codec)
    out = pagecodec.decode_page(row["data"], row["params"], row["codec"],
                                tag, row["num_values"], row["null_count"])
    want = pagecodec.to_arrow(arr, tag)
    got = out.cast(want.type) if out.type != want.type else out
    assert got.to_pylist() == want.to_pylist(), (tag, codec)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(I64, SMALL, st.just(0)), max_size=300))
@pytest.mark.parametrize("codec", ["plain", "for", "rle", "dict", "bitpack"])
def test_int64_roundtrip_all_codecs(codec, xs):
    _roundtrip(pa.array(xs, pa.int64()), "i64", codec)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.one_of(texty, st.just(""), st.just("x" * 5000)),
                max_size=200))
@pytest.mark.parametrize("codec", ["plain", "dict", "fsst", "prefix"])
def test_string_roundtrip_all_codecs(codec, xs):
    arr = pa.array(xs, pa.large_string())
    if codec == "fsst":
        from cpp_parquet_spark.codecs import fsst
        if fsst.train(arr) is None:
            return  # untrainable page: selection would never pick fsst
    _roundtrip(arr, "str", codec)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(texty, st.just(""), st.none()), max_size=200))
def test_prefix_sorted_with_nulls_roundtrip(xs):
    """prefix in its element: sorted values (long shared runs) + nulls."""
    arr = pa.array(sorted([x for x in xs if x is not None])
                   + [None] * sum(x is None for x in xs), pa.large_string())
    _roundtrip(arr, "str", "prefix")


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(bin_, st.none()), max_size=200))
def test_binary_with_nulls_roundtrip(xs):
    arr = pa.array(xs, pa.large_binary())
    for codec in ("plain", "dict"):
        _roundtrip(arr, "bin", codec)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.one_of(I64, st.none()), max_size=200))
def test_int_nulls_roundtrip(xs):
    arr = pa.array(xs, pa.int64())
    for codec in ("plain", "for", "rle", "dict"):
        _roundtrip(arr, "i64", codec)


@settings(max_examples=40, deadline=None)
@given(st.lists(st.booleans(), max_size=500))
def test_bool_roundtrip(xs):
    arr = pa.array(xs, pa.bool_())
    for codec in ("rle", "plain"):
        _roundtrip(arr, "bool", codec)


@settings(max_examples=30, deadline=None)
@given(st.lists(st.floats(allow_nan=False), max_size=200))
def test_float_roundtrip(xs):
    arr = pa.array(xs, pa.float64())
    for codec in ("plain", "dict"):
        _roundtrip(arr, "f64", codec)


@settings(max_examples=40, deadline=None)
@given(st.lists(texty, min_size=1, max_size=150))
def test_auto_selection_always_roundtrips_sha256(xs):
    """Whatever the selector picks, the decoded values must be
    byte-identical (the BASELINE.json:15 invariant, per value)."""
    arr = pa.array(xs, pa.large_string())
    codec, ftab = choose_codec_arrow(arr, "str")
    row = pagecodec.encode_page(arr, "str", codec, ftab)
    out = pagecodec.decode_page(row["data"], row["params"], row["codec"],
                                "str", row["num_values"], row["null_count"])
    for a, b in zip(xs, out.to_pylist()):
        assert hashlib.sha256(a.encode()).digest() == \
            hashlib.sha256(b.encode()).digest()


@settings(max_examples=30, deadline=None)
@given(st.lists(I64, min_size=1, max_size=300))
def test_selection_never_loses_to_plain_badly(xs):
    """The chosen int codec's size must be <= PLAIN + small framing slack
    (auto-selection exists to not regress the baseline)."""
    arr = pa.array(xs, pa.int64())
    codec, _ = choose_codec_arrow(arr, "i64")
    row = pagecodec.encode_page(arr, "i64", codec)
    plain_row = pagecodec.encode_page(arr, "i64", "plain")
    assert row["enc_bytes"] <= plain_row["enc_bytes"] + 64


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(-10**6, 10**6).map(lambda i: i / 100.0)
                | st.sampled_from([0.0, -0.0, 1e300, -1e-300]),
                max_size=300))
def test_float_roundtrip_dfloat_and_plain(xs):
    arr = pa.array(xs, pa.float64())
    for codec in ("plain", "dfloat", "dict"):
        row = pagecodec.encode_page(arr, "f64", codec)
        out = pagecodec.decode_page(row["data"], row["params"], row["codec"],
                                    row["type"], row["num_values"],
                                    row["null_count"])
        import numpy as np
        a = np.asarray(out.to_pylist(), dtype=np.float64)
        b = np.asarray(xs, dtype=np.float64)
        # BIT equality: -0.0 vs 0.0 and extreme magnitudes must survive
        assert a.view(np.int64).tolist() == b.view(np.int64).tolist(), codec


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=-(2**63), max_value=2**63 - 1),
                max_size=300),
       st.sampled_from(["f32", "f64"]))
def test_bss_roundtrip_arbitrary_bit_patterns(bits, tag):
    """bss over ARBITRARY float bit patterns (ints reinterpreted as
    floats): every NaN payload, subnormal, inf, and -0.0 the bit space
    can express must survive bit-identically — with and without the E9
    zstd wrapper."""
    npdt = np.float32 if tag == "f32" else np.float64
    idt = np.int32 if tag == "f32" else np.int64
    v = np.array(bits, dtype=np.int64).astype(idt).view(npdt)
    arr = pa.array(v, pa.float32() if tag == "f32" else pa.float64())
    for block in (None, "zstd"):
        row = pagecodec.encode_page(arr, tag, "bss", block=block)
        out = pagecodec.decode_page(row["data"], row["params"],
                                    row["codec"], tag, row["num_values"],
                                    row["null_count"])
        got = np.asarray(out.to_numpy(zero_copy_only=False), dtype=npdt)
        assert np.array_equal(got.view(idt), v.view(idt))
