"""FSST pair-table decode: identity with the single-code path and with
the original values across stream shapes the pair kernel special-cases —
odd-length streams (ESC pad), string boundaries at odd stream positions,
OOV escapes (fallback path), empty strings, and the memo cache."""

import numpy as np
import pyarrow as pa
import pytest

from cpp_parquet_spark.codecs import fsst


def _roundtrip(vals, table=None):
    arr = pa.array(vals, type=pa.large_string())
    enc, params = fsst.encode(arr, table)
    out = fsst.decode(enc, params, len(vals))
    assert out.cast(pa.large_string()).equals(arr)
    # the explicit single-code path must agree bit-for-bit
    single = fsst._decode_single(enc, params, len(vals))
    assert single.cast(pa.large_string()).equals(arr)
    return enc, params


def test_pair_decode_prose():
    vals = [f"the quick brown fox jumps over the lazy dog {i}" * 3
            for i in range(200)]
    _roundtrip(vals)


def test_pair_decode_odd_stream_and_boundaries():
    # lots of 1-byte and odd-length strings force odd cut positions
    vals = ["a", "bb", "ccc", "", "dddd", "e"] * 100
    _roundtrip(vals)


def test_pair_decode_oov_falls_back():
    # table trained on ascii; encode values with bytes outside the
    # training byte set -> ESC escapes -> nesc > 0 -> single-code path
    table = fsst.train(pa.array(["hello world the fox " * 50]))
    assert table is not None
    vals = ["hello\x00world", "\xff\xfe", "the fox", ""]
    enc, params = fsst.encode(pa.array(vals, type=pa.large_string()), table)
    assert params.get("nesc", 0) > 0
    out = fsst.decode(enc, params, len(vals))
    assert out.cast(pa.large_string()).to_pylist() == vals


def test_pair_decode_no_esc_flag_skips_scan():
    vals = ["alpha beta gamma delta " * 8] * 64
    enc, params = _roundtrip(vals)
    assert params.get("nesc") == 0


def test_pair_decode_missing_nesc_param_still_correct():
    # pages written before the nesc flag carry no param: decode must
    # scan and still produce identical output
    vals = ["some text with repetition " * 4] * 32
    arr = pa.array(vals, type=pa.large_string())
    enc, params = fsst.encode(arr)
    out = fsst.decode(enc, {}, len(vals))
    assert out.cast(pa.large_string()).equals(arr)


def test_pair_table_cache_bounded():
    fsst._PAIR_CACHE.clear()
    for i in range(12):
        vals = [f"corpus {i} token{j} " * 6 for j in range(50)]
        _roundtrip(vals)
    assert len(fsst._PAIR_CACHE) <= fsst._PAIR_CACHE_MAX
