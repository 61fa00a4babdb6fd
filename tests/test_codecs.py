"""PLAIN (E1), dictionary (E2), FOR (E6), bit-pack (E4) roundtrips and
edge cases (overflow guards, empty/unicode strings, dict-vs-plain sizes)."""

import numpy as np
import pyarrow as pa
import pytest

from cpp_parquet_spark.codecs import bitpack, dictionary, plain
from cpp_parquet_spark.codecs import pagecodec as pc
from cpp_parquet_spark.codecs import for_ as forc


def test_plain_fixed_roundtrip():
    rng = np.random.default_rng(1)
    for tag, dt in [("i64", np.int64), ("i32", np.int32),
                    ("f64", np.float64), ("f32", np.float32)]:
        v = rng.standard_normal(1000).astype(dt) if "f" in tag else \
            rng.integers(-2**31, 2**31, 1000).astype(dt)
        data, p = plain.encode(v, tag)
        got = plain.decode(data, p, 1000, tag)
        assert np.array_equal(got, v)


def test_plain_bool_roundtrip():
    v = np.array([True, False, True, True, False] * 41)  # 205 values
    data, _ = plain.encode(v, "bool")
    assert len(data) == (205 + 7) // 8
    assert np.array_equal(plain.decode(data, {}, 205, "bool"), v)


@pytest.mark.parametrize("vals", [
    ["hello", "world", "", "a", "x" * 10000, "héllo wörld — ünïcode ≠ ascii",
     "\x00\x01 binary-ish \xff", "tab\tnewline\n"],
    [""] * 50,
    ["dup"] * 100 + ["other"] * 3,
])
def test_plain_strings_roundtrip(vals):
    data, p = plain.encode(vals, "str")
    got = plain.decode(data, p, len(vals), "str")
    assert got.to_pylist() == vals


def test_plain_string_size_matches_parquet_plain():
    """[u32 len][bytes] per value — same total as Parquet PLAIN BYTE_ARRAY
    (parquet.thrift:566-576), just de-interleaved."""
    vals = ["abc", "de", ""]
    data, _ = plain.encode(vals, "str")
    assert len(data) == 4 * 3 + 5


def test_for_roundtrip_and_size():
    v = np.arange(1000, 2000, dtype=np.int64)
    data, p = forc.encode(v)
    assert p["frame"] == 1000 and p["bw"] == 10
    assert len(data) == (1000 * 10 + 7) // 8
    assert np.array_equal(forc.decode(data, p, 1000), v)


def test_for_int64_extremes():
    v = np.array([np.iinfo(np.int64).min, 0, np.iinfo(np.int64).max], dtype=np.int64)
    data, p = forc.encode(v)
    assert p["bw"] == 64
    assert np.array_equal(forc.decode(data, p, 3), v)


def test_for_negative_values():
    v = np.array([-500, -499, -1, -500, -250], dtype=np.int64)
    data, p = forc.encode(v)
    assert p["frame"] == -500
    assert np.array_equal(forc.decode(data, p, 5), v)


def test_for_constant_column():
    v = np.full(10000, 42, dtype=np.int64)
    data, p = forc.encode(v)
    assert p["bw"] == 0 and data == b""
    assert np.array_equal(forc.decode(data, p, 10000), v)


def test_bitpack_codec():
    v = np.array([0, 1, 2, 3, 7, 6, 5], dtype=np.uint64)
    data, p = bitpack.encode(v)
    assert p["bw"] == 3
    assert np.array_equal(bitpack.decode(data, p, 7), v)


@pytest.mark.parametrize("tag,vals", [
    ("str", ["en", "fr", "en", "en", "zh", "fr"] * 100),
    ("str", ["only"]),
    ("i64", np.array([7, 7, 7, 9, 7] * 50, dtype=np.int64)),
    ("f64", np.array([1.5, 2.5, 1.5, np.inf, -0.0] * 20)),
])
def test_dict_roundtrip(tag, vals):
    data, p = dictionary.encode(vals, tag)
    got = dictionary.decode(data, p, len(vals), tag)
    if tag == "str":
        assert got.to_pylist() == list(vals)
    else:
        assert np.array_equal(np.asarray(got), np.asarray(vals))


def test_dict_beats_plain_on_low_cardinality():
    vals = ["GET", "POST", "GET", "GET"] * 2500
    d, _ = dictionary.encode(vals, "str")
    pl, _ = plain.encode(vals, "str")
    assert len(d) < len(pl) / 10


def test_dict_indices_are_rle_compressed():
    """Runs of the same value should collapse via the hybrid encoding."""
    vals = ["a"] * 10000 + ["b"] * 10000
    d, _ = dictionary.encode(vals, "str")
    assert len(d) < 50  # two dict entries + two repeated runs


# ---------------------------------------------------------------------------
# prefix (front coding / DELTA_BYTE_ARRAY analogue)
# ---------------------------------------------------------------------------

def test_prefix_roundtrip_sorted_paths():
    import pyarrow as pa
    from cpp_parquet_spark.codecs import prefix
    paths = sorted(f"src/org{i % 7}/mod{i % 41}/File{i}.java"
                   for i in range(3000))
    arr = pa.array(paths, pa.large_string())
    body, params = prefix.encode(arr)
    assert prefix.decode(body, params, len(arr)).equals(arr)
    # sorted paths must shrink vs raw
    assert len(body) < sum(len(p) for p in paths)


@pytest.mark.parametrize("vals", [
    [], [""], ["", "", ""], ["a"] * 100, ["abc"],
    ["zz", "aa", "mm"] * 50,                     # unsorted still correct
    ["x" * 500, "x" * 500 + "y", "x" * 499],     # prefix > CAP clamps
    ["café/a", "café/b", "naïve"],  # multibyte utf-8
])
def test_prefix_roundtrip_edges(vals):
    import pyarrow as pa
    from cpp_parquet_spark.codecs import prefix
    arr = pa.array(vals, pa.large_string())
    body, params = prefix.encode(arr)
    assert prefix.decode(body, params, len(arr)).equals(arr)


def test_prefix_binary_tag():
    import pyarrow as pa
    from cpp_parquet_spark.codecs import prefix
    arr = pa.array([b"\xff\x00ab", b"\xff\x00ac", b"zz"], pa.large_binary())
    body, params = prefix.encode(arr)
    assert prefix.decode(body, params, 3, "bin").equals(arr)


def test_prefix_page_roundtrip_with_nulls():
    import pandas as pd
    from cpp_parquet_spark.codecs import pagecodec as pc
    s = pd.Series(["a/b/c1", None, "a/b/c2", "a/b/c3", None, "a/x"])
    row = pc.encode_page(s, "str", "prefix")
    out = pc.decode_page(row["data"], row["params"], row["codec"],
                         row["type"], row["num_values"], row["null_count"])
    assert out.to_pylist() == s.where(s.notna(), None).tolist()


def test_prefix_selected_for_sorted_keys():
    """Selection picks prefix when front coding beats dict/FSST: long
    shared prefixes + full-alphabet random tails (raw digest bytes give
    FSST nothing to symbolize, unlike hex tails where FSST's 16-char
    digrams legitimately win the size comparison)."""
    import pyarrow as pa
    import hashlib
    from cpp_parquet_spark.select import choose_string_codec
    keys = sorted(b"tenant/0042/shard/0007/key/"
                  + hashlib.sha256(str(i).encode()).digest()
                  for i in range(4000))
    codec, tab = choose_string_codec(pa.array(keys, pa.large_binary()))
    assert codec == "prefix" and tab is None


def test_dict_of_fsst_cascade_on_pathlike_vocab():
    """Dict pages with a big internally-repetitive vocabulary (paths)
    FSST-encode the dictionary blob itself (params dv=fsst) — the
    two-level shape of Parquet's dictionary page under page compression,
    with the lightweight symbol table instead of a block codec."""
    import json

    import pyarrow as pa

    import cpp_parquet_spark.codecs.dictionary as d

    vocab = [f"src/main/java/com/example/mod_{i // 50}/Handler_{i}.java"
             for i in range(2000)]
    rows = [vocab[i % len(vocab)] for i in range(16000)]
    arr = pa.array(rows, type=pa.large_string())
    row = pc.encode_page(arr, "str", "dict")
    p = json.loads(row["params"])
    assert p.get("dv") == "fsst"
    out = pc.decode_page(row["data"], row["params"], "dict", "str",
                         row["num_values"], row["null_count"])
    assert out.to_pylist() == rows
    # must actually pay: re-encode with the cascade disabled and compare
    old = d.DICT_FSST_MIN
    d.DICT_FSST_MIN = 1 << 60
    try:
        base = pc.encode_page(arr, "str", "dict")
    finally:
        d.DICT_FSST_MIN = old
    assert row["enc_bytes"] < base["enc_bytes"] * 0.9
    # small vocabularies skip the cascade (table overhead won't amortize)
    small = pc.encode_page(pa.array(["a", "b", "c"] * 100,
                                    type=pa.large_string()), "str", "dict")
    assert "dv" not in json.loads(small["params"])


def test_dict_of_fsst_binary_and_nulls():
    import json

    import pyarrow as pa

    vocab = [("k/%06d/" % (i // 10)).encode() * 40 + b"%04d" % (i % 1000)
             for i in range(1500)]
    rows = [vocab[i % len(vocab)] if i % 7 else None for i in range(9000)]
    arr = pa.array(rows, type=pa.large_binary())
    row = pc.encode_page(arr, "bin", "dict")
    assert json.loads(row["params"]).get("dv") == "fsst"
    out = pc.decode_page(row["data"], row["params"], "dict", "bin",
                         row["num_values"], row["null_count"])
    assert out.to_pylist() == rows
