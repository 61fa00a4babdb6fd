"""Page framing (S2/E5): every (tag, codec) combination round-trips,
including null masks via definition-level runs."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from cpp_parquet_spark.codecs import pagecodec as pc


def roundtrip(s: pd.Series, tag: str, codec: str):
    row = pc.encode_page(s, tag, codec)
    arr = pc.decode_page(row["data"], row["params"], row["codec"], row["type"],
                         row["num_values"], row["null_count"])
    return row, arr


RNG = np.random.default_rng(42)

CASES = [
    ("i64", "plain", pd.Series(RNG.integers(-1000, 1000, 500))),
    ("i64", "for", pd.Series(RNG.integers(10**9, 10**9 + 5000, 500))),
    ("i64", "rle", pd.Series(np.repeat(RNG.integers(0, 5, 20), 25))),
    ("i64", "bitpack", pd.Series(RNG.integers(0, 100, 500))),
    ("i64", "dict", pd.Series(RNG.choice([7, 11, 13], 500))),
    ("i32", "for", pd.Series(RNG.integers(-50, 50, 500).astype(np.int32))),
    ("f64", "plain", pd.Series(RNG.standard_normal(500))),
    ("f64", "dict", pd.Series(RNG.choice([1.5, 2.5, -3.25], 500))),
    ("f32", "plain", pd.Series(RNG.standard_normal(500).astype(np.float32))),
    ("bool", "rle", pd.Series(RNG.random(500) < 0.3)),
    ("bool", "plain", pd.Series(RNG.random(500) < 0.5)),
    ("str", "plain", pd.Series([f"value-{i % 37}" for i in range(500)])),
    ("str", "dict", pd.Series([f"lang-{i % 5}" for i in range(500)])),
    ("str", "fsst", pd.Series(["def foo(): return bar + baz  # comment"] * 300
                              + [f"import module_{i}\n" * 3 for i in range(200)])),
    ("str", "prefix", pd.Series(sorted(
        f"src/pkg{i % 9}/mod{i % 31}/File{i}.java" for i in range(500)))),
    ("bin", "prefix", pd.Series(sorted(
        b"k/" + bytes([i % 251, 255, i % 7]) for i in range(500)))),
    ("ts", "plain", pd.Series(pd.date_range("2024-01-01", periods=500, freq="h"))),
    ("ts", "for", pd.Series(pd.date_range("2024-01-01", periods=500, freq="s"))),
    ("ts", "dict", pd.Series(pd.to_datetime(["2024-01-01", "2024-06-01"]).repeat(250))),
]


@pytest.mark.parametrize("tag,codec,s", CASES, ids=[f"{t}-{c}" for t, c, _ in CASES])
def test_page_roundtrip(tag, codec, s):
    s = s.reset_index(drop=True)
    row, arr = roundtrip(s, tag, codec)
    assert row["num_values"] == len(s)
    assert row["null_count"] == 0
    expect = pa.Array.from_pandas(s)
    if tag == "ts":
        expect = expect.cast(pa.timestamp("us"))
    elif tag == "str":
        expect = expect.cast(pa.large_string())
    got = arr.cast(expect.type)
    assert got.equals(expect), f"{tag}/{codec} mismatch"


@pytest.mark.parametrize("tag,codec,s", [
    ("i64", "for", pd.Series([1, None, 3, None, 5], dtype="Int64")),
    ("i64", "plain", pd.Series([None] * 5, dtype="Int64")),
    ("f64", "plain", pd.Series([1.5, None, 2.5, None, None])),
    ("str", "dict", pd.Series(["a", None, "b", "a", None])),
    ("str", "fsst", pd.Series((["def f(): pass", None, "def g(): pass"] * 20))),
    ("str", "plain", pd.Series([None, "x", None, "", "yy"])),
], ids=["for-nulls", "all-null", "f64-nulls", "dict-nulls", "fsst-nulls", "plain-str-nulls"])
def test_page_roundtrip_with_nulls(tag, codec, s):
    s = s.reset_index(drop=True)
    row, arr = roundtrip(s, tag, codec)
    assert row["null_count"] == int(s.isna().sum())
    expect = pa.Array.from_pandas(s)
    if tag == "str":
        expect = expect.cast(pa.large_string())
    got = arr.cast(expect.type)
    assert got.equals(expect)


def test_def_levels_alternating_nulls():
    """Worst-case literal def-levels (FIXTURES.md B3 nullable_s)."""
    s = pd.Series([None if i % 2 else f"v{i}" for i in range(1000)])
    row, arr = roundtrip(s, "str", "dict")
    assert row["null_count"] == 500
    assert arr.null_count == 500
    assert arr.to_pylist() == s.where(s.notna(), None).tolist()


def test_raw_bytes_accounting():
    s = pd.Series(["abcd", "ef", ""])
    row = pc.encode_page(s, "str", "plain")
    assert row["raw_bytes"] == 6 + 12  # payload + 4B lengths
    assert row["enc_bytes"] == len(row["data"])


@pytest.mark.parametrize("blk", ["zlib", "zstd"])
@pytest.mark.parametrize("tag,codec,s", CASES,
                         ids=[f"blk-{t}-{c}" for t, c, _ in CASES])
def test_page_roundtrip_with_block(blk, tag, codec, s):
    """E9: outer block compression wraps every (tag, codec) page and
    round-trips (zlib + the preferred zstd)."""
    s = s.reset_index(drop=True)
    row = pc.encode_page(s, tag, codec, block=blk)
    assert row["enc_bytes"] == len(row["data"])
    arr = pc.decode_page(row["data"], row["params"], row["codec"],
                         row["type"], row["num_values"], row["null_count"])
    expect = pa.Array.from_pandas(s)
    if tag == "ts":
        expect = expect.cast(pa.timestamp("us"))
    elif tag == "str":
        expect = expect.cast(pa.large_string())
    assert arr.cast(expect.type).equals(expect), f"{tag}/{codec} blk mismatch"


@pytest.mark.parametrize("blk", ["zstd", "lz4", "snappy", "gzip"])
def test_block_arrow_codecs_roundtrip_and_ulen(blk):
    """Non-zlib E9 codecs store ulen (Arrow decompress needs the output
    size) and round-trip byte-identically."""
    import json
    s = pd.Series(["def f(x):\n    return x + 1\n" * 30] * 100)
    row = pc.encode_page(s, "str", "plain", block=blk)
    p = json.loads(row["params"])
    assert p.get("blk") == blk
    assert p.get("ulen", 0) > row["enc_bytes"]  # it compressed
    arr = pc.decode_page(row["data"], row["params"], row["codec"],
                         row["type"], row["num_values"], row["null_count"])
    assert arr.cast(pa.large_string()).to_pylist() == s.tolist()


def test_block_unknown_codec_rejected():
    s = pd.Series(["x" * 200])
    with pytest.raises(ValueError, match="unsupported block codec"):
        pc.encode_page(s, "str", "plain", block="lzma")


def test_block_zlib_only_kept_when_smaller():
    import json
    # highly repetitive plain text: zlib wins, blk marker present
    s = pd.Series(["aaaa bbbb cccc " * 40] * 200)
    row = pc.encode_page(s, "str", "plain", block="zlib")
    assert json.loads(row["params"]).get("blk") == "zlib"
    base = pc.encode_page(s, "str", "plain")
    assert row["enc_bytes"] < base["enc_bytes"]
    # incompressible bytes: zlib would grow the page -> marker absent
    rng = np.random.default_rng(7)
    blob = pd.Series([rng.bytes(4096)])
    row2 = pc.encode_page(blob, "bin", "plain", block="zlib")
    assert "blk" not in json.loads(row2["params"])


@pytest.mark.parametrize("tag,codec,s", CASES,
                         ids=[f"crc-{t}-{c}" for t, c, _ in CASES])
def test_page_crc_roundtrip_and_corruption(tag, codec, s):
    """Optional page CRC (parquet PageHeader.crc analogue): clean pages
    verify + round-trip; any flipped byte raises PageCorruptError."""
    s = s.reset_index(drop=True)
    row = pc.encode_page(s, tag, codec, crc=True)
    import json
    assert isinstance(json.loads(row["params"])["crc"], int)
    arr = pc.decode_page(row["data"], row["params"], row["codec"],
                         row["type"], row["num_values"], row["null_count"])
    expect = pa.Array.from_pandas(s)
    if tag == "ts":
        expect = expect.cast(pa.timestamp("us"))
    elif tag == "str":
        expect = expect.cast(pa.large_string())
    assert arr.cast(expect.type).equals(expect)
    if len(row["data"]) == 0:
        return
    bad = bytearray(row["data"])
    bad[len(bad) // 2] ^= 0x5A
    with pytest.raises(pc.PageCorruptError):
        pc.decode_page(bytes(bad), row["params"], row["codec"],
                       row["type"], row["num_values"], row["null_count"])


def test_page_crc_composes_with_block_zlib():
    s = pd.Series(["aaaa bbbb cccc " * 40] * 200)
    row = pc.encode_page(s, "str", "plain", block="zlib", crc=True)
    arr = pc.decode_page(row["data"], row["params"], row["codec"],
                         row["type"], row["num_values"], row["null_count"])
    assert arr.cast(pa.large_string()).to_pylist() == s.tolist()
    bad = bytearray(row["data"])
    bad[0] ^= 0xFF
    with pytest.raises(pc.PageCorruptError):
        pc.decode_page(bytes(bad), row["params"], row["codec"],
                       row["type"], row["num_values"], row["null_count"])


# --- BYTE_STREAM_SPLIT (bss / listb, parquet.thrift:620-630) ------------

def _bits(a: np.ndarray) -> np.ndarray:
    w = a.dtype.itemsize
    return a.view(np.int32 if w == 4 else np.int64)


@pytest.mark.parametrize("tag", ["f32", "f64"])
def test_bss_bit_exact_specials(tag):
    """bss is a byte permutation: NaN payloads, -0.0, infinities and
    subnormals must survive BIT-identically (== would hide -0.0/NaN)."""
    dt = np.float32 if tag == "f32" else np.float64
    sub = np.finfo(dt).smallest_subnormal
    v = np.array([0.0, -0.0, np.inf, -np.inf, np.nan, -np.nan,
                  sub, -sub, 1.5, -2.75e30], dtype=dt)
    # a NaN with a non-default payload
    v[5] = np.array([0x7FC00123 if tag == "f32" else 0x7FF8000000000123],
                    dtype=np.int32 if tag == "f32" else np.int64
                    ).view(dt)[0]
    # Arrow entry (the engine's real mapInArrow path): NaN is a VALUE
    # there — the pandas Series entry would coerce NaN to null
    s = pa.array(v, type=pa.float32() if tag == "f32" else pa.float64())
    row = pc.encode_page(s, tag, "bss")
    assert row["null_count"] == 0
    arr = pc.decode_page(row["data"], row["params"], row["codec"],
                         row["type"], row["num_values"], row["null_count"])
    got = np.asarray(arr.to_numpy(zero_copy_only=False), dtype=dt)
    assert np.array_equal(_bits(got), _bits(v))


@pytest.mark.parametrize("tag", ["f32", "f64"])
def test_bss_roundtrip_with_nulls_and_block(tag):
    dt = np.float32 if tag == "f32" else np.float64
    base = (1000.0 + RNG.standard_normal(500)).astype(dt)
    s = pd.Series(base).mask(pd.Series(RNG.random(500) < 0.2))
    row = pc.encode_page(s, tag, "bss", block="zstd")
    assert row["null_count"] == int(s.isna().sum())
    arr = pc.decode_page(row["data"], row["params"], row["codec"],
                         row["type"], row["num_values"], row["null_count"])
    expect = pa.Array.from_pandas(s).cast(
        pa.float32() if tag == "f32" else pa.float64())
    assert arr.cast(expect.type).equals(expect)


def test_bss_empty_and_single():
    for n in (0, 1):
        s = pd.Series(np.arange(n, dtype=np.float64) + 0.5)
        row = pc.encode_page(s, "f64", "bss")
        arr = pc.decode_page(row["data"], row["params"], row["codec"],
                             row["type"], row["num_values"],
                             row["null_count"])
        assert arr.to_pylist() == s.tolist()


def test_bss_blocks_compress_better_than_plain():
    """The reason bss exists: similar-magnitude floats share exponent/sign
    bytes, so grouping byte planes lets the block codec see the runs."""
    v = (12345.0 + RNG.standard_normal(8192)).astype(np.float64)
    s = pd.Series(v)
    plain_z = pc.encode_page(s, "f64", "plain", block="zstd")
    bss_z = pc.encode_page(s, "f64", "bss", block="zstd")
    assert bss_z["enc_bytes"] < plain_z["enc_bytes"]


@pytest.mark.parametrize("tag", ["arrf32", "arrf64"])
def test_listb_roundtrip_bit_exact(tag):
    dt = np.float32 if tag == "arrf32" else np.float64
    pdt = pa.float32() if tag == "arrf32" else pa.float64()
    rows = [((100.0 + RNG.standard_normal(16)).astype(dt)).tolist()
            for _ in range(64)]
    rows[3] = []                     # empty vector
    rows[7] = [float("nan"), float("-inf"), -0.0]
    arr = pa.array(rows, type=pa.list_(pdt))
    row = pc.encode_page(arr, tag, "listb", block="zstd")
    got = pc.decode_page(row["data"], row["params"], row["codec"],
                         row["type"], row["num_values"], row["null_count"])
    gf = np.asarray(got.flatten().to_numpy(zero_copy_only=False), dtype=dt)
    ef = np.asarray(arr.flatten().to_numpy(zero_copy_only=False), dtype=dt)
    assert np.array_equal(_bits(gf), _bits(ef))
    assert got.offsets.to_pylist() == [0] + list(
        np.cumsum([len(r) for r in rows]))


def test_listb_smaller_than_listf_under_block():
    dt = np.float32
    rows = [((3.0 + RNG.standard_normal(64)).astype(dt)).tolist()
            for _ in range(256)]
    arr = pa.array(rows, type=pa.list_(pa.float32()))
    f = pc.encode_page(arr, "arrf32", "listf", block="zstd")
    b = pc.encode_page(arr, "arrf32", "listb", block="zstd")
    assert b["enc_bytes"] < f["enc_bytes"]


def test_float_selection_prefers_bss_only_under_block():
    from cpp_parquet_spark.select import choose_codec_arrow
    v = pa.array((7.0 + RNG.standard_normal(4096)).astype(np.float64))
    assert choose_codec_arrow(v, "f64")[0] == "plain"
    assert choose_codec_arrow(v, "f64", block="zstd")[0] == "bss"
    emb = pa.array([[1.0, 2.0], [3.5]], type=pa.list_(pa.float32()))
    assert choose_codec_arrow(emb, "arrf32")[0] == "listf"
    assert choose_codec_arrow(emb, "arrf32", block="zstd")[0] == "listb"
    # decimal-like floats still win dfloat even under a block codec
    # (+10 offset: rounding tiny negatives yields -0.0, which correctly
    # disqualifies dfloat — int64 storage would drop the sign)
    dec = pa.array(np.round((10 + RNG.standard_normal(4096)) * 100) / 100)
    assert choose_codec_arrow(dec, "f64", block="zstd")[0] == "dfloat"


# --- listi: array<int> composite (int8-quantized vectors, token ids) ----

@pytest.mark.parametrize("tag,elem,lo,hi", [
    ("arri8", pa.int8(), -128, 127),
    ("arri16", pa.int16(), -(1 << 15), (1 << 15) - 1),
    ("arri32", pa.int32(), -(1 << 31), (1 << 31) - 1),
    ("arri64", pa.int64(), -(1 << 62), (1 << 62) - 1),
])
def test_listi_roundtrip(tag, elem, lo, hi):
    rows = [RNG.integers(lo, hi, size=RNG.integers(0, 24),
                         dtype=np.int64).tolist() for _ in range(128)]
    rows[0] = []                              # leading empty
    rows[5] = [lo, hi]                        # extremes
    arr = pa.array(rows, type=pa.list_(elem))
    row = pc.encode_page(arr, tag, "listi")
    got = pc.decode_page(row["data"], row["params"], row["codec"],
                         row["type"], row["num_values"], row["null_count"])
    assert got.cast(pa.list_(elem)).to_pylist() == rows


def test_listi_nulls_and_block():
    rows = [[1, -2, 3], None, [], [127, -128], None, [0]]
    arr = pa.array(rows, type=pa.list_(pa.int8()))
    row = pc.encode_page(arr, "arri8", "listi", block="zstd")
    assert row["null_count"] == 2
    got = pc.decode_page(row["data"], row["params"], row["codec"],
                         row["type"], row["num_values"], row["null_count"])
    assert got.cast(pa.list_(pa.int8())).to_pylist() == rows


def test_listi_int8_packs_below_plain_width():
    """FOR bit-packing stores int8-ranged children at <= 8 bits/value:
    a quantized int32 vector column shrinks ~4x vs its plain width."""
    rows = [RNG.integers(-127, 128, 64, dtype=np.int64).tolist()
            for _ in range(256)]
    arr = pa.array(rows, type=pa.list_(pa.int32()))
    row = pc.encode_page(arr, "arri32", "listi")
    assert row["enc_bytes"] < row["raw_bytes"] / 3
    got = pc.decode_page(row["data"], row["params"], row["codec"],
                         row["type"], row["num_values"], row["null_count"])
    assert got.cast(pa.list_(pa.int32())).to_pylist() == rows


def test_arri_selection_and_tags():
    from pyspark.sql import types as T
    from cpp_parquet_spark.select import choose_codec_arrow
    assert pc.spark_type_tag(T.ArrayType(T.IntegerType())) == "arri32"
    assert pc.spark_type_tag(T.ArrayType(T.ByteType())) == "arri8"
    assert pc.spark_type_tag(T.ArrayType(T.StringType())) == "arrs"
    assert pc.spark_type_tag(T.ArrayType(T.ArrayType(T.IntegerType()))) is None
    assert pc.spark_type_for("arri16") == T.ArrayType(T.ShortType())
    arr = pa.array([[1, 2], [3]], type=pa.list_(pa.int32()))
    assert choose_codec_arrow(arr, "arri32")[0] == "listi"
    assert choose_codec_arrow(arr, "arri32", block="zstd")[0] == "listi"
