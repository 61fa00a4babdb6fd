"""Parquet DELTA-family format grammars (codecs/deltafmt.py) + their
cross-reader conformance through interop.py (v2 data pages, both
directions vs pyarrow) — SURVEY.md §5.2 item 1, round-4 extension.

Unit layer: DBP/DLBA/DBA roundtrips through OUR encode+decode at the
grammar's edge shapes (empty, single value, exact block/miniblock
boundaries, wrapping extremes).  Conformance layer: our v2-page files
read by pyarrow; pyarrow-written DELTA/BSS files (v1 AND v2 pages) read
by our kernels.
"""
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cpp_parquet_spark import interop
from cpp_parquet_spark.codecs import deltafmt


# --- DBP unit roundtrips ---------------------------------------------------

@pytest.mark.parametrize("n", [0, 1, 2, 31, 32, 33, 127, 128, 129,
                               255, 256, 257, 1000])
def test_dbp_roundtrip_boundaries(n):
    rng = np.random.default_rng(n)
    v = rng.integers(-10**12, 10**12, n)
    out, pos = deltafmt.dbp_decode(deltafmt.dbp_encode(v, 64), bits=64)
    np.testing.assert_array_equal(out, v.astype(np.int64))


def test_dbp_wrapping_extremes():
    # i64 min/max adjacent: the first difference overflows int64 — the
    # format requires WRAPPING arithmetic, so this must roundtrip
    v = np.array([np.iinfo(np.int64).min, np.iinfo(np.int64).max,
                  0, -1, np.iinfo(np.int64).min], np.int64)
    out, _ = deltafmt.dbp_decode(deltafmt.dbp_encode(v, 64), bits=64)
    np.testing.assert_array_equal(out, v)


def test_dbp_int32_width():
    v = np.array([np.iinfo(np.int32).min, np.iinfo(np.int32).max,
                  -7, 7, 0], np.int32)
    out, _ = deltafmt.dbp_decode(deltafmt.dbp_encode(v, 32), bits=32)
    assert out.dtype == np.int32
    np.testing.assert_array_equal(out, v)


def test_dbp_sorted_compresses():
    v = np.arange(10_000, dtype=np.int64) * 3 + 5
    enc = deltafmt.dbp_encode(v, 64)
    assert len(enc) < v.nbytes / 50          # constant deltas ~ free
    out, _ = deltafmt.dbp_decode(enc, bits=64)
    np.testing.assert_array_equal(out, v)


def test_dbp_stream_position_chains():
    # DLBA/DBA concatenate DBP streams back to back — the decoder's end
    # position must be exact
    a = np.arange(100, dtype=np.int32)
    b = np.array([9, -9, 99], np.int32)
    buf = deltafmt.dbp_encode(a, 32) + deltafmt.dbp_encode(b, 32)
    got_a, pos = deltafmt.dbp_decode(buf, 0, bits=32)
    got_b, end = deltafmt.dbp_decode(buf, pos, bits=32)
    np.testing.assert_array_equal(got_a, a)
    np.testing.assert_array_equal(got_b, b)
    assert end == len(buf)


# --- DLBA / DBA unit roundtrips --------------------------------------------

def _strings(n, seed=3):
    rng = np.random.default_rng(seed)
    pool = ["", "a", "é" * 40, "shared/prefix/path/deep/file.py",
            "shared/prefix/path/deep/file2.py", "zzz" * 100]
    return pa.array(rng.choice(pool, n).tolist(), pa.large_binary())


@pytest.mark.parametrize("n", [0, 1, 2, 129, 1000])
def test_dlba_roundtrip(n):
    a = _strings(n)
    got = deltafmt.dlba_decode(deltafmt.dlba_encode(a), n)
    assert got.equals(a)


@pytest.mark.parametrize("n", [0, 1, 2, 129, 1000])
def test_dba_roundtrip(n):
    # sort to make front-coding meaningful; decode must still be exact
    a = _strings(n).cast(pa.large_string()).sort() \
        .cast(pa.large_binary()) if n else _strings(n)
    got = deltafmt.dba_decode(deltafmt.dba_encode(a), n)
    assert got.equals(a)


def test_dba_long_shared_prefix_clamps():
    # shared prefix longer than the 256-byte compare cap: the prefix
    # length clamps and the suffix carries the rest — still bit-exact
    base = "p" * 500
    a = pa.array([base + "x", base + "y", base + "y2"], pa.large_binary())
    got = deltafmt.dba_decode(deltafmt.dba_encode(a), 3)
    assert got.equals(a)


def test_dba_sorted_beats_dlba():
    vals = sorted(f"repo/org_{i % 37}/pkg/module_{i}.py"
                  for i in range(5000))
    a = pa.array([v.encode() for v in vals], pa.large_binary())
    assert len(deltafmt.dba_encode(a)) < 0.6 * len(deltafmt.dlba_encode(a))


# --- conformance: our v2 pages -> pyarrow ----------------------------------

def _cols(n=3000, seed=11):
    rng = np.random.default_rng(seed)
    return {
        "i32_delta": pa.array(
            rng.integers(-2**31, 2**31 - 1, n).astype(np.int32)),
        "i64_delta": pa.array(np.cumsum(rng.integers(0, 999, n))
                              .astype(np.int64)),
        "s_dlba": pa.array([f"repo/path/file_{i // 7}_{i}.py"
                            for i in range(n)]),
        "s_dba": pa.array(sorted(f"org_{i % 13}/mod_{i}.go"
                                 for i in range(n))),
        "f64_bss": pa.array(rng.normal(size=n)),
        "f32_bss": pa.array(rng.normal(size=n).astype(np.float32)),
        "i64_opt": pa.array([None if i % 17 == 0 else i * 3
                             for i in range(n)], pa.int64()),
        "s_opt": pa.array([None if i % 11 == 0 else f"v{i}"
                           for i in range(n)]),
    }


_ENC = {"i32_delta": "delta", "i64_delta": "delta",
        "s_dlba": "delta_length", "s_dba": "delta_byte_array",
        "f64_bss": "byte_stream_split", "f32_bss": "byte_stream_split",
        "i64_opt": "delta", "s_opt": "delta_byte_array"}

_PA_ENC = {"i32_delta": "DELTA_BINARY_PACKED",
           "i64_delta": "DELTA_BINARY_PACKED",
           "s_dlba": "DELTA_LENGTH_BYTE_ARRAY",
           "s_dba": "DELTA_BYTE_ARRAY",
           "f64_bss": "BYTE_STREAM_SPLIT", "f32_bss": "BYTE_STREAM_SPLIT",
           "i64_opt": "DELTA_BINARY_PACKED", "s_opt": "DELTA_BYTE_ARRAY"}


def test_our_delta_v2_pages_read_by_pyarrow(tmp_path):
    cols = _cols()
    p = str(tmp_path / "ours_delta.parquet")
    interop.write_parquet(p, cols, encodings=_ENC)
    got = pq.read_table(p)
    # pyarrow must also report the encodings we claimed in the metadata
    md = pq.ParquetFile(p).metadata.row_group(0)
    encs = {md.column(i).path_in_schema: md.column(i).encodings
            for i in range(md.num_columns)}
    assert "DELTA_BINARY_PACKED" in encs["i32_delta"]
    assert "DELTA_BYTE_ARRAY" in encs["s_dba"]
    assert "BYTE_STREAM_SPLIT" in encs["f64_bss"]
    for name, arr in cols.items():
        g = got.column(name).combine_chunks()
        want = arr.cast(g.type) if g.type != arr.type else arr
        assert g.equals(want), name


# --- conformance: pyarrow DELTA/BSS files -> our kernels --------------------

@pytest.mark.parametrize("dpv", ["1.0", "2.0"])
def test_pyarrow_delta_pages_read_by_our_codecs(tmp_path, dpv):
    cols = _cols(seed=23)
    p = str(tmp_path / f"pa_{dpv}.parquet")
    pq.write_table(pa.table(cols), p, use_dictionary=False,
                   compression="NONE", version="2.6",
                   data_page_version=dpv, column_encoding=_PA_ENC)
    ours = interop.read_parquet_with_our_codecs(p)
    for name, arr in cols.items():
        got = ours[name]
        want = arr.cast(got.type) if got.type != arr.type else arr
        assert got.equals(want), (dpv, name)


def test_pyarrow_v2_dictionary_pages_read_by_our_codecs(tmp_path):
    cols = _cols(seed=31)
    p = str(tmp_path / "pa_dict_v2.parquet")
    pq.write_table(pa.table(cols), p, compression="NONE",
                   version="2.6", data_page_version="2.0")
    ours = interop.read_parquet_with_our_codecs(p)
    for name, arr in cols.items():
        got = ours[name]
        want = arr.cast(got.type) if got.type != arr.type else arr
        assert got.equals(want), name


def test_writer_rejects_bad_encoding_type(tmp_path):
    p = str(tmp_path / "bad.parquet")
    with pytest.raises(ValueError, match="int-only"):
        interop.write_parquet(p, {"s": pa.array(["a", "b"])},
                              encodings={"s": "delta"})
    with pytest.raises(ValueError, match="float-only"):
        interop.write_parquet(p, {"i": pa.array([1, 2])},
                              encodings={"i": "byte_stream_split"})
    with pytest.raises(ValueError, match="both"):
        interop.write_parquet(p, {"i": pa.array([1, 2])},
                              dictionary={"i"}, encodings={"i": "delta"})
