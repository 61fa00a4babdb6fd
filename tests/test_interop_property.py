"""Property-based fuzz of the Parquet interop surface.

Random values, null patterns, page/row-group geometries and codecs
through both directions: our writer -> pyarrow reader, and pyarrow
writer -> our kernels. Deterministic (hypothesis derandomized per
settings profile in conftest or default seed)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings, strategies as st

from cpp_parquet_spark import interop

_text = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FF),
    max_size=24)


@st.composite
def _columns(draw):
    n = draw(st.integers(min_value=1, max_value=120))
    cols = {}
    cols["i"] = pa.array(
        draw(st.lists(st.one_of(st.none(),
                                st.integers(-2**62, 2**62)),
                      min_size=n, max_size=n)), pa.int64())
    cols["s"] = pa.array(
        draw(st.lists(st.one_of(st.none(), _text),
                      min_size=n, max_size=n)), pa.string())
    cols["f"] = pa.array(
        draw(st.lists(st.one_of(st.none(),
                                st.floats(allow_nan=False, width=64)),
                      min_size=n, max_size=n)), pa.float64())
    cols["l"] = pa.array(
        draw(st.lists(st.one_of(st.none(),
                                st.lists(st.one_of(st.none(),
                                                   st.integers(-1000, 1000)),
                                         max_size=5)),
                      min_size=n, max_size=n)), pa.list_(pa.int64()))
    cols["st"] = pa.array(
        draw(st.lists(st.one_of(
            st.none(),
            st.fixed_dictionaries({"u": st.one_of(st.none(),
                                                  st.integers(-99, 99)),
                                   "w": st.one_of(st.none(), _text)})),
            min_size=n, max_size=n)),
        pa.struct([("u", pa.int64()), ("w", pa.string())]))
    cols["m"] = pa.array(
        draw(st.lists(st.one_of(
            st.none(),
            st.dictionaries(_text.filter(bool),
                            st.one_of(st.none(), st.integers(-99, 99)),
                            max_size=4)),
            min_size=n, max_size=n)),
        pa.map_(pa.string(), pa.int64()))
    cols["t"] = pa.array(
        draw(st.lists(st.one_of(st.none(),
                                st.integers(-2**52, 2**52)),
                      min_size=n, max_size=n)),
        pa.int64()).cast(pa.timestamp("us"))
    cols["lb"] = pa.array(
        draw(st.lists(st.one_of(st.none(),
                                st.lists(st.one_of(st.none(),
                                                   st.booleans()),
                                         max_size=6)),
                      min_size=n, max_size=n)),
        pa.list_(pa.bool_()))
    cols["ls"] = pa.array(
        draw(st.lists(st.one_of(
            st.none(),
            st.lists(st.one_of(
                st.none(),
                st.fixed_dictionaries(
                    {"a": st.one_of(st.none(), st.integers(-99, 99)),
                     "b": st.one_of(st.none(), _text)})),
                max_size=4)),
            min_size=n, max_size=n)),
        pa.list_(pa.struct([("a", pa.int64()), ("b", pa.string())])))
    return cols


@settings(max_examples=40, deadline=None)
@given(cols=_columns(),
       comp=st.sampled_from([None, "zstd", "snappy"]),
       page_rows=st.sampled_from([None, 7, 32]),
       rg_rows=st.sampled_from([None, 13, 50]),
       senc=st.sampled_from(["plain", "delta_length"]))
def test_our_writer_pyarrow_reads_fuzz(tmp_path_factory, cols, comp,
                                       page_rows, rg_rows, senc):
    p = str(tmp_path_factory.mktemp("fz") / "f.parquet")
    interop.write_parquet(p, cols, compression=comp, page_rows=page_rows,
                          row_group_rows=rg_rows, page_index=True,
                          statistics=True, string_encoding=senc)
    t = pq.read_table(p)
    for name, arr in cols.items():
        got = t.column(name).combine_chunks().cast(arr.type)
        assert got.equals(arr), (name, arr.to_pylist()[:5],
                                 got.to_pylist()[:5])


@settings(max_examples=30, deadline=None)
@given(cols=_columns(),
       comp=st.sampled_from(["NONE", "zstd", "snappy"]),
       dps=st.sampled_from([256, 4096]),
       rgs=st.sampled_from([16, 10**6]),
       ver=st.sampled_from(["1.0", "2.0"]),
       ud=st.booleans())
def test_pyarrow_writer_our_kernels_fuzz(tmp_path_factory, cols, comp,
                                         dps, rgs, ver, ud):
    p = str(tmp_path_factory.mktemp("fz2") / "f.parquet")
    pq.write_table(pa.table(cols), p, compression=comp,
                   data_page_size=dps, row_group_size=rgs,
                   data_page_version=ver, use_dictionary=ud)
    out = interop.read_parquet_with_our_codecs(p)
    for name, arr in cols.items():
        got = out[name].cast(arr.type)
        assert got.equals(arr), (name, arr.to_pylist()[:5],
                                 got.to_pylist()[:5])


def test_zero_row_files_both_directions(tmp_path):
    empty = {"i": pa.array([], pa.int64()), "s": pa.array([], pa.string()),
             "l": pa.array([], pa.list_(pa.int64()))}
    p = str(tmp_path / "e.parquet")
    interop.write_parquet(p, empty, page_index=True, statistics=True)
    assert pq.read_table(p).num_rows == 0
    out = interop.read_parquet_with_our_codecs(p)
    assert all(len(v) == 0 for v in out.values())
    p2 = str(tmp_path / "e2.parquet")
    pq.write_table(pa.table(empty), p2, compression="NONE")
    out2 = interop.read_parquet_with_our_codecs(p2)
    assert all(len(v) == 0 for v in out2.values())


def test_required_vs_optional_is_a_whole_column_property(tmp_path):
    # regression (found by the fuzz): a null-free FIRST row group must
    # not mark the column REQUIRED when a later row group has nulls —
    # the schema is emitted once, from the first group
    f = pa.array([0.0, 0.0, 0.0] + [None] * 50, pa.float64())
    i = pa.array([None] * 53, pa.int64())
    p = str(tmp_path / "sched.parquet")
    interop.write_parquet(p, {"f": f, "i": i}, row_group_rows=50,
                          page_index=True, statistics=True)
    t = pq.read_table(p)
    assert t.column("f").combine_chunks().cast(f.type).equals(f)
    assert t.column("i").combine_chunks().cast(i.type).equals(i)
    out = interop.read_parquet_with_our_codecs(p)
    assert out["f"].cast(f.type).equals(f)
    assert out["i"].cast(i.type).equals(i)


def test_corrupt_inputs_fail_cleanly(tmp_path):
    import pytest
    p = str(tmp_path / "x.parquet")
    good = {"i": pa.array([1, 2, 3], pa.int64())}
    interop.write_parquet(p, good)
    raw = open(p, "rb").read()
    # not a parquet file
    bad1 = str(tmp_path / "bad1.parquet")
    open(bad1, "wb").write(b"NOPE" + raw[4:])
    with pytest.raises(AssertionError):
        interop.read_parquet_with_our_codecs(bad1)
    # truncated footer
    bad2 = str(tmp_path / "bad2.parquet")
    open(bad2, "wb").write(raw[: len(raw) // 2])
    with pytest.raises(Exception):
        interop.read_parquet_with_our_codecs(bad2)
    # flipped byte inside the data page region: either a decode error
    # or wrong values, never a hang/silent partial
    bad3 = str(tmp_path / "bad3.parquet")
    b = bytearray(raw)
    b[10] ^= 0xFF
    open(bad3, "wb").write(bytes(b))
    try:
        out = interop.read_parquet_with_our_codecs(bad3)
        assert not out["i"].cast(pa.int64()).equals(good["i"])
    except Exception:
        pass
