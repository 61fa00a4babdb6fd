"""Parquet LIST cross-reader conformance (Dremel repetition levels).

Both directions over the format's 3-level structure
``optional group (LIST) { repeated group list { optional element } }``:
our emitters write real .parquet pages with rep+def level streams that
pyarrow must read back exactly, and pyarrow-written list files (v1 and
v2 pages, dict and plain, multi-page) must decode exactly through our
rle/plain/dictionary kernels + `_reassemble_list`."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from cpp_parquet_spark import interop

INTS = pa.array([[1, 2, 3], None, [], [4], [5, None, 7], None, []],
                pa.list_(pa.int64()))
STRS = pa.array([["a", "bb"], [], None, ["ccc", "", "dd"], [None, "e"],
                 ["x"], ["y", "z"]], pa.list_(pa.string()))
FLAT = pa.array([10, None, 30, 40, 50, 60, 70], pa.int64())


def test_our_writer_pyarrow_reads_lists(tmp_path):
    p = str(tmp_path / "ours.parquet")
    interop.write_parquet(p, {"ints": INTS, "strs": STRS, "flat": FLAT})
    t = pq.read_table(p)
    assert t.column("ints").combine_chunks().cast(INTS.type).equals(INTS)
    assert t.column("strs").combine_chunks().cast(STRS.type).equals(STRS)
    assert t.column("flat").combine_chunks().cast(FLAT.type).equals(FLAT)


def test_our_writer_dict_list_leaf(tmp_path):
    p = str(tmp_path / "ours_dict.parquet")
    interop.write_parquet(p, {"strs": STRS}, dictionary={"strs"})
    t = pq.read_table(p)
    assert t.column("strs").combine_chunks().cast(STRS.type).equals(STRS)


@pytest.mark.parametrize("kw", [
    dict(use_dictionary=True),
    dict(use_dictionary=False),
    dict(use_dictionary=False, data_page_version="2.0"),
    dict(use_dictionary=True, data_page_version="2.0"),
    dict(use_dictionary=False, data_page_size=64),   # many pages/chunk
], ids=["dict", "plain", "v2", "v2dict", "multipage"])
def test_pyarrow_writer_our_kernels_read_lists(tmp_path, kw):
    p = str(tmp_path / "theirs.parquet")
    pq.write_table(pa.table({"ints": INTS, "strs": STRS, "flat": FLAT}),
                   p, compression="NONE", **kw)
    out = interop.read_parquet_with_our_codecs(p)
    assert out["ints"].cast(INTS.type).equals(INTS)
    assert out["strs"].cast(STRS.type).equals(STRS)
    assert out["flat"].cast(FLAT.type).equals(FLAT)


def test_list_levels_shred_shapes():
    rep, deflev, leaf, _ = interop._list_levels(INTS)
    # slots: 3 +1(null) +1(empty) +1 +3 +1(null) +1(empty) = 11
    assert rep.tolist() == [0, 1, 1, 0, 0, 0, 0, 1, 1, 0, 0]
    assert deflev.tolist() == [3, 3, 3, 0, 1, 3, 3, 2, 3, 0, 1]
    assert leaf.to_pylist() == [1, 2, 3, 4, 5, 7]


def test_roundtrip_ours_to_ours(tmp_path):
    p = str(tmp_path / "both.parquet")
    interop.write_parquet(p, {"ints": INTS, "strs": STRS})
    out = interop.read_parquet_with_our_codecs(p)
    assert out["ints"].cast(INTS.type).equals(INTS)
    assert out["strs"].cast(STRS.type).equals(STRS)


def test_large_random_lists_roundtrip(tmp_path):
    rng = np.random.RandomState(7)
    rows = []
    for _ in range(2000):
        r = rng.rand()
        if r < 0.05:
            rows.append(None)
        elif r < 0.15:
            rows.append([])
        else:
            n = rng.randint(1, 9)
            rows.append([None if rng.rand() < 0.1 else int(rng.randint(-1000, 1000))
                         for _ in range(n)])
    arr = pa.array(rows, pa.list_(pa.int64()))
    p = str(tmp_path / "rand.parquet")
    interop.write_parquet(p, {"v": arr})
    assert pq.read_table(p).column("v").combine_chunks() \
        .cast(arr.type).equals(arr)
    p2 = str(tmp_path / "rand2.parquet")
    pq.write_table(pa.table({"v": arr}), p2, compression="NONE",
                   data_page_size=4096)
    assert interop.read_parquet_with_our_codecs(p2)["v"] \
        .cast(arr.type).equals(arr)


@pytest.mark.parametrize("comp", ["snappy", "gzip", "zstd", "lz4_raw"])
def test_our_compressed_pages_pyarrow_reads(tmp_path, comp):
    p = str(tmp_path / f"c_{comp}.parquet")
    txt = pa.array([f"tok{i % 3} row {i} " * 4 for i in range(7)])
    interop.write_parquet(p, {"ints": INTS, "flat": FLAT, "txt": txt},
                          dictionary={"txt"}, compression=comp)
    t = pq.read_table(p)
    assert t.column("ints").combine_chunks().cast(INTS.type).equals(INTS)
    assert t.column("flat").combine_chunks().cast(FLAT.type).equals(FLAT)
    assert t.column("txt").combine_chunks().cast(txt.type).equals(txt)


def test_our_compressed_v2_delta_pages_pyarrow_reads(tmp_path):
    # v2 semantics: levels stay raw, only the value section compresses
    p = str(tmp_path / "v2z.parquet")
    txt = pa.array([f"line {i} " * 3 for i in range(7)])
    f32 = pa.array(np.arange(7, dtype=np.float32))
    interop.write_parquet(p, {"flat": FLAT, "txt": txt, "f32": f32},
                          encodings={"flat": "delta",
                                     "txt": "delta_length",
                                     "f32": "byte_stream_split"},
                          compression="zstd")
    t = pq.read_table(p)
    assert t.column("flat").combine_chunks().cast(FLAT.type).equals(FLAT)
    assert t.column("txt").combine_chunks().cast(txt.type).equals(txt)
    assert t.column("f32").combine_chunks().equals(f32)


@pytest.mark.parametrize("comp", ["snappy", "gzip", "zstd", "lz4"])
@pytest.mark.parametrize("ver", ["1.0", "2.0"])
def test_pyarrow_compressed_pages_our_kernels_read(tmp_path, comp, ver):
    p = str(tmp_path / f"pc_{comp}_{ver}.parquet")
    txt = pa.array([f"tok{i % 3} row {i} " * 4 for i in range(7)])
    pq.write_table(pa.table({"ints": INTS, "strs": STRS, "flat": FLAT,
                             "txt": txt}),
                   p, compression=comp, data_page_version=ver)
    out = interop.read_parquet_with_our_codecs(p)
    assert out["ints"].cast(INTS.type).equals(INTS)
    assert out["strs"].cast(STRS.type).equals(STRS)
    assert out["flat"].cast(FLAT.type).equals(FLAT)
    assert out["txt"].cast(txt.type).equals(txt)


def test_unknown_compression_rejected(tmp_path):
    with pytest.raises(ValueError, match="unsupported parquet compression"):
        interop.write_parquet(str(tmp_path / "x.parquet"),
                              {"flat": FLAT}, compression="brotli7")


STRUCT = pa.array([{"u": 1, "v": "a"}, None, {"u": None, "v": "b"},
                   {"u": 4, "v": None}, {"u": 5, "v": "e"},
                   {"u": None, "v": None}, {"u": 7, "v": "g"}],
                  pa.struct([("u", pa.int64()), ("v", pa.string())]))


def test_struct_both_directions(tmp_path):
    p = str(tmp_path / "st.parquet")
    interop.write_parquet(p, {"st": STRUCT, "flat": FLAT},
                          row_group_rows=3, compression="zstd")
    t = pq.read_table(p)
    assert t.column("st").combine_chunks().cast(STRUCT.type).equals(STRUCT)
    out = interop.read_parquet_with_our_codecs(p)
    assert out["st"].cast(STRUCT.type).equals(STRUCT)
    p2 = str(tmp_path / "st2.parquet")
    pq.write_table(pa.table({"st": STRUCT}), p2, compression="zstd",
                   row_group_size=3, data_page_version="2.0")
    out2 = interop.read_parquet_with_our_codecs(p2)
    assert out2["st"].cast(STRUCT.type).equals(STRUCT)


def test_struct_nested_field_rejected(tmp_path):
    bad = pa.array([{"a": [1]}],
                   pa.struct([("a", pa.list_(pa.int64()))]))
    with pytest.raises(ValueError, match="unsupported"):
        interop.write_parquet(str(tmp_path / "b.parquet"), {"s": bad})


MAPS = pa.array([{"a": "1", "b": "2"}, None, {}, {"c": None},
                 {"d": "4", "e": "5"}, {"f": "6"}, None],
                pa.map_(pa.string(), pa.string()))
MAPI = pa.array([{1: 10}, {}, None, {2: None, 3: 30}, {7: 70},
                 None, {8: 80}], pa.map_(pa.int64(), pa.int64()))


def test_map_both_directions(tmp_path):
    p = str(tmp_path / "m.parquet")
    interop.write_parquet(p, {"m": MAPS, "mi": MAPI},
                          row_group_rows=3, compression="zstd")
    t = pq.read_table(p)
    assert t.column("m").combine_chunks().cast(MAPS.type).equals(MAPS)
    assert t.column("mi").combine_chunks().cast(MAPI.type).equals(MAPI)
    out = interop.read_parquet_with_our_codecs(p)
    assert out["m"].cast(MAPS.type).equals(MAPS)
    assert out["mi"].cast(MAPI.type).equals(MAPI)


@pytest.mark.parametrize("ver", ["1.0", "2.0"])
@pytest.mark.parametrize("comp", ["NONE", "zstd"])
def test_pyarrow_map_files_our_kernels(tmp_path, ver, comp):
    p = str(tmp_path / f"pm_{ver}_{comp}.parquet")
    pq.write_table(pa.table({"m": MAPS, "mi": MAPI}), p,
                   compression=comp, data_page_version=ver,
                   row_group_size=3)
    out = interop.read_parquet_with_our_codecs(p)
    assert out["m"].cast(MAPS.type).equals(MAPS)
    assert out["mi"].cast(MAPI.type).equals(MAPI)


def _ls_data():
    return [
        [{"u": 1, "v": "a"}, None, {"u": 3, "v": None}],
        None, [], [None],
        [{"u": None, "v": "z"}],
        [{"u": 7, "v": "q"}, {"u": 8, "v": "r"}] * 40,
    ] * 50


def _ls_arr():
    t = pa.list_(pa.struct([("u", pa.int64()), ("v", pa.string())]))
    return pa.array(_ls_data(), t)


def test_liststruct_ours_to_pyarrow(tmp_path):
    # LIST whose element is a GROUP, from OUR emitters, read by
    # pyarrow's C++ reader — all five null shapes (null list, empty
    # list, null element, null field, value)
    p = str(tmp_path / "ls_ours.parquet")
    arr = _ls_arr()
    interop.write_parquet(
        p, {"id": pa.array(range(len(arr)), pa.int64()), "evs": arr})
    back = pq.read_table(p)
    assert back.column("evs").to_pylist() == _ls_data()
    assert back.column("id").to_pylist() == list(range(len(arr)))


def test_liststruct_ours_to_our_reader(tmp_path):
    p = str(tmp_path / "ls_rt.parquet")
    arr = _ls_arr()
    interop.write_parquet(
        p, {"id": pa.array(range(len(arr)), pa.int64()), "evs": arr})
    ours = interop.read_parquet_with_our_codecs(p)
    assert ours["evs"].to_pylist() == _ls_data()
    ft = interop.footer_schema(p)
    assert ft["evs"] == pa.list_(
        pa.struct([("u", pa.int64()), ("v", pa.string())]))


def test_liststruct_pyarrow_to_our_reader(tmp_path):
    # reverse direction across pyarrow writer configurations:
    # multi-page, dictionary, compressed pages, multi-row-group
    tbl = pa.table({"id": pa.array(range(len(_ls_data())), pa.int64()),
                    "evs": _ls_arr()})
    for i, kwargs in enumerate([
            dict(use_dictionary=False, data_page_size=1024),
            dict(use_dictionary=True),
            dict(use_dictionary=False, compression="zstd"),
            dict(use_dictionary=False, row_group_size=77)]):
        p = str(tmp_path / f"pa_ls_{i}.parquet")
        pq.write_table(tbl, p, **kwargs)
        ours = interop.read_parquet_with_our_codecs(p)
        assert ours["evs"].to_pylist() == _ls_data(), kwargs


def test_liststruct_ours_multi_row_group(tmp_path):
    p = str(tmp_path / "ls_rg.parquet")
    arr = _ls_arr()
    interop.write_parquet(
        p, {"id": pa.array(range(len(arr)), pa.int64()), "evs": arr},
        row_group_rows=77)
    back = pq.read_table(p)
    assert back.column("evs").to_pylist() == _ls_data()
    ours = interop.read_parquet_with_our_codecs(p)
    assert ours["evs"].to_pylist() == _ls_data()


def test_list_bool_both_directions(tmp_path):
    # round 5: bool LIST elements (PLAIN bit-packed leaf under rep/def
    # framing) — previously rejected out of conservatism
    data = [[True, False, None], None, [], [True], [False] * 17,
            [None, True]] * 30
    arr = pa.array(data, pa.list_(pa.bool_()))
    p = str(tmp_path / "lb.parquet")
    interop.write_parquet(
        p, {"id": pa.array(range(len(arr)), pa.int64()), "flags": arr},
        row_group_rows=50)
    assert pq.read_table(p).column("flags").to_pylist() == data
    ours = interop.read_parquet_with_our_codecs(p)
    assert ours["flags"].cast(pa.list_(pa.bool_())).to_pylist() == data
    p2 = str(tmp_path / "pa_lb.parquet")
    pq.write_table(pa.table({"flags": arr}), p2, use_dictionary=False)
    o2 = interop.read_parquet_with_our_codecs(p2)
    assert o2["flags"].cast(pa.list_(pa.bool_())).to_pylist() == data
