"""array<string> / array<binary> columns through the `lists` composite
codec (SURVEY.md §2.1 round-3 extension: token lists, code lines,
shingle sets — the variable-width sibling of listf/listi).

Layout under test (pagecodec._encode_values "lists"):
[u32 llen][lens RLE][u32 cdef_len][child validity RLE][child value stream]
with the inner string codec re-selected per page by the measured sampler.
"""

import numpy as np
import pyarrow as pa
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cpp_parquet_spark.codecs import pagecodec as pc


def _roundtrip(rows, tag):
    elem = pa.large_string() if tag == "arrs" else pa.large_binary()
    arr = pa.array(rows, type=pa.list_(elem))
    row = pc.encode_page(arr, tag, "lists")
    out = pc.decode_page(row["data"], row["params"], row["codec"], tag,
                         row["num_values"], row["null_count"])
    assert out.type == pc.arrow_type_for(tag)
    assert out.to_pylist() == rows
    return row


def test_lines_shape_with_all_edge_rows():
    rows = [
        ["def f():", "    return 1", ""],       # code lines, empty string
        None,                                     # null LIST
        [],                                       # empty list
        ["x" * 5000],                             # one long element
        [None, "a", None],                        # null ELEMENTS
        ["üñíé", "", "\x00\x01"],                # unicode + control bytes
    ]
    row = _roundtrip(rows, "arrs")
    assert row["codec"] == "lists"
    assert row["null_count"] == 1


def test_token_vocab_selects_dict_inner():
    rows = [["the", "a", "of", "the"] * 8 for _ in range(64)]
    row = _roundtrip(rows, "arrs")
    import json
    p = json.loads(row["params"])
    assert p["ic"] == "dict"
    assert row["enc_bytes"] < row["raw_bytes"] / 4


def test_code_lines_select_compressive_inner():
    rows = [[f"    let value_{i}_{j} = compute(value_{i}, {j});"
             for j in range(20)] for i in range(50)]
    row = _roundtrip(rows, "arrs")
    import json
    assert json.loads(row["params"])["ic"] in ("fsst", "dict", "prefix")
    assert row["enc_bytes"] < row["raw_bytes"]


def test_binary_lists_roundtrip():
    rows = [[b"\x00\xff\xfe", b""], None, [b"abc" * 50], [None, b"q"]]
    _roundtrip(rows, "arrb")


def test_block_codec_and_crc_wrap_lists():
    rows = [[f"line {i} of the file" for i in range(j, j + 20)]
            for j in range(50)]
    arr = pa.array(rows, type=pa.list_(pa.large_string()))
    row = pc.encode_page(arr, "arrs", "lists", block="zstd", crc=True)
    out = pc.decode_page(row["data"], row["params"], row["codec"], "arrs",
                         row["num_values"], row["null_count"])
    assert out.to_pylist() == rows
    # a flipped byte must surface, never corrupt silently
    bad = bytearray(row["data"])
    bad[len(bad) // 2] ^= 0x40
    with pytest.raises(pc.PageCorruptError):
        pc.decode_page(bytes(bad), row["params"], row["codec"], "arrs",
                       row["num_values"], row["null_count"])


def test_sliced_array_encodes_the_slice_only():
    rows = [[f"r{i}e{j}" for j in range(i % 4)] for i in range(100)]
    arr = pa.array(rows, type=pa.list_(pa.large_string()))
    sl = arr.slice(13, 40)
    row = pc.encode_page(sl, "arrs", "lists")
    out = pc.decode_page(row["data"], row["params"], row["codec"], "arrs",
                         row["num_values"], row["null_count"])
    assert out.to_pylist() == rows[13:53]


def test_all_rows_null_and_all_elements_null():
    _roundtrip([None, None, None], "arrs")
    _roundtrip([[None, None], [None]], "arrs")


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.one_of(
        st.none(),
        st.lists(st.one_of(st.none(), st.text(max_size=12)), max_size=6)),
    max_size=40))
def test_property_arrs_roundtrip(rows):
    _roundtrip(rows, "arrs")


def test_spark_type_tag_maps_string_and_binary_arrays():
    from pyspark.sql import types as T
    assert pc.spark_type_tag(T.ArrayType(T.StringType())) == "arrs"
    assert pc.spark_type_tag(T.ArrayType(T.BinaryType())) == "arrb"
    assert pc.spark_type_for("arrs") == T.ArrayType(T.StringType())


def test_page_cuts_split_by_child_bytes():
    from cpp_parquet_spark.engine import _page_cuts
    rows = [["y" * 1000] * 10 for _ in range(200)]   # ~10 KB per row
    arr = pa.array(rows, type=pa.list_(pa.large_string()))
    cuts = _page_cuts(arr, "arrs", page_bytes=1 << 16, rows_max=1 << 16)
    assert cuts[-1] == 200
    assert len(cuts) > 10          # ~2 MB total / 64 KiB pages
    sizes = np.diff([0] + cuts)
    assert sizes.max() <= 8        # 64 KiB / 10 KB per row


def test_engine_roundtrip_doc_lines(spark, sf_dir):
    from pyspark.sql import functions as F

    from cpp_parquet_spark.engine import (EncodeConfig, decode_table,
                                          encode_table)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df = docs.select("doc_id", F.split("text", "\n").alias("lines"))
    cfg = EncodeConfig(table_name="doclines", keys=("doc_id",),
                       salt_from=("doc_id",), num_parts=4)
    pages = encode_table(df, cfg)
    dec = decode_table(pages, spark)
    orig = df.select("doc_id", F.array_join("lines", "\n", "<N>").alias("j"))
    back = dec.select("doc_id", F.array_join("lines", "\n", "<N>").alias("j"))
    assert orig.exceptAll(back).count() == 0
    assert back.exceptAll(orig).count() == 0


def test_list_codecs_preserve_child_element_nulls():
    # a NULL list ELEMENT is not NaN/garbage: every list codec carries
    # a child validity stream when (and only when) the page holds null
    # elements; null-free pages keep the original framing
    import json
    import warnings

    import pyarrow as pa

    from cpp_parquet_spark.codecs import pagecodec

    cases = [
        ([[1, None, 3], None, [], [None], [5, 6]], "arri64", "listi"),
        ([[1, None], [0], None], "arri8", "listi"),
        ([[1.5, None, 3.25], None, [], [None], [5.0]], "arrf64", "listf"),
        ([[1.5, None], [2.5, None]], "arrf32", "listb"),
        ([["a", None, "bb"], None, [], [None]], "arrs", "lists"),
    ]
    for pylist, tag, codec in cases:
        vals = pa.array(pylist, pagecodec.ARROW_TYPE[tag])
        with warnings.catch_warnings():
            warnings.simplefilter("error")   # NaN-cast warning = a miss
            row = pagecodec.encode_page(vals, tag, codec)
        pj = row["params"] if isinstance(row["params"], str) \
            else json.dumps(row["params"])
        assert '"cnul"' in pj
        back = pagecodec.decode_page(row["data"], pj, row["codec"], tag,
                                     row["num_values"], row["null_count"])
        assert back.to_pylist() == vals.to_pylist(), (tag, codec)
    # null-free children stay on the original framing
    vals = pa.array([[1, 2], None, [3]], pa.list_(pa.int64()))
    row = pagecodec.encode_page(vals, "arri64", "listi")
    pj = row["params"] if isinstance(row["params"], str) \
        else json.dumps(row["params"])
    assert '"cnul"' not in pj
    back = pagecodec.decode_page(row["data"], pj, row["codec"], "arri64",
                                 row["num_values"], row["null_count"])
    assert back.to_pylist() == vals.to_pylist()
