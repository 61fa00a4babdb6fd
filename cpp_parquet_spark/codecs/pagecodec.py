"""Page framing and codec dispatch.

A *page* is one encoded run of values for one column — the engine's
equivalent of a Parquet data page (parquet.thrift:671-693,797-836;
SURVEY.md §1.2 maps pages to rows of the pages table). Layout of the
``data`` blob::

    [u32 def_len][def-level RLE stream (absent when def_len == 0)]
    [value stream (codec-specific, holds only the non-null values)]

``params`` is a small JSON dict (codec metadata: bit widths, FOR frame).
``num_values`` counts rows including nulls (parquet.thrift:673-676).

Type tags: i64 i32 f64 f32 bool str bin ts (timestamp stored as int64
epoch-microseconds; the tag restores the logical type on decode).

Parameterized tags (the logical-type annotations of parquet.thrift's
DATE / DECIMAL over int physical storage):

- ``date``: DateType stored as epoch-days int32 through the int codec
  family (FOR/delta/RLE/dict — dates are the textbook delta column).
- ``dec:<p>:<s>``: DecimalType(p, s) with p <= 18, stored as the
  UNSCALED int64 through the int codec family; precision/scale live in
  the tag so decode rebuilds the exact logical type.
- ``dec38:<p>:<s>``: DecimalType(p, s) with 18 < p <= 38 (Spark's
  ceiling), PLAIN passthrough: 16-byte little-endian two's-complement
  words — Arrow's decimal128 buffer verbatim, the LE twin of Parquet's
  FIXED_LEN_BYTE_ARRAY(16) decimal convention (parquet.thrift
  LogicalTypes DECIMAL). No lightweight codec applies (the unscaled
  value overflows the int64 codec word), but the E9 outer block codec
  still wraps the page when configured.
"""

from __future__ import annotations

import json
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

#: E9 outer block codecs (parquet.thrift:483-494 CompressionCodec analogue).
#: zlib rides the stdlib; the rest ride pyarrow's bundled compressors.
#: Arrow decompressors need the uncompressed length, so every non-zlib
#: blk stores ``ulen`` in params — the same bookkeeping as parquet.thrift's
#: PageHeader.uncompressed_page_size (parquet.thrift:797-801).
BLOCK_CODECS = ("zlib", "zstd", "lz4", "snappy", "gzip")
_ARROW_BLOCK_LEVEL = {"zstd": 3}


def _block_compress(name: str, data: bytes) -> bytes:
    if name == "zlib":
        return zlib.compress(data, 6)
    lvl = _ARROW_BLOCK_LEVEL.get(name)
    codec = pa.Codec(name, compression_level=lvl) if lvl is not None \
        else pa.Codec(name)
    return codec.compress(data, asbytes=True)


def _block_decompress(name: str, data: bytes, ulen: int | None) -> bytes:
    if name == "zlib":
        return zlib.decompress(data)
    if name not in BLOCK_CODECS:
        raise ValueError(f"unsupported block codec {name}")
    if ulen is None:
        raise ValueError(f"block codec {name} page missing ulen param")
    return pa.Codec(name).decompress(data, decompressed_size=ulen,
                                     asbytes=True)

from . import bitpack, bss, dfloat, dictionary, fsst, levels, plain, prefix, rle
from . import for_ as forc

INT_TAGS = {"i64", "i32", "i16", "i8", "ts", "tsn", "date"}
FLOAT_TAGS = {"f64", "f32"}
STR_TAGS = {"str", "bin"}
ARRF_TAGS = {"arrf32", "arrf64"}  # array<float>/array<double> (embeddings)
ARRI_TAGS = {"arri8", "arri16", "arri32", "arri64"}  # array<int> (e.g.
                                  # int8-quantized vectors, token ids)
ARRS_TAGS = {"arrs", "arrb"}      # array<string>/array<binary> (token
                                  # lists, code lines, shingle sets)
ARR_TAGS = ARRF_TAGS | ARRI_TAGS | ARRS_TAGS
#: element byte width per fixed-width array tag (arrs/arrb are
#: variable-width — callers size those via the child offsets instead)
ARR_ELEM_W = {"arrf32": 4, "arrf64": 8,
              "arri8": 1, "arri16": 2, "arri32": 4, "arri64": 8}
#: child value tag per variable-width array tag
ARRS_CHILD = {"arrs": "str", "arrb": "bin"}

#: codecs legal per tag (selection never goes outside these)
LEGAL = {
    **{t: ("plain", "for", "delta", "rle", "dict", "bitpack") for t in INT_TAGS},
    **{t: ("plain", "dict", "dfloat", "bss") for t in FLOAT_TAGS},
    "bool": ("rle", "plain"),
    **{t: ("plain", "dict", "fsst", "prefix") for t in STR_TAGS},
    **{t: ("listf", "listb") for t in ARRF_TAGS},
    **{t: ("listi",) for t in ARRI_TAGS},
    **{t: ("lists",) for t in ARRS_TAGS},
}

_NP_FIXED = {"i64": np.int64, "i32": np.int32, "i16": np.int16,
             "i8": np.int8, "f64": np.float64, "f32": np.float32}

ARROW_TYPE = {"i64": pa.int64(), "i32": pa.int32(), "i16": pa.int16(),
              "i8": pa.int8(), "f64": pa.float64(),
              "f32": pa.float32(), "bool": pa.bool_(),
              "str": pa.large_string(), "bin": pa.large_binary(),
              "ts": pa.timestamp("us"), "tsn": pa.timestamp("us"),
              "date": pa.date32(),
              "arrf32": pa.list_(pa.float32()),
              "arrf64": pa.list_(pa.float64()),
              "arri8": pa.list_(pa.int8()),
              "arri16": pa.list_(pa.int16()),
              "arri32": pa.list_(pa.int32()),
              "arri64": pa.list_(pa.int64()),
              "arrs": pa.list_(pa.large_string()),
              "arrb": pa.list_(pa.large_binary())}


def is_dec(tag: str) -> bool:
    """True for a parameterized decimal tag ``dec:<p>:<s>`` (p <= 18,
    unscaled-int64 codec family)."""
    return tag.startswith("dec:")


def is_dec38(tag: str) -> bool:
    """True for a wide-decimal tag ``dec38:<p>:<s>`` (18 < p <= 38,
    PLAIN 16-byte passthrough)."""
    return tag.startswith("dec38:")


def dec_precision_scale(tag: str) -> tuple[int, int]:
    parts = tag.split(":")
    return int(parts[-2]), int(parts[-1])


def dec_text(unscaled: int, scale: int) -> str:
    """Scaled decimal text of an unscaled int ("12.34" for 1234, s=2) —
    casts losslessly to decimal(38, s) in Spark SQL and DuckDB alike.
    Used for decimal zone bounds and the ``__agg__`` exact-sum sidecar."""
    if scale == 0:
        return str(unscaled)
    sign = "-" if unscaled < 0 else ""
    ds = str(abs(unscaled)).rjust(scale + 1, "0")
    return f"{sign}{ds[:-scale]}.{ds[-scale:]}"


def int_like(tag: str) -> bool:
    """Tags whose value stream rides the int codec family."""
    return tag in INT_TAGS or is_dec(tag)


def legal_codecs(tag: str) -> tuple[str, ...]:
    if is_dec38(tag):
        return ("plain",)
    return LEGAL["i64"] if is_dec(tag) else LEGAL[tag]


def arrow_type_for(tag: str):
    if is_dec(tag) or is_dec38(tag):
        return pa.decimal128(*dec_precision_scale(tag))
    return ARROW_TYPE[tag]


def spark_type_tag(dt) -> str | None:
    """Spark DataType -> tag, or None when unsupported (caller passes through)."""
    from pyspark.sql import types as T
    m = {T.LongType: "i64", T.IntegerType: "i32", T.ShortType: "i16",
         T.ByteType: "i8", T.DoubleType: "f64",
         T.FloatType: "f32", T.BooleanType: "bool", T.StringType: "str",
         T.BinaryType: "bin", T.TimestampType: "ts",
         T.TimestampNTZType: "tsn", T.DateType: "date"}
    if isinstance(dt, T.ArrayType):
        if isinstance(dt.elementType, T.FloatType):
            return "arrf32"
        if isinstance(dt.elementType, T.DoubleType):
            return "arrf64"
        if isinstance(dt.elementType, T.ByteType):
            return "arri8"
        if isinstance(dt.elementType, T.ShortType):
            return "arri16"
        if isinstance(dt.elementType, T.IntegerType):
            return "arri32"
        if isinstance(dt.elementType, T.LongType):
            return "arri64"
        if isinstance(dt.elementType, T.StringType):
            return "arrs"
        if isinstance(dt.elementType, T.BinaryType):
            return "arrb"
        return None
    if isinstance(dt, T.DecimalType):
        # p <= 18: unscaled value fits int64, rides the int codec family;
        # wider: PLAIN 16-byte decimal128 passthrough (dec38)
        if dt.precision <= 18:
            return f"dec:{dt.precision}:{dt.scale}"
        return f"dec38:{dt.precision}:{dt.scale}"
    return m.get(type(dt))


def spark_type_for(tag: str):
    from pyspark.sql import types as T
    if is_dec(tag) or is_dec38(tag):
        p, s = dec_precision_scale(tag)
        return T.DecimalType(p, s)
    return {"i64": T.LongType(), "i32": T.IntegerType(),
            "i16": T.ShortType(), "i8": T.ByteType(),
            "f64": T.DoubleType(),
            "f32": T.FloatType(), "bool": T.BooleanType(),
            "str": T.StringType(), "bin": T.BinaryType(),
            "ts": T.TimestampType(), "tsn": T.TimestampNTZType(),
            "date": T.DateType(),
            "arrf32": T.ArrayType(T.FloatType()),
            "arrf64": T.ArrayType(T.DoubleType()),
            "arri8": T.ArrayType(T.ByteType()),
            "arri16": T.ArrayType(T.ShortType()),
            "arri32": T.ArrayType(T.IntegerType()),
            "arri64": T.ArrayType(T.LongType()),
            "arrs": T.ArrayType(T.StringType()),
            "arrb": T.ArrayType(T.BinaryType())}[tag]


def dec_unscaled(arr: pa.Array) -> np.ndarray:
    """decimal128 array (no nulls) -> unscaled int64 values.

    Arrow stores decimal128 as little-endian 128-bit two's complement;
    for precision <= 18 the value is exactly the low 64 bits read as
    int64 (the high word is pure sign extension)."""
    n = len(arr)
    if n == 0:
        return np.empty(0, np.int64)
    buf = np.frombuffer(arr.buffers()[1], np.int64, count=2 * (n + arr.offset))
    pairs = buf.reshape(-1, 2)[arr.offset:]
    return np.ascontiguousarray(pairs[:, 0])


def dec_from_unscaled(v: np.ndarray, p: int, s: int,
                      mask: np.ndarray | None = None) -> pa.Array:
    """unscaled int64 -> decimal128(p, s) array (mask = True where NULL)."""
    v = np.ascontiguousarray(v, dtype=np.int64)
    pairs = np.empty((v.shape[0], 2), dtype=np.int64)
    pairs[:, 0] = v
    pairs[:, 1] = v >> 63                    # sign extension high word
    validity = None
    if mask is not None and mask.any():
        validity = pa.array(~mask).buffers()[1]
    return pa.Array.from_buffers(pa.decimal128(p, s), v.shape[0],
                                 [validity, pa.py_buffer(pairs.tobytes())])


def to_arrow(values, tag: str) -> pa.Array:
    """Normalize any input (pa.Array/ChunkedArray/pd.Series/list) to the
    canonical Arrow representation for a tag."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pd.Series):
        values = pa.Array.from_pandas(values)
    elif not isinstance(values, pa.Array):
        values = pa.array(values)
    want = arrow_type_for(tag)
    if tag in ARR_TAGS:
        return values if values.type == want else values.cast(want)
    if tag in ("ts", "tsn") and pa.types.is_timestamp(values.type):
        values = values.cast(pa.timestamp("us", tz=values.type.tz))
        if values.type.tz is not None:
            values = values.cast(pa.timestamp("us"))
        return values
    return values if values.type == want else values.cast(want)


def _arr_split(arr: pa.Array, tag: str) -> tuple[np.ndarray | pa.Array, np.ndarray]:
    """-> (non-null values as numpy/arrow, valid bool mask over all rows)."""
    if arr.null_count:
        valid = arr.is_valid().to_numpy(zero_copy_only=False)
        work = arr.drop_null()
    else:
        valid = np.ones(len(arr), dtype=bool)
        work = arr
    if tag in ("ts", "tsn"):
        return work.cast(pa.int64()).to_numpy(zero_copy_only=False), valid
    if tag == "date":
        return work.cast(pa.int32()).to_numpy(zero_copy_only=False), valid
    if is_dec(tag):
        return dec_unscaled(work), valid
    if is_dec38(tag):
        return work, valid          # arrow decimal128; PLAIN slices its buffer
    if tag in _NP_FIXED:
        return work.to_numpy(zero_copy_only=False), valid
    if tag == "bool":
        return work.to_numpy(zero_copy_only=False), valid
    if tag in STR_TAGS or tag in ARR_TAGS:
        return work, valid
    raise ValueError(f"unsupported tag {tag}")


def _encode_values(vals, tag: str, codec: str, fsst_table=None) -> tuple[bytes, dict]:
    if codec in ("listf", "listb"):
        # array<float>/<double>: list lengths through the FOR-framed RLE
        # int path (constant embedding dims collapse to a few bytes),
        # child values PLAIN little-endian ("listf") or byte-stream-split
        # ("listb", parquet.thrift:620-630 — size-neutral alone, but the
        # E9 outer block codec compresses the grouped exponent/sign
        # planes far better than interleaved floats)
        if tag not in ARRF_TAGS:
            raise ValueError(f"{codec} is for array<float>/array<double>")
        arr = vals
        want = ARROW_TYPE[tag]
        if arr.type != want:
            arr = arr.cast(want)
        offs = np.frombuffer(arr.buffers()[1], np.int32,
                             count=len(arr) + 1, offset=arr.offset * 4)
        lens = np.diff(offs).astype(np.int64)
        ldata, lp = _encode_values(lens, "i64", "rle")
        child = arr.flatten()
        # child validity stream for null ELEMENTS (def level 2 of the
        # repeated-optional group) — a NULL float element is NOT NaN;
        # without this stream drop-to-NaN silently corrupts it. Only
        # pages that actually hold null elements pay for (and signal,
        # via params "cnul") the extra framing — null-free pages keep
        # the original layout, so previously-written pages decode as-is.
        cnul = child.null_count
        if cnul:
            cvalid = child.is_valid().to_numpy(zero_copy_only=False)
            cdef = levels.encode_validity(cvalid)
            child = child.drop_null()
        dt = np.float32 if tag == "arrf32" else np.float64
        cvals = np.ascontiguousarray(
            child.to_numpy(zero_copy_only=False), dtype=dt)
        vbytes = bss.split_bytes(cvals) if codec == "listb" \
            else cvals.tobytes()
        if cnul:
            body = (np.array([len(ldata), len(cdef)], np.uint32).tobytes()
                    + ldata + cdef + vbytes)
            return body, {"lens": lp, "cnul": int(cnul)}
        body = np.uint32(len(ldata)).tobytes() + ldata + vbytes
        return body, {"lens": lp}
    if codec == "lists":
        # array<string>/array<binary> (token lists, code lines, shingle
        # sets): list lengths via the FOR-framed RLE path, a child
        # validity stream for null ELEMENTS (definition level 2 of
        # parquet.thrift's repeated-optional group), and the flattened
        # child values through the regular string codec family — the
        # inner codec is re-selected per page by the same measured
        # sampler the scalar string path uses (dict for token vocab,
        # fsst for prose/code lines, plain for incompressible)
        if tag not in ARRS_TAGS:
            raise ValueError("lists is for array<string>/array<binary>")
        arr = vals
        want = ARROW_TYPE[tag]
        if arr.type != want:
            arr = arr.cast(want)
        offs = np.frombuffer(arr.buffers()[1], np.int32,
                             count=len(arr) + 1, offset=arr.offset * 4)
        lens = np.diff(offs).astype(np.int64)
        ldata, lp = _encode_values(lens, "i64", "rle")
        child = arr.flatten()
        ctag = ARRS_CHILD[tag]
        cnul = child.null_count
        if cnul:
            cvalid = child.is_valid().to_numpy(zero_copy_only=False)
            cdef = levels.encode_validity(cvalid)
            cwork = child.drop_null()
        else:
            cdef = b""
            cwork = child
        if len(cwork):
            from ..select import choose_string_codec
            ic, ftab = choose_string_codec(cwork)
            cdata, cp = _encode_values(cwork, ctag, ic, ftab)
        else:
            ic, cdata, cp = "plain", b"", {}
        body = (np.array([len(ldata), len(cdef)], np.uint32).tobytes()
                + ldata + cdef + cdata)
        return body, {"lens": lp, "ic": ic, "child": cp, "cnul": int(cnul)}
    if codec == "listi":
        # array<int> (int8-quantized vectors, token-id lists): list
        # lengths via the FOR-framed RLE path, child ints through FOR
        # bit-packing — int8-ranged children store at <=8 bits/value
        # instead of the element's plain width
        if tag not in ARRI_TAGS:
            raise ValueError("listi is for array<tinyint..bigint>")
        arr = vals
        want = ARROW_TYPE[tag]
        if arr.type != want:
            arr = arr.cast(want)
        offs = np.frombuffer(arr.buffers()[1], np.int32,
                             count=len(arr) + 1, offset=arr.offset * 4)
        lens = np.diff(offs).astype(np.int64)
        ldata, lp = _encode_values(lens, "i64", "rle")
        carr = arr.flatten()
        # null-element validity stream, same contract as listf/lists:
        # params "cnul" signals the two-length header; null-free pages
        # keep the original framing (old pages decode unchanged)
        cnul = carr.null_count
        if cnul:
            cvalid = carr.is_valid().to_numpy(zero_copy_only=False)
            cdef = levels.encode_validity(cvalid)
            carr = carr.drop_null()
        child = np.ascontiguousarray(
            carr.to_numpy(zero_copy_only=False), dtype=np.int64)
        cdata, cp = forc.encode(child)
        if cnul:
            body = (np.array([len(ldata), len(cdef)], np.uint32).tobytes()
                    + ldata + cdef + cdata)
            return body, {"lens": lp, "child": cp, "cnul": int(cnul)}
        body = np.uint32(len(ldata)).tobytes() + ldata + cdata
        return body, {"lens": lp, "child": cp}
    if codec == "bss":
        if tag not in FLOAT_TAGS:
            raise ValueError("bss is float-only")
        return bss.encode(vals, tag)
    if codec == "dfloat":
        if tag not in FLOAT_TAGS:
            raise ValueError("dfloat is float-only")
        return dfloat.encode(np.asarray(vals, dtype=np.float64))
    if codec == "plain":
        return plain.encode(vals, tag)
    if codec == "dict":
        return dictionary.encode(vals, tag)
    if codec == "fsst":
        if tag not in STR_TAGS:
            raise ValueError("fsst is string-only")
        return fsst.encode(vals, fsst_table)
    if codec == "prefix":
        if tag not in STR_TAGS:
            raise ValueError("prefix is string-only")
        return prefix.encode(vals)
    if tag == "bool":
        if codec == "rle":
            data, p = rle.encode(np.asarray(vals, dtype=np.uint64), bit_width=1)
            return data, p
        raise ValueError(f"bool: unsupported codec {codec}")
    if int_like(tag):
        v = np.ascontiguousarray(vals, dtype=np.int64)
        if codec == "for":
            return forc.encode(v)
        if codec == "delta":
            return forc.encode_delta(v)
        if codec == "rle":
            # FOR-framed residuals through the RLE/bit-packed hybrid: runs in
            # the raw values survive framing, and the frame bounds bit width.
            lo = int(v.min()) if v.size else 0
            r = v.astype(np.uint64) - np.uint64(lo & 0xFFFFFFFFFFFFFFFF)
            data, p = rle.encode(r)
            return data, {"frame": lo, **p}
        if codec == "bitpack":
            if v.size and int(v.min()) < 0:
                return forc.encode(v)  # bitpack needs unsigned; frame first
            data, p = bitpack.encode(v.astype(np.uint64))
            return data, {"frame": 0, **p}
    raise ValueError(f"unsupported codec {codec} for tag {tag}")


def _decode_values(data: bytes, params: dict, codec: str, tag: str, k: int):
    if codec == "dfloat":
        return dfloat.decode(data, params, k)
    if codec == "bss":
        return bss.decode(data, params, k, tag)
    if codec in ("listf", "listb"):
        cnul = int(params.get("cnul", 0))
        hlen = 8 if cnul else 4
        head = np.frombuffer(data[:hlen], np.uint32)
        llen = int(head[0])
        dlen = int(head[1]) if cnul else 0
        lens = np.asarray(_decode_values(data[hlen: hlen + llen],
                                         params["lens"], "rle", "i64", k))
        offs = np.zeros(k + 1, dtype=np.int32)
        offs[1:] = np.cumsum(lens).astype(np.int32)
        dt = pa.float32() if tag == "arrf32" else pa.float64()
        npdt = np.float32 if tag == "arrf32" else np.float64
        nchild = int(offs[-1])
        vbytes = data[hlen + llen + dlen:]
        if codec == "listb":
            child = bss.unsplit_bytes(vbytes, nchild - cnul, npdt)
        else:
            child = np.frombuffer(vbytes, dtype=npdt,
                                  count=nchild - cnul)
        carr = pa.array(child, dt)
        if cnul:
            cvalid = levels.decode_validity(
                data[hlen + llen: hlen + llen + dlen], nchild)
            idx = np.cumsum(cvalid, dtype=np.int64) - 1
            carr = carr.take(pa.array(idx, mask=~cvalid))
        return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), carr)
    if codec == "lists":
        head = np.frombuffer(data[:8], np.uint32)
        llen, dlen = int(head[0]), int(head[1])
        lens = np.asarray(_decode_values(data[8: 8 + llen], params["lens"],
                                         "rle", "i64", k))
        offs = np.zeros(k + 1, dtype=np.int32)
        offs[1:] = np.cumsum(lens).astype(np.int32)
        nchild = int(offs[-1])
        cnul = int(params.get("cnul", 0))
        ctag = ARRS_CHILD[tag]
        ckid = nchild - cnul
        cbody = data[8 + llen + dlen:]
        if ckid:
            child = _decode_values(cbody, params["child"], params["ic"],
                                   ctag, ckid)
            child = to_arrow(child, ctag)
        else:
            child = pa.array([], type=arrow_type_for(ctag))
        if cnul:
            cvalid = levels.decode_validity(data[8 + llen: 8 + llen + dlen],
                                            nchild)
            idx = np.cumsum(cvalid, dtype=np.int64) - 1
            child = child.take(pa.array(idx, mask=~cvalid))
        return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), child)
    if codec == "listi":
        cnul = int(params.get("cnul", 0))
        hlen = 8 if cnul else 4
        head = np.frombuffer(data[:hlen], np.uint32)
        llen = int(head[0])
        dlen = int(head[1]) if cnul else 0
        lens = np.asarray(_decode_values(data[hlen: hlen + llen],
                                         params["lens"], "rle", "i64", k))
        offs = np.zeros(k + 1, dtype=np.int32)
        offs[1:] = np.cumsum(lens).astype(np.int32)
        nchild = int(offs[-1])
        child = np.asarray(forc.decode(data[hlen + llen + dlen:],
                                       params["child"], nchild - cnul),
                           dtype=np.int64)
        elem = ARROW_TYPE[tag].value_type
        carr = pa.array(child, pa.int64()).cast(elem)
        if cnul:
            cvalid = levels.decode_validity(
                data[hlen + llen: hlen + llen + dlen], nchild)
            idx = np.cumsum(cvalid, dtype=np.int64) - 1
            carr = carr.take(pa.array(idx, mask=~cvalid))
        return pa.ListArray.from_arrays(pa.array(offs, pa.int32()), carr)
    if codec == "plain":
        return plain.decode(data, params, k, tag)
    if codec == "dict":
        return dictionary.decode(data, params, k, tag)
    if codec == "fsst":
        return fsst.decode(data, params, k, tag)
    if codec == "prefix":
        return prefix.decode(data, params, k, tag)
    if tag == "bool" and codec == "rle":
        return rle.decode(data, {"bw": 1}, k).astype(bool)
    if int_like(tag):
        if codec == "for":
            return forc.decode(data, params, k)
        if codec == "delta":
            return forc.decode_delta(data, params, k)
        if codec == "rle":
            lo = int(params["frame"])
            r = rle.decode(data, params, k)
            return (r + np.uint64(lo & 0xFFFFFFFFFFFFFFFF)).view(np.int64)
        if codec == "bitpack":
            lo = int(params.get("frame", 0))
            if lo:
                return forc.decode(data, params, k)
            return bitpack.decode(data, params, k).view(np.int64)
    raise ValueError(f"unsupported codec {codec} for tag {tag}")


def raw_size(vals, tag: str, n_present: int) -> int:
    """PLAIN-equivalent byte size (the 'uncoded' baseline for ratios)."""
    if tag in ARRS_TAGS:
        child = vals.flatten() if isinstance(vals, pa.Array) else \
            pa.array([e for x in vals for e in x],
                     type=arrow_type_for(ARRS_CHILD[tag]))
        cb = child.cast(pa.large_binary()) if not pa.types.is_large_binary(
            child.type) else child
        vbytes = int(pa.compute.sum(
            pa.compute.binary_length(cb)).as_py() or 0)
        return vbytes + 4 * len(child) + 4 * n_present
    if tag in ARR_TAGS:
        w = ARR_ELEM_W[tag]
        nvals = len(vals.flatten()) if isinstance(vals, pa.Array) else             sum(len(x) for x in vals)
        return nvals * w + 4 * n_present
    if is_dec38(tag):
        return 16 * n_present
    if tag in ("i64", "f64", "ts", "tsn") or is_dec(tag):
        return 8 * n_present
    if tag in ("i32", "f32", "date"):
        return 4 * n_present
    if tag == "i16":
        return 2 * n_present
    if tag == "i8":
        return n_present
    if tag == "bool":
        return (n_present + 7) // 8
    if isinstance(vals, pa.Array):
        ba = vals.cast(pa.large_binary()) if not pa.types.is_large_binary(vals.type) else vals
        return int(pa.compute.sum(pa.compute.binary_length(ba)).as_py() or 0) + 4 * n_present
    return sum(len(x) for x in vals) + 4 * n_present


def encode_page(values, tag: str, codec: str, fsst_table=None,
                block: str | None = None, crc: bool = False) -> dict:
    """Encode one page; returns the pages-table row fields (sans ids).

    ``values`` may be a pa.Array (canonical, zero-copy path), pd.Series,
    or a plain sequence.

    ``block`` (E9, SURVEY.md §2.1): optional outer block compression over
    the framed page bytes — legal for every tag because it wraps the blob
    AFTER the lightweight codec. One of ``BLOCK_CODECS`` ("zstd" is the
    recommended default: ~both faster and smaller than zlib on code/text);
    kept only when it actually shrinks the page. The ``blk`` params key
    tells decode to unwrap; non-zlib codecs also store ``ulen`` (the
    uncompressed length, parquet.thrift:797-801's uncompressed_page_size
    analogue) because Arrow decompressors require the output size.
    Off by default: the engine's identity is lightweight codecs, and the
    ≤-reference size bar is met without it (BASELINE.md).

    ``crc``: optional page-integrity checksum over the final framed blob
    (after block compression, matching parquet.thrift:807-824's "crc of
    the data within the page" semantics for its optional PageHeader.crc).
    Stored as params ``crc``; decode verifies it when present and raises
    ``PageCorruptError`` on mismatch. Off by default (costs one crc32
    pass per page).
    """
    arr = to_arrow(values, tag)
    n = len(arr)
    vals, valid = _arr_split(arr, tag)
    null_count = int(n - valid.sum())
    def_stream = levels.encode_validity(valid) if null_count else b""
    k = n - null_count
    if k == 0:
        body, params = b"", {}
        codec = "plain"
    else:
        try:
            body, params = _encode_values(vals, tag, codec, fsst_table)
        except ValueError:
            if codec != "dfloat":
                raise
            # parquet-style per-page fallback: this page isn't exactly
            # scaled-decimal even though the chunk decision said dfloat
            # (bss when a block codec will compress the byte planes)
            codec = "bss" if block else "plain"
            body, params = _encode_values(vals, tag, codec, fsst_table)
    data = np.uint32(len(def_stream)).tobytes() + def_stream + body
    if block is not None and block not in BLOCK_CODECS:
        raise ValueError(f"unsupported block codec {block}")
    if block is not None and len(data) > 64:
        comp = _block_compress(block, data)
        if len(comp) < len(data):
            params = {**params, "blk": block}
            if block != "zlib":
                params["ulen"] = len(data)
            data = comp
    if crc:
        params = {**params, "crc": zlib.crc32(data)}
    return {
        "codec": codec,
        "type": tag,
        "params": json.dumps(params, separators=(",", ":")),
        "data": data,
        "num_values": n,
        "null_count": null_count,
        "raw_bytes": raw_size(vals, tag, k),
        "enc_bytes": len(data),
    }


#: zone-map text length cap for string values — a min/max longer than
#: this is dropped (None = "unknown", never prunes) rather than
#: truncated, because a truncated upper bound is not a valid bound
ZONE_STR_MAX = 64


def page_minmax(arr: pa.Array, tag: str) -> tuple[str | None, str | None]:
    """Zone-map [min, max] of one page in canonical text form.

    The text forms cast back losslessly in Spark SQL: decimal text for
    the int family (incl. timestamps as epoch microseconds, bools as
    0/1), round-trippable repr for finite floats, the raw value for
    short strings. ``(None, None)`` means "unknown" and must never
    prune — returned for binary/list pages, all-null pages, NaN/inf
    float bounds, and long strings (parquet ColumnMetaData min/max
    statistics semantics, parquet.thrift:882-889)."""
    import math

    import pyarrow.compute as pc

    if tag in ARR_TAGS or tag == "bin":
        return None, None
    if len(arr) - arr.null_count == 0:
        return None, None
    if is_dec(tag):
        # scaled decimal text; the zone scan casts to decimal(38, s)
        _, s = dec_precision_scale(tag)
        u = dec_unscaled(arr.drop_null() if arr.null_count else arr)
        return dec_text(int(u.min()), s), dec_text(int(u.max()), s)
    if is_dec38(tag):
        mm = pc.min_max(arr)
        mn, mx = mm["min"].as_py(), mm["max"].as_py()
        if mn is None or mx is None:
            return None, None
        return str(mn), str(mx)
    if tag in ("ts", "tsn"):
        arr = arr.cast(pa.int64())
    elif tag == "date":
        arr = arr.cast(pa.int32())          # epoch days
    elif tag == "bool":
        arr = arr.cast(pa.int8())
    elif tag in FLOAT_TAGS:
        # pc.min_max SKIPS NaN, but Spark orders NaN above every number —
        # a zone computed without the NaN would wrongly prune pages whose
        # NaN rows match an upper-range predicate
        if pc.any(pc.is_nan(arr)).as_py():
            return None, None
    mm = pc.min_max(arr)
    mn, mx = mm["min"].as_py(), mm["max"].as_py()
    if mn is None or mx is None:
        return None, None
    if tag in STR_TAGS:
        if len(mn) > ZONE_STR_MAX or len(mx) > ZONE_STR_MAX:
            return None, None
        return mn, mx
    if isinstance(mn, float) and not (math.isfinite(mn) and math.isfinite(mx)):
        return None, None
    return repr(mn), repr(mx)


class PageCorruptError(ValueError):
    """A page blob failed its stored CRC — bytes were altered at rest."""


def decode_page(data: bytes, params_json: str, codec: str, tag: str,
                num_values: int, null_count: int) -> pa.Array:
    """Decode one page back to an Arrow array (nulls restored)."""
    if '"crc"' in params_json:     # cheap probe before the JSON parse
        want = json.loads(params_json).get("crc")
        if want is not None and zlib.crc32(data) != want:
            raise PageCorruptError(
                f"page crc mismatch: stored {want}, "
                f"computed {zlib.crc32(data)} over {len(data)} bytes")
    if '"blk"' in params_json:
        p = json.loads(params_json)
        blk = p.get("blk")
        if blk is not None:
            data = _block_decompress(blk, data, p.get("ulen"))
    def_len = int(np.frombuffer(data[:4], dtype=np.uint32)[0])
    body = data[4 + def_len :]
    n = num_values
    k = n - null_count
    if null_count:
        valid = levels.decode_validity(data[4 : 4 + def_len], n)
    else:
        valid = np.ones(n, dtype=bool)
    vals = _decode_values(body, json.loads(params_json), codec, tag, k) \
        if k else None

    arrow_type = arrow_type_for(tag)
    if k == 0:
        return pa.nulls(n, arrow_type)
    if tag in STR_TAGS or tag in ARR_TAGS or is_dec38(tag):
        arr = vals
        if null_count:
            idx = np.cumsum(valid, dtype=np.int64) - 1
            take = pa.array(idx, mask=~valid)
            arr = arr.take(take)
        return arr.cast(arrow_type) if arr.type != arrow_type else arr
    if is_dec(tag):
        p, s = dec_precision_scale(tag)
        v = np.ascontiguousarray(vals, dtype=np.int64)
        if null_count:
            full = np.zeros(n, dtype=np.int64)
            full[valid] = v
            return dec_from_unscaled(full, p, s, mask=~valid)
        return dec_from_unscaled(v, p, s)
    v = np.asarray(vals)
    if tag in ("i32", "date"):
        v = v.astype(np.int32)
    elif tag == "i16":
        v = v.astype(np.int16)
    elif tag == "i8":
        v = v.astype(np.int8)
    elif tag == "f32":
        v = v.astype(np.float32)
    elif tag in ("ts", "tsn"):
        v = v.view(np.int64)
    if null_count:
        full = np.zeros(n, dtype=v.dtype)
        full[valid] = v
        return pa.array(full, type=arrow_type, mask=~valid)
    return pa.array(v, type=arrow_type)
