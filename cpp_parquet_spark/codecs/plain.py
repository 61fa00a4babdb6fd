"""PLAIN codec (E1) — baseline, no compression.

Semantics follow Parquet PLAIN (parquet.thrift:566-576, SURVEY.md [T]):
fixed-width values back-to-back little-endian; booleans 1 bit LSB-first;
byte arrays as length-prefixed bytes. One deliberate layout deviation for
vectorization speed, same size as Parquet's interleaved form: strings are
stored as ``[u32 lengths[n]] [concat utf8 bytes]`` instead of interleaved
``(len, bytes)*`` — building/parsing is pure numpy either way at decode,
but the split layout avoids a scatter on encode.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# --- fixed-width numerics ----------------------------------------------------

_FIXED = {"i64": "<i8", "i32": "<i4", "i16": "<i2", "i8": "<i1",
          "f64": "<f8", "f32": "<f4", "u64": "<u8",
          "ts": "<i8", "tsn": "<i8", "date": "<i4"}


def encode_fixed(values: np.ndarray, tag: str) -> bytes:
    return np.ascontiguousarray(values, dtype=_FIXED[tag]).tobytes()


def decode_fixed(data: bytes, tag: str, n: int) -> np.ndarray:
    return np.frombuffer(data, dtype=_FIXED[tag], count=n)


# --- booleans: 1 bit per value, LSB-first ------------------------------------

def encode_bool(values: np.ndarray) -> bytes:
    return np.packbits(np.ascontiguousarray(values, dtype=np.uint8),
                       bitorder="little").tobytes()


def decode_bool(data: bytes, n: int) -> np.ndarray:
    return np.unpackbits(np.frombuffer(data, dtype=np.uint8),
                         bitorder="little", count=n).astype(bool)


# --- byte arrays / strings ----------------------------------------------------

def encode_binary(values) -> bytes:
    """values: pa.Array / np.ndarray(object) of bytes|str -> PLAIN blob."""
    arr = values if isinstance(values, pa.Array) else pa.array(values)
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.large_binary())
    elif pa.types.is_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                            count=len(arr) + 1, offset=arr.offset * 8)
    lengths = np.diff(offsets).astype(np.uint32)
    databuf = arr.buffers()[2]
    payload = np.frombuffer(databuf, dtype=np.uint8,
                            count=int(offsets[-1]))[int(offsets[0]):]
    return lengths.tobytes() + payload.tobytes()


def decode_binary(data: bytes, n: int, as_str: bool = True) -> pa.Array:
    raw = np.frombuffer(data, dtype=np.uint8)
    lengths = raw[: 4 * n].view(np.uint32).astype(np.int64)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    payload = raw[4 * n :]
    arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(payload.tobytes())],
    )
    return arr.cast(pa.large_string()) if as_str else arr


# --- wide decimals: decimal128 passthrough, 16-byte LE words ------------------

def encode_dec128(values: pa.Array) -> bytes:
    """decimal128 array (no nulls) -> raw 16-byte little-endian words
    (Arrow's buffer layout verbatim; zero-copy slice)."""
    arr = values.combine_chunks() if isinstance(values, pa.ChunkedArray) \
        else values
    n = len(arr)
    buf = np.frombuffer(arr.buffers()[1], dtype=np.uint8,
                        count=16 * (n + arr.offset))[16 * arr.offset:]
    return buf.tobytes()


def decode_dec128(data: bytes, n: int, p: int, s: int) -> pa.Array:
    return pa.Array.from_buffers(pa.decimal128(p, s), n,
                                 [None, pa.py_buffer(data)])


# --- codec interface (dispatch by type tag) -----------------------------------

def encode(values, tag: str) -> tuple[bytes, dict]:
    if tag.startswith("dec38:"):    # 16-byte decimal128 (pagecodec dec38:p:s)
        return encode_dec128(values), {}
    if tag.startswith("dec:"):      # unscaled int64 (pagecodec dec:<p>:<s>)
        tag = "i64"
    if tag in _FIXED:
        return encode_fixed(values, tag), {}
    if tag == "bool":
        return encode_bool(values), {}
    if tag in ("str", "bin"):
        return encode_binary(values), {}
    raise ValueError(f"plain: unsupported tag {tag}")


def decode(data: bytes, params: dict, n: int, tag: str):
    if tag.startswith("dec38:"):
        parts = tag.split(":")
        return decode_dec128(data, n, int(parts[-2]), int(parts[-1]))
    if tag.startswith("dec:"):
        tag = "i64"
    if tag in _FIXED:
        return decode_fixed(data, tag, n)
    if tag == "bool":
        return decode_bool(data, n)
    if tag in ("str", "bin"):
        return decode_binary(data, n, as_str=(tag == "str"))
    raise ValueError(f"plain: unsupported tag {tag}")
