"""BYTE_STREAM_SPLIT codec ("bss") — byte-plane transposition for floats.

Public lineage: Parquet's ``BYTE_STREAM_SPLIT = 9`` encoding
(parquet.thrift:620-630, evidence tag [T] in SURVEY.md §0.2): "K
byte-streams are created where K is the size in bytes of the data type.
The individual bytes of a value are scattered to the corresponding stream
and the streams are concatenated" — i.e. for n float32 values the page
holds the n first-bytes, then the n second-bytes, and so on. The transposition is size-neutral on its own but
groups the highly-regular exponent/sign bytes of similar-magnitude floats
into contiguous runs, so an outer block codec (E9, zstd/zlib) compresses
them far better than the interleaved PLAIN layout — which is exactly how
parquet-cpp pairs it with page compression.

From-scratch vectorized implementation: one numpy ``.T`` +
``ascontiguousarray`` per page in each direction — no per-value Python.
Losslessness is structural (a byte permutation), so NaN payloads, -0.0,
infinities, and subnormals all round-trip bit-identically.
"""

from __future__ import annotations

import numpy as np

_DT = {"f32": np.float32, "f64": np.float64}


def split_bytes(raw: np.ndarray) -> bytes:
    """Byte-plane transpose a fixed-width 1-D array: value-major bytes ->
    plane-major bytes (plane 0 = every value's byte 0, ...)."""
    v = np.ascontiguousarray(raw)
    w = v.dtype.itemsize
    if v.size == 0:
        return b""
    planes = v.view(np.uint8).reshape(v.size, w).T
    return np.ascontiguousarray(planes).tobytes()


def unsplit_bytes(data: bytes, n: int, dtype) -> np.ndarray:
    """Inverse of :func:`split_bytes` for ``n`` values of ``dtype``."""
    dt = np.dtype(dtype)
    if n == 0:
        return np.empty(0, dtype=dt)
    w = dt.itemsize
    planes = np.frombuffer(data, dtype=np.uint8, count=n * w).reshape(w, n)
    return np.ascontiguousarray(planes.T).reshape(-1).view(dt)


def encode(values, tag: str) -> tuple[bytes, dict]:
    if tag not in _DT:
        raise ValueError(f"bss is float-only, got tag {tag}")
    v = np.ascontiguousarray(values, dtype=_DT[tag])
    return split_bytes(v), {}


def decode(data: bytes, params: dict, k: int, tag: str) -> np.ndarray:
    if tag not in _DT:
        raise ValueError(f"bss is float-only, got tag {tag}")
    return unsplit_bytes(data, k, _DT[tag])
