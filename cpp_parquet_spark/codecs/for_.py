"""Frame-of-reference (FOR) integer codec (E6).

Subtract the page minimum ("frame") from each value and bit-pack the
non-negative residuals at ``ceil(log2(max-min+1))`` bits (SURVEY.md §2.1 E6;
Parquet's nearest relative is DELTA_BINARY_PACKED, parquet.thrift:601-604 —
FOR is the simpler non-delta variant mandated by BASELINE.json:14).

Overflow-safe for the full int64 domain: residuals are computed in uint64
two's-complement arithmetic (max-min <= 2^64-1 always fits), and the frame
is stored as a signed Python int in params.
"""

from __future__ import annotations

import numpy as np

from .bitpack import bit_width_for, pack_bits_le, unpack_bits_le


def encode(values: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(values, dtype=np.int64)
    if v.size == 0:
        return b"", {"frame": 0, "bw": 0}
    lo = int(v.min())
    # two's-complement subtraction: exact v - lo as uint64 since v >= lo
    residuals = v.astype(np.uint64) - np.uint64(lo & 0xFFFFFFFFFFFFFFFF)
    bw = bit_width_for(int(residuals.max()))
    return pack_bits_le(residuals, bw), {"frame": lo, "bw": bw}


def decode(data: bytes, params: dict, n: int) -> np.ndarray:
    bw = int(params["bw"])
    lo = int(params["frame"])
    residuals = unpack_bits_le(data, bw, n)
    return (residuals + np.uint64(lo & 0xFFFFFFFFFFFFFFFF)).view(np.int64)


def encode_delta(values: np.ndarray) -> tuple[bytes, dict]:
    """Delta variant (Parquet's DELTA_BINARY_PACKED relative): wrap-safe
    uint64 first differences, FOR-framed + bit-packed. Sorted or
    near-sorted columns pack at the bit width of the *step*, not the
    value span."""
    v = np.ascontiguousarray(values, dtype=np.int64)
    if v.size == 0:
        return b"", {"frame": 0, "bw": 0, "first": 0}
    u = v.view(np.uint64)
    d = np.empty(v.size - 1, dtype=np.uint64)
    np.subtract(u[1:], u[:-1], out=d)          # mod 2^64: exact on decode
    body, p = encode(d.view(np.int64))
    return body, {**p, "first": int(v[0])}


def decode_delta(data: bytes, params: dict, n: int) -> np.ndarray:
    if n == 0:
        return np.empty(0, dtype=np.int64)
    d = decode(data, params, n - 1).view(np.uint64)
    out = np.empty(n, dtype=np.uint64)
    out[0] = np.uint64(int(params["first"]) & 0xFFFFFFFFFFFFFFFF)
    np.cumsum(d, out=out[1:])                  # wraps mod 2^64
    out[1:] += out[0]
    return out.view(np.int64)
