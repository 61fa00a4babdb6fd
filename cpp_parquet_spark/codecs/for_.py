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
