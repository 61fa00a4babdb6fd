"""Bit-packing primitives + the standalone BIT_PACK codec (E4).

Packing order is LSB-first within each value and little-endian across
bytes — the same bit order the Parquet RLE/bit-packed hybrid uses for its
literal runs ("bit packed, back to back... from least significant bit of
each byte to most significant bit", parquet.thrift encoding notes; Impala
grammar at arrow/util/rle_encoding.h:46-67 — see SURVEY.md §0.2 [RLE]).

Fully vectorized: values -> bit matrix -> np.packbits(bitorder='little').
Supports bit widths 0..64 (width 0 = all values equal zero).
"""

from __future__ import annotations

import numpy as np


def bit_width_for(max_value: int) -> int:
    """Smallest width that can hold ``max_value`` (an unsigned int)."""
    if max_value < 0:
        raise ValueError("bit_width_for expects a non-negative value")
    return int(max_value).bit_length()


def pack_bits_le(values: np.ndarray, bit_width: int) -> bytes:
    """Pack unsigned ints into ``bit_width`` bits each, LSB-first."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.shape[0]
    if bit_width == 0 or n == 0:
        return b""
    if bit_width > 64:
        raise ValueError(f"bit_width {bit_width} > 64")
    shifts = np.arange(bit_width, dtype=np.uint64)
    # (n, bw) matrix of bits, LSB first, then flatten row-major so the
    # first value's LSB is the stream's first bit.
    bits = ((v[:, None] >> shifts) & np.uint64(1)).astype(np.uint8)
    return np.packbits(bits.ravel(), bitorder="little").tobytes()


def unpack_bits_le(buf: bytes | np.ndarray, bit_width: int, n: int) -> np.ndarray:
    """Inverse of :func:`pack_bits_le`; returns uint64 array of length n."""
    if bit_width == 0:
        return np.zeros(n, dtype=np.uint64)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    raw = np.frombuffer(buf, dtype=np.uint8)
    need_bits = n * bit_width
    bits = np.unpackbits(raw, bitorder="little", count=need_bits)
    bits = bits.reshape(n, bit_width).astype(np.uint64)
    shifts = np.arange(bit_width, dtype=np.uint64)
    return (bits << shifts).sum(axis=1, dtype=np.uint64)


# ---------------------------------------------------------------------------
# BIT_PACK codec (fixed-width packing, no runs) over unsigned residuals.
# The north rule names "bit-pack" as a standalone codec; we expose it for
# low-cardinality unsigned int streams (dict codes, levels, small ints).
# ---------------------------------------------------------------------------

def encode(values: np.ndarray) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(values, dtype=np.uint64)
    bw = bit_width_for(int(v.max())) if v.size else 0
    return pack_bits_le(v, bw), {"bw": bw}


def decode(data: bytes, params: dict, n: int) -> np.ndarray:
    return unpack_bits_le(data, int(params["bw"]), n)
