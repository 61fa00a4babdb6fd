"""RLE / bit-packed hybrid codec (E3) — the Parquet level/dict-index encoding.

Grammar (arrow/util/rle_encoding.h:46-67, SURVEY.md §0.2 [RLE]; also
parquet.thrift RLE notes)::

    encoded-block := run*
    run := literal-run | repeated-run
    literal-run   := varint(num_groups << 1 | 1) <num_groups * 8 values,
                     bit-packed LSB-first>
    repeated-run  := varint(count << 1) <value padded to whole bytes, LE>

Literal runs always hold a multiple of 8 values; the final group of the
final literal run is zero-padded (decoder knows the true count).

Encoder strategy (vectorized; our own choice — the grammar permits any
valid run split, and our decoder handles every valid stream):

* maximal runs of length >= RLE_MIN (16) become repeated-runs;
* everything between them forms literal segments. A mid-stream literal
  segment must be a multiple of 8 values, so we *steal* up to 7 values
  from the head of the following repeated-run (RLE_MIN=16 guarantees the
  run keeps >= 9 repetitions, still worth a repeated-run);
* the trailing literal segment is zero-padded to a group of 8.

Run detection, stealing and bit-packing are all numpy; the only Python
loop is over *segments* (at most n/RLE_MIN + 1 iterations, never per value).
"""

from __future__ import annotations

import numpy as np

from .bitpack import bit_width_for, pack_bits_le, unpack_bits_le

RLE_MIN = 16  # minimum natural run length promoted to a repeated-run


def _varint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(buf: np.ndarray, pos: int) -> tuple[int, int]:
    shift = 0
    result = 0
    while True:
        b = int(buf[pos])
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7


def encode(values: np.ndarray, bit_width: int | None = None) -> tuple[bytes, dict]:
    """Encode unsigned ints as an RLE/bit-packed hybrid stream."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    n = v.shape[0]
    if bit_width is None:
        bit_width = bit_width_for(int(v.max())) if n else 0
    if n == 0:
        return b"", {"bw": int(bit_width)}
    if bit_width == 0:
        # all zeros: one repeated run (value occupies 0 bytes would be
        # ambiguous; use 1 byte-width floor like Parquet's ceil(bw/8)>=0 —
        # we emit the header only, value width is ceil(0/8)=0 bytes).
        return _varint(n << 1), {"bw": 0}

    # --- locate maximal runs -------------------------------------------------
    change = np.flatnonzero(v[1:] != v[:-1]) + 1
    starts = np.concatenate((np.zeros(1, dtype=np.int64), change))
    ends = np.concatenate((change, np.array([n], dtype=np.int64)))
    lens = ends - starts
    rle_mask = lens >= RLE_MIN
    r_starts = starts[rle_mask]
    r_ends = ends[rle_mask]
    r_vals = v[r_starts] if r_starts.size else np.empty(0, dtype=np.uint64)

    # steal from each repeated-run head so the preceding literal segment is
    # a multiple of 8
    prev_end = np.concatenate((np.zeros(1, dtype=np.int64), r_ends[:-1]))
    lit_before = r_starts - prev_end
    steal = (-lit_before) % 8
    eff_starts = r_starts + steal

    vbytes = (bit_width + 7) // 8
    out = bytearray()
    cursor = 0
    for i in range(eff_starts.shape[0]):
        ls, le = cursor, int(eff_starts[i])
        if le > ls:  # literal segment, guaranteed multiple of 8
            out += _varint(((le - ls) // 8) << 1 | 1)
            out += pack_bits_le(v[ls:le], bit_width)
        count = int(r_ends[i] - eff_starts[i])
        out += _varint(count << 1)
        out += int(r_vals[i]).to_bytes(vbytes, "little")
        cursor = int(r_ends[i])
    if cursor < n:  # trailing literal segment, zero-pad to a group of 8
        seg = v[cursor:n]
        pad = (-seg.shape[0]) % 8
        if pad:
            seg = np.concatenate((seg, np.zeros(pad, dtype=np.uint64)))
        out += _varint((seg.shape[0] // 8) << 1 | 1)
        out += pack_bits_le(seg, bit_width)
    return bytes(out), {"bw": int(bit_width)}


def decode(data: bytes, params: dict, n: int) -> np.ndarray:
    """Decode any valid RLE/bit-packed hybrid stream (not just ours)."""
    bw = int(params["bw"])
    out = np.empty(n, dtype=np.uint64)
    if n == 0:
        return out
    if bw == 0:
        out[:] = 0
        return out
    buf = np.frombuffer(data, dtype=np.uint8)
    vbytes = (bw + 7) // 8
    pos = 0
    filled = 0
    while filled < n:
        header, pos = _read_varint(buf, pos)
        if header & 1:  # literal run
            groups = header >> 1
            count = groups * 8
            nbytes = (count * bw + 7) // 8
            vals = unpack_bits_le(buf[pos : pos + nbytes].tobytes(), bw, count)
            take = min(count, n - filled)
            out[filled : filled + take] = vals[:take]
            filled += take
            pos += nbytes
        else:  # repeated run
            count = header >> 1
            val = int.from_bytes(buf[pos : pos + vbytes].tobytes(), "little")
            take = min(count, n - filled)
            out[filled : filled + take] = val
            filled += take
            pos += vbytes
    return out
