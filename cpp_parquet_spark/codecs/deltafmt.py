"""Parquet DELTA-family encodings — the FORMAT's value grammars.

The engine's own pages use our FOR/DELTA (`for_.py`) and prefix
front-coding (`prefix.py`) codecs, which are the *semantic* relatives of
these format encodings but deliberately simpler framings.  This module
implements the format grammars themselves — public parquet-format
``Encodings.md`` — so the cross-reader conformance layer
(`cpp_parquet_spark.interop`) can prove our DELTA/prefix/byte-stream
understanding against pyarrow's Parquet reader AND decode
pyarrow-written pages, both directions:

* ``DELTA_BINARY_PACKED`` (enum 5) — ``<block size> <miniblocks per
  block> <total count> <first value>`` header (ULEB128 varints, first
  value zigzag), then per block ``<min delta (zigzag varint)>
  <bitwidths: 1 byte per miniblock> <miniblock bodies>``.  Deltas are
  first differences with WRAPPING arithmetic in the physical int width;
  each block frames them by its min delta (frame-of-reference — the same
  trick as our E6), each miniblock bit-packs its 32 residuals at its own
  width, LSB-first (the same bit order as the RLE hybrid's literal runs,
  so `bitpack.pack_bits_le` is the shared primitive).  In the last
  block, miniblocks past the data carry width 0 and no body; the last
  populated miniblock is zero-padded to 32 values.
* ``DELTA_LENGTH_BYTE_ARRAY`` (enum 6) — int32 DELTA_BINARY_PACKED of
  the byte lengths, then the concatenated bytes.
* ``DELTA_BYTE_ARRAY`` (enum 7) — int32 DBP of shared-prefix lengths
  (vs the PREVIOUS value — incremental/front coding, the format twin of
  our E8c prefix codec), then DELTA_LENGTH_BYTE_ARRAY of the suffixes.

Standard block geometry (what parquet-cpp writes): 128-value blocks,
4 miniblocks of 32.  We emit exactly that; the decoder accepts any legal
geometry from the header.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import bitpack

BLOCK = 128
MINIBLOCKS = 4
MINI = BLOCK // MINIBLOCKS


def _uvarint(x: int) -> bytes:
    out = bytearray()
    while True:
        b = x & 0x7F
        x >>= 7
        if x:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_uvarint(buf, pos: int) -> tuple[int, int]:
    r, s = 0, 0
    while True:
        b = buf[pos]
        pos += 1
        r |= (b & 0x7F) << s
        if not (b & 0x80):
            return r, pos
        s += 7


def _zz_enc(x: int, bits: int) -> int:
    mask = (1 << bits) - 1
    return ((x << 1) ^ (x >> (bits - 1))) & mask


def _zz_dec(u: int) -> int:
    return (u >> 1) ^ -(u & 1)


def dbp_encode(values, bits: int = 64) -> bytes:
    """DELTA_BINARY_PACKED stream for an int column. ``bits`` is the
    physical width (32 for INT32 lengths/prefixes, 64 for INT64) — all
    delta arithmetic wraps at that width, per the format."""
    ut = np.uint64 if bits == 64 else np.uint32
    st = np.int64 if bits == 64 else np.int32
    v = np.ascontiguousarray(values, dtype=st)
    n = int(v.size)
    out = bytearray()
    out += _uvarint(BLOCK) + _uvarint(MINIBLOCKS) + _uvarint(n)
    out += _uvarint(_zz_enc(int(v[0]) if n else 0, bits))
    if n <= 1:
        return bytes(out)
    uv = v.view(ut)
    d = uv[1:] - uv[:-1]                      # wrapping first differences
    mask = (1 << bits) - 1
    for b0 in range(0, d.size, BLOCK):
        db = d[b0:b0 + BLOCK]
        mind = int(db.view(st).min())
        res = (db - ut(mind & mask)).astype(np.uint64)   # wraps, >= 0
        out += _uvarint(_zz_enc(mind, bits))
        widths = bytearray(MINIBLOCKS)
        bodies = bytearray()
        for m in range(MINIBLOCKS):
            mb = res[m * MINI:(m + 1) * MINI]
            if mb.size == 0:
                break                          # width stays 0, no body
            bw = int(mb.max()).bit_length()
            widths[m] = bw
            if bw:
                pad = np.zeros(MINI, np.uint64)
                pad[:mb.size] = mb
                bodies += bitpack.pack_bits_le(pad, bw)
        out += bytes(widths) + bodies
    return bytes(out)


def dbp_decode(buf, pos: int = 0, bits: int = 64
               ) -> tuple[np.ndarray, int]:
    """Decode one DELTA_BINARY_PACKED stream starting at ``pos``;
    returns (int values, position after the stream) — the end position
    matters because DLBA/DBA concatenate streams back to back."""
    ut = np.uint64 if bits == 64 else np.uint32
    st = np.int64 if bits == 64 else np.int32
    block, pos = _read_uvarint(buf, pos)
    nmini, pos = _read_uvarint(buf, pos)
    if block % 128 or block % nmini or (block // nmini) % 32:
        raise ValueError(f"illegal DBP geometry block={block} mini={nmini}")
    mini = block // nmini
    n, pos = _read_uvarint(buf, pos)
    zf, pos = _read_uvarint(buf, pos)
    first = _zz_dec(zf)
    if n == 0:
        return np.empty(0, st), pos
    mask = (1 << bits) - 1
    deltas = np.empty(n - 1, ut)
    got = 0
    while got < n - 1:
        zm, pos = _read_uvarint(buf, pos)
        mind = _zz_dec(zm)
        widths = bytes(buf[pos:pos + nmini])
        pos += nmini
        in_block = min(block, n - 1 - got)
        for m in range(nmini):
            if got >= n - 1 or m * mini >= in_block:
                break
            bw = widths[m]
            take = min(mini, n - 1 - got)
            if bw:
                body = buf[pos:pos + bw * mini // 8]
                pos += bw * mini // 8
                vals = bitpack.unpack_bits_le(body, bw, mini)[:take]
            else:
                vals = np.zeros(take, np.uint64)
            deltas[got:got + take] = vals.astype(ut) + ut(mind & mask)
            got += take
    acc = np.empty(n, ut)
    acc[0] = ut(first & mask)
    acc[1:] = deltas
    np.cumsum(acc, out=acc)                   # wraps in the uint domain
    return acc.view(st), pos


def _as_binary(values) -> pa.Array:
    a = values if isinstance(values, pa.Array) else pa.array(values)
    if isinstance(a, pa.ChunkedArray):
        a = a.combine_chunks()
    return a.cast(pa.large_binary())


def dlba_encode(values) -> bytes:
    """DELTA_LENGTH_BYTE_ARRAY: int32 DBP of lengths + concatenated
    bytes (null-free input — nulls live in the def levels)."""
    a = _as_binary(values)
    # large_binary offsets are int64; slice by the array's own offset
    raw = np.frombuffer(a.buffers()[1], np.int64)
    offs = raw[a.offset:a.offset + len(a) + 1]
    lens = (offs[1:] - offs[:-1]).astype(np.int32)
    data = np.frombuffer(a.buffers()[2], np.uint8)[offs[0]:offs[-1]]
    return dbp_encode(lens, bits=32) + data.tobytes()


def dlba_decode(buf, n: int, pos: int = 0) -> pa.Array:
    lens, pos = dbp_decode(buf, pos, bits=32)
    if lens.size != n:
        raise ValueError(f"DLBA length count {lens.size} != {n}")
    offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens, out=offs[1:])
    payload = bytes(buf[pos:pos + int(offs[-1])])
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(payload)])


def dba_encode(values) -> bytes:
    """DELTA_BYTE_ARRAY (incremental encoding): shared-prefix length vs
    the previous value via int32 DBP, suffixes via DLBA. Prefix lengths
    computed vectorized: equal-prefix run per adjacent pair from one
    padded byte matrix compare."""
    a = _as_binary(values)
    n = len(a)
    if n == 0:
        return dbp_encode(np.empty(0, np.int32), 32) + \
            dlba_encode(pa.array([], pa.large_binary()))
    raw = np.frombuffer(a.buffers()[1], np.int64)
    offs = raw[a.offset:a.offset + n + 1]
    data = np.frombuffer(a.buffers()[2], np.uint8)
    lens = offs[1:] - offs[:-1]
    plens = np.zeros(n, np.int64)
    if n > 1:
        # cap bounds the compare-matrix width; a true shared prefix
        # longer than cap just clamps (legal — the suffix carries the
        # rest), keeping the matrix O(n * 256) bytes
        cap = int(min(lens[:-1].max(initial=0), lens[1:].max(initial=0),
                      256))
        if cap > 0:
            # (n-1, cap) matrices of current vs previous bytes, padded
            # with DISTINCT sentinels so pads never compare equal; the
            # shared-prefix length is the first unequal column.  cap
            # iterations of numpy gathers, never per-value Python.
            cur = np.full((n - 1, cap), -2, np.int16)
            prv = np.full((n - 1, cap), -1, np.int16)
            idx = np.arange(cap)
            m_c = idx[None, :] < lens[1:, None]
            m_p = idx[None, :] < lens[:-1, None]
            cur[m_c] = data[(offs[1:-1][:, None] + idx[None, :])[m_c]]
            prv[m_p] = data[(offs[:-2][:, None] + idx[None, :])[m_p]]
            neq = cur != prv
            any_neq = neq.any(axis=1)
            first_neq = np.where(any_neq, neq.argmax(axis=1), cap)
            plens[1:] = np.minimum(first_neq,
                                   np.minimum(lens[:-1], lens[1:]))
    suf_offs = np.zeros(n + 1, np.int64)
    np.cumsum(lens - plens, out=suf_offs[1:])
    out = np.empty(int(suf_offs[-1]), np.uint8)
    src = np.arange(out.size, dtype=np.int64) + \
        np.repeat(offs[:-1] + plens - suf_offs[:-1], lens - plens)
    out[:] = data[src]
    sufs = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(suf_offs.tobytes()), pa.py_buffer(out.tobytes())])
    return dbp_encode(plens.astype(np.int32), bits=32) + dlba_encode(sufs)


def dba_decode(buf, n: int, pos: int = 0) -> pa.Array:
    plens, pos = dbp_decode(buf, pos, bits=32)
    if plens.size != n:
        raise ValueError(f"DBA prefix count {plens.size} != {n}")
    sufs = dlba_decode(buf, n, pos)
    # prefix carry: value i = value[i-1][:plens[i]] + suffix[i].  The
    # chain is sequential by construction; conformance reads accept the
    # per-value loop (the ENGINE's prefix codec has the vectorized
    # restart-window form — codecs/prefix.py).
    out = []
    prev = b""
    for i in range(n):
        prev = prev[:plens[i]] + sufs[i].as_py()
        out.append(prev)
    return pa.array(out, pa.large_binary())
