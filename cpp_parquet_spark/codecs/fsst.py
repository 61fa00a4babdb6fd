"""FSST-style string symbol-table codec (E7).

Inspired by Boncz/Lehner/Neumann, "FSST: Fast Random Access String
Compression" (VLDB 2020), as mandated by BASELINE.json:6,14 — a per-page
table of at most 255 multi-byte symbols plus an escape byte; every string
is rewritten as a sequence of 1-byte symbol codes, with out-of-vocabulary
bytes emitted as ``ESC(0xFF) + raw byte``.

This is a from-scratch *vectorized* variant, not the paper's algorithm:
symbols are built by R rounds (default 3) of greedy non-overlapping digram
merging — round r merges pairs of round-(r-1) symbols, so symbol length
doubles per round up to 2**R = 8 bytes, matching FSST's 8-byte symbol cap.
Training and encoding are numpy-only; the single Python loop is over
rounds (3), never over values or bytes (BASELINE.json:15).

Hot-path representation: the working array ``a`` is uint8 (codes 0..253;
254 = SENT, a string-boundary sentinel; 255 = ESC); each round's merge
table is an int16[256, 256] LUT storing ``code + 1`` (0 = no merge), so
the pair gather is one 2-D C-level pass and the ESC/SENT rows/columns
stay 0 by construction. The sentinel makes cross-string merges impossible without
carrying a per-position string-id array through the passes, and because
merges never touch ESC positions, the out-of-vocabulary raw bytes can be
recovered *in original order* from the source data at the end — so the
merge passes touch exactly ONE array (``a``), which is what keeps the
kernel fast when 32 workers share the memory bus.

Page layout (all little-endian)::

    [u16 n_codes][u8 sym_len[n_codes]][flat symbol bytes]
    [u32 enc_len[n_strings]][encoded stream bytes]

Decoding needs only the code->bytes expansions; greedy-merge history is
training-side state.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ESC = 255                     # escape code (always reserved)
SENT = 254                    # string-boundary sentinel (never emitted)
MAX_CODES = 254               # codes 0..253 usable as symbols
ROUNDS = 3                    # symbol length up to 2**ROUNDS = 8 bytes
ROUND_BUDGET = (160, 63, 31)  # max new symbols per round
MIN_PAIR_FREQ = 8             # a pair must occur this often in the sample
MAX_BASE = 240                # more distinct bytes than this -> not texty
TRAIN_BYTES = 1 << 18         # train on at most 256 KiB of the chunk
                              # (trained once per column chunk — the 16 ms
                              # amortizes; +4% ratio over a 64 KiB sample)


class SymbolTable:
    """code -> byte expansion, plus the per-round merge LUTs for encoding."""

    __slots__ = ("base_lut", "expansions", "round_luts", "_enc_luts")

    def __init__(self, base_lut, expansions, round_luts):
        self.base_lut = base_lut          # uint8->code (int16, -1 = OOV)
        self.expansions = expansions      # list[bytes], index = code
        self.round_luts = round_luts      # list of int16[256,256] (code+1) LUTs
        self._enc_luts = None             # lazy uint8 encode-side LUTs

    def enc_luts(self):
        """(base_lut8 as pa.Array, [flat round luts as pa.Array uint8]) —
        the encode hot path gathers through Arrow ``take`` (uint16 indices
        stay uint16 inside the kernel; numpy fancy-indexing upcasts every
        index to int64 and measured 4-6x slower on the same LUTs). Codes
        fit uint8: 0..253, ESC=255 marks OOV in base_lut8; round LUT
        entries are code+1 <= 254."""
        if self._enc_luts is None:
            base8 = np.where(self.base_lut < 0, ESC,
                             self.base_lut).astype(np.uint8)
            self._enc_luts = (pa.array(base8),
                              [pa.array(l.astype(np.uint8).ravel())
                               for l in self.round_luts])
        return self._enc_luts


def _flatten(values) -> tuple[np.ndarray, np.ndarray]:
    """pa.Array/sequence of str|bytes -> (flat uint8 bytes, byte_lens int64)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if not isinstance(values, pa.Array):
        first = next((v for v in values if v is not None), "")
        typ = pa.large_binary() if isinstance(first, bytes) else pa.large_string()
        values = pa.array(values, type=typ)
    arr = values
    if not pa.types.is_large_binary(arr.type):
        arr = arr.cast(pa.large_binary())
    offsets = np.frombuffer(arr.buffers()[1], dtype=np.int64,
                            count=len(arr) + 1, offset=arr.offset * 8)
    lens = np.diff(offsets)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8,
                         count=int(offsets[-1]))[int(offsets[0]):]
    return data, lens


def _pair_keys(a: np.ndarray) -> np.ndarray:
    """uint16 key (left<<8)|right for each adjacent pair of uint8 codes."""
    k = a[:-1].astype(np.uint16)
    k <<= 8
    k |= a[1:]
    return k


def _sub_pass(a: np.ndarray, lut_pa: "pa.Array") -> np.ndarray:
    """One greedy non-overlapping pair-substitution pass.

    a: uint8 codes (SENT breaks strings, ESC marks OOV);
    lut_pa: pa.Array uint8[65536] flat merge table storing ``code + 1``
    (0 = no merge; ESC/SENT rows and columns are 0 by construction, so no
    merge can cross a string boundary or swallow an escape). The gather
    runs through Arrow ``take`` — it keeps uint16 indices uint16, where
    numpy's fancy index upcasts every index to int64 (measured 0.57 ms vs
    3.2 ms on a 1.5M-key segment); the result buffer is re-viewed as
    numpy zero-copy.

    Greedy selection (even offsets within each maximal run of consecutive
    match positions) is BIT-PARALLEL: the match mask packs to a CPython
    big integer (bit i = position i, little-endian) and the run-parity
    propagates by doubling — ``K = starts; K |= (K << s) & P; P &= P << s``
    with ``P`` = "this and previous both match", O(log longest-run)
    word-wide passes. Measured 4.6x faster than the previous int32
    ``maximum.accumulate`` parity scan, bit-identical output. The
    substitution is a branch-free byte-wise bit-select
    (``(z-1)&m | a&~m`` with m = keep*0xFF — no per-element branch,
    measured 1.15x over ``np.where``), and the compaction is one
    ``np.compress`` over the alive mask."""
    n = a.shape[0]
    if n < 2:
        return a
    k16 = a[:-1].astype(np.uint16)
    k16 <<= 8
    k16 |= a[1:]
    zt = lut_pa.take(pa.array(k16))
    z = np.frombuffer(zt.buffers()[1], np.uint8, n - 1, offset=zt.offset)
    x = int.from_bytes(
        np.packbits(z.astype(bool), bitorder="little").tobytes(), "little")
    if x == 0:
        return a
    keep_i = x & ~(x << 1)              # run starts (offset 0: kept)
    p = x & (x << 1)                    # i and i-1 both match
    s = 2
    while p:
        keep_i |= (keep_i << s) & p
        p &= p << s
        s <<= 1
    kb = np.frombuffer(keep_i.to_bytes((n - 1 + 7) // 8 + 16, "little"),
                       np.uint8)
    keep = np.unpackbits(kb, bitorder="little",
                         count=n - 1).view(bool)
    # alive mask comes free in the bigint domain (position i+1 dies when
    # keep[i])
    dead = keep_i << 1
    alive_b = np.frombuffer(
        ((~dead) & ((1 << n) - 1)).to_bytes((n + 7) // 8 + 16, "little"),
        np.uint8)
    alive = np.unpackbits(alive_b, bitorder="little", count=n).view(bool)
    mask8 = keep.view(np.uint8) * np.uint8(255)
    hi = z - np.uint8(1)      # uint8 wrap at non-match positions is masked
    hi &= mask8
    out = np.empty(n, dtype=np.uint8)
    np.bitwise_and(a[:-1], ~mask8, out=out[:-1])
    out[:-1] |= hi
    out[-1] = a[-1]
    return np.compress(alive, out)


def _with_sentinels(codes: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Interleave SENT after each string: [s0.., SENT, s1.., SENT, ...].

    Two regimes: few long strings (the usual source-code segment, ~100
    strings of ~2.5 KB) place each string with ONE slice memcpy — a
    short Python loop beats building output-length index arrays by ~8x;
    many tiny strings fall back to the vectorized scatter with int32
    index arithmetic (segment sizes are bounded by SEG_BYTES << 2^31)."""
    n = lens.shape[0]
    total = codes.shape[0] + n
    a = np.full(total, SENT, dtype=np.uint8)
    if n <= 512:
        pos = 0
        src = 0
        for ln in lens.tolist():
            a[pos: pos + ln] = codes[src: src + ln]
            pos += ln + 1
            src += ln
        return a
    sid = np.repeat(np.arange(n, dtype=np.int32), lens)
    a[np.arange(codes.shape[0], dtype=np.int32) + sid] = codes
    return a


def train(values) -> SymbolTable | None:
    """Build a symbol table from (a sample of) the given strings.

    Deterministic. Returns None when the data is not FSST-friendly
    (too many distinct bytes, i.e. binary-ish, or nothing merges).
    """
    data, lens = _flatten(values)
    if data.shape[0] == 0:
        return None
    if data.shape[0] > TRAIN_BYTES:
        # deterministic prefix of whole strings totalling ~TRAIN_BYTES
        cum = np.cumsum(lens)
        k = min(int(np.searchsorted(cum, TRAIN_BYTES)), lens.shape[0] - 1)
        data = data[: int(cum[k])]
        lens = lens[: k + 1]
    present = np.flatnonzero(np.bincount(data, minlength=256))
    nbase = present.shape[0]
    if nbase > MAX_BASE:
        return None
    base_lut = np.full(256, -1, dtype=np.int16)
    base_lut[present] = np.arange(nbase, dtype=np.int16)
    expansions: list[bytes] = [bytes([b]) for b in present.tolist()]

    # no OOV possible during training (base = this data's byte set)
    a = _with_sentinels(base_lut[data].astype(np.uint8), lens)
    vocab = nbase
    round_luts: list[np.ndarray] = []
    for r in range(ROUNDS):
        budget = min(ROUND_BUDGET[r], MAX_CODES - vocab)
        if budget <= 0 or a.shape[0] < 2:
            break
        freq = np.bincount(_pair_keys(a), minlength=65536).reshape(256, 256)
        freq[SENT, :] = 0
        freq[:, SENT] = 0
        freq = freq.ravel()
        order = np.argsort(freq, kind="stable")[::-1][:budget]
        order = order[freq[order] >= MIN_PAIR_FREQ]
        if order.shape[0] == 0:
            break
        lut = np.zeros((256, 256), dtype=np.int16)   # code+1; 0 = no merge
        lut.ravel()[order] = np.arange(vocab + 1, vocab + 1 + order.shape[0],
                                       dtype=np.int16)
        for pair_key in order.tolist():
            x, y = pair_key >> 8, pair_key & 0xFF
            expansions.append(expansions[x] + expansions[y])
        round_luts.append(lut)
        a = _sub_pass(a, pa.array(lut.astype(np.uint8).ravel()))
        vocab += order.shape[0]
    if not round_luts:
        return None
    return SymbolTable(base_lut, expansions, round_luts)


#: segment target for the encode passes. Each segment's temporaries are
#: ~12x this size. Re-measured after the Arrow-take/bit-select kernel
#: (2026-08-20, sf0.1 documents.text): single-thread 0.074 GB/s at
#: 128 KiB vs 0.071 at 256 KiB and 0.056 at 512 KiB; 32-way
#: multiprocessing aggregate 1.21 GB/s at 128 KiB vs 1.14 / 0.87 —
#: the hot set (a, k16, z, masks) fits the per-core L2 at 128 KiB and
#: the cheaper kernel no longer amortizes Python dispatch any better
#: at 256 KiB. (Old kernel's 32-way aggregate on this corpus: 0.33.)
SEG_BYTES = 1 << 17


def _encode_segment(data: np.ndarray, lens: np.ndarray,
                    table: SymbolTable) -> tuple[np.ndarray, np.ndarray]:
    """Encode a group of whole strings; returns (out uint8, enc_lens u32)."""
    n = lens.shape[0]
    base8, round_flat = table.enc_luts()
    ct = base8.take(pa.array(data))       # arrow take: uint8 idx stays u8
    codes8 = np.frombuffer(ct.buffers()[1], np.uint8, data.shape[0],
                           offset=ct.offset)
    oov = codes8 == ESC                   # ESC is never a legal base code
    a = _with_sentinels(codes8, lens)
    for lut in round_flat:
        a = _sub_pass(a, lut)
    n_oov = int(oov.sum())
    if n_oov * 16 < a.shape[0]:
        # low-OOV fast path (the common case: the training sample's byte
        # set covers almost all of the segment): every surviving code
        # emits 1 byte, so the output is the stream minus sentinels with
        # the few OOV raw bytes np.insert-ed after their ESC markers,
        # and per-string lengths fall out of the sentinel positions —
        # skips the full-width cumsum + double-scatter emit (measured
        # 16x faster at zero OOV, ~4x at 1/16 OOV density)
        is_sent = a == SENT
        sent_pos = np.flatnonzero(is_sent)
        out = a[~is_sent]
        enc_lens = np.empty(n, dtype=np.uint32)
        enc_lens[0] = sent_pos[0]
        np.subtract(sent_pos[1:], sent_pos[:-1], out=enc_lens[1:],
                    casting="unsafe")
        enc_lens[1:] -= 1
        if n_oov:
            esc_pos = np.flatnonzero(a == ESC)
            owner = np.searchsorted(sent_pos, esc_pos)   # string index
            # position of each ESC inside `out` = its position in `a`
            # minus the sentinels before it (= its owner index)
            out = np.insert(out, esc_pos - owner + 1, data[oov])
            enc_lens += np.bincount(owner, minlength=n).astype(np.uint32)
        return out, enc_lens
    # merges never consume ESC or SENT, so the surviving ESC positions map
    # 1:1, in order, onto the OOV bytes of the original data
    is_esc = a == ESC
    is_sent = a == SENT
    # int32 throughout: output size is bounded by 2x the segment bytes
    out_w = is_esc.astype(np.int32)       # escape emits 2 bytes
    out_w += 1
    out_w[is_sent] = 0                    # sentinels emit nothing
    offs = np.zeros(a.shape[0] + 1, dtype=np.int32)
    np.cumsum(out_w, out=offs[1:])
    out = np.empty(int(offs[-1]), dtype=np.uint8)
    emit = ~is_sent
    out[offs[:-1][emit]] = a[emit]
    out[offs[:-1][is_esc] + 1] = data[oov]
    # per-string encoded lengths from the running width at each sentinel
    ends = offs[1:][is_sent]
    enc_lens = np.empty(n, dtype=np.uint32)
    enc_lens[0] = ends[0]
    np.subtract(ends[1:], ends[:-1], out=enc_lens[1:], casting="unsafe")
    return out, enc_lens


def _encode_with_table(values, table: SymbolTable) -> tuple[bytes, np.ndarray]:
    """Returns (stream bytes, per-string encoded byte lengths).

    Work proceeds in string-aligned segments of ~SEG_BYTES: string
    boundaries already stop merges, so segmenting is bit-identical to the
    unsegmented encode while keeping the temporaries cache-resident."""
    data, lens = _flatten(values)
    n = lens.shape[0]
    if n == 0:
        return b"", np.empty(0, dtype=np.uint32)
    if data.shape[0] <= SEG_BYTES:
        out, enc_lens = _encode_segment(data, lens, table)
        return out.tobytes(), enc_lens
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=cum[1:])
    # segment cut points (string indices) at ~SEG_BYTES byte strides
    targets = np.arange(1, int(cum[-1] // SEG_BYTES) + 2,
                        dtype=np.int64) * SEG_BYTES
    cuts = np.unique(np.searchsorted(cum, targets).clip(1, n))
    if cuts[-1] != n:
        cuts = np.append(cuts, n)
    outs, lens_parts = [], []
    prev = 0
    for c in cuts.tolist():
        seg_out, seg_lens = _encode_segment(
            data[int(cum[prev]): int(cum[c])], lens[prev:c], table)
        outs.append(seg_out)
        lens_parts.append(seg_lens)
        prev = c
    return (np.concatenate(outs).tobytes(),
            np.concatenate(lens_parts))


def encode(values, table: SymbolTable | None = None) -> tuple[bytes, dict]:
    if table is None:
        table = train(values)
    if table is None:
        raise ValueError("fsst: data not trainable (caller should fall back)")
    stream, enc_lens = _encode_with_table(values, table)
    n_codes = len(table.expansions)
    sym_lens = np.array([len(s) for s in table.expansions], dtype=np.uint8)
    flat = b"".join(table.expansions)
    head = (np.uint16(n_codes).tobytes() + sym_lens.tobytes() + flat
            + enc_lens.tobytes())
    # nesc: ESC count in the stream. 0 lets decode skip both the escape
    # scan and the escape-resolution pass (the pair-table fast path);
    # older pages without the param fall back to scanning.
    nesc = int(np.count_nonzero(np.frombuffer(stream, np.uint8) == ESC)) \
        if stream else 0
    return head + stream, {"nesc": nesc}


#: pair-expansion tables memoized per symbol table (pages of one column
#: chunk share the table bytes, so a full-chunk decode builds it once).
#: Keyed by the page head bytes (n_codes + sym_lens + flat symbols).
_PAIR_CACHE: dict = {}
_PAIR_CACHE_MAX = 8


def _pair_table(head: bytes, sym_lens: np.ndarray, flat: np.ndarray):
    """65536-row binary table: row k (little-endian key ``left | right<<8``,
    so stream PAIR keys are a zero-copy uint16 view) holds
    ``exp[left] + exp[right]``. Codes >= n_codes (incl. ESC and SENT)
    expand empty — which makes ESC a free right-pad for odd streams.
    Built vectorized (~4 ms, <=2 MB) and memoized across pages."""
    ent = _PAIR_CACHE.get(head)
    if ent is not None:
        return ent
    n_codes = sym_lens.shape[0]
    lens256 = np.zeros(256, np.int64)
    lens256[:n_codes] = sym_lens
    offs256 = np.zeros(257, np.int64)
    np.cumsum(lens256, out=offs256[1:])
    kk = np.arange(65536, dtype=np.int64)
    left = kk & 255
    right = kk >> 8
    ll = lens256[left]
    lr = lens256[right]
    toffs = np.zeros(65537, np.int64)
    np.cumsum(ll + lr, out=toffs[1:])
    tdata = np.empty(int(toffs[-1]), np.uint8)
    # scatter the left then right halves of every row: one repeat/arange
    # pass per half over ~2x the table bytes
    for lens_h, code_h, base in ((ll, left, None), (lr, right, ll)):
        rep = np.repeat(kk, lens_h)
        outp = np.arange(rep.shape[0], dtype=np.int64)
        start = np.repeat(np.cumsum(lens_h) - lens_h, lens_h)
        j = outp - start
        dst = toffs[rep] + j
        if base is not None:
            dst += base[rep]
        tdata[dst] = flat[offs256[code_h[rep]] + j]
    symtab = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), 65536,
        [None, pa.py_buffer(toffs.tobytes()), pa.py_buffer(tdata.tobytes())])
    if len(_PAIR_CACHE) >= _PAIR_CACHE_MAX:
        _PAIR_CACHE.pop(next(iter(_PAIR_CACHE)))
    _PAIR_CACHE[head] = (symtab, lens256)
    return symtab, lens256


def decode(data: bytes, params: dict, n: int, tag: str = "str"):
    """Decode = ONE Arrow binary ``take`` over PAIRS of stream codes.

    The escape-free fast path (``nesc == 0`` — the overwhelmingly common
    case once a chunk-level table is trained on its own data) gathers
    through the memoized 65536-row pair table of `_pair_table`: keys are
    a zero-copy little-endian uint16 view of the stream (odd streams get
    one ESC pad byte — ESC expands empty), halving take elements and
    skipping the escape-resolution pass entirely. String boundaries at
    odd stream positions land inside a pair; their offset is the pair
    start plus the first code's expansion length. Measured 2.0x the
    single-code kernel on source code (0.24 GB/s/thread) and 4.4x on
    prose (0.50) — gain grows with codes-per-byte. Escaped pages fall
    back to `_decode_single`, bit-identical either way."""
    raw = np.frombuffer(data, dtype=np.uint8)
    n_codes = int(raw[:2].view(np.uint16)[0])
    pos = 2
    sym_lens = raw[pos: pos + n_codes].astype(np.int64)
    pos += n_codes
    flat_len = int(sym_lens.sum())
    flat = raw[pos: pos + flat_len]
    head = raw[: pos + flat_len].tobytes()   # hashable cache key (tiny)
    pos += flat_len
    enc_lens = raw[pos: pos + 4 * n].view(np.uint32).astype(np.int64)
    pos += 4 * n
    s = raw[pos:]
    ns = s.shape[0]
    if ns == 0:
        return _decode_single(data, params, n, tag)
    nesc = params.get("nesc")
    if nesc is None:                      # pre-flag page: one scan
        nesc = int(np.any(s == ESC))
    if nesc:
        return _decode_single(data, params, n, tag)
    cum = np.zeros(n + 1, np.int64)
    np.cumsum(enc_lens, out=cum[1:])
    symtab, lens256 = _pair_table(head, sym_lens, flat)
    if ns & 1:
        s2 = np.empty(ns + 1, np.uint8)
        s2[:-1] = s
        s2[-1] = ESC                      # expands empty: pure pad
        s = s2
    keys = s.view(np.uint16)              # LE pair keys, zero-copy
    taken = symtab.take(pa.array(keys))
    out_offs = np.frombuffer(taken.buffers()[1], np.int64,
                             keys.shape[0] + 1, offset=taken.offset * 8)
    str_offs = out_offs[cum >> 1].copy()
    odd = (cum & 1).astype(bool)
    if odd.any():
        str_offs[odd] += lens256[s[cum[odd] - 1]]
    dbuf = taken.buffers()[2]
    arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(np.ascontiguousarray(str_offs).tobytes()),
         dbuf if dbuf is not None else pa.py_buffer(b"")])
    return arr.cast(pa.large_string()) if tag == "str" else arr


def _decode_single(data: bytes, params: dict, n: int, tag: str = "str"):
    """Single-code decode (escape-capable): one Arrow binary ``take``.

    Every stream byte maps to an entry of a 513-row binary symbol table
    (rows 0..255: the code expansions; rows 256..511: the 256 possible
    raw escape-payload bytes as single-byte entries; row 512: empty) and
    ``symtab.take(idx)`` materializes the entire concatenated output —
    offsets AND data — in one C++ kernel. Escapes become index fixups on
    the (sparse) 0xFF positions: the marker position maps to the raw
    byte's row, the payload position maps to the empty row. The decoded
    string array is then assembled ZERO-COPY: its data buffer IS the
    take result's, and its offsets are the take offsets gathered at the
    string boundaries. Replaces the round-3 padded-gather kernel whose
    per-output-byte numpy index math (repeat + arange + add + gather)
    capped it at ~0.06 GB/s/thread — this shape measures ~10x that."""
    raw = np.frombuffer(data, dtype=np.uint8)
    n_codes = int(raw[:2].view(np.uint16)[0])
    pos = 2
    sym_lens = raw[pos : pos + n_codes].astype(np.int64)
    pos += n_codes
    flat_len = int(sym_lens.sum())
    flat = raw[pos : pos + flat_len]
    pos += flat_len
    enc_lens = raw[pos : pos + 4 * n].view(np.uint32).astype(np.int64)
    pos += 4 * n
    s = raw[pos:]
    cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(enc_lens, out=cum[1:])
    ns = s.shape[0]
    if ns == 0:
        return pa.LargeBinaryArray.from_buffers(
            pa.large_binary(), n,
            [None, pa.py_buffer(np.zeros(n + 1, np.int64).tobytes()),
             pa.py_buffer(b"")],
        ).cast(pa.large_string() if tag == "str" else pa.large_binary())

    # per-page symbol table (tiny: <= 254 expansions + 256 raw bytes)
    tab_lens = np.zeros(513, dtype=np.int64)
    tab_lens[:n_codes] = sym_lens
    tab_lens[256:512] = 1
    toffs = np.zeros(514, dtype=np.int64)
    np.cumsum(tab_lens, out=toffs[1:])
    tdata = np.concatenate([flat, np.arange(256, dtype=np.uint8)])
    symtab = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), 513,
        [None, pa.py_buffer(toffs.tobytes()), pa.py_buffer(tdata.tobytes())])

    idx = s.astype(np.int32)
    # -- escape resolution: in each maximal chain of consecutive 0xFF
    # bytes (chains also break at string boundaries), even offsets are
    # escape MARKERS and odd offsets are their raw payload bytes. Only
    # the (sparse) 0xFF positions are touched — string ids come from one
    # searchsorted over those positions, not a stream-length sid array.
    p = np.flatnonzero(s == ESC)
    if p.size:
        sid_p = np.searchsorted(cum, p, side="right")
        ar = np.arange(p.size, dtype=np.int64)
        new_chain = np.empty(p.size, dtype=bool)
        new_chain[0] = True
        new_chain[1:] = (np.diff(p) > 1) | (sid_p[1:] != sid_p[:-1])
        chain_first = np.maximum.accumulate(np.where(new_chain, ar, 0))
        esc_pos = p[((ar - chain_first) & 1) == 0]
        raw_pos = esc_pos + 1
        idx[esc_pos] = s[raw_pos].astype(np.int32) + 256
        idx[raw_pos] = 512
    taken = symtab.take(pa.array(idx))
    out_offs = np.frombuffer(taken.buffers()[1], np.int64, ns + 1,
                             offset=taken.offset * 8)
    str_offs = out_offs[cum]          # string boundaries, zero-copy data
    dbuf = taken.buffers()[2]
    arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(np.ascontiguousarray(str_offs).tobytes()),
         dbuf if dbuf is not None else pa.py_buffer(b"")],
    )
    return arr.cast(pa.large_string()) if tag == "str" else arr
