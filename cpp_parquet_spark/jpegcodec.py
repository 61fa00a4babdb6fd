"""Baseline JPEG (JFIF) codec in pure numpy — no Pillow/libjpeg.

Scope: sequential baseline DCT (SOF0), 8-bit, Huffman entropy coding,
1 or 3 components, 4:4:4 / 4:2:2 / 4:2:0 chroma subsampling, restart
markers. Progressive (SOF2), arithmetic coding, and 12-bit raise
``NotImplementedError`` naming the feature.

Shape of the implementation (decode):

1. marker walk: DQT / DHT / SOF0 / DRI / SOS parsed, APPn/COM skipped;
2. entropy decode: a Python bit reader over the de-stuffed scan bytes
   walks MCUs emitting quantized coefficient blocks — bit-serial by
   nature (each Huffman code's length depends on the previous), so this
   loop is per-block Python; fine for the thumbnail/asset-sized images
   a feature pipeline samples, honest about not being a hot kernel;
3. the numeric heavy half IS vectorized: dezigzag + dequantize + 2-D
   IDCT run over ALL blocks of a component at once (einsum with the
   8x8 DCT-II basis), then block reassembly, nearest chroma upsample,
   and the BT.601 full-range YCbCr->RGB matrix.

The encoder (`encode_jpeg`) emits single-table 4:4:4 baseline JFIF with
the Annex K example quantization tables scaled by a quality factor and
the Annex K typical Huffman tables — every structural feature the
decoder consumes, built by an independent forward path (fwd DCT +
zigzag + run/size Huffman), so encode->decode roundtrips cross-check
the two directions quantitatively (PSNR; bit-exact on flat blocks).

Validated additionally against foreign-encoder JPEGs shipped in the
container (tests/test_jpeg.py), including a cross-FORMAT check: the
same 16x16 Python-logo asset exists as both .jpg and .png, so our JPEG
decode is compared pixel-wise against our independent PNG decode.
"""

from __future__ import annotations

import struct

import numpy as np

# --- 8x8 DCT basis (DCT-II, orthonormal) --------------------------------------

_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16.0)
_C *= np.sqrt(2.0 / 8.0)
_C[0] *= np.sqrt(0.5)

#: zigzag order: index i of the stream -> (row, col) of the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63],
    dtype=np.int64)

# Annex K (ITU T.81) example luminance / chrominance quantization tables
QL = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103,
    99], dtype=np.int64)
QC = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99],
    dtype=np.int64)

# Annex K typical Huffman tables: (bits[1..16], huffval)
_DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
         list(range(12)))
_DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
         list(range(12)))
_AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
_AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


class _HuffTable:
    """Canonical Huffman decode table: (length, code) -> symbol, plus a
    fast (maxlen-bounded) lookup dict keyed by the code's bit string
    value at its length."""

    def __init__(self, bits, huffval):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lookup[(ln, code)] = huffval[k]
                k += 1
                code += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over de-stuffed scan bytes."""

    __slots__ = ("data", "pos", "acc", "nbits")

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            self.acc = (self.acc << 8) | self.data[self.pos]
            self.pos += 1
            self.nbits += 8

    def bits(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
            if self.nbits < n:       # pad past the end (spec: 1-bits)
                self.acc = (self.acc << 8) | 0xFF
                self.nbits += 8
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: _HuffTable) -> int:
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.bits(1)
            sym = table.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("jpeg: invalid Huffman code in scan")

    def reset(self) -> None:
        self.acc = 0
        self.nbits = 0


def _extend(v: int, t: int) -> int:
    """T.81 EXTEND: t-bit magnitude v -> signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _idct_blocks(coefs: np.ndarray) -> np.ndarray:
    """[n, 8, 8] dequantized coefficient blocks -> spatial samples
    (float), vectorized 2-D IDCT: X = C^T K C."""
    return np.einsum("ki,nkl,lj->nij", _C, coefs, _C, optimize=True)


def _fdct_blocks(blocks: np.ndarray) -> np.ndarray:
    """[n, 8, 8] spatial -> DCT coefficients: K = C X C^T."""
    return np.einsum("ik,nkl,jl->nij", _C, blocks, _C, optimize=True)


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline JFIF bytes -> uint8 image ([h, w] gray or [h, w, 3]
    RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, _HuffTable] = {}
    ac_tabs: dict[int, _HuffTable] = {}
    comps = None                      # [(cid, h, v, tq)]
    w = h = None
    restart = 0
    scan_map = None                   # [(comp_idx, dc_id, ac_id)]
    scan_data = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            pos += 1
            continue
        marker = payload[pos + 1]
        pos += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue                  # standalone
        seg_len = struct.unpack(">H", payload[pos:pos + 2])[0]
        seg = payload[pos + 2: pos + seg_len]
        pos += seg_len
        if marker == 0xDB:            # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                if pq != 0:
                    raise NotImplementedError("jpeg: 16-bit quant table")
                qt[tq] = np.frombuffer(seg[p + 1: p + 65],
                                       np.uint8).astype(np.int64)
                p += 65
        elif marker == 0xC4:          # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                bits = list(seg[p + 1: p + 17])
                n = sum(bits)
                vals = list(seg[p + 17: p + 17 + n])
                (dc_tabs if tc == 0 else ac_tabs)[th] = \
                    _HuffTable(bits, vals)
                p += 17 + n
        elif marker == 0xC0:          # SOF0 baseline
            _prec, h, w, nc = struct.unpack(">BHHB", seg[:6])
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i: 9 + 3 * i]
                comps.append((cid, hv >> 4, hv & 15, tq))
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"jpeg: SOF{marker - 0xC0} (progressive/extended/"
                "arithmetic) unsupported — baseline SOF0 only")
        elif marker == 0xDD:          # DRI
            restart = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:          # SOS
            ns = seg[0]
            scan_map = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i: 3 + 2 * i]
                ci = next(j for j, c in enumerate(comps)
                          if c[0] == cs)
                scan_map.append((ci, tt >> 4, tt & 15))
            scan_data = payload[pos:]
            break
    if comps is None or scan_data is None:
        raise ValueError("jpeg: missing SOF0/SOS")

    # de-stuff: 0xFF00 -> 0xFF; cut at any non-RST marker; record RSTs
    raw = np.frombuffer(scan_data, np.uint8)
    out_bytes = bytearray()
    seg_bounds = []                   # byte offsets where RST occurred
    i = 0
    while i < len(raw):
        b = int(raw[i])
        if b != 0xFF:
            out_bytes.append(b)
            i += 1
            continue
        nxt = int(raw[i + 1]) if i + 1 < len(raw) else 0xD9
        if nxt == 0x00:
            out_bytes.append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            seg_bounds.append(len(out_bytes))
            i += 2
        else:
            break                     # EOI or next header
    rdr = _BitReader(bytes(out_bytes))
    seg_iter = iter(seg_bounds)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    blocks: list[list[np.ndarray]] = [[] for _ in comps]
    pred = [0] * len(comps)
    n_mcu = 0
    for _my in range(mcuy):
        for _mx in range(mcux):
            if restart and n_mcu and n_mcu % restart == 0:
                # RST boundary: drop buffered bits, jump the byte
                # cursor to the recorded restart-segment start, reset
                # the DC predictors (T.81 F.2.1.3.1)
                rdr.reset()
                b = next(seg_iter, None)
                if b is not None:
                    rdr.pos = b
                pred = [0] * len(comps)
            n_mcu += 1
            for ci, dc_id, ac_id in scan_map:
                _cid, ch, cv, _tq = comps[ci]
                for _ in range(ch * cv):
                    coef = np.zeros(64, np.int64)
                    t = rdr.huff(dc_tabs[dc_id])
                    diff = _extend(rdr.bits(t), t)
                    pred[ci] += diff
                    coef[0] = pred[ci]
                    k = 1
                    while k < 64:
                        rs = rdr.huff(ac_tabs[ac_id])
                        r, s = rs >> 4, rs & 15
                        if s == 0:
                            if r == 15:
                                k += 16          # ZRL
                                continue
                            break                # EOB
                        k += r
                        if k > 63:
                            raise ValueError("jpeg: AC run overflow")
                        coef[k] = _extend(rdr.bits(s), s)
                        k += 1
                    blocks[ci].append(coef)

    # vectorized numeric half: dezigzag + dequant + IDCT per component
    planes = []
    for ci, (cid, ch, cv, tq) in enumerate(comps):
        bw, bh = mcux * ch, mcuy * cv           # blocks per row / col
        z = np.stack(blocks[ci]) if blocks[ci] else \
            np.zeros((0, 64), np.int64)
        deq = np.zeros((z.shape[0], 64), np.int64)
        # the DQT table is stored in ZIGZAG order like the coefficient
        # stream itself: entry i quantizes stream position i, landing
        # at natural position ZIGZAG[i]
        deq[:, ZIGZAG] = z * qt[tq]
        spat = _idct_blocks(deq.reshape(-1, 8, 8)) + 128.0
        # blocks arrive MCU-major: for each MCU, cv x ch blocks
        plane = np.zeros((bh * 8, bw * 8))
        bi = 0
        for my in range(mcuy):
            for mx in range(mcux):
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        plane[y0:y0 + 8, x0:x0 + 8] = spat[bi]
                        bi += 1
        # nearest upsample to full resolution
        ry, rx = vmax // cv, hmax // ch
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, 0), rx, 1)
        planes.append(plane[:h, :w])
    if len(planes) == 1:
        return np.clip(planes[0].round(), 0, 255).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb.round(), 0, 255).astype(np.uint8)


# --- encoder (baseline 4:4:4, Annex K tables) ---------------------------------

class _HuffEnc:
    """symbol -> (code, length) from a (bits, huffval) table."""

    def __init__(self, bits, huffval):
        self.codes: dict[int, tuple[int, int]] = {}
        code = 0
        k = 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.codes[huffval[k]] = (code, ln)
                k += 1
                code += 1
            code <<= 1


class _BitWriter:
    __slots__ = ("out", "acc", "nbits")

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, ln: int) -> None:
        self.acc = (self.acc << ln) | code
        self.nbits += ln
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)      # byte stuffing
            self.acc &= (1 << self.nbits) - 1

    def flush(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits


def _cat(v: int) -> int:
    """magnitude category (bit length) of a signed coefficient."""
    return int(abs(v)).bit_length()


def _mag_bits(v: int, t: int) -> int:
    """signed value -> t-bit magnitude code (one's complement for
    negatives, per T.81)."""
    return v if v >= 0 else v + (1 << t) - 1


def _scaled_q(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-style quality scaling of an Annex K table (50 = as-is,
    higher = finer)."""
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base * s + 50) // 100
    return np.clip(q, 1, 255)


def encode_jpeg(img: np.ndarray, quality: int = 85,
                subsampling: str = "444",
                restart_interval: int = 0) -> bytes:
    """uint8 gray [h, w] or RGB [h, w, 3] -> baseline JFIF bytes
    (Annex K quantization scaled by ``quality`` + typical Huffman
    tables). ``subsampling``: "444" (one block per component per MCU)
    or "420" (16x16 MCUs: 4 Y blocks + box-averaged Cb + Cr — the
    photographic default, exercising the decoder's interleave +
    upsample path). ``restart_interval`` > 0 emits DRI + RSTn markers
    every N MCUs (byte-aligned, DC predictors reset). An independent
    forward path for the decoder to cross-check: fwd DCT (einsum
    basis), zigzag, run/size Huffman, byte stuffing."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w = img.shape[:2]
    gray = img.ndim == 2
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    sub420 = subsampling == "420" and not gray
    if gray:
        planes = [img.astype(np.float64)]
    else:
        rgb = img.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        planes = [y, cb, cr]
    qls = _scaled_q(QL, quality)
    qcs = _scaled_q(QC, quality)
    qtabs = [qls] if gray else [qls, qcs]
    enc_dc = [_HuffEnc(*_DC_L)] if gray else \
        [_HuffEnc(*_DC_L), _HuffEnc(*_DC_C)]
    enc_ac = [_HuffEnc(*_AC_L)] if gray else \
        [_HuffEnc(*_AC_L), _HuffEnc(*_AC_C)]

    mcu_px = 16 if sub420 else 8
    mcux = (w + mcu_px - 1) // mcu_px
    mcuy = (h + mcu_px - 1) // mcu_px

    def _pad_edge(plane, ph, pw):
        hh, ww = plane.shape
        pad = np.empty((ph, pw))
        pad[:hh, :ww] = plane
        pad[hh:, :ww] = plane[hh - 1: hh, :]
        pad[:, ww:] = pad[:, ww - 1: ww]
        return pad

    def _block_coefs(plane, pi, bh, bw):
        """plane -> quantized zigzag coefficients [bh, bw, 64]."""
        pad = _pad_edge(plane, bh * 8, bw * 8)
        blocks = (pad.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3)
                  .reshape(-1, 8, 8) - 128.0)
        coefs = _fdct_blocks(blocks)
        # QL/QC above are written in NATURAL row-major order; the DQT
        # segment emits them re-ordered to zigzag below
        qm = qtabs[min(pi, len(qtabs) - 1)].reshape(8, 8)
        qq = np.round(coefs / qm).astype(np.int64)
        return qq.reshape(-1, 64)[:, ZIGZAG].reshape(bh, bw, 64)

    if sub420:
        ydown = None
        yq = _block_coefs(planes[0], 0, mcuy * 2, mcux * 2)
        # 2x2 box-average chroma downsample (pad to even dims first)
        chroma_q = []
        for pi in (1, 2):
            p = _pad_edge(planes[pi], mcuy * 16, mcux * 16)
            down = p.reshape(mcuy * 8, 2, mcux * 8, 2).mean(axis=(1, 3))
            chroma_q.append(_block_coefs(down, pi, mcuy, mcux))
        qgrids = [yq] + chroma_q
    else:
        qgrids = [_block_coefs(p, pi, mcuy, mcux)
                  for pi, p in enumerate(planes)]

    wtr = _BitWriter()
    pred = [0] * len(planes)

    def emit_block(zz, pi):
        ti = min(pi, 1)
        diff = int(zz[0]) - pred[pi]
        pred[pi] = int(zz[0])
        t = _cat(diff)
        c, ln = enc_dc[ti].codes[t]
        wtr.put(c, ln)
        if t:
            wtr.put(_mag_bits(diff, t), t)
        run = 0
        nz = np.flatnonzero(zz[1:])
        last = int(nz[-1]) + 1 if nz.size else 0
        k = 1
        while k <= last:
            v = int(zz[k])
            if v == 0:
                run += 1
                k += 1
                continue
            while run > 15:
                c, ln = enc_ac[ti].codes[0xF0]         # ZRL
                wtr.put(c, ln)
                run -= 16
            s = _cat(v)
            c, ln = enc_ac[ti].codes[(run << 4) | s]
            wtr.put(c, ln)
            wtr.put(_mag_bits(v, s), s)
            run = 0
            k += 1
        if last < 63:
            c, ln = enc_ac[ti].codes[0x00]             # EOB
            wtr.put(c, ln)

    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu \
                    and n_mcu % restart_interval == 0:
                wtr.flush()                 # byte-align, 1-bit padding
                wtr.out += bytes([0xFF, 0xD0 + (rst & 7)])
                rst += 1
                for pi in range(len(pred)):
                    pred[pi] = 0
            n_mcu += 1
            if sub420:
                for by in range(2):
                    for bx in range(2):
                        emit_block(qgrids[0][my * 2 + by, mx * 2 + bx],
                                   0)
                emit_block(qgrids[1][my, mx], 1)
                emit_block(qgrids[2][my, mx], 2)
            else:
                for pi in range(len(planes)):
                    emit_block(qgrids[pi][my, mx], pi)
    wtr.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zz_q = lambda q: bytes(int(q[ZIGZAG[i]]) for i in range(64))
    out += seg(0xDB, b"\x00" + zz_q(qls))
    if not gray:
        out += seg(0xDB, b"\x01" + zz_q(qcs))
    nc = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, nc)
    y_hv = 0x22 if sub420 else 0x11
    for i in range(nc):
        sof += bytes([i + 1, y_hv if i == 0 else 0x11,
                      0 if i == 0 else 1])
    out += seg(0xC0, sof)

    def dht(tc, th, bits, vals):
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits)
                   + bytes(vals))

    out += dht(0, 0, *_DC_L) + dht(1, 0, *_AC_L)
    if not gray:
        out += dht(0, 1, *_DC_C) + dht(1, 1, *_AC_C)
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([nc])
    for i in range(nc):
        sos += bytes([i + 1, 0 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, sos)
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)
