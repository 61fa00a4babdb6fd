"""Vectorized XXH64 + parquet split-block Bloom filter (SBBF) kernels.

The parquet format's BloomFilter sidecar (parquet.thrift
BloomFilterHeader / BloomFilterAlgorithm BLOCK / BloomFilterHash
XXHASH) hashes each column value's PLAIN-encoded bytes with XXH64
seed 0, then sets 8 bits in one 256-bit block chosen by the high hash
word — the "split block" scheme of Putze/Sanders/Singler's cache-,
hash- and space-efficient Bloom filters, fixed by the spec to 8 salt
constants and 32-byte blocks.

Everything here is numpy over 2-D byte matrices (one row per value,
zero Python per value): XXH64's short path (<32 bytes) and the
4-accumulator stripe path are evaluated lane-parallel across values
with per-length masks, so hashing a million 16-byte keys is a handful
of array ops. uint64 arithmetic wraps mod 2^64 exactly as the scalar
algorithm requires.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_P1 = np.uint64(0x9E3779B185EBCA87)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_P4 = np.uint64(0x85EBCA77C2B2AE63)
_P5 = np.uint64(0x27D4EB2F165667C5)

#: parquet-format SBBF salt constants (one per 32-bit block word)
SALT = np.array([0x47b6137b, 0x44974d91, 0x8824ad5b, 0xa2b7289d,
                 0x705495c7, 0x2df1424b, 0x9efc4947, 0x5c6bfb31],
                dtype=np.uint32)


def _rotl(x: np.ndarray, r: int) -> np.ndarray:
    r = np.uint64(r)
    return (x << r) | (x >> (np.uint64(64) - r))


def _round(acc: np.ndarray, lane: np.ndarray) -> np.ndarray:
    return _rotl(acc + lane * _P2, 31) * _P1


def _avalanche(h: np.ndarray) -> np.ndarray:
    h = h ^ (h >> np.uint64(33))
    h = h * _P2
    h = h ^ (h >> np.uint64(29))
    h = h * _P3
    return h ^ (h >> np.uint64(32))


def xxh64_matrix(mat: np.ndarray, lens: np.ndarray,
                 seed: int = 0) -> np.ndarray:
    """XXH64 of each row of ``mat`` (uint8, one value per row, rows
    zero-padded to a common multiple-of-32 width) over its first
    ``lens[i]`` bytes. Returns uint64 hashes.

    Lane-parallel evaluation of the reference algorithm: every value
    walks the same stripe schedule, masked by its own length — the
    cost is O(max_len) array ops regardless of row count."""
    n, width = mat.shape
    assert width % 32 == 0
    lens = lens.astype(np.int64)
    seed = np.uint64(seed)
    u64 = mat.view("<u8").reshape(n, width // 8)   # 8-byte lanes
    u32 = mat.view("<u4").reshape(n, width // 4)   # 4-byte lanes
    h = np.empty(n, np.uint64)

    long = lens >= 32
    # ---- stripe path (len >= 32): 4 accumulators over 32-byte stripes
    if long.any():
        nl = int(long.sum())
        ll = lens[long]
        acc = np.empty((4, nl), np.uint64)
        m = (1 << 64) - 1          # scalar init wraps mod 2^64 by hand
        acc[0] = np.uint64((int(seed) + int(_P1) + int(_P2)) & m)
        acc[1] = np.uint64((int(seed) + int(_P2)) & m)
        acc[2] = seed
        acc[3] = np.uint64((int(seed) - int(_P1)) & m)
        sub = u64[long]
        n_stripes = int(ll.max()) // 32
        for s in range(n_stripes):
            live = ll >= (s + 1) * 32
            if not live.any():
                break
            for lane in range(4):
                upd = _round(acc[lane], sub[:, s * 4 + lane])
                acc[lane] = np.where(live, upd, acc[lane])
        hl = (_rotl(acc[0], 1) + _rotl(acc[1], 7)
              + _rotl(acc[2], 12) + _rotl(acc[3], 18))
        for lane in range(4):
            hl = (hl ^ _round(np.zeros(nl, np.uint64), acc[lane])) \
                * _P1 + _P4
        h[long] = hl
    h[~long] = np.uint64((int(seed) + int(_P5)) & ((1 << 64) - 1))
    h = h + lens.astype(np.uint64)

    # ---- tail: 8-byte words from the last full stripe edge ----------
    pos = np.where(long, (lens // 32) * 32, 0)
    max_rem8 = int(((lens - pos).max() if n else 0) // 8)
    for _ in range(max_rem8):
        live = pos + 8 <= lens
        if not live.any():
            break
        k1 = _round(np.zeros(n, np.uint64),
                    np.take_along_axis(
                        u64, (pos // 8).clip(0, u64.shape[1] - 1)
                        [:, None], 1)[:, 0])
        upd = _rotl(h ^ k1, 27) * _P1 + _P4
        h = np.where(live, upd, h)
        pos = np.where(live, pos + 8, pos)
    # ---- one 4-byte word --------------------------------------------
    live = pos + 4 <= lens
    if live.any():
        w = np.take_along_axis(
            u32, (pos // 4).clip(0, u32.shape[1] - 1)[:, None],
            1)[:, 0].astype(np.uint64)
        upd = _rotl(h ^ (w * _P1), 23) * _P2 + _P3
        h = np.where(live, upd, h)
        pos = np.where(live, pos + 4, pos)
    # ---- trailing bytes ---------------------------------------------
    max_rem1 = int((lens - pos).max()) if n else 0
    for _ in range(max_rem1):
        live = pos < lens
        if not live.any():
            break
        b = np.take_along_axis(mat, pos[:, None].clip(0, width - 1),
                               1)[:, 0].astype(np.uint64)
        upd = _rotl(h ^ (b * _P5), 11) * _P1
        h = np.where(live, upd, h)
        pos = np.where(live, pos + 1, pos)
    return _avalanche(h)


def _as_matrix(values) -> tuple[np.ndarray, np.ndarray]:
    """Arbitrary-length byte strings -> (padded uint8 matrix, lengths).
    Accepts a pyarrow string/binary array or a list of bytes."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    if isinstance(values, pa.Array):
        values = values.cast(pa.large_binary())
        offs = np.frombuffer(values.buffers()[1], np.int64,
                             len(values) + 1, offset=values.offset * 8)
        payload = np.frombuffer(values.buffers()[2], np.uint8)
        lens = np.diff(offs)
        starts = offs[:-1]
    else:
        lens = np.array([len(v) for v in values], np.int64)
        starts = np.zeros(len(values), np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        payload = np.frombuffer(b"".join(values), np.uint8)
    n = len(lens)
    width = max(int(lens.max() if n else 0), 1)
    width = (width + 31) // 32 * 32
    mat = np.zeros((n, width), np.uint8)
    # gather payload rows into the padded matrix in one scatter
    total = int(lens.sum())
    row = np.repeat(np.arange(n, dtype=np.int64), lens)
    cum = np.zeros(n, np.int64)
    np.cumsum(lens[:-1], out=cum[1:])
    intra = np.arange(total, dtype=np.int64) - np.repeat(cum, lens)
    src = np.repeat(starts, lens) + intra
    mat[row, intra] = payload[src]
    return mat, lens


def xxh64(values, seed: int = 0) -> np.ndarray:
    """XXH64 per value. ``values``: pyarrow string/binary array, list of
    bytes, or a numpy int32/int64/float32/float64 array (hashed over
    its PLAIN little-endian encoding, the parquet bloom convention)."""
    if isinstance(values, np.ndarray) and values.dtype != np.uint8:
        b = np.ascontiguousarray(values).view(np.uint8) \
            .reshape(len(values), values.dtype.itemsize)
        width = (values.dtype.itemsize + 31) // 32 * 32
        mat = np.zeros((len(values), width), np.uint8)
        mat[:, :values.dtype.itemsize] = b
        lens = np.full(len(values), values.dtype.itemsize, np.int64)
        return xxh64_matrix(mat, lens, seed)
    mat, lens = _as_matrix(values)
    return xxh64_matrix(mat, lens, seed)


# --- split-block bloom filter (SBBF) -----------------------------------------

def sbbf_size(ndv: int, fpp: float = 0.01) -> int:
    """Bitset bytes (power of two, >= 32) for ``ndv`` distinct values
    at target false-positive rate ``fpp`` — the standard c = -k/ln(1 -
    fpp^(1/k)) bits-per-value sizing with k = 8, rounded up."""
    import math
    k = 8.0
    c = -k / math.log(1.0 - fpp ** (1.0 / k))
    bits = max(int(ndv * c), 256)
    nbytes = 1 << max(int(math.ceil(math.log2(bits / 8.0))), 5)
    return nbytes


def _block_masks(h: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """hash -> (block index factor, 8 per-word bit masks). The block
    index needs numBytes, so only the 32-bit mask half is fixed here."""
    hi = (h >> np.uint64(32)).astype(np.uint64)
    lo = h.astype(np.uint32)
    # mask word w gets bit (lo * SALT[w]) >> 27
    prod = lo[:, None].astype(np.uint32) * SALT[None, :]
    bit = (prod >> np.uint32(27)).astype(np.uint32)
    masks = (np.uint32(1) << bit)
    return hi, masks


def sbbf_build(hashes: np.ndarray, nbytes: int) -> np.ndarray:
    """Insert every hash; returns the bitset as uint32 words (LE)."""
    nblocks = nbytes // 32
    words = np.zeros(nblocks * 8, np.uint32)
    hi, masks = _block_masks(hashes)
    block = ((hi * np.uint64(nblocks)) >> np.uint64(32)).astype(np.int64)
    widx = block[:, None] * 8 + np.arange(8)[None, :]
    np.bitwise_or.at(words, widx.ravel(), masks.ravel())
    return words


def sbbf_check(words: np.ndarray, hashes: np.ndarray) -> np.ndarray:
    """Membership test per hash against a bitset from `sbbf_build` (or
    any spec-conformant writer). False = definitely absent."""
    nblocks = words.shape[0] // 8
    hi, masks = _block_masks(hashes)
    block = ((hi * np.uint64(nblocks)) >> np.uint64(32)).astype(np.int64)
    widx = block[:, None] * 8 + np.arange(8)[None, :]
    got = words[widx]
    return ((got & masks) == masks).all(axis=1)
