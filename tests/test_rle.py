"""RLE/bit-packed hybrid (E3) — golden vectors from the public grammar
(arrow/util/rle_encoding.h:75-85) + property tests vs a naive reference
decoder/encoder written independently of the vectorized kernel."""

import numpy as np
import pytest

from cpp_parquet_spark.codecs import rle
from cpp_parquet_spark.codecs.bitpack import pack_bits_le, unpack_bits_le


# --- naive reference implementations (slow, obviously-correct) ----------------

def naive_decode(data: bytes, bw: int, n: int) -> list[int]:
    out = []
    pos = 0
    while len(out) < n:
        # varint
        header, shift = 0, 0
        while True:
            b = data[pos]; pos += 1
            header |= (b & 0x7F) << shift
            if not (b & 0x80):
                break
            shift += 7
        if header & 1:
            groups = header >> 1
            count = groups * 8
            nbytes = (count * bw + 7) // 8
            vals = unpack_bits_le(data[pos:pos + nbytes], bw, count)
            out.extend(int(v) for v in vals)
            pos += nbytes
        else:
            count = header >> 1
            vb = (bw + 7) // 8
            val = int.from_bytes(data[pos:pos + vb], "little")
            out.extend([val] * count)
            pos += vb
    return out[:n]


def spec_repeated_run(count: int, value: int, bw: int) -> bytes:
    out = bytearray()
    h = count << 1
    while True:
        b = h & 0x7F; h >>= 7
        out.append(b | 0x80 if h else b)
        if not h:
            break
    out += value.to_bytes((bw + 7) // 8, "little")
    return bytes(out)


# --- golden vectors (rle_encoding.h:75-85) ------------------------------------

def test_golden_100_ones_100_zeros():
    """'100 1s followed by 100 0s' -> two repeated runs."""
    vals = np.array([1] * 100 + [0] * 100, dtype=np.uint64)
    stream = spec_repeated_run(100, 1, 1) + spec_repeated_run(100, 0, 1)
    got = rle.decode(stream, {"bw": 1}, 200)
    assert np.array_equal(got, vals)
    # our encoder produces exactly this two-run form
    enc, p = rle.encode(vals, bit_width=1)
    assert enc == stream
    assert p["bw"] == 1


def test_golden_alternating_200():
    """'alternating 1s and 0s (200 total)' -> 25 literal groups, 26 bytes."""
    vals = np.tile(np.array([1, 0], dtype=np.uint64), 100)
    enc, _ = rle.encode(vals, bit_width=1)
    assert len(enc) == 26, "1 header byte + 25 bit-packed bytes"
    assert enc[0] == (25 << 1) | 1
    assert np.array_equal(rle.decode(enc, {"bw": 1}, 200), vals)


def test_literal_multiple_of_8_mid_stream():
    """A literal segment before a repeated run must be stolen up to a
    multiple of 8 (rle_encoding.h:59-67 groups-of-8 rule)."""
    # 5 distinct values then a run of 100 -> encoder must emit an 8-value
    # literal group (stealing 3 from the run head), then a 97-run.
    vals = np.array([1, 2, 3, 4, 5] + [7] * 100, dtype=np.uint64)
    enc, p = rle.encode(vals)
    assert np.array_equal(rle.decode(enc, p, len(vals)), vals)
    assert naive_decode(enc, p["bw"], len(vals)) == vals.tolist()


@pytest.mark.parametrize("seed", range(6))
@pytest.mark.parametrize("bw", [1, 2, 3, 7, 8, 12, 20, 32, 40, 64])
def test_roundtrip_random(seed, bw):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(1, 5000))
    hi = np.uint64((1 << bw) - 1)
    # mix runs and noise
    base = rng.integers(0, int(hi) + 1 if bw < 64 else 2**63, size=n).astype(np.uint64)
    runify = rng.random(n) < 0.7
    base[runify] = base[0]
    enc, p = rle.encode(base, bit_width=bw)
    got = rle.decode(enc, p, n)
    assert np.array_equal(got, base)
    assert naive_decode(enc, bw, n) == base.tolist()


@pytest.mark.parametrize("pattern", [
    [], [0], [5], [3] * 7, [3] * 8, [3] * 15, [3] * 16, [3] * 17,
    list(range(9)), [1] * 16 + [2] * 16, [1, 1, 2] * 11,
    [0] * 100, [2**63] * 20, list(range(64, 0, -1)) + [9] * 63,
])
def test_roundtrip_boundaries(pattern):
    vals = np.array(pattern, dtype=np.uint64)
    enc, p = rle.encode(vals)
    assert np.array_equal(rle.decode(enc, p, len(vals)), vals)
    if len(vals):
        assert naive_decode(enc, p["bw"], len(vals)) == vals.tolist()


def test_bitpack_roundtrip():
    rng = np.random.default_rng(0)
    for bw in (1, 5, 11, 31, 33, 64):
        hi = (1 << bw) - 1
        v = rng.integers(0, min(hi, 2**63 - 1) + 1, size=777).astype(np.uint64)
        if bw == 64:
            v[0] = np.uint64(2**64 - 1)
        packed = pack_bits_le(v, bw)
        assert len(packed) == (777 * bw + 7) // 8
        assert np.array_equal(unpack_bits_le(packed, bw, 777), v)
