"""Front-coding (incremental prefix) string codec — the engine's analogue
of Parquet's DELTA_BYTE_ARRAY "incremental encoding" (parquet format
Encodings.md; parquet.thrift Encoding.DELTA_BYTE_ARRAY): each value
stores the byte length of its common prefix with the PREVIOUS value plus
its remaining suffix bytes. It wins on sorted path-like columns — the
north-rule table's `path` column is sorted within every part
(``EncodeConfig.order_keys``), where neighbouring values share long
directory prefixes that neither dict (values unique) nor FSST (symbols
cap at 8 bytes) can exploit.

Layout (little-endian)::

    u32 plen_blob_len ; plen_blob    # k prefix lens, bit-packed (E4)
    u32 slen_blob_len ; slen_blob    # k suffix lens, bit-packed (E4)
    suffix bytes, concatenated

Two deliberate bounds keep both directions fully vectorized (the repo-wide
"no per-row Python" invariant, BASELINE.json):

* prefix lengths cap at ``CAP`` = 255 bytes — bounds the encode-side
  byte-position comparison loop; longer shared prefixes spill into the
  suffix (columns that degenerate this way are dict/FSST territory and
  lose the size comparison in selection anyway);
* a restart every ``RESTART`` = 16 values (prefix forced to 0) bounds the
  decode dependency chain, so reconstruction is at most RESTART-1
  vectorized gather passes instead of a per-string loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import bitpack
from .fsst import _flatten

CAP = 255
RESTART = 16


def _common_prefixes(flat: np.ndarray, starts: np.ndarray,
                     lens: np.ndarray) -> np.ndarray:
    """Per-string common-prefix byte count with the previous string
    (index 0 and every RESTART-th string get 0). Byte-position passes
    over a shrinking active set: pass j keeps only the strings whose
    first j+1 bytes all matched, so total work = Σ common-prefix bytes."""
    k = lens.shape[0]
    cp = np.zeros(k, dtype=np.int64)
    if k < 2:
        return cp
    i = np.arange(1, k, dtype=np.int64)
    cap = np.minimum(np.minimum(lens[1:], lens[:-1]), CAP)
    act = i[(i % RESTART != 0) & (cap > 0)]
    j = 0
    while act.shape[0]:
        eq = flat[starts[act] + j] == flat[starts[act - 1] + j]
        act = act[eq]
        j += 1
        cp[act] = j
        act = act[j < cap[act - 1]]   # cap is indexed by i-1
    return cp


def _spans(starts: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Flat gather indices covering [starts[i], starts[i]+lens[i]) for
    every i, concatenated in order (the repeat/arange span trick)."""
    tot = int(lens.sum())
    if tot == 0:
        return np.empty(0, dtype=np.int64)
    cum = np.zeros(lens.shape[0], dtype=np.int64)
    np.cumsum(lens[:-1], out=cum[1:])
    return np.repeat(starts, lens) + (np.arange(tot, dtype=np.int64)
                                      - np.repeat(cum, lens))


def encode(values, table_unused=None) -> tuple[bytes, dict]:
    """values: pa.Array / sequence of str|bytes -> (body bytes, params)."""
    flat, lens = _flatten(values)
    k = lens.shape[0]
    starts = np.zeros(k, dtype=np.int64)
    if k:
        np.cumsum(lens[:-1], out=starts[1:])
    cp = _common_prefixes(flat, starts, lens)
    sl = lens - cp
    suffix = flat[_spans(starts + cp, sl)]
    pblob, pp = bitpack.encode(cp.astype(np.uint64))
    sblob, sp = bitpack.encode(sl.astype(np.uint64))
    body = (np.uint32(len(pblob)).tobytes() + pblob
            + np.uint32(len(sblob)).tobytes() + sblob
            + suffix.tobytes())
    return body, {"pbw": pp["bw"], "sbw": sp["bw"], "r": RESTART}


def decode(data: bytes, params: dict, n: int, tag: str = "str"):
    raw = np.frombuffer(data, dtype=np.uint8)
    plen = int(raw[:4].view(np.uint32)[0])
    pos = 4
    cp = bitpack.decode(raw[pos:pos + plen], {"bw": params["pbw"]},
                        n).astype(np.int64)
    pos += plen
    slen = int(raw[pos:pos + 4].view(np.uint32)[0])
    pos += 4
    sl = bitpack.decode(raw[pos:pos + slen], {"bw": params["sbw"]},
                        n).astype(np.int64)
    pos += slen
    suffix = raw[pos:]

    lens = cp + sl
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    out = np.empty(int(offs[-1]), dtype=np.uint8)
    # suffixes land at out_start + prefix_len, in order
    out[_spans(offs[:-1] + cp, sl)] = suffix[:int(sl.sum())]
    # prefixes resolve in RESTART-1 passes: strings at distance d from
    # their restart point copy from a (d-1)-distance string that pass
    # d-1 fully materialized
    r = int(params.get("r", RESTART))
    idx = np.arange(n, dtype=np.int64)
    for d in range(1, r):
        sel = idx[(idx % r == d) & (cp > 0)]
        if sel.shape[0] == 0:
            continue
        out[_spans(offs[sel], cp[sel])] = out[_spans(offs[sel - 1], cp[sel])]
    arr = pa.LargeBinaryArray.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offs.tobytes()), pa.py_buffer(out.tobytes())])
    return arr.cast(pa.large_string()) if tag == "str" else arr
