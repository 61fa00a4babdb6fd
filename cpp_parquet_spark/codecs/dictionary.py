"""Dictionary codec (E2) — Parquet RLE_DICTIONARY semantics.

Distinct values PLAIN-encoded once (the "dictionary page",
parquet.thrift:583-589,703-712); the value stream becomes indices encoded
with the RLE/bit-packed hybrid at ``bit_width(len(dict)-1)`` bits
(parquet.thrift:616-618). Here the dictionary blob travels in the page
``data`` section ahead of the index stream (one self-contained page row
replaces Parquet's separate dictionary page — SURVEY.md §1.2).

Layout: ``[u32 n_dict][u32 dict_blob_len][dict PLAIN blob][rle index stream]``
Factorization is pyarrow's C++ ``dictionary_encode`` — first-occurrence
order, deterministic.

Dict-of-FSST cascade (round 3): when the distinct-values payload of a
string/binary column is large (>= ``DICT_FSST_MIN`` bytes — path-like
columns with a big but internally-repetitive vocabulary), the dictionary
blob itself is FSST-encoded and ``params["dv"] = "fsst"`` marks it for
decode. This is the same two-level shape as Parquet's dictionary page
under page compression (parquet.thrift:703-712 + 642-651), but with the
lightweight symbol table instead of a general-purpose block codec, so
single-value random access into the dictionary stays cheap. Applied only
when it actually shrinks the blob by >10%; deterministic (fsst.train is
RNG-free), so resume re-picks identical bytes.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from . import plain, rle


def _to_arrow(values, tag: str) -> pa.Array:
    if isinstance(values, pa.Array):
        return values
    if tag == "str":
        return pa.array(values, type=pa.large_string())
    if tag == "bin":
        return pa.array(values, type=pa.large_binary())
    return pa.array(np.ascontiguousarray(values))


#: cascade threshold: below this the PLAIN dictionary blob stays as-is
#: (symbol-table overhead would not amortize)
DICT_FSST_MIN = 1 << 12


def encode(values, tag: str) -> tuple[bytes, dict]:
    arr = _to_arrow(values, tag)
    dct = arr.dictionary_encode()
    codes = dct.indices.to_numpy(zero_copy_only=False).astype(np.uint64)
    uniques = dct.dictionary
    dict_blob, _ = plain.encode(uniques, tag)
    params = {}
    if tag in ("str", "bin") and len(dict_blob) >= DICT_FSST_MIN:
        from . import fsst
        table = fsst.train(uniques)
        if table is not None:
            fb, _ = fsst.encode(uniques, table)
            if len(fb) < len(dict_blob) * 0.9:
                dict_blob = fb
                params["dv"] = "fsst"
    idx_stream, idx_params = rle.encode(codes)
    n_dict = len(uniques)
    head = np.array([n_dict, len(dict_blob)], dtype=np.uint32).tobytes()
    return head + dict_blob + idx_stream, {"bw": idx_params["bw"], **params}


def decode(data: bytes, params: dict, n: int, tag: str):
    head = np.frombuffer(data[:8], dtype=np.uint32)
    n_dict, blob_len = int(head[0]), int(head[1])
    dict_blob = data[8 : 8 + blob_len]
    if params.get("dv") == "fsst":
        from . import fsst
        uniques = fsst.decode(dict_blob, {}, n_dict, tag)
    else:
        uniques = plain.decode(dict_blob, {}, n_dict, tag)
    codes = rle.decode(data[8 + blob_len :], {"bw": int(params["bw"])}, n)
    if isinstance(uniques, pa.Array):
        return uniques.take(pa.array(codes.astype(np.int64)))
    return np.asarray(uniques)[codes.astype(np.int64)]
