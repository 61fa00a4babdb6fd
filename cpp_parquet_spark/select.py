"""Codec auto-selection (E8).

The reference world's only "selection" is parquet-cpp's dict-first with
size-threshold fallback to PLAIN (parquet/properties.h:137-139,305-306;
SURVEY.md §2.1 E8). The north rule mandates a real sampling-based selector
(BASELINE.json:6): per column chunk, pick dict vs RLE vs FSST vs bit-pack
vs FOR vs PLAIN from column statistics — cardinality, run-length, byte
frequency.

Two layers:

* :func:`choose_codec` — deterministic pure function: page-level stats ->
  codec name, by comparing *estimated encoded sizes* (ints/floats/bools)
  or *measured sample encodings* (strings — dict/FSST/plain encoded on a
  deterministic <=16 KiB sample and the smallest wins).
* The cluster-level sampling pass lives in
  :mod:`cpp_parquet_spark.stats` (Spark DataFrame aggregation over a
  seeded sample; its thresholds mirror this module so plan-level and
  page-level decisions agree).

Determinism matters: resume must re-pick identical codecs for identical
input (SURVEY.md §7 M5 hard part #3) — no RNG, stride-based sampling only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .codecs import dfloat, dictionary, fsst, plain, prefix
from .codecs.bitpack import bit_width_for
from .codecs.pagecodec import ARR_TAGS as pagecodec_ARR_TAGS
from .codecs.pagecodec import INT_TAGS, STR_TAGS

SAMPLE_VALUES = 512          # stride-sampled values for string estimation
SAMPLE_BYTES = 1 << 14       # cap the string sample at 16 KiB
DICT_MAX_CARD = 1 << 16      # beyond this a dictionary stops paying off


def _stride_sample(n: int, k: int) -> np.ndarray:
    """Deterministic evenly-spaced index sample (no RNG)."""
    if n <= k:
        return np.arange(n)
    return np.linspace(0, n - 1, k).astype(np.int64)


def _int_stats(v: np.ndarray) -> dict:
    n = v.shape[0]
    runs = int((v[1:] != v[:-1]).sum()) + 1 if n else 1
    idx = _stride_sample(n, 1024)
    sample = v[idx]
    ndist_s = len(np.unique(sample))
    lo, hi = (int(v.min()), int(v.max())) if n else (0, 0)
    return {"n": n, "lo": lo, "hi": hi, "mean_run": n / runs,
            "ndistinct_est": ndist_s * max(1, n // max(1, idx.shape[0]))
                             if ndist_s == idx.shape[0] else ndist_s}


def choose_int_codec(v: np.ndarray) -> str:
    """Pick by estimated encoded size; deterministic tiebreak order."""
    st = _int_stats(v)
    n = st["n"]
    if n == 0:
        return "plain"
    span = (st["hi"] - st["lo"]) & 0xFFFFFFFFFFFFFFFF
    bw = bit_width_for(span)
    vb = (bw + 7) // 8
    # PLAIN baseline at the column's own word width (i8 stores 1 B/value,
    # not 8) so narrow ints don't get pushed into FOR for a phantom win
    w = v.dtype.itemsize
    est = {"plain": w * n, "for": (n * bw) // 8 + 16}
    if n > 1:
        u = np.ascontiguousarray(v, dtype=np.int64).view(np.uint64)
        d = (u[1:] - u[:-1]).view(np.int64)
        dspan = (int(d.max()) - int(d.min())) & 0xFFFFFFFFFFFFFFFF
        est["delta"] = ((n - 1) * bit_width_for(dspan)) // 8 + 24
    if st["mean_run"] >= 4:
        # repeated runs dominate: headers + byte-padded values per run
        est["rle"] = int(n / st["mean_run"]) * (2 + max(vb, 1)) + 16
    nd = st["ndistinct_est"]
    if nd <= DICT_MAX_CARD and nd < n // 2:
        cw = bit_width_for(max(nd - 1, 1))
        est["dict"] = nd * 8 + (n * cw) // 8 + 24
    if st["lo"] >= 0:
        est["bitpack"] = (n * bit_width_for(st["hi"])) // 8 + 8
    order = ("rle", "delta", "dict", "for", "bitpack", "plain")
    return min(order, key=lambda c: est.get(c, float("inf")))


def choose_float_codec(v: np.ndarray, block: str | None = None) -> str:
    n = v.shape[0]
    if n == 0:
        return "plain"
    idx = _stride_sample(n, 1024)
    sample = np.asarray(v[idx], dtype=np.float64)
    scale = dfloat.find_scale(sample)
    if scale is not None:
        i = np.rint(sample * scale).astype(np.int64)
        span = (int(i.max()) - int(i.min())) & 0xFFFFFFFFFFFFFFFF
        if bit_width_for(span) <= 48:       # beats 64-bit plain w/ headroom
            return "dfloat"
    nd = len(np.unique(v[idx]))
    if nd <= max(16, idx.shape[0] // 10):
        return "dict"
    # bss (BYTE_STREAM_SPLIT) is size-neutral alone; only worth it when an
    # E9 outer block codec will compress the grouped byte planes
    return "bss" if block else "plain"


def choose_string_codec(arr: pa.Array) -> tuple[str, object]:
    """Returns (codec, trained fsst table or None).

    Encodes a deterministic sample with each candidate and picks the
    smallest — the selection signal the stats pass computes at scale
    (cardinality + byte-frequency) reduced to a direct measurement here.
    """
    n = len(arr)
    if n == 0:
        return "plain", None
    idx = _stride_sample(n, SAMPLE_VALUES)
    sample = arr.take(pa.array(idx))
    if sample.null_count:
        sample = sample.drop_null()
    if len(sample) == 0:
        return "plain", None
    # cap the sample by BYTES too: on wide values (source files) 512 values
    # can be the whole page, making selection as expensive as encoding
    if sample.nbytes > SAMPLE_BYTES:
        la = sample.cast(pa.large_binary())
        offs = np.frombuffer(la.buffers()[1], dtype=np.int64,
                             count=len(la) + 1, offset=la.offset * 8)
        cum = offs - offs[0]
        k = max(1, int(np.searchsorted(cum, SAMPLE_BYTES)))
        # re-stride so the byte-capped sample still spans the whole page
        sample = sample.take(pa.array(_stride_sample(len(sample), k)))
    sizes = {}
    pl, _ = plain.encode(sample, "str")
    sizes["plain"] = len(pl)
    d, _ = dictionary.encode(sample, "str")
    sizes["dict"] = len(d)
    table = fsst.train(sample)
    if table is not None:
        f, _ = fsst.encode(sample, table)
        # subtract the symbol-table overhead: it amortizes over the full
        # page, not the sample
        sizes["fsst"] = max(1, len(f) - sum(len(s) for s in table.expansions)
                            - len(table.expansions) - 2)
    # front coding: measured on a CONTIGUOUS mid-page window of the same
    # value count — stride sampling destroys the neighbour adjacency
    # prefix exploits (measured: sorted paths stride-sample to ~fsst
    # size but contiguous-encode 1.26x smaller than fsst), while the
    # other candidates are order-insensitive so their stride sample
    # stands. Equal counts keep the byte totals directly comparable.
    m = len(sample)
    contig = arr.slice(max(0, (n - m) // 2), m)
    if contig.null_count:
        contig = contig.drop_null()
    def _vbytes(a: pa.Array) -> int:
        return int(pa.compute.sum(pa.compute.binary_length(
            a.cast(pa.large_binary()))).as_py() or 0)

    cb = _vbytes(contig) if len(contig) else 0
    if cb:
        pr, _ = prefix.encode(contig)
        # normalize by RAW VALUE BYTES, not value count: with variable-
        # length values the two windows hold different byte totals and an
        # un-normalized compare mis-ranks prefix on long-value columns
        sizes["prefix"] = int(len(pr) * (_vbytes(sample) / cb))
    order = ("fsst", "dict", "prefix", "plain")
    best = min(order, key=lambda c: sizes.get(c, float("inf")))
    return best, (table if best == "fsst" else None)


def choose_codec_arrow(arr: pa.Array, tag: str, block: str | None = None):
    """pa.Array + tag -> (codec, fsst_table_or_None). Deterministic.

    The per-page entry point used by the encode kernel (nulls are handled
    by the page framing; selection looks at present values only).
    ``block`` is the configured E9 outer block codec (or None): floats and
    float arrays flow to byte-stream-split layouts when it is set."""
    if tag == "bool":
        return "rle", None
    work = arr.drop_null() if arr.null_count else arr
    if len(work) == 0:
        return "plain", None
    from .codecs import pagecodec as _pc
    if _pc.is_dec(tag):
        return choose_int_codec(_pc.dec_unscaled(work)), None
    if tag in INT_TAGS:
        if tag in ("ts", "tsn"):
            work = work.cast(pa.int64())
        elif tag == "date":
            work = work.cast(pa.int32())
        return choose_int_codec(work.to_numpy(zero_copy_only=False)), None
    if tag in ("f64", "f32"):
        return choose_float_codec(work.to_numpy(zero_copy_only=False),
                                  block), None
    if tag in STR_TAGS:
        return choose_string_codec(work)
    if tag in pagecodec_ARR_TAGS:
        if tag in ("arrs", "arrb"):
            return "lists", None
        if tag.startswith("arri"):
            return "listi", None
        return ("listb" if block else "listf"), None
    return "plain", None


def choose_codec(s, tag: str, block: str | None = None):
    """pandas Series + tag -> (codec, fsst_table_or_None). Deterministic."""
    if tag == "bool":
        return "rle", None
    if tag in INT_TAGS:
        v = s.dropna()
        if tag in ("ts", "tsn"):
            arr = v.to_numpy(dtype="datetime64[us]").view(np.int64)
        else:
            arr = v.to_numpy(dtype=np.int64)
        return choose_int_codec(arr), None
    if tag in ("f64", "f32"):
        return choose_float_codec(s.dropna().to_numpy(), block), None
    if tag in STR_TAGS:
        arr = pa.Array.from_pandas(s)
        arr = arr.cast(pa.large_string() if tag == "str" else pa.large_binary())
        return choose_string_codec(arr)
    return "plain", None
