"""Decimal-float codec ("dfloat") — lightweight float compression for
values that are exactly scaled decimals (prices, rates, quantities).

Public-idea lineage: the "pseudodecimal" path of ALP (Afroozeh &
Boncz, "ALP: Adaptive Lossless floating-Point Compression", SIGMOD 2024)
— most real-world doubles are decimal literals; ``v * 10^e`` is an exact
small integer, and integers compress with the existing FOR/delta/bit-pack
kernels. This is a from-scratch vectorized reimplementation of the idea,
not a port: one scale per page, exactness verified on EVERY value before
committing (the caller falls back to PLAIN when verification fails, so
the codec is lossless by construction).

Page layout: the integer stream encoded by :mod:`for_`'s FOR kernel;
params carry ``{"scale": 10^e, **for_params}``.
"""

from __future__ import annotations

import numpy as np

from . import for_ as forc

#: scales tried in order; first exact one wins (deterministic)
SCALES = (1, 100, 10, 1000, 10000)

#: |scaled| must stay inside 2^53 so the float->int->float trip is exact
MAX_ABS = float(1 << 53)


def _bit_exact(a: np.ndarray, b: np.ndarray) -> bool:
    """float64 equality at the BIT level: == treats -0.0 == 0.0, so a page
    holding -0.0 would pass a value compare yet decode to +0.0 and break
    the sha256 round-trip. Comparing the int64 bit patterns closes that."""
    return np.array_equal(a.view(np.int64), b.view(np.int64))


def find_scale(v: np.ndarray) -> int | None:
    """Smallest-index scale for which every value is an exact scaled
    integer (None when the page isn't decimal-like)."""
    if v.size == 0:
        return 1
    if not np.isfinite(v).all():
        return None
    for s in SCALES:
        x = v * s
        if np.abs(x).max() >= MAX_ABS:
            continue
        # verify through the ACTUAL storage path (int64), not float rint:
        # rint(-0.0) is still -0.0 as a float, but int64 storage drops the
        # sign, so the decode would yield +0.0 — the int trip catches it
        i = np.rint(x).astype(np.int64)
        if _bit_exact(np.asarray(i.astype(np.float64) / s, np.float64), v):
            return s
    return None


def encode(values: np.ndarray, scale: int | None = None) -> tuple[bytes, dict]:
    v = np.ascontiguousarray(values, dtype=np.float64)
    s = scale if scale is not None else find_scale(v)
    if s is None:
        raise ValueError("dfloat: page is not exactly scaled-decimal "
                         "(caller should fall back to plain)")
    i = np.rint(v * s).astype(np.int64)
    if not _bit_exact(np.asarray(i.astype(np.float64) / s, np.float64), v):
        raise ValueError("dfloat: exactness verification failed")
    body, p = forc.encode(i)
    return body, {"scale": s, **p}


def decode(data: bytes, params: dict, n: int) -> np.ndarray:
    i = forc.decode(data, {k: params[k] for k in ("frame", "bw")}, n)
    return i.astype(np.float64) / int(params["scale"])
