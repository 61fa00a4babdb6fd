"""Vectorized numpy codec kernels.

Every kernel is pure numpy/pyarrow — no per-row Python in any hot path
(BASELINE.json:15). Each codec module exposes::

    encode(values, **kw) -> (data: bytes, params: dict)
    decode(data: bytes, params: dict, n: int) -> np.ndarray

The page-level framing (type tags, null/definition levels, codec dispatch)
lives in :mod:`cpp_parquet_spark.codecs.pagecodec`.
"""
