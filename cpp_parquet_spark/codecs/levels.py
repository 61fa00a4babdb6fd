"""Definition-level runs (E5) — nullable-column encoding.

An OPTIONAL field's definition level is 0 (null) or 1 (present), max bit
width 1, stored as an RLE/bit-packed hybrid stream exactly like Parquet
data pages do (parquet.thrift:183-192, 671-693; SURVEY.md §2.1 E5). The
page's ``num_values`` includes nulls; the value stream holds only the
``num_values - null_count`` present values.
"""

from __future__ import annotations

import numpy as np

from . import rle


def encode_validity(valid: np.ndarray) -> bytes:
    """valid: bool array (True = present) -> RLE def-level stream (bw=1)."""
    data, _ = rle.encode(valid.astype(np.uint64), bit_width=1)
    return data


def decode_validity(data: bytes, n: int) -> np.ndarray:
    return rle.decode(data, {"bw": 1}, n).astype(bool)
